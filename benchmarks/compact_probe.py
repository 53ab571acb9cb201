"""Isolate the sparse-repair compaction cost (config-3 probe showed ~250 ms).

Suspects inside ``repair_bad_pixels``'s sparse branch at 24 MP:
- jnp.nonzero(size=K): cumsum(24M) + bincount (a 24M-update scatter-add, the
  classic TPU serialization trap) + cumsum(K)
- the final .at[kk].set scatter (K updates — should be cheap)

Candidate replacement: one cumsum + searchsorted-gather (no giant scatter),
or an MXU-blocked cumsum (within-block prefix sums as an f32 matmul against a
triangular matrix, block offsets by a tiny host-size cumsum).

Run on TPU: python -m benchmarks.compact_probe
"""
from __future__ import annotations

import time

import numpy as np


def blocked_cumsum(x, block: int = 512):
    """Inclusive cumsum via MXU: within-block prefix = x @ upper-triangular."""
    import jax.numpy as jnp
    from jax import lax

    n = x.shape[0]
    pad = (-n) % block
    xb = jnp.pad(x, (0, pad)).reshape(-1, block).astype(jnp.float32)
    tri = jnp.tril(jnp.ones((block, block), jnp.float32)).T  # [i<=j] upper
    within = lax.dot_general(
        xb, tri, (((1,), (0,)), ((), ())), precision=lax.Precision.HIGHEST
    )
    totals = within[:, -1]
    offsets = jnp.cumsum(totals) - totals  # small: n/block elements
    return (within + offsets[:, None]).reshape(-1)[:n]


def main() -> None:
    import jax
    import jax.numpy as jnp

    from benchmarks.cache import enable_compile_cache

    enable_compile_cache()
    from benchmarks.timing import timed_loop

    H, W = 4000, 6000
    K = 32768
    rng = np.random.default_rng(0)
    mask = jax.device_put(rng.random((4, H // 2, W // 2)) < 1e-5)
    chan = jax.device_put(rng.random((4, H // 2, W // 2), np.float32))
    n = int(np.prod(mask.shape))
    print(f"[cp] backend={jax.default_backend()} sites={int(np.asarray(jnp.sum(mask)))}",
          flush=True)

    def t(name, fn, *args, iters=8):
        t0 = time.time()
        dt = timed_loop(fn, *args, iters=iters)
        print(f"[cp] {name}: {dt*1e3:7.2f} ms [wall {time.time()-t0:.0f}s]", flush=True)
        return dt

    t("nonzero(size=K)     ",
      lambda m: jnp.nonzero(m.reshape(-1), size=K, fill_value=n)[0].astype(jnp.int32),
      mask)
    t("cumsum 24M int32    ", lambda m: jnp.cumsum(m.reshape(-1).astype(jnp.int32)), mask)
    t("blocked cumsum (MXU)", lambda m: blocked_cumsum(m.reshape(-1).astype(jnp.float32)), mask)

    def compact_searchsorted(m):
        c = jnp.cumsum(m.reshape(-1).astype(jnp.int32))
        kk = jnp.searchsorted(c, jnp.arange(1, K + 1, dtype=jnp.int32))
        return jnp.where(jnp.arange(K) < c[-1], kk, n)

    def compact_mxu(m):
        c = blocked_cumsum(m.reshape(-1).astype(jnp.float32)).astype(jnp.int32)
        kk = jnp.searchsorted(c, jnp.arange(1, K + 1, dtype=jnp.int32))
        return jnp.where(jnp.arange(K) < c[-1], kk, n)

    def compact_hier(m, S=512):
        """No 24M cumsum, no giant scatter: block sums -> block cumsum (small)
        -> per-slot block via searchsorted -> gather the K owning blocks
        -> within-block rank via an MXU prefix sum over (K, S)."""
        from jax import lax

        xb = m.reshape(-1, S).astype(jnp.float32)  # (B, S)
        bs = jnp.sum(xb, axis=1)  # (B,)
        bc = jnp.cumsum(bs)  # small
        total = bc[-1]
        k = jnp.arange(K, dtype=jnp.float32)
        b_k = jnp.searchsorted(bc, k + 1.0)
        b_k = jnp.minimum(b_k, xb.shape[0] - 1)
        prev = jnp.take(bc, b_k) - jnp.take(bs, b_k)
        r_k = k - prev  # rank within the block
        rows = jnp.take(xb, b_k, axis=0)  # (K, S)
        tri = jnp.tril(jnp.ones((S, S), jnp.float32)).T
        rowcsum = lax.dot_general(
            rows, tri, (((1,), (0,)), ((), ())), precision=lax.Precision.HIGHEST
        )
        pos = jnp.sum((rowcsum < r_k[:, None] + 1.0).astype(jnp.int32), axis=1)
        kk = b_k.astype(jnp.int32) * S + pos
        return jnp.where(k < total, kk, n)

    t("compact searchsorted", compact_searchsorted, mask)
    t("compact MXU         ", compact_mxu, mask)
    t("compact hierarchical", compact_hier, mask)

    # parity check on host
    got = np.asarray(compact_searchsorted(mask))
    got2 = np.asarray(compact_mxu(mask))
    got3 = np.asarray(compact_hier(mask))
    want = np.asarray(jnp.nonzero(mask.reshape(-1), size=K, fill_value=n)[0])
    print("[cp] parity searchsorted:", bool((got == want).all()),
          "mxu:", bool((got2 == want).all()),
          "hier:", bool((got3 == want).all()), flush=True)

    from pysp_tpu.correct.bad_pixels import masked_fill_inpaint, masked_fill_inpaint_sparse

    t("dense fill 4+2      ", lambda c, m: masked_fill_inpaint(c, m), chan, mask)
    for k in (32768, 8192, 2048):
        t(f"sparse fill K={k:5d}",
          lambda c, m, k=k: masked_fill_inpaint_sparse(c, m, max_sites=k),
          chan, mask)


if __name__ == "__main__":
    main()
