"""Stage breakdown of masked_fill_inpaint_sparse after the compaction fix.

compact_probe r2: sparse fill = 37 / 10.4 / 3.5 ms at K = 32768 / 8192 / 2048
while compaction alone is ~7 ms at K=32768 — the K-side tail (searchsorted on
nb_keys, the 6-iteration gather loop, the final scatter) dominates. Isolate
each stage to decide between fewer gathers, an MXU one-hot matmul loop, or a
smaller K default.

Run on TPU: python -m benchmarks.sparsefill_probe [K]
"""
from __future__ import annotations

import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from benchmarks.cache import enable_compile_cache

    enable_compile_cache()
    from benchmarks.timing import timed_loop
    from pysp_tpu.correct.bad_pixels import compact_mask_indices

    K = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    H, W = 4000, 6000
    rng = np.random.default_rng(0)
    mask = jax.device_put(rng.random((4, H // 2, W // 2)) < 1e-5)
    chan = jax.device_put(rng.random((4, H // 2, W // 2), np.float32))
    n = int(np.prod(mask.shape))
    p, h, w = 4, H // 2, W // 2
    print(f"[sf] backend={jax.default_backend()} K={K}", flush=True)

    def t(name, fn, *args, iters=32):
        t0 = time.time()
        dt = timed_loop(fn, *args, iters=iters)
        print(f"[sf] {name}: {dt*1e3:7.2f} ms [wall {time.time()-t0:.0f}s]",
              flush=True)
        return dt

    t("compact             ", lambda m: compact_mask_indices(m.reshape(-1), K), mask)

    def setup(c, m):
        flat_chan = c.reshape(-1)
        kk = compact_mask_indices(m.reshape(-1), K)
        valid_slot = kk < n
        py = (kk // w) % h
        px = kk % w
        pp = kk // (h * w)
        nb_keys = jnp.stack(
            [
                pp * (h * w)
                + jnp.clip(py + dy, 0, h - 1) * w
                + jnp.clip(px + dx, 0, w - 1)
                for dy, dx in ((-1, 0), (1, 0), (0, -1), (0, 1))
            ],
            axis=1,
        )
        pos = jnp.minimum(jnp.searchsorted(kk, nb_keys), K - 1)
        nb_masked = jnp.take(kk, pos) == nb_keys
        nb_chan = jnp.take(flat_chan, jnp.minimum(nb_keys, n - 1))
        return kk, valid_slot, pos, nb_masked, nb_chan

    t("compact+setup       ", lambda c, m: setup(c, m)[4], chan, mask)

    def loop_only(c, m):
        kk, valid_slot, pos, nb_masked, nb_chan = setup(c, m)
        x0 = jnp.zeros((K,), c.dtype)
        v0 = jnp.zeros((K,), c.dtype)

        def fill_body(_, carry):
            x, v = carry
            nb_x = jnp.where(nb_masked, jnp.take(x, pos), nb_chan)
            nb_v = jnp.where(nb_masked, jnp.take(v, pos), 1.0)
            xs = ((nb_x[:, 0] + nb_x[:, 1]) + nb_x[:, 2]) + nb_x[:, 3]
            vs = ((nb_v[:, 0] + nb_v[:, 1]) + nb_v[:, 2]) + nb_v[:, 3]
            filled = xs / jnp.maximum(vs, 1.0)
            new_x = jnp.where(v > 0, x, filled)
            new_v = jnp.minimum(v + vs, 1.0)
            return (
                jnp.where(valid_slot, new_x, 0.0),
                jnp.where(valid_slot, new_v, 0.0),
            )

        x, v = jax.lax.fori_loop(0, 4, fill_body, (x0, v0))
        return x

    t("compact+setup+loop  ", loop_only, chan, mask)

    def scatter_only(c, m):
        kk, valid_slot, pos, nb_masked, nb_chan = setup(c, m)
        x = nb_chan[:, 0]
        out = c.reshape(-1).at[jnp.where(valid_slot, kk, n)].set(x, mode="drop")
        return out.reshape(c.shape)

    t("compact+setup+scattr", scatter_only, chan, mask)

    from pysp_tpu.correct.bad_pixels import masked_fill_inpaint_sparse

    t("full sparse fill    ",
      lambda c, m: masked_fill_inpaint_sparse(c, m, max_sites=K), chan, mask)


if __name__ == "__main__":
    main()
