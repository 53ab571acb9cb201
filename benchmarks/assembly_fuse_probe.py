"""Price the Best/Fast back half: 12 phase planes -> (H, W, 3) HWC.

interleave_probe measured quad_to_bayer x3 at 2.32 ms and the HWC stack at
0.99 ms standalone; Mosaic cannot interleave in VMEM, so the question is how
much of that XLA can fuse away when nothing forces the full-res channels to
materialize. Variants at 24 MP:

  A. stack(quad_to_bayer(q) for 3ch)            — one expression, no stitch
  B. stack(DUS_border(quad_to_bayer(q)))        — the shipping order (stitch
                                                   on full-res channels between
                                                   assembly and stack)
  C. stack(quad_to_bayer(DUS_border_on_phases)) — stitch moved to phase space

Run on TPU: python -m benchmarks.assembly_fuse_probe
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.timing import timed_loop
from pysp_tpu.ops.polyphase import quad_to_bayer


def main() -> None:
    from benchmarks.cache import enable_compile_cache

    enable_compile_cache()
    rng = np.random.default_rng(0)
    H, W = 4000, 6000
    h2, w2 = H // 2, W // 2
    f = 16  # full-res border frame width (2*margin_for(1))
    planes = [jax.device_put(rng.random((h2, w2), np.float32)) for _ in range(12)]
    # full-res border strips (the XLA-developed edges)
    s = 2 * f + 8
    tops = [jax.device_put(rng.random((s, W), np.float32)) for _ in range(3)]
    lefts = [jax.device_put(rng.random((H, s), np.float32)) for _ in range(3)]

    def consume(out):
        return jnp.sum(out * 1.0000001)

    def chans_of(ps):
        return [
            quad_to_bayer(((ps[k], ps[k + 1]), (ps[k + 2], ps[k + 3])))
            for k in (0, 4, 8)
        ]

    def variant_a(ps):
        return consume(jnp.stack(chans_of(ps), axis=-1))

    def variant_b(ps, ts, ls):
        out = []
        for c, t, le in zip(chans_of(ps), ts, ls):
            c = jax.lax.dynamic_update_slice(c, t[:f, :], (0, 0))
            c = jax.lax.dynamic_update_slice(c, t[s - f :, :], (H - f, 0))
            c = jax.lax.dynamic_update_slice(c, le[:, :f], (0, 0))
            c = jax.lax.dynamic_update_slice(c, le[:, s - f :], (0, W - f))
            out.append(c)
        return consume(jnp.stack(out, axis=-1))

    def variant_c(ps, ts, ls):
        # stitch in phase space: update each quarter plane's border rows/cols
        # from the phase-split full-res strips, THEN assemble once.
        ps = list(ps)
        f2 = f // 2

        def split(x):
            # dimension-split reshape (strided views hit the gather wall)
            hh, ww = x.shape
            return x.reshape(hh // 2, 2, ww // 2, 2)

        for ci, k in enumerate((0, 4, 8)):
            t, le = split(ts[ci]), split(ls[ci])
            for py in (0, 1):
                for px in (0, 1):
                    idx = k + 2 * py + px
                    p = ps[idx]
                    tp = t[:, py, :, px]      # (s/2, w2) phase strip
                    lp = le[:, py, :, px]     # (h2, s/2)
                    p = jax.lax.dynamic_update_slice(p, tp[:f2, :], (0, 0))
                    p = jax.lax.dynamic_update_slice(
                        p, tp[tp.shape[0] - f2 :, :], (h2 - f2, 0)
                    )
                    p = jax.lax.dynamic_update_slice(p, lp[:, :f2], (0, 0))
                    p = jax.lax.dynamic_update_slice(
                        p, lp[:, lp.shape[1] - f2 :], (0, w2 - f2)
                    )
                    ps[idx] = p
        return consume(jnp.stack(chans_of(ps), axis=-1))

    for name, fn, args in [
        ("A fused 12->HWC (no stitch)", variant_a, (planes,)),
        ("B stitch on channels (shipping)", variant_b, (planes, tops, lefts)),
        ("C stitch in phase space", variant_c, (planes, tops, lefts)),
    ]:
        t0 = time.time()
        dt = timed_loop(fn, *args, iters=16)
        print(f"[probe] {name}: {dt*1e3:.2f} ms [wall {time.time()-t0:.0f}s]",
              file=sys.stderr, flush=True)

    # value identity: B == C
    def run(fn, *args):
        return fn(*args)

    ra = float(variant_b(planes, tops, lefts))
    rc = float(variant_c(planes, tops, lefts))
    print(f"[probe] B vs C consumed sums: {ra:.6f} vs {rc:.6f}", file=sys.stderr)


if __name__ == "__main__":
    main()
