"""Does replacing the 4-DUS border stitch with one masked select fix the
102 MP composition gap?

best_stage_probe/stitch_split_probe showed the composed channels_mega pays
~35 ms at 102 MP that no isolated component explains; the prime suspect is
the dynamic_update_slice consumers de-fusing the phase-interleave producer.
This probe times the SHIPPED develop_channels_mega against a variant whose
stitch is a value-identical single masked select per channel (iota masks:
row < f | row >= h-f picks the strips, col masks likewise) at both 102 MP
and 24 MP.

Run on TPU: python -m benchmarks.stitch_fuse_probe
"""
from __future__ import annotations


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from benchmarks.cache import enable_compile_cache

    enable_compile_cache()
    from benchmarks.timing import timed_loop
    from pysp_tpu.core.frame import RawFrame
    from pysp_tpu.demosaic import ahd_mega as M

    def stitch_masked(c, t, bo, le, ri, f, s, h, w):
        # value-identical to _stitch_edges: rows pasted first, full-height
        # column strips take precedence (same as DUS ordering)
        rows = jax.lax.broadcasted_iota(jnp.int32, (h, 1), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
        top_pad = jnp.pad(t[:f, :], ((0, h - f), (0, 0)))
        bot_pad = jnp.pad(bo[s - f :, :], ((h - f, 0), (0, 0)))
        le_pad = jnp.pad(le[:, :f], ((0, 0), (0, w - f)))
        ri_pad = jnp.pad(ri[:, s - f :], ((0, 0), (w - f, 0)))
        c = jnp.where(rows < f, top_pad, c)
        c = jnp.where(rows >= h - f, bot_pad, c)
        c = jnp.where(cols < f, le_pad, c)
        c = jnp.where(cols >= w - f, ri_pad, c)
        return c

    for h, w in ((8736, 11648), (4000, 6000)):
        rng = np.random.default_rng(0)
        frame = RawFrame.synthetic(rng.random((h, w)).astype(np.float32))
        mp = h * w / 1e6

        def dev(bayer):
            fr = frame.replace(bayer=bayer)
            r, g, b = M.develop_channels_mega(fr, 1, True, True)
            return r + g + b

        dt = timed_loop(dev, frame.bayer, iters=4)
        print(f"{mp:5.1f} MP shipped DUS stitch: {dt*1e3:8.2f} ms", flush=True)

        real = M._stitch_edges
        try:
            M._stitch_edges = stitch_masked
            dt2 = timed_loop(dev, frame.bayer, iters=4)
        finally:
            M._stitch_edges = real
        print(f"{mp:5.1f} MP masked stitch:      {dt2*1e3:8.2f} ms", flush=True)

        # value parity of the variant
        M._stitch_edges = stitch_masked
        try:
            a = np.stack([np.asarray(x) for x in M.develop_channels_mega(frame, 1, True, True)])
        finally:
            M._stitch_edges = real
        b_ = np.stack([np.asarray(x) for x in M.develop_channels_mega(frame, 1, True, True)])
        print(f"{mp:5.1f} MP stitch parity max abs: {np.abs(a - b_).max():.2e}",
              flush=True)


if __name__ == "__main__":
    main()
