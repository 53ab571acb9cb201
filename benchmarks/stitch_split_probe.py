"""Where do the 102 MP border strips' ~35 ms go? (follow-up to best_stage_probe)

D - C at 102 MP is 34.7 ms for border strips + stitch (0.63 ms at 24 MP).
Candidates: the full-height (H, s) LEFT/RIGHT strip develops (lane-starved XLA
stencils at 28-48 cols), the (s, W) top/bottom strips, or the stitch DUS
passes. Times each piece at the 102 MP shape.

Run on TPU: python -m benchmarks.stitch_split_probe [H W]
"""
from __future__ import annotations

import sys


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from benchmarks.cache import enable_compile_cache

    enable_compile_cache()
    from benchmarks.timing import timed_loop
    from pysp_tpu.colorimetry.transforms import cam_to_lin_srgb_matrix
    from pysp_tpu.core.frame import RawFrame
    from pysp_tpu.demosaic.ahd import demosaic_ahd_channels
    from pysp_tpu.demosaic.ahd_band import margin_for
    from pysp_tpu.demosaic.ahd_mega import _stitch_edges
    from pysp_tpu.pipeline.develop import _color_tail_channels

    h, w = (int(sys.argv[1]), int(sys.argv[2])) if len(sys.argv) > 2 else (8736, 11648)
    rng = np.random.default_rng(0)
    frame = RawFrame.synthetic(rng.random((h, w)).astype(np.float32))
    mat = cam_to_lin_srgb_matrix(frame.cam_mat, frame.cam_white)
    stages = 1
    f = 2 * margin_for(stages)
    s = 2 * f + 8
    print(f"shape {h}x{w}, strip s={s}", flush=True)

    def crop_dev(rows, cols):
        def fn(bayer):
            sub = frame.replace(bayer=bayer[rows, cols])
            rr, gg, bb = demosaic_ahd_channels(sub, stages)
            return sum(
                jnp.sum(c) for c in _color_tail_channels(rr, gg, bb, mat, True, True)
            )[None]

        return timed_loop(fn, frame.bayer, iters=4)

    t_top = crop_dev(slice(0, s), slice(None))
    print(f"top strip ({s}, {w}):    {t_top*1e3:8.2f} ms", flush=True)
    t_left = crop_dev(slice(None), slice(0, s))
    print(f"left strip ({h}, {s}):   {t_left*1e3:8.2f} ms", flush=True)

    # the stitch alone: synthetic channel + strips, 3 channels
    chan = jnp.zeros((h, w), jnp.float32)
    strip_t = jnp.zeros((s, w), jnp.float32)
    strip_l = jnp.zeros((h, s), jnp.float32)

    def stitch3(c, t, bo, le, ri):
        return jnp.stack(
            [_stitch_edges(c, t, bo, le, ri, f, s, h, w) for _ in range(3)]
        )

    t_st = timed_loop(stitch3, chan, strip_t, strip_t, strip_l, strip_l, iters=4)
    print(f"stitch DUS x3 channels:  {t_st*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
