"""Config-3 overhead breakdown: flat-field, hot-pixel detection, repair.

r1 attributed the ~35 ms config-3 overhead to the 32-sweep Jacobi repair; the
masked-fill rewrite (4+2 passes) only brought config 3 from 52.8 to ~46 ms,
so something else dominates — prime suspect: the median detector's 30-pass
count-bisection quantile plus median2 and reductions.

Run on TPU: python -m benchmarks.config3_probe
"""
from __future__ import annotations

import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from benchmarks.cache import enable_compile_cache

    enable_compile_cache()

    from benchmarks.timing import timed_loop
    from pysp_tpu import RawFrame, flat_frame_correction
    from pysp_tpu.correct.bad_pixels import (
        find_erroneous_pixels_median,
        masked_fill_inpaint,
        repair_bad_pixels,
    )
    from pysp_tpu.core.bayer import bayer_to_planes, planes_to_bayer

    H, W, MP = 4000, 6000, 24.0
    rng = np.random.default_rng(0)
    frame = jax.device_put(RawFrame.synthetic(rng.random((H, W), np.float32)))
    flat = jax.device_put(
        RawFrame.synthetic(
            np.clip(1.0 - 0.3 * rng.random((H, W)), 0.1, 1).astype(np.float32)
        )
    )
    print(f"[c3] backend={jax.default_backend()}", flush=True)

    def t(name, fn, *args, iters=8):
        t0 = time.time()
        dt = timed_loop(fn, *args, iters=iters)
        print(f"[c3] {name}: {dt*1e3:6.2f} ms [wall {time.time()-t0:.0f}s]",
              flush=True)
        return dt

    t("flat_field        ", lambda f: flat_frame_correction(f, flat).bayer, frame)
    t("detect (median+q) ",
      lambda f: find_erroneous_pixels_median(f).astype(jnp.float32), frame)

    masks = jax.device_put(
        np.zeros((4, H // 2, W // 2), bool) | (rng.random((4, H // 2, W // 2)) < 1e-5)
    )
    t("repair (fill 4+2) ",
      lambda f, m: repair_bad_pixels(f, m).bayer, frame, masks)

    # quantile search alone: old binary bisection (branches=1 x 30 passes) vs
    # the 16-way multisection (4 passes, one fused delta read each)
    from pysp_tpu.correct.bad_pixels import _bisect_quantile

    planes = bayer_to_planes(frame.bayer)
    delta = jnp.abs(planes - jnp.roll(planes, 1, axis=-1))
    t("binary q (30x1)   ", lambda d: _bisect_quantile(d, 0.9999, 30, 1), delta)
    t("multisect q (4x16)", lambda d: _bisect_quantile(d, 0.9999, 4, 16), delta)

    from pysp_tpu.ops.stencil import median2

    t("median2 detect    ", lambda d: median2(d), planes)

    # the composed program the bench scores (one jit: flat + detect + repair + Best)
    from pysp_tpu.pipeline.develop import DevelopConfig
    from pysp_tpu.pipeline.pipeline import PipelineConfig, develop_pipeline
    from pysp_tpu.const import QualityDemosaic

    best = DevelopConfig(quality=QualityDemosaic.Best)
    for name, cfg in (
        ("composed bare     ", PipelineConfig(develop=best)),
        ("composed +flat    ", PipelineConfig(develop=best, flat_field=True)),
        ("composed +repair  ", PipelineConfig(develop=best, repair_hot_pixels=True)),
        (
            "composed config3  ",
            PipelineConfig(develop=best, flat_field=True, repair_hot_pixels=True),
        ),
    ):
        t(name, lambda f, cfg=cfg: develop_pipeline(f, cfg, flat=flat), frame)


if __name__ == "__main__":
    main()
