"""Config-3 (Best + heal + flat) stage decomposition at 24 MP.

After the fused flat-field (0.67 ms) and the banded heal kernel (2.26 ms),
config 3 still carries unexplained overhead over bare Best. Times each stage
standalone and the composed pipeline. Run on TPU:
python -m benchmarks.config3_probe
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.timing import timed_loop
from pysp_tpu.const import QualityDemosaic
from pysp_tpu.core.frame import RawFrame
from pysp_tpu.core.bayer import bayer_to_planes
from pysp_tpu.correct.bad_pixels import (
    _bisect_quantile,
    find_erroneous_pixels_median,
    repair_bad_pixels,
)
from pysp_tpu.ops.stencil import median2
from pysp_tpu.correct.flat_field import flat_frame_correction
from pysp_tpu.pipeline.develop import DevelopConfig, develop
from pysp_tpu.pipeline.pipeline import PipelineConfig, develop_pipeline


def main() -> None:
    from benchmarks.cache import enable_compile_cache

    enable_compile_cache()
    rng = np.random.default_rng(0)
    H, W = 4000, 6000
    frame = jax.device_put(
        RawFrame.synthetic(
            rng.random((H, W), np.float32),
            cam_mat=np.array(
                [[0.9, -0.2, -0.1], [-0.3, 1.1, 0.2], [0.0, -0.4, 1.3]], np.float32
            ),
            wb_neutral=np.array([0.45, 1.0, 0.62], np.float32),
        )
    )
    flat = jax.device_put(
        RawFrame.synthetic(
            np.clip(1.0 - 0.3 * rng.random((H, W)), 0.1, 1).astype(np.float32)
        )
    )
    masks = find_erroneous_pixels_median(frame)
    masks = jax.device_put(np.asarray(masks))

    def t_flat(f):
        return jnp.sum(flat_frame_correction(f, flat).bayer)

    def t_planes(f):
        return sum(jnp.sum(p) for p in bayer_to_planes(f.bayer))

    def t_median2(f):
        return jnp.sum(median2(bayer_to_planes(f.bayer)))

    def t_detect(f):
        return jnp.sum(find_erroneous_pixels_median(f).astype(jnp.float32))

    def t_quantile(f):
        planes = bayer_to_planes(f.bayer)
        delta = jnp.abs(planes - median2(planes))
        return jnp.sum(_bisect_quantile(delta, 0.9999))

    def t_repair(f):
        return jnp.sum(repair_bad_pixels(f, masks, 4).bayer)

    cfg_dev = DevelopConfig(quality=QualityDemosaic.Best, postprocess_stages=1)

    def t_develop(f):
        return jnp.sum(develop(f, cfg_dev))

    cfg3 = PipelineConfig(develop=cfg_dev, flat_field=True, repair_hot_pixels=True)

    def t_pipeline(f):
        return jnp.sum(develop_pipeline(f, cfg3, flat=flat))

    for name, fn, iters in [
        ("flat-field", t_flat, 16),
        ("plane split", t_planes, 16),
        ("median2 (+split)", t_median2, 16),
        ("quantile (+split+median2)", t_quantile, 16),
        ("detect full", t_detect, 16),
        ("repair (heal, given masks)", t_repair, 16),
        ("develop Best alone", t_develop, 8),
        ("pipeline config3", t_pipeline, 8),
    ]:
        t0 = time.time()
        dt = timed_loop(fn, frame, iters=iters)
        print(f"[probe] {name}: {dt*1e3:.2f} ms [wall {time.time()-t0:.0f}s]",
              file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
