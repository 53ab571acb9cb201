"""Probe: flat-field correction cost at 24 MP — fused mosaic-layout pass.

The plane-stack formulation paid two CFA (de)interleave relayouts around one
elementwise multiply/divide (~4 ms of data movement at 24 MP, BASELINE.md
round-2 config-3 split). The fused version (correct/flat_field.py) computes the
per-plane flat means from strided views and applies the correction directly in
mosaic layout. This probe times the op alone and config-3 end to end.
"""
from __future__ import annotations

import os
import sys

import numpy as np


def main() -> None:
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    from benchmarks.timing import timed_loop
    from pysp_tpu import (
        DevelopConfig,
        PipelineConfig,
        QualityDemosaic,
        RawFrame,
        develop_pipeline,
    )
    from pysp_tpu.correct.flat_field import flat_frame_correction

    H, W = 4000, 6000
    rng = np.random.default_rng(0)
    frame = jax.device_put(RawFrame.synthetic(rng.random((H, W), np.float32)))
    flat = jax.device_put(
        RawFrame.synthetic(
            np.clip(1.0 - 0.3 * rng.random((H, W)), 0.1, 1).astype(np.float32)
        )
    )

    dt = timed_loop(
        lambda f: flat_frame_correction(f, flat).bayer, frame, iters=32
    )
    print(f"flat_frame_correction alone (24 MP): {dt*1e3:.2f} ms", file=sys.stderr)

    cfg3 = PipelineConfig(
        develop=DevelopConfig(quality=QualityDemosaic.Best, postprocess_stages=1),
        flat_field=True,
        repair_hot_pixels=True,
    )
    dt3 = timed_loop(lambda f: develop_pipeline(f, cfg3, flat=flat), frame, iters=4)
    print(f"config3 (Best+heal+flat, 24 MP): {dt3*1e3:.1f} ms", file=sys.stderr)


if __name__ == "__main__":
    main()
