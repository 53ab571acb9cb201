"""Benchmark: full AHD ("Best") DNG->sRGB develop throughput at 24 MP on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference (bullbin/pySP) publishes no numbers (BASELINE.md) and cannot
run here (MSVC-only Cython kernels, missing native deps), so the baseline was measured
from the vectorized NumPy/cv2 transcription of its algorithms (tests/golden_ref.py) on
this machine's CPU at 24 MP — see BASELINE.md "Measured" section:

    draft 13.9 MP/s | eag 5.5 MP/s | ahd 0.77 MP/s | full AHD develop 0.69 MP/s

(The transcription is, if anything, faster than the real reference: its hottest loop is
vectorized where the reference mixes Cython+Python.) vs_baseline compares the same
workload: full 24 MP AHD develop (demosaic + WB + cam->sRGB + gamma).
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_FULL_AHD_DEVELOP_MPS = 0.69  # measured, see module docstring
MP = 24.0
H, W = 4000, 6000


def main() -> None:
    import jax
    import jax.numpy as jnp

    from pysp_tpu import DevelopConfig, QualityDemosaic, RawFrame, develop

    rng = np.random.default_rng(0)
    bayer = rng.random((H, W), np.float32)
    frame = RawFrame.synthetic(
        bayer,
        cam_mat=np.array(
            [[0.9, -0.2, -0.1], [-0.3, 1.1, 0.2], [0.0, -0.4, 1.3]], np.float32
        ),
        wb_neutral=np.array([0.45, 1.0, 0.62], np.float32),
    )
    frame = jax.device_put(frame)
    cfg = DevelopConfig(quality=QualityDemosaic.Best, postprocess_stages=1)

    # compile + warmup
    t0 = time.time()
    out = develop(frame, cfg)
    out.block_until_ready()
    compile_s = time.time() - t0
    print(f"[bench] backend={jax.default_backend()} compile+first={compile_s:.1f}s",
          file=sys.stderr)

    iters = 5
    t0 = time.time()
    for _ in range(iters):
        out = develop(frame, cfg)
    out.block_until_ready()
    dt = (time.time() - t0) / iters

    mps = MP / dt
    print(f"[bench] p50-ish develop latency {dt*1e3:.1f} ms -> {mps:.1f} MP/s",
          file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "AHD develop throughput (24MP DNG->sRGB, 1 chip)",
                "value": round(mps, 2),
                "unit": "MP/s",
                "vs_baseline": round(mps / BASELINE_FULL_AHD_DEVELOP_MPS, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
