"""Qualify a 100+ MP single-frame develop on the real chip (VERDICT r4 missing #4).

Every prior perf number is 24 MP or 16x1.5 MP; the reference (via libraw)
handles 100+ MP medium-format files as a matter of course
(/root/reference/image.py:224). This probe runs the big stages at ~102 MP
(8736x11648 — GFX100-class) and reports ps/px vs the 24 MP band, VMEM tile
picker behavior, exact-bounds sweep cost at medium-format warp magnitudes, and
memory headroom for the 1.2 GB (H, W, 3) f32 output. Each case is isolated so
one failure doesn't mask the rest.

Run on TPU: python -m benchmarks.large_frame_probe [H W]
"""
from __future__ import annotations

import json
import sys
import time
import traceback


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from benchmarks.cache import enable_compile_cache

    enable_compile_cache()
    from benchmarks.timing import timed_loop
    from pysp_tpu.const import QualityDemosaic
    from pysp_tpu.core.frame import RawFrame
    from pysp_tpu.pipeline.develop import DevelopConfig, develop
    from pysp_tpu.pipeline.pipeline import PipelineConfig, develop_pipeline
    from pysp_tpu.warp.opcodes import apply_opcode_3_warp, encode_warp_rectilinear

    h, w = (int(sys.argv[1]), int(sys.argv[2])) if len(sys.argv) > 2 else (8736, 11648)
    mp = h * w / 1e6
    print(f"devices: {jax.devices()}  frame: {h}x{w} ({mp:.1f} MP)", flush=True)

    # structured content on host (float32 throughout; a 100 MP f64 scene would
    # be 800 MB of host churn)
    yy = np.arange(h, dtype=np.float32)[:, None]
    xx = np.arange(w, dtype=np.float32)[None, :]
    bayer = np.clip(
        0.45
        + 0.3 * np.sin(xx / 19.0) * np.cos(yy / 23.0)
        + 0.15 * ((xx.astype(np.int32) // 256 + yy.astype(np.int32) // 256) % 2),
        0.02,
        0.98,
    ).astype(np.float32)
    rng = np.random.default_rng(0)
    bayer += rng.normal(0, 0.01, (h, w)).astype(np.float32)
    bayer = np.clip(bayer, 0.01, 0.99)
    frame = RawFrame.synthetic(
        bayer,
        cam_mat=np.array(
            [[0.9, -0.2, -0.1], [-0.3, 1.1, 0.2], [0.0, -0.4, 1.3]], np.float32
        ),
        wb_neutral=np.array([0.45, 1.0, 0.62], np.float32),
    )

    results = {}

    def case(name, fn, iters=4):
        t0 = time.time()
        try:
            dt = timed_loop(fn, frame, iters=iters)
            results[name] = round(dt * 1e3, 2)
            print(
                f"{name:28s} {dt * 1e3:9.1f} ms  ({mp / dt / 1e3:7.2f} GP/s,"
                f" {dt / (mp * 1e6) * 1e12:6.0f} ps/px)   [wall {time.time()-t0:.0f}s]",
                flush=True,
            )
        except Exception as e:
            results[name] = f"FAIL: {type(e).__name__}"
            print(f"{name:28s} FAILED: {e}", flush=True)
            traceback.print_exc()

    case("draft develop", lambda f: develop(f, DevelopConfig(quality=QualityDemosaic.Draft)))
    case("fast develop", lambda f: develop(f, DevelopConfig(quality=QualityDemosaic.Fast)))
    case(
        "best develop",
        lambda f: develop(
            f, DevelopConfig(quality=QualityDemosaic.Best, postprocess_stages=1)
        ),
        iters=3,
    )
    case(
        "config3 (flat-less heal+best)",
        lambda f: develop_pipeline(
            f,
            PipelineConfig(
                develop=DevelopConfig(
                    quality=QualityDemosaic.Best, postprocess_stages=1
                ),
                repair_hot_pixels=True,
            ),
        ),
        iters=3,
    )

    # develop + DNG warp at a medium-format-magnitude warp (~1.5% corner pull)
    block = encode_warp_rectilinear(
        [(1.004, -0.008, 0.0015, 0.0, 0.0002, -0.0001)] * 3, (0.5, 0.5)
    )
    t0 = time.time()
    from pysp_tpu.warp.rectilinear import displacement_bounds

    bounds = displacement_bounds(
        (1.004, -0.008, 0.0015, 0.0, 0.0002, -0.0001), w, h, (0.5, 0.5), 1.0
    )
    host_sweep_s = time.time() - t0
    print(f"exact f64 bounds sweep at {mp:.0f} MP: {host_sweep_s:.1f} s host, "
          f"bounds {bounds}", flush=True)
    results["bounds_sweep_host_s"] = round(host_sweep_s, 2)
    results["bounds"] = str(bounds)

    cfg_fast = DevelopConfig(quality=QualityDemosaic.Fast)
    case(
        "fast develop + lanczos4 warp",
        lambda f: apply_opcode_3_warp(
            develop(f, cfg_fast), block, interpolation="lanczos4"
        ),
        iters=3,
    )
    case(
        "fast develop + bilinear warp",
        lambda f: apply_opcode_3_warp(
            develop(f, cfg_fast), block, interpolation="bilinear"
        ),
        iters=3,
    )

    print(json.dumps(results))


if __name__ == "__main__":
    main()
