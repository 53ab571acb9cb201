"""Re-check the 100 MP warp/CA paths after the round-5 VMEM-gate + grid fixes.

large_frame_probe found the lanczos4 warp at 102 MP compiling a 349.9M-VMEM
program (crash) and the bilinear warp at ~190 ms: full-width banded launches
at medium-format spans. The fixes: remap_bounded_pallas refuses launches that
cannot fit at the minimum tile; warp_image_rectilinear escalates to (finer)
column-rect grids when full-width rows can't fit; the CA ladder gained
model-based grid zones. Run on TPU: python -m benchmarks.large_warp_recheck
"""
from __future__ import annotations

import time


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from benchmarks.cache import enable_compile_cache

    enable_compile_cache()
    from benchmarks.timing import timed_loop
    from pysp_tpu.const import QualityDemosaic
    from pysp_tpu.core.frame import RawFrame
    from pysp_tpu.correct.ca.models import Poly3CorrectionModel
    from pysp_tpu.correct.ca.removal import remove_ca_from_raw
    from pysp_tpu.pipeline.develop import DevelopConfig, develop
    from pysp_tpu.warp.opcodes import apply_opcode_3_warp, encode_warp_rectilinear

    h, w = 8736, 11648
    mp = h * w / 1e6
    print(f"devices: {jax.devices()}  frame: {h}x{w} ({mp:.1f} MP)", flush=True)
    rng = np.random.default_rng(0)
    xx = np.arange(w, dtype=np.float32)[None, :]
    yy = np.arange(h, dtype=np.float32)[:, None]
    bayer = np.clip(
        0.45 + 0.3 * np.sin(xx / 19.0) * np.cos(yy / 23.0)
        + rng.normal(0, 0.01, (h, w)),
        0.02,
        0.98,
    ).astype(np.float32)
    frame = RawFrame.synthetic(bayer)
    block = encode_warp_rectilinear(
        [(1.004, -0.008, 0.0015, 0.0, 0.0002, -0.0001)] * 3, (0.5, 0.5)
    )
    cfg_fast = DevelopConfig(quality=QualityDemosaic.Fast)

    img = develop(frame, cfg_fast)
    float(jnp.sum(img))

    for interp in ("lanczos4", "bilinear"):
        t0 = time.time()
        try:
            dt = timed_loop(
                lambda x: apply_opcode_3_warp(x, block, interpolation=interp),
                img,
                iters=3,
            )
            print(
                f"warp {interp:9s} @ {mp:.0f} MP: {dt*1e3:8.1f} ms "
                f"({dt/(mp*1e6)*1e12:6.0f} ps/px)  [wall {time.time()-t0:.0f}s]",
                flush=True,
            )
        except Exception as e:
            print(f"warp {interp:9s} FAILED: {type(e).__name__}: {str(e)[:160]}",
                  flush=True)

    model = Poly3CorrectionModel(0.004)
    t0 = time.time()
    try:
        dt = timed_loop(
            lambda f: remove_ca_from_raw(f, model, model).bayer, frame, iters=3
        )
        print(f"CA removal @ {mp:.0f} MP: {dt*1e3:8.1f} ms "
              f"({dt/(mp*1e6)*1e12:6.0f} ps/px)  [wall {time.time()-t0:.0f}s]",
              flush=True)
    except Exception as e:
        print(f"CA removal FAILED: {type(e).__name__}: {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
