"""Where does dev+warp's ~4.5 ms/frame interaction penalty come from?

config5_isolate: dev ~1.1 ms/frame, warp_only ~2.4 ms/frame, but dev_warp =
8 ms/frame. Candidates: the (H, W, 3) <-> planar relayouts around the warp,
the map computation fused badly into the composed program, or Pallas-after-
Pallas scheduling. Same-process component timings on one 1.5 MP frame.

Run: python -m benchmarks.warp_interact_probe
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
    from pysp_tpu import DevelopConfig, QualityDemosaic, RawFrame
    from pysp_tpu.pipeline.develop import develop as _develop
    from pysp_tpu.warp.opcodes import apply_opcode_3_warp, encode_warp_rectilinear
    from pysp_tpu.warp.rectilinear import (
        compute_remapping_table,
        displacement_bounds,
        warp_image_rectilinear,
    )
    from pysp_tpu.ops.pallas_kernels import remap_bounded_pallas

    bh, bw = 1000, 1504
    rng = np.random.default_rng(0)
    frame = jax.device_put(
        RawFrame.synthetic(rng.random((bh, bw), np.float32), ev=10.0)
    )
    img = jax.device_put(rng.random((bh, bw, 3), np.float32))
    coeff = (1.005, -0.01, 0.002, 0.0, 0.0003, -0.0002)
    warp_block = encode_warp_rectilinear([coeff] * 3, (0.5, 0.5))
    cfg = DevelopConfig(quality=QualityDemosaic.Best, postprocess_stages=1)
    bounds = displacement_bounds(coeff, bw, bh, (0.5, 0.5))
    print(f"[wi] backend={jax.default_backend()} bounds={bounds}", flush=True)

    def t(name, fn, *args, iters=30):
        t0 = time.time()
        dt = timed_loop(fn, *args, iters=iters)
        print(f"[wi] {name}: {dt*1e3:7.3f} ms [wall {time.time()-t0:.0f}s]",
              flush=True)
        return dt

    t("develop alone       ", lambda f: _develop.__wrapped__(f, cfg), frame)
    t("warp batched alone  ",
      lambda im: warp_image_rectilinear(im, [coeff] * 3, (0.5, 0.5)), img)
    t("warp opcode alone   ", lambda im: apply_opcode_3_warp(im, warp_block), img)

    mx, my = compute_remapping_table(coeff, bw, bh, (0.5, 0.5))
    mx = jax.device_put(np.asarray(jnp.clip(mx, 0, bw - 1)))
    my = jax.device_put(np.asarray(jnp.clip(my, 0, bh - 1)))

    t("remap3 premade maps ",
      lambda im, a, bnd: remap_bounded_pallas(
          jnp.moveaxis(im, -1, 0), a, bnd, bounds[0], bounds[1], "lanczos4"
      ), img, mx, my)
    t("map computation only",
      lambda im: jnp.stack(compute_remapping_table(coeff, bw, bh, (0.5, 0.5))),
      img)
    t("moveaxis relayout   ",
      lambda im: jnp.moveaxis(im, -1, 0) + 0.5, img)
    t("dev + moveaxis      ",
      lambda f: jnp.moveaxis(_develop.__wrapped__(f, cfg), -1, 0) + 0.5, frame)
    t("dev + warp composed ",
      lambda f: apply_opcode_3_warp(_develop.__wrapped__(f, cfg), warp_block),
      frame)


if __name__ == "__main__":
    main()
