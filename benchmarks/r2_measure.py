"""Round-2 consolidated TPU measurement pass (one process, cache-enabled).

Measures, in order of importance, printing each result as it lands:
  1. Best/Draft/Fast 24 MP develop (the scored family)
  2. config 3 (Best + masked-fill healing + flat) — VERDICT item 4's "done" gate
  3. burst 16x1.5MP
  4. cbrt cost probe chunk timing (decides whether a Halley cbrt is worth it)

Run:  JAX_COMPILATION_CACHE_DIR is set by benchmarks.cache.
      python -m benchmarks.r2_measure 2>&1 | tee /tmp/r2_measure.log
"""
from __future__ import annotations

import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from benchmarks.cache import enable_compile_cache

    print(f"[r2] cache={enable_compile_cache()}", flush=True)

    from benchmarks.timing import timed_loop
    from pysp_tpu import (
        DevelopConfig,
        PipelineConfig,
        QualityDemosaic,
        RawFrame,
        develop_pipeline,
    )
    from pysp_tpu.pipeline.develop import develop, develop_burst

    H, W, MP = 4000, 6000, 24.0
    rng = np.random.default_rng(0)
    frame = jax.device_put(
        RawFrame.synthetic(
            rng.random((H, W), np.float32),
            cam_mat=np.array(
                [[0.9, -0.2, -0.1], [-0.3, 1.1, 0.2], [0.0, -0.4, 1.3]], np.float32
            ),
            wb_neutral=np.array([0.45, 1.0, 0.62], np.float32),
        )
    )
    print(f"[r2] backend={jax.default_backend()}", flush=True)

    for q in (QualityDemosaic.Best, QualityDemosaic.Draft, QualityDemosaic.Fast):
        cfg = DevelopConfig(quality=q, postprocess_stages=1)
        t0 = time.time()
        dt = timed_loop(lambda f, cfg=cfg: develop(f, cfg), frame, iters=8)
        print(
            f"[r2] {q.name}: {dt*1e3:.1f} ms = {MP/dt:.0f} MP/s "
            f"[wall {time.time()-t0:.0f}s]",
            flush=True,
        )

    # config 3: healing now masked_fill (4+2 passes); was 52.8 ms total at r1
    flat = jax.device_put(
        RawFrame.synthetic(
            np.clip(1.0 - 0.3 * rng.random((H, W)), 0.1, 1).astype(np.float32)
        )
    )
    cfg3 = PipelineConfig(
        develop=DevelopConfig(quality=QualityDemosaic.Best, postprocess_stages=1),
        flat_field=True,
        repair_hot_pixels=True,
    )
    t0 = time.time()
    dt3 = timed_loop(lambda f: develop_pipeline(f, cfg3, flat=flat), frame, iters=4)
    print(
        f"[r2] config3 (Best+heal+flat): {dt3*1e3:.1f} ms = {MP/dt3:.0f} MP/s "
        f"[wall {time.time()-t0:.0f}s; r1 was 52.8 ms]",
        flush=True,
    )

    burst_n, bh, bw = 16, 1000, 1504
    burst = jax.device_put(
        jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs),
            *[
                RawFrame.synthetic(rng.random((bh, bw), np.float32), ev=10.0 + i * 0.1)
                for i in range(burst_n)
            ],
        )
    )
    cfg_best = DevelopConfig(quality=QualityDemosaic.Best, postprocess_stages=1)
    t0 = time.time()
    dtb = timed_loop(lambda fs: develop_burst(fs, cfg_best), burst, iters=4)
    print(
        f"[r2] burst 16x1.5MP: {dtb*1e3:.1f} ms = {burst_n*bh*bw/1e6/dtb:.0f} MP/s "
        f"[wall {time.time()-t0:.0f}s]",
        flush=True,
    )

    print("[r2] DONE", flush=True)


if __name__ == "__main__":
    main()
