"""Real-chip check of the banded Pallas heal kernel: parity vs the XLA dense
fill, then amortized timing vs the dense and sparse paths and the composed
config-3 pipeline.

Run on TPU: python -m benchmarks.heal_pallas_check
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
    from pysp_tpu.correct.bad_pixels import (
        masked_fill_inpaint,
        masked_fill_inpaint_sparse,
    )
    from pysp_tpu.ops.pallas_kernels import masked_fill_pallas

    H, W = 4000, 6000
    rng = np.random.default_rng(0)
    mask = jax.device_put(rng.random((4, H // 2, W // 2)) < 1e-5)
    chan = jax.device_put(rng.random((4, H // 2, W // 2), np.float32))
    print(f"[hp] backend={jax.default_backend()}", flush=True)

    # parity on the real chip (one 6 MP crop to keep the compile small)
    c = chan[:, :512, :768]
    m0 = np.array(mask[:, :512, :768])
    m0[0, 0, 0] = m0[1, 511, 767] = True
    m0[2, 100:103, 200:203] = True
    m = jax.device_put(m0)
    dense = np.asarray(masked_fill_inpaint(c, m))
    pal = np.asarray(masked_fill_pallas(c, m))
    eq = dense == pal
    print(f"[hp] parity 6MP: identical={bool(eq.all())} diffs={int((~eq).sum())}",
          flush=True)

    def t(name, fn, *args, iters=32):
        t0 = time.time()
        dt = timed_loop(fn, *args, iters=iters)
        print(f"[hp] {name}: {dt*1e3:7.2f} ms [wall {time.time()-t0:.0f}s]",
              flush=True)

    t("pallas heal 24MP    ", lambda c, m: masked_fill_pallas(c, m), chan, mask)
    t("dense fill 24MP     ", lambda c, m: masked_fill_inpaint(c, m), chan, mask)
    t("sparse K=8192 24MP  ",
      lambda c, m: masked_fill_inpaint_sparse(c, m, max_sites=8192), chan, mask)

    # the composed program the bench scores
    from pysp_tpu import RawFrame, flat_frame_correction  # noqa: F401
    from pysp_tpu.const import QualityDemosaic
    from pysp_tpu.pipeline.develop import DevelopConfig
    from pysp_tpu.pipeline.pipeline import PipelineConfig, develop_pipeline

    frame = jax.device_put(RawFrame.synthetic(rng.random((H, W), np.float32)))
    flat = jax.device_put(
        RawFrame.synthetic(
            np.clip(1.0 - 0.3 * rng.random((H, W)), 0.1, 1).astype(np.float32)
        )
    )
    best = DevelopConfig(quality=QualityDemosaic.Best)
    for name, cfg in (
        ("composed +repair  ", PipelineConfig(develop=best, repair_hot_pixels=True)),
        (
            "composed config3  ",
            PipelineConfig(develop=best, flat_field=True, repair_hot_pixels=True),
        ),
    ):
        t(name, lambda f, cfg=cfg: develop_pipeline(f, cfg, flat=flat), frame, iters=8)


if __name__ == "__main__":
    main()
