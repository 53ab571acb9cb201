"""Focused re-measure of the bench paths that regressed in a noisy run:
Fast develop, burst, config3. Run on TPU: python -m benchmarks.bench_focus"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.timing import timed_loop
from pysp_tpu import PipelineConfig, develop_pipeline
from pysp_tpu.const import QualityDemosaic
from pysp_tpu.core.frame import RawFrame
from pysp_tpu.pipeline.develop import DevelopConfig, develop, develop_burst


def main() -> None:
    rng = np.random.default_rng(0)
    H, W = 4000, 6000
    MP = H * W / 1e6
    frame = jax.device_put(
        RawFrame.synthetic(rng.random((H, W), np.float32).astype(np.float32))
    )

    for name, cfg in [
        ("Fast", DevelopConfig(quality=QualityDemosaic.Fast)),
        ("Best", DevelopConfig(quality=QualityDemosaic.Best, postprocess_stages=1)),
    ]:
        t0 = time.time()
        dt = timed_loop(lambda f, c=cfg: develop(f, c), frame, iters=4)
        print(f"[focus] {name}: {dt*1e3:.1f} ms = {MP/dt:.1f} MP/s "
              f"(wall {time.time()-t0:.0f}s)", file=sys.stderr, flush=True)

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
    print(f"[focus] config3: {dt3*1e3:.1f} ms = {MP/dt3:.1f} MP/s "
          f"(wall {time.time()-t0:.0f}s)", file=sys.stderr, flush=True)

    burst_n, bh, bw = 16, 1000, 1504
    burst = jax.device_put(
        jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[
                RawFrame.synthetic(rng.random((bh, bw), np.float32).astype(np.float32))
                for _ in range(burst_n)
            ],
        )
    )
    cfg_best = DevelopConfig(quality=QualityDemosaic.Best, postprocess_stages=1)
    t0 = time.time()
    dtb = timed_loop(lambda fs: develop_burst(fs, cfg_best), burst, iters=4)
    print(f"[focus] burst x{burst_n}: {dtb*1e3:.1f} ms = "
          f"{burst_n*bh*bw/1e6/dtb:.1f} MP/s (wall {time.time()-t0:.0f}s)",
          file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
