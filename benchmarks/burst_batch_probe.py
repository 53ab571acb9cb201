"""Is the bare Best burst paying for its 16 small launches? (VERDICT r4 item 8)

config-5's largest single term is the bare 16x1.5 MP Best burst (18 of 66.5
ms), run as lax.map over 16 per-frame megakernel launches. Before building a
batched (N, bands)-grid megakernel, measure the ceiling with a proxy that has
the same total pixels and identical kernel math but ONE launch: the 16 frames
stacked vertically as a single tall frame. The gap between burst and tall is
the most a batched launch could recover (launch overhead + per-frame border
strips + assembly); if it's small, item 8 closes with a negative entry.

Run on TPU: python -m benchmarks.burst_batch_probe
"""
from __future__ import annotations

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from benchmarks.cache import enable_compile_cache

    enable_compile_cache()
    from benchmarks.timing import timed_loop
    from pysp_tpu.const import QualityDemosaic
    from pysp_tpu.core.frame import RawFrame
    from pysp_tpu.pipeline.develop import DevelopConfig, develop, develop_burst

    n, h, w = 16, 1000, 1504
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    frames = []
    for i in range(n):
        bayer = np.clip(
            0.45 + 0.3 * np.sin(xx / 9 + i) * np.cos(yy / 13)
            + rng.normal(0, 0.01, (h, w)),
            0.02,
            0.98,
        ).astype(np.float32)
        frames.append(RawFrame.synthetic(bayer, ev=10.0 + 0.1 * i))
    batch = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *frames)
    cfg = DevelopConfig(quality=QualityDemosaic.Best, postprocess_stages=1)

    dt_burst = timed_loop(lambda f: develop_burst(f, cfg), batch, iters=4)
    mp = n * h * w / 1e6
    print(f"burst lax.map 16x1.5MP: {dt_burst*1e3:7.2f} ms ({mp/dt_burst/1e3:6.2f} GP/s)",
          flush=True)

    tall = RawFrame.synthetic(
        np.concatenate([np.asarray(f.bayer) for f in frames], axis=0)
    )
    dt_tall = timed_loop(lambda f: develop(f, cfg), tall, iters=4)
    print(f"tall single-frame 16000x1504: {dt_tall*1e3:7.2f} ms "
          f"({mp/dt_tall/1e3:6.2f} GP/s)", flush=True)
    print(f"max batched-launch recovery: {(dt_burst-dt_tall)*1e3:.2f} ms "
          f"({100*(dt_burst-dt_tall)/dt_burst:.0f}% of the burst)", flush=True)

    # same question at the 24 MP single-frame shape for reference
    one = RawFrame.synthetic(
        np.clip(0.45 + 0.3 * np.sin(np.mgrid[0:4000, 0:6000][1] / 9.0), 0.02, 0.98
                ).astype(np.float32)
    )
    dt_one = timed_loop(lambda f: develop(f, cfg), one, iters=4)
    print(f"24MP single frame: {dt_one*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
