"""Where do Best's border strips + stitch (~5.9 ms of 17.2 at 24 MP) go?

best_stage_probe measured D-C = border strips + stitch = ~5.9 ms. This splits
that into: each strip's XLA develop (top/bottom 32x6000, left/right 4000x32),
the two-concat stitch alone, and a dynamic_update_slice stitch alternative.
Run on TPU: python -m benchmarks.border_probe
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.timing import timed_loop
from pysp_tpu.core.frame import RawFrame
from pysp_tpu.demosaic.ahd import demosaic_ahd_channels
from pysp_tpu.demosaic.ahd_band import margin_for


def main() -> None:
    from benchmarks.cache import enable_compile_cache

    enable_compile_cache()
    rng = np.random.default_rng(0)
    H, W = 4000, 6000
    stages = 1
    f = 2 * margin_for(stages)
    s = 2 * f + 8
    frame = jax.device_put(
        RawFrame.synthetic(
            rng.random((H, W), np.float32),
            cam_mat=np.array(
                [[0.9, -0.2, -0.1], [-0.3, 1.1, 0.2], [0.0, -0.4, 1.3]], np.float32
            ),
            wb_neutral=np.array([0.45, 1.0, 0.62], np.float32),
        )
    )

    def strip_dev(bayer):
        sub = frame.replace(bayer=bayer)
        return sum(jnp.sum(c) for c in demosaic_ahd_channels(sub, stages))

    top = jax.device_put(np.asarray(frame.bayer[:s, :]))
    left = jax.device_put(np.asarray(frame.bayer[:, :s]))

    # stitch alone: 3 channels, two concats each (the shipping topology)
    chans = [jax.device_put(rng.random((H, W), np.float32)) for _ in range(3)]
    tb = [jax.device_put(rng.random((s, W), np.float32)) for _ in range(3)]
    lr = [jax.device_put(rng.random((H, s), np.float32)) for _ in range(3)]

    def stitch_concat(cs, ts, ls):
        out = []
        for c, t, le in zip(cs, ts, ls):
            c = jnp.concatenate([t[:f, :], c[f : H - f, :], t[s - f :, :]], axis=0)
            c = jnp.concatenate([le[:, :f], c[:, f : W - f], le[:, s - f :]], axis=1)
            out.append(c)
        return sum(jnp.sum(c) for c in out)

    def stitch_dus(cs, ts, ls):
        out = []
        for c, t, le in zip(cs, ts, ls):
            c = jax.lax.dynamic_update_slice(c, t[:f, :], (0, 0))
            c = jax.lax.dynamic_update_slice(c, t[s - f :, :], (H - f, 0))
            c = jax.lax.dynamic_update_slice(c, le[:, :f], (0, 0))
            c = jax.lax.dynamic_update_slice(c, le[:, s - f :], (0, W - f))
            out.append(c)
        return sum(jnp.sum(c) for c in out)

    for name, fn, args, iters in [
        ("top strip dev (32x6000)", strip_dev, (top,), 16),
        ("left strip dev (4000x32)", strip_dev, (left,), 16),
        ("stitch concat x3ch", stitch_concat, (chans, tb, lr), 16),
        ("stitch DUS x3ch", stitch_dus, (chans, tb, lr), 16),
    ]:
        t0 = time.time()
        dt = timed_loop(fn, *args, iters=iters)
        print(
            f"[probe] {name}: {dt*1e3:.2f} ms [wall {time.time()-t0:.0f}s]",
            file=sys.stderr, flush=True,
        )


if __name__ == "__main__":
    main()
