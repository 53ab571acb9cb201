"""Cost of highlight reconstruction at 24 MP on the TPU.

Measures the full develop with DevelopConfig(highlights="reconstruct") against
the default clip develop (both Best quality), plus the reconstruction stage in
isolation, using the fori_loop-amortized timer (tunnel-RTT-immune).

The reconstruct path keeps the Pallas AHD megakernel for the demosaic but
skips the in-kernel fused color tail (the super-white channels must survive
the matrix un-clipped), so its expected overhead = pyramid fill (3 channels x
~11 levels at 24 MP) + intensity re-estimation + the XLA color tail replacing
the fused one.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from pysp_tpu import DevelopConfig, QualityDemosaic, develop
from pysp_tpu.core.frame import RawFrame
from pysp_tpu.correct.highlights import reconstruct_highlights_channels

from benchmarks.timing import timed_loop


def make_frame(h: int = 4000, w: int = 6000, seed: int = 7) -> RawFrame:
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:h, 0:w]
    scene = 0.3 + 0.25 * np.sin(x / 97.0) * np.cos(y / 71.0)
    scene += rng.normal(0, 0.01, (h, w))
    r2 = (x - w * 0.7) ** 2 + (y - h * 0.3) ** 2
    scene += 2.5 * np.exp(-r2 / (2 * 200.0**2))  # blown blob
    bayer = np.clip(scene, 0.0, 1.0).astype(np.float32)
    return RawFrame.synthetic(
        jnp.asarray(bayer),
        wb_neutral=jnp.asarray([0.55, 1.0, 0.62], jnp.float32),
    )


def main() -> None:
    print(f"[probe] backend={jax.default_backend()}")
    frame = make_frame()
    mp = frame.bayer.shape[0] * frame.bayer.shape[1] / 1e6

    cfg_clip = DevelopConfig(quality=QualityDemosaic.Best)
    cfg_rec = DevelopConfig(quality=QualityDemosaic.Best, highlights="reconstruct")

    dt_clip = timed_loop(lambda f: develop(f, cfg_clip), frame, iters=4)
    print(f"[probe] Best clip        : {dt_clip*1e3:7.1f} ms  ({mp/dt_clip:6.0f} MP/s)")

    dt_rec = timed_loop(lambda f: develop(f, cfg_rec), frame, iters=4)
    print(f"[probe] Best reconstruct : {dt_rec*1e3:7.1f} ms  ({mp/dt_rec:6.0f} MP/s)")
    print(f"[probe] overhead         : {(dt_rec-dt_clip)*1e3:7.1f} ms")

    # isolation: reconstruction stage alone on full-res channels
    h, w = frame.bayer.shape
    rng = np.random.default_rng(3)
    chans = [jnp.asarray(rng.random((h, w), np.float32)) for _ in range(3)]
    wb = frame.wb_reciprocal()

    def stage(r, g, b):
        rr, gg, bb = reconstruct_highlights_channels(r, g, b, wb, frame.lim_sat)
        return rr + gg + bb

    dt_stage = timed_loop(stage, *chans, iters=4)
    print(f"[probe] stage alone      : {dt_stage*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
