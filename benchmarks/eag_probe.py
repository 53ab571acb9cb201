"""Fast (EAG) tier roofline probe: where do the 8-9 ms at 24 MP go?

VERDICT r2 weak #8: Fast runs 8-9 ms vs Best 13-17 ms despite skipping
homogeneity/decision/medians — either the XLA program is HBM-bound across its
many fused-pass round-trips (then a banded kernel wins) or genuinely VPU-bound
(then 8 ms is the roofline and the tier is what it is). Same-process
measurements, RTT-proof iteration counts.

Run: python -m benchmarks.eag_probe [H W]
"""
from __future__ import annotations

import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from benchmarks.cache import enable_compile_cache

    enable_compile_cache()
    from benchmarks.timing import timed_loop
    from pysp_tpu import DevelopConfig, QualityDemosaic, RawFrame
    from pysp_tpu.core.bayer import bayer_to_rgbg
    from pysp_tpu.demosaic.eag import (
        demosaic_eag_channels,
        resample_b,
        resample_g_to_full_resolution,
        resample_r,
    )
    from pysp_tpu.pipeline.develop import develop

    H = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    W = int(sys.argv[2]) if len(sys.argv) > 2 else 6000
    mp = H * W / 1e6
    rng = np.random.default_rng(0)
    frame = jax.device_put(
        RawFrame.synthetic(
            rng.random((H, W), np.float32),
            cam_mat=np.array(
                [[0.9, -0.2, -0.1], [-0.3, 1.1, 0.2], [0.0, -0.4, 1.3]],
                np.float32,
            ),
            wb_neutral=np.array([0.45, 1.0, 0.62], np.float32),
        )
    )
    r, g1, b, g2 = (np.asarray(p) for p in bayer_to_rgbg(frame.bayer))
    r, g1, b, g2 = (jax.device_put(p) for p in (r, g1, b, g2))
    print(f"[ep] backend={jax.default_backend()} {H}x{W} ({mp:.0f} MP)", flush=True)

    def t(name, fn, *args, iters=30):
        t0 = time.time()
        dt = timed_loop(fn, *args, iters=iters)
        print(
            f"[ep] {name}: {dt*1e3:7.3f} ms = {mp/dt:6.0f} MP/s "
            f"[wall {time.time()-t0:.0f}s]",
            flush=True,
        )
        return dt

    cfg = DevelopConfig(quality=QualityDemosaic.Fast)
    t("full Fast develop ", lambda f: develop(f, cfg), frame)

    # unfused composition (the pre-round-3 shipping path) for comparison
    from pysp_tpu.colorimetry.transforms import cam_to_lin_srgb_matrix
    from pysp_tpu.pipeline.develop import _color_tail_channels

    def unfused(f):
        r_, g_, b_ = demosaic_eag_channels(f)
        mat = cam_to_lin_srgb_matrix(f.cam_mat, f.cam_white)
        return jnp.stack(
            _color_tail_channels(r_, g_, b_, mat, True, True), axis=-1
        )

    t("unfused develop   ", unfused, frame)
    t("demosaic channels ", lambda f: jnp.stack(demosaic_eag_channels(f), -1),
      frame)

    wb = frame.wb_reciprocal()

    def gfill(g1v, g2v):
        return resample_g_to_full_resolution(g1v, g2v)

    t("G fill            ", gfill, g1, g2)

    gfull = jax.jit(gfill)(g1, g2)
    gfull = jax.device_put(np.asarray(gfull))

    t("R+B resample      ",
      lambda rv, bv, gv: resample_r(rv, gv) + resample_b(bv, gv), r, b, gfull)

    # HBM floor: read the mosaic once, write three channels
    def floor(bayer):
        x = bayer * 1.0001
        return jnp.stack([x, x * 0.5, x * 0.25], -1)

    t("HBM floor r1w3    ", floor, frame.bayer)


if __name__ == "__main__":
    main()
