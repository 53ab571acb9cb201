"""CA-removal cost split at config-5 scale: maps vs remaps vs resamples.

Round-3 follow-up (BASELINE.md "channel batching" ledger): CA removal is
45.5 ms of the 105.6 ms config-5 burst. This probe times the pieces of one
frame's `remove_ca_from_raw` (1000x1504, the config-5 per-frame shape) so the
next optimization targets the real cost: the Newton-inverted coordinate
fields (8 sequential full-res fori_loop passes per field), the two banded
Pallas remap launches, or the EAG guide resamples.

Run on TPU: python -m benchmarks.ca_probe [H W]
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
    from pysp_tpu.core.bayer import bayer_to_rgbg
    from pysp_tpu.core.frame import RawFrame
    from pysp_tpu.correct.ca.models import Poly3CorrectionModel
    from pysp_tpu.correct.ca.removal import (
        _maps_from_offsets,
        _model_bound_px,
        remove_ca_from_raw,
    )
    from pysp_tpu.demosaic.eag import resample_b, resample_g_to_full_resolution, resample_r
    from pysp_tpu.ops.pallas_kernels import remap_bounded_pallas

    H = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    W = int(sys.argv[2]) if len(sys.argv) > 2 else 1504
    mp = H * W / 1e6
    rng = np.random.default_rng(0)
    frame = jax.device_put(RawFrame.synthetic(rng.random((H, W), np.float32)))
    model = Poly3CorrectionModel(0.01)

    print(f"[ca] backend={jax.default_backend()} {H}x{W} ({mp:.1f} MP)", flush=True)

    def t(name, fn, *args, iters=30):
        t0 = time.time()
        dt = timed_loop(fn, *args, iters=iters)
        print(f"[ca] {name}: {dt*1e3:7.3f} ms [wall {time.time()-t0:.0f}s]", flush=True)
        return dt

    t("full remove_ca      ", lambda f: remove_ca_from_raw(f, model, model).bayer, frame)

    r, g1, b, g2 = bayer_to_rgbg(frame.bayer)
    g_full = jax.jit(resample_g_to_full_resolution)(g1, g2)
    g_full = jax.device_put(np.asarray(g_full))
    fh, fw = g_full.shape
    bound = _model_bound_px(model, fh, fw)
    print(f"[ca] bound = +-{bound}px", flush=True)

    t("G fill              ", resample_g_to_full_resolution, g1, g2)

    def maps_inv(img):
        coords = model.get_undistorted_coordinates(img)
        mx, my = _maps_from_offsets(coords, fh, fw)
        return mx + my

    def maps_fwd(img):
        coords = model.get_distorted_coordinates(img)
        mx, my = _maps_from_offsets(coords, fh, fw)
        return mx + my

    t("inv map (Newton x8) ", maps_inv, g_full)
    t("fwd map (poly)      ", maps_fwd, g_full)

    coords = jax.jit(model.get_undistorted_coordinates)(g_full)
    mx, my = (jax.device_put(np.asarray(m)) for m in _maps_from_offsets(coords, fh, fw))
    mx2 = jnp.stack([mx, mx])
    my2 = jnp.stack([my, my])
    img2 = jnp.stack([g_full, g_full * 0.5])
    bb = (-bound, bound)

    t("pallas remap shared ", lambda i, x, y: remap_bounded_pallas(i, x, y, bb, bb, "bilinear"),
      g_full, mx2, my2)
    t("pallas remap 2-stack", lambda i, x, y: remap_bounded_pallas(i, x, y, bb, bb, "bilinear"),
      img2, mx2, my2)

    from pysp_tpu.correct.ca.removal import _model_row_zones
    from pysp_tpu.ops.pallas_kernels import remap_bounded_pallas_zoned

    zones = _model_row_zones((model, model), fh, fw, "inv")
    print(f"[ca] inv zones: {zones}", flush=True)
    if zones is not None:
        t("zoned remap shared  ",
          lambda i, x, y: remap_bounded_pallas_zoned(i, x, y, zones, "bilinear"),
          g_full, mx2, my2)
        t("zoned remap 2-stack ",
          lambda i, x, y: remap_bounded_pallas_zoned(i, x, y, zones, "bilinear"),
          img2, mx2, my2)
        z = remap_bounded_pallas_zoned(img2, mx2, my2, zones, "bilinear")
        u = remap_bounded_pallas(img2, mx2, my2, bb, bb, "bilinear")
        diff = float(jnp.abs(z - u).max())
        print(f"[ca] zoned vs unzoned maxdiff: {diff}", flush=True)

    t("R+B guide resample  ",
      lambda rv, bv, gv: resample_r(rv, gv) + resample_b(bv, gv), r, b, g_full)


if __name__ == "__main__":
    main()
