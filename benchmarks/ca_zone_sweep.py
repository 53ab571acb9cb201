"""Sweep row-zone count x per-zone sep kinds for the CA remap launches.

Config-5's CA model (Poly3 k1=0.01 at 1000x1504) never engages the separable
kind at the default 4 row zones — the central zones still reach |y - cy| ~ 250
and their position-error bound (0.033-0.035 px) sits just over the 1/32-px
budget. Finer zones tighten both the sep bound (more rows ride the ~8x cheaper
kind) and the exact zones' dy spans; the cost is more kernel launches. This
probe measures the 2-stack CA remap at n_zones = 4/8/16 with host-computed
per-zone kinds, plus accuracy vs the exact unzoned remap.

Run on TPU: python -m benchmarks.ca_zone_sweep
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
        _model_row_zones,
        _model_sep_pos_error,
    )
    from pysp_tpu.demosaic.eag import resample_g_to_full_resolution
    from pysp_tpu.ops.pallas_kernels import (
        remap_bounded_pallas,
        remap_bounded_pallas_zoned,
    )
    from pysp_tpu.ops.resample import SEP_POS_ERR_BUDGET

    H = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    W = int(sys.argv[2]) if len(sys.argv) > 2 else 1504
    rng = np.random.default_rng(0)
    frame = jax.device_put(RawFrame.synthetic(rng.random((H, W), np.float32)))
    model = Poly3CorrectionModel(0.01)
    both = (model, model)

    print(f"[zs] backend={jax.default_backend()} {H}x{W}", flush=True)

    r, g1, b, g2 = bayer_to_rgbg(frame.bayer)
    g_full = jax.device_put(np.asarray(jax.jit(resample_g_to_full_resolution)(g1, g2)))
    fh, fw = g_full.shape
    bound = _model_bound_px(model, fh, fw)
    bb = (-bound, bound)

    coords = jax.jit(model.get_undistorted_coordinates)(g_full)
    mx, my = (jax.device_put(np.asarray(m)) for m in _maps_from_offsets(coords, fh, fw))
    mx2 = jnp.stack([mx, mx])
    my2 = jnp.stack([my, my])
    img2 = jnp.stack([g_full, g_full * 0.5])

    def t(name, fn, *args, iters=60):
        t0 = time.time()
        dt = timed_loop(fn, *args, iters=iters)
        print(f"[zs] {name}: {dt*1e3:7.3f} ms [wall {time.time()-t0:.0f}s]", flush=True)
        return dt

    exact = remap_bounded_pallas(img2, mx2, my2, bb, bb, "bilinear")
    t("unzoned exact       ", lambda i, x, y: remap_bounded_pallas(i, x, y, bb, bb, "bilinear"),
      img2, mx2, my2)

    for n in (4, 8, 16):
        zones = _model_row_zones(both, fh, fw, "inv", n_zones=n)
        if zones is None:
            print(f"[zs] n={n}: zones unavailable", flush=True)
            continue
        kinds = []
        for r0, r1, _, zdxb in zones:
            e = _model_sep_pos_error(both, fh, fw, zdxb, direction="inv", row_range=(r0, r1))
            kinds.append("bilinear_sep" if e is not None and e <= SEP_POS_ERR_BUDGET else "bilinear")
        n_sep = sum(k.endswith("_sep") for k in kinds)
        sep_rows = sum(r1 - r0 for (r0, r1, _, _), k in zip(zones, kinds) if k.endswith("_sep"))
        print(f"[zs] n={n}: {n_sep}/{n} zones sep ({sep_rows}/{fh} rows)", flush=True)

        t(f"zoned n={n:<2} exact     ",
          lambda i, x, y, z=zones: remap_bounded_pallas_zoned(i, x, y, z, "bilinear"),
          img2, mx2, my2)
        if n_sep:
            t(f"zoned n={n:<2} mixed     ",
              lambda i, x, y, z=zones, k=kinds: remap_bounded_pallas_zoned(i, x, y, z, "bilinear", kinds=k),
              img2, mx2, my2)
            z = remap_bounded_pallas_zoned(img2, mx2, my2, zones, "bilinear", kinds=kinds)
            diff = float(jnp.abs(z - exact).max())
            print(f"[zs] n={n} mixed vs exact maxdiff: {diff:.3e}", flush=True)


if __name__ == "__main__":
    main()
