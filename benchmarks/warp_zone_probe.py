"""On-chip probe: exact displacement bounds + column x row grid zones for the
DNG warp remap (VERDICT r3 item 1).

Round 3 left the warp resample as the dominant config-5 cost (~2.2-2.6
ms/frame): zones were row-only and the bounds came from a coarse 256x256 sweep
with margin 3 (+6 on every span). Round 4 (a) sweeps every output pixel in f64
so margin drops to the 1 px f32-floor crossing, and (b) adds column strips so
each rectangle pays only its LOCAL spans. This probe measures, per
interpolation kind at the two scored warp magnitudes:

    unzoned(exact bounds) / row-zoned x4 / grid 4x2 / grid 4x4

through warp-shaped maps on a (3, 1000, 1504) channel stack with a shared map
(exactly the config-5 warp launch shape). Run on the real chip:

    PYTHONPATH=. python benchmarks/warp_zone_probe.py
"""
from __future__ import annotations

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    sys.path.insert(0, ".")
    from benchmarks.timing import timed_loop
    from pysp_tpu.ops.pallas_kernels import (
        remap_bounded_pallas,
        remap_bounded_pallas_grid,
        remap_bounded_pallas_zoned,
    )
    from pysp_tpu.warp.rectilinear import (
        compute_remapping_table,
        displacement_bounds,
        warp_grid_zones,
        warp_row_zones,
    )

    h, w, c = 1000, 1504, 3
    center = (0.5, 0.5)
    rng = np.random.default_rng(0)
    img = jax.device_put(jnp.asarray(rng.random((c, h, w), np.float32)))

    configs = [
        ("config5", (1.005, -0.01, 0.002, 0.0, 0.0003, -0.0002)),
        ("warp1.5%", (1.015, -0.015, 0.003, 0.0, 0.0005, -0.0004)),
    ]
    for name, coeffs in configs:
        mx, my = compute_remapping_table(coeffs, w, h, center)
        mx = jax.device_put(jnp.clip(mx, 0, w - 1))
        my = jax.device_put(jnp.clip(my, 0, h - 1))
        g = displacement_bounds(coeffs, w, h, center)
        zones = warp_row_zones([coeffs] * c, w, h, center)
        print(f"[probe] {name}: exact global bounds {g}")
        print(f"[probe]   row zones: {[(z[2], z[3]) for z in zones]}")

        for kind in ("bilinear", "lanczos4"):
            variants = {}
            variants["unzoned"] = lambda im, g=g, kind=kind: remap_bounded_pallas(
                im, mx, my, g[0], g[1], kind
            )
            variants["rows x4"] = (
                lambda im, z=zones, kind=kind: remap_bounded_pallas_zoned(
                    im, mx, my, z, kind
                )
            )
            for n_cols in (2, 4):
                gz = warp_grid_zones(
                    [coeffs] * c, w, h, center, n_cols=n_cols,
                    interpolation=kind,
                )
                if gz is None:
                    continue
                col_zones, any_sep = gz
                label = f"grid 4x{n_cols}" + ("+sep" if any_sep else "")
                variants[label] = (
                    lambda im, cz=col_zones, kind=kind: remap_bounded_pallas_grid(
                        im, mx, my, cz, kind
                    )
                )
            # sep engagement on the row path for apples-to-apples
            from pysp_tpu.ops.resample import SEP_POS_ERR_BUDGET
            from pysp_tpu.warp.rectilinear import warp_sep_pos_error

            reach = 4 if kind == "lanczos4" else 1
            kinds_sep = []
            for r0, r1, _, dxb in zones:
                err = warp_sep_pos_error(
                    [coeffs], w, h, center, 1.0, dxb, reach, row_range=(r0, r1)
                )
                kinds_sep.append(
                    kind + "_sep" if err <= SEP_POS_ERR_BUDGET else kind
                )
            if any(k.endswith("_sep") for k in kinds_sep):
                variants["rows x4+sep"] = (
                    lambda im, z=zones, ks=kinds_sep, kind=kind:
                    remap_bounded_pallas_zoned(im, mx, my, z, kind, kinds=ks)
                )

            base = None
            for label, fn in variants.items():
                out = fn(img)
                if out is None:
                    print(f"[probe]   {kind:10s} {label:14s}: declined")
                    continue
                if base is None:
                    base = np.asarray(out)
                    maxd = 0.0
                else:
                    maxd = float(np.abs(np.asarray(out) - base).max())
                dt = timed_loop(fn, img, iters=30)
                print(
                    f"[probe]   {kind:10s} {label:14s}: {dt*1e3:6.2f} ms "
                    f"(maxdiff vs unzoned {maxd:.2e})"
                )


if __name__ == "__main__":
    t0 = time.time()
    main()
    print(f"[probe] wall {time.time()-t0:.0f}s")
