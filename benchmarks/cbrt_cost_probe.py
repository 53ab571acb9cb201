"""Measure the AHD megakernel's cbrt cost: time one chunk with the real
exp(log/3) cbrt vs an identity stand-in (wrong values, same shapes).

If the delta is large, a Halley-iteration cbrt is worth building. Run on TPU:
    python -m benchmarks.cbrt_cost_probe
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.timing import timed_loop
from pysp_tpu.ops import pallas_kernels as pk


def run_case(name, planes, mat, wb):
    t0 = time.time()
    dt = timed_loop(
        lambda ps: pk.ahd_mega_pallas(ps, mat, wb, False, 1, tile_h=112)[0],
        planes,
        iters=8,
    )
    mp = 4 * planes[0].shape[0] * planes[0].shape[1] / 1e6
    print(f"{name}: {dt*1e3:7.2f} ms/chunk = {mp/dt:7.1f} MP/s "
          f"(wall {time.time()-t0:.0f}s)", flush=True)
    return dt


def main() -> None:
    rng = np.random.default_rng(0)
    h2, w2 = 2000, 1016
    planes = tuple(
        jax.device_put(jnp.asarray(rng.random((h2, w2), np.float32)))
        for _ in range(4)
    )
    mat = jnp.asarray(np.eye(3), jnp.float32)
    wb = jnp.asarray([2.0, 1.0, 1.5], jnp.float32)

    base = run_case("explog-cbrt", planes, mat, wb)

    # Identity cbrt: patch the kernel's local _cbrt via the band core's cbrt_fn
    orig = pk._ahd_mega_kernel

    import functools

    def patched(*args, **kwargs):
        from pysp_tpu.demosaic import ahd_band

        orig_band = ahd_band.ahd_band_quads

        def band_identity(planes_, mat_, wb_, is_hdr, postprocess_stages=1,
                          cbrt_fn=None):
            return orig_band(
                planes_, mat_, wb_, is_hdr, postprocess_stages,
                cbrt_fn=lambda x: x,
            )

        ahd_band.ahd_band_quads = band_identity
        try:
            return orig(*args, **kwargs)
        finally:
            ahd_band.ahd_band_quads = orig_band

    pk._ahd_mega_kernel = patched
    try:
        ident = run_case("identity-cbrt", planes, mat, wb)
    finally:
        pk._ahd_mega_kernel = orig

    print(f"cbrt share (upper bound): {(base - ident) / base * 100:.1f}%",
          flush=True)

    # Newton candidate: magic-constant seed (max rel err 3.2%) + 3 divide-form
    # iterations -> 6e-8 max rel (f32 machine precision; derived numerically,
    # constant 0x2a510000 scanned over x in [1e-8, 1e3]).
    def newton_cbrt(x):
        i = jax.lax.bitcast_convert_type(x, jnp.int32)
        y = jax.lax.bitcast_convert_type(
            jnp.int32(0x2A510000) + i // 3, jnp.float32
        )
        for _ in range(3):
            y = (2.0 * y + x / (y * y)) * jnp.float32(1.0 / 3.0)
        return y

    def patched_newton(*args, **kwargs):
        from pysp_tpu.demosaic import ahd_band

        orig_band = ahd_band.ahd_band_quads

        def band_newton(planes_, mat_, wb_, is_hdr, postprocess_stages=1,
                        cbrt_fn=None):
            return orig_band(
                planes_, mat_, wb_, is_hdr, postprocess_stages,
                cbrt_fn=newton_cbrt,
            )

        ahd_band.ahd_band_quads = band_newton
        try:
            return orig(*args, **kwargs)
        finally:
            ahd_band.ahd_band_quads = orig_band

    pk._ahd_mega_kernel = patched_newton
    try:
        newt = run_case("newton3-cbrt", planes, mat, wb)
    finally:
        pk._ahd_mega_kernel = orig
    print(f"newton3 vs explog: {(base - newt) / base * 100:+.1f}%", flush=True)


if __name__ == "__main__":
    main()
