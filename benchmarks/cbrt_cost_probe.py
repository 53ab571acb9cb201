"""Measure the AHD megakernel's LAB-transcendental cost.

Times one chunk three ways:
  explog   — the shipping kernel (exp(log·p) cbrt + pow2.4)
  newton   — multiply-only Halley-iteration inverse roots (bitcast seed); more
             accurate (3.3e-7 vs 1.1e-6 max rel err) but measured SLOWER
  identity — both replaced by identity (wrong values, same shapes): the upper
             bound of what any cbrt/pow implementation could ever save.

Result (v5e, 2026-08-17, 8.1MP chunk, tile 112):
  explog 3.43 ms | newton 3.99 ms (-16%) | identity 3.24 ms
→ exp/log are cheap on the VPU; ALL LAB transcendentals together are ~5.5% of
the kernel. The Newton forms stay here as the documented negative result; the
kernel keeps exp(log·p).

Run on TPU: python -m benchmarks.cbrt_cost_probe
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.cache import enable_compile_cache

enable_compile_cache()

from benchmarks.timing import timed_loop  # noqa: E402
from pysp_tpu.ops import pallas_kernels as pk  # noqa: E402

# Seed constants tuned by scan (3.3-3.4% max seed rel err over [1e-12, 10]).
_K3 = 1419916000  # inverse cube root
_K5 = 1277950000  # inverse fifth root


def _seed(x, k, inv_p):
    i = jax.lax.bitcast_convert_type(x, jnp.int32)
    j = (jnp.float32(k) - i.astype(jnp.float32) * jnp.float32(inv_p)).astype(
        jnp.int32
    )
    return jax.lax.bitcast_convert_type(j, jnp.float32)


def newton_cbrt(x):
    """x**(1/3): 2 Halley steps on the inverse root; max rel err 3.3e-7."""
    r = _seed(x, _K3, 1.0 / 3.0)
    for _ in range(2):
        d = 1.0 - x * r * r * r
        r = r * (1.0 + d * (jnp.float32(1 / 3) + d * jnp.float32(2 / 9)))
    return x * r * r


def newton_pow24(x):
    """x**2.4 = (x^2·r^4)^2 with r = x**(-1/5); max rel err 1.5e-6."""
    r = _seed(x, _K5, 1.0 / 5.0)
    for _ in range(2):
        r2 = r * r
        d = 1.0 - x * r2 * r2 * r
        r = r * (1.0 + d * (jnp.float32(0.2) + d * jnp.float32(3 / 25)))
    r2 = r * r
    t = (x * x) * r2 * r2
    return t * t


def run_case(name, planes, mat, wb):
    t0 = time.time()
    dt = timed_loop(
        lambda ps: pk.ahd_mega_pallas(ps, mat, wb, False, 1, tile_h=112)[0],
        planes,
        iters=32,
    )
    mp = 4 * planes[0].shape[0] * planes[0].shape[1] / 1e6
    print(f"{name}: {dt*1e3:7.2f} ms/chunk = {mp/dt:7.1f} MP/s "
          f"(wall {time.time()-t0:.0f}s)", flush=True)
    return dt


def _patched_case(name, planes, mat, wb, cbrt_fn):
    # pow24_fn plumbing was removed with the rejected hypothesis (ADVICE r2):
    # the probe now swaps only the LAB cbrt, which carried the whole effect.
    from pysp_tpu.demosaic import ahd_band

    orig_band = ahd_band.ahd_band_quads

    def band(planes_, mat_, wb_, is_hdr, postprocess_stages=1,
             cbrt_fn=None, _c=cbrt_fn):
        return orig_band(
            planes_, mat_, wb_, is_hdr, postprocess_stages, cbrt_fn=_c,
        )

    ahd_band.ahd_band_quads = band
    try:
        return run_case(name, planes, mat, wb)
    finally:
        ahd_band.ahd_band_quads = orig_band


def main() -> None:
    rng = np.random.default_rng(0)
    h2, w2 = 2000, 1016
    planes = tuple(
        jax.device_put(jnp.asarray(rng.random((h2, w2), np.float32)))
        for _ in range(4)
    )
    mat = jnp.asarray(np.eye(3), jnp.float32)
    wb = jnp.asarray([2.0, 1.0, 1.5], jnp.float32)

    explog = run_case("explog (shipping)", planes, mat, wb)

    newt = _patched_case(
        "newton (rejected)", planes, mat, wb, cbrt_fn=newton_cbrt,
    )
    ident = _patched_case(
        "identity (bound) ", planes, mat, wb, cbrt_fn=lambda x: x,
    )

    print(f"newton vs explog: {(explog - newt) / explog * 100:+.1f}%", flush=True)
    print(f"transcendental share (vs identity): "
          f"{(explog - ident) / explog * 100:.1f}%", flush=True)


if __name__ == "__main__":
    main()
