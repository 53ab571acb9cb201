"""One probe round on the lanczos4 select topology (VERDICT r4 item 6).

The round-4 accounting parked config-5's warp at the lanczos4 quality
contract's structural cost. The verdict's three candidates, examined:

1. "reuse horizontal weight planes across the 8 vertical taps" — ALREADY the
   shipping topology: _remap_kernel builds wplanes[t] once and every source
   row s reuses them (ops/pallas_kernels.py, the `rows[s]` loop).
2. "sep kinds at zone centers with exact fallback" — ALREADY shipping: per-zone
   kinds gate bilinear_sep/lanczos4_sep against the position-error budget
   (warp_row_zones / warp_grid_zones kinds).
3. "1/32 fixed-point weight quantization" — cv2 quantizes PHASES to 1/32 and
   reads weights from a 32-entry table. Mosaic has no in-kernel gather, so a
   table read becomes a 32-way select chain (>> the 8-FMA polynomial already
   used); quantizing the phase before the polynomial costs the same FMAs plus
   the quantize. The only question with measurement value: how much of the
   kernel is weight COMPUTATION at all? This probe bounds every conceivable
   weight scheme by timing the shipping kernel against a variant whose weight
   planes are constants (zero weight-compute cost).

Run on TPU: python -m benchmarks.lanczos_weight_probe
"""
from __future__ import annotations


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from benchmarks.cache import enable_compile_cache

    enable_compile_cache()
    from benchmarks.timing import timed_loop
    from pysp_tpu.ops import pallas_kernels as pk
    from pysp_tpu.ops import resample as rs
    from pysp_tpu.warp.rectilinear import compute_remapping_table, displacement_bounds

    h, w = 1000, 1504  # the config-5 per-frame shape
    coeffs = (1.004, -0.008, 0.0015, 0.0, 0.0002, -0.0001)
    center = (0.5, 0.5)
    img = jax.random.uniform(jax.random.PRNGKey(0), (3, h, w), jnp.float32)
    mx, my = compute_remapping_table(coeffs, w, h, center, 1.0)
    mx = jnp.clip(mx, 0, w - 1)
    my = jnp.clip(my, 0, h - 1)
    dyb, dxb = displacement_bounds(coeffs, w, h, center, 1.0)
    float(jnp.sum(img))
    print(f"bounds dy={dyb} dx={dxb}", flush=True)

    def run(kind):
        return timed_loop(
            lambda x: pk.remap_bounded_pallas(x, mx, my, dyb, dxb, kind),
            img,
            iters=8,
        )

    t_exact = run("lanczos4")
    print(f"lanczos4 exact (shipping weights): {t_exact*1e3:7.3f} ms", flush=True)

    # constant weight planes: a lower bound for ANY weight scheme
    real = rs._lanczos4_weight_planes_fast
    try:
        rs._lanczos4_weight_planes_fast = lambda f: tuple(
            jnp.full_like(f, 0.125) for _ in range(8)
        )
        t_const = run("lanczos4")
    finally:
        rs._lanczos4_weight_planes_fast = real
    print(f"lanczos4 with FREE weights:        {t_const*1e3:7.3f} ms "
          f"(weight share {100*(t_exact-t_const)/t_exact:.0f}%)", flush=True)

    t_sep = run("lanczos4_sep")
    print(f"lanczos4_sep (shipping):           {t_sep*1e3:7.3f} ms", flush=True)
    t_bil = run("bilinear")
    print(f"bilinear exact (quality trade):    {t_bil*1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
