"""Tile-height sweep for the banded RL kernel (follow-up to rl_pallas_check).

Halo is 24+24 rows, so small tiles pay large DMA read amplification
((tile+48)/tile on BOTH est and img); the default _pick_tile estimate may be
leaving time on the table. Run on TPU: python -m benchmarks.rl_tile_sweep
"""
from __future__ import annotations


def main() -> None:
    import jax
    import jax.numpy as jnp

    from benchmarks.cache import enable_compile_cache

    enable_compile_cache()
    from benchmarks.timing import timed_loop
    from pysp_tpu.filters.blur import get_1d_gaussian_filter
    from pysp_tpu.ops.pallas_kernels import rl_deconv_pallas

    h, w = 4000, 6000
    img = jax.random.uniform(jax.random.PRNGKey(0), (h, w), jnp.float32, 0.02, 0.9)
    float(jnp.sum(img))
    taps = get_1d_gaussian_filter(2.0)

    for tile in (40, 80, 100, 125, 200, 250, 400, 500):
        if h % tile:
            continue
        try:
            dt = timed_loop(
                lambda x: rl_deconv_pallas(x, taps, 20, tile_h=tile), img, iters=3
            )
            print(f"tile {tile:4d}: {dt*1e3:7.1f} ms", flush=True)
        except Exception as e:
            print(f"tile {tile:4d}: FAIL {type(e).__name__}: {str(e)[:120]}",
                  flush=True)


if __name__ == "__main__":
    main()
