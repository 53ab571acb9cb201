"""Real-chip check + timing of the banded Pallas RL iteration.

Run on TPU: python -m benchmarks.rl_pallas_check [H W]
"""
from __future__ import annotations

import sys


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from benchmarks.cache import enable_compile_cache

    enable_compile_cache()
    from benchmarks.timing import timed_loop
    from pysp_tpu.filters.blur import blur_gaussian, get_1d_gaussian_filter
    from pysp_tpu.filters.sharpen import gaussian_rt_deconvolution
    from pysp_tpu.ops.pallas_kernels import rl_deconv_pallas

    h, w = (int(sys.argv[1]), int(sys.argv[2])) if len(sys.argv) > 2 else (4000, 6000)
    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (h, w), jnp.float32, 0.02, 0.9)
    float(jnp.sum(img))
    taps = get_1d_gaussian_filter(2.0)

    def xla_rl(x, iters):
        def body(_, est):
            blurred = blur_gaussian(est, 2.0)
            return est * blur_gaussian(x / (blurred + 1e-25), 2.0)

        return jax.lax.fori_loop(0, iters, body, x)

    a = np.asarray(rl_deconv_pallas(img, taps, 4))
    b = np.asarray(xla_rl(img, 4))
    print(f"on-chip parity max abs diff (4 it): {np.abs(a - b).max():.3e}", flush=True)

    dt = timed_loop(lambda x: rl_deconv_pallas(x, taps, 20), img, iters=3)
    print(f"rl_deconv_pallas 20it s2: {dt*1e3:8.1f} ms", flush=True)
    dt2 = timed_loop(lambda x: xla_rl(x, 20), img, iters=3)
    print(f"rl_deconv_xla    20it s2: {dt2*1e3:8.1f} ms", flush=True)
    dt3 = timed_loop(lambda x: gaussian_rt_deconvolution(x, 2.0, 20), img, iters=3)
    print(f"public surface (gated):   {dt3*1e3:8.1f} ms", flush=True)
    img3 = jnp.stack([img, img * 0.8, img * 0.6], axis=-1)
    dt4 = timed_loop(lambda x: gaussian_rt_deconvolution(x, 2.0, 20), img3, iters=2)
    print(f"RGB public surface:       {dt4*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
