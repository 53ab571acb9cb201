"""Post-develop filter cost at 24 MP: blur, unsharp (Oklab), RL deconvolution.

VERDICT r4 weak #2: the filter stages (filters/blur.py, filters/sharpen.py —
reference behavior /root/reference/filter/blur/blur_gaussian.py:57-102 and
/root/reference/filter/sharpen/gauss_rt_deconv.py:29-37) shipped CLI-exposed
and correctness-gated but with zero TPU numbers. RL deconvolution at 20
iterations is ~80 full-res separable conv passes — if it costs 30 ms it
doubles a Best develop and nobody knows. This probe measures every variant at
24 MP so the ledger can say what the filters actually cost.

Run on TPU: python -m benchmarks.filter_probe [H W]
"""
from __future__ import annotations

import json
import sys
import time


def main() -> None:
    import jax
    import jax.numpy as jnp

    from benchmarks.cache import enable_compile_cache

    enable_compile_cache()
    from benchmarks.timing import timed_loop
    from pysp_tpu.filters.blur import blur_gaussian
    from pysp_tpu.filters.sharpen import (
        gaussian_rt_deconvolution,
        gaussian_rt_deconvolution_lab,
        gaussian_rt_deconvolution_yuv,
        unsharp_mask_lab,
        unsharp_mask_per_channel,
    )

    h, w = (int(sys.argv[1]), int(sys.argv[2])) if len(sys.argv) > 2 else (4000, 6000)
    mp = h * w / 1e6
    print(f"devices: {jax.devices()}  shape: {h}x{w}x3 ({mp:.1f} MP)", flush=True)

    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (h, w, 3), jnp.float32, 0.02, 0.9)
    float(jnp.sum(img))  # force through the tunnel

    sigma = 2.0
    cases = [
        ("blur_gaussian s2", lambda x: blur_gaussian(x, sigma), 8),
        ("unsharp_per_channel s2", lambda x: unsharp_mask_per_channel(x, sigma, 0.8), 8),
        ("unsharp_lab s2", lambda x: unsharp_mask_lab(x, sigma, 0.8), 8),
        ("rl_deconv rgb s2 20it", lambda x: gaussian_rt_deconvolution(x, sigma, 20), 3),
        ("rl_deconv_lab s2 20it", lambda x: gaussian_rt_deconvolution_lab(x, sigma, 20), 3),
        ("rl_deconv_yuv s2 20it", lambda x: gaussian_rt_deconvolution_yuv(x, sigma, 20), 3),
    ]
    results = {}
    for name, fn, iters in cases:
        t0 = time.time()
        dt = timed_loop(fn, img, iters=iters)
        results[name] = dt * 1e3
        print(
            f"{name:28s} {dt * 1e3:9.3f} ms  ({mp / dt / 1e3:8.1f} MP/s)"
            f"   [wall {time.time() - t0:.0f}s]",
            flush=True,
        )

    # sigma sensitivity for the expensive one: window = ceil(6*sigma) odd
    for s in (1.0, 4.0):
        dt = timed_loop(lambda x: gaussian_rt_deconvolution_yuv(x, s, 20), img, iters=3)
        results[f"rl_deconv_yuv s{s:g} 20it"] = dt * 1e3
        print(f"{'rl_deconv_yuv s%g 20it' % s:28s} {dt * 1e3:9.3f} ms", flush=True)

    print(json.dumps({k: round(v, 3) for k, v in results.items()}))


if __name__ == "__main__":
    main()
