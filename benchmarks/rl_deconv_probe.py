"""Where RL deconvolution's 130 ms/24 MP goes, and what formulation fixes it.

filter_probe measured rl_deconv_yuv (single-channel, 20 it, s=2) at ~129 ms =
~6.5 ms/iteration = ~3.2 ms per separable blur — ~60 GB/s effective and ~10%
VPU, i.e. overhead-bound. Each blur is an H-pass (13 lane-axis shifted MACs)
then a V-pass (13 sublane shifts). Candidates probed here, all bit-equivalent
reformulations or documented-divergence variants:

- pass split: H-pass vs V-pass cost in isolation (is the lane shift the tax?)
- transposed pipeline: keep the whole RL loop on the transposed image so both
  blur passes stride the sublane axis; 2 transposes total (in/out).
- alternating orientation: V-pass -> transpose -> V-pass -> ... (transpose per
  blur, never a lane-axis shift chain).

Run on TPU: python -m benchmarks.rl_deconv_probe [H W]
"""
from __future__ import annotations

import json
import sys


def main() -> None:
    import jax
    import jax.numpy as jnp

    from benchmarks.cache import enable_compile_cache

    enable_compile_cache()
    from benchmarks.timing import timed_loop
    from pysp_tpu.filters.blur import get_1d_gaussian_filter
    from pysp_tpu.filters.sharpen import gaussian_rt_deconvolution
    from pysp_tpu.ops.stencil import filter2d

    h, w = (int(sys.argv[1]), int(sys.argv[2])) if len(sys.argv) > 2 else (4000, 6000)
    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (h, w), jnp.float32, 0.02, 0.9)
    float(jnp.sum(img))
    sigma = 2.0
    k1 = get_1d_gaussian_filter(sigma)
    results = {}

    def rep(name, fn, *args, iters=8):
        dt = timed_loop(fn, *args, iters=iters)
        results[name] = dt * 1e3
        print(f"{name:34s} {dt * 1e3:9.3f} ms", flush=True)

    rep("h_pass 13tap", lambda x: filter2d(x, k1.reshape(1, -1), "reflect"), img)
    rep("v_pass 13tap", lambda x: filter2d(x, k1.reshape(-1, 1), "reflect"), img)
    rep("transpose", lambda x: x.T + 0.0, img)

    def blur_vv(x):  # V-pass on x, V-pass on x^T: H handled as V via transpose
        a = filter2d(x, k1.reshape(-1, 1), "reflect")
        return filter2d(a.T, k1.reshape(-1, 1), "reflect").T

    rep("blur via double-V+T", blur_vv, img)

    def blur_ref(x):
        a = filter2d(x, k1.reshape(1, -1), "reflect")
        return filter2d(a, k1.reshape(-1, 1), "reflect")

    rep("blur reference (H then V)", blur_ref, img)

    # RL loops: reference vs transposed-pipeline vs alternating
    rep(
        "rl 20it reference",
        lambda x: gaussian_rt_deconvolution(x, sigma, 20),
        img,
        iters=3,
    )

    def rl_alternating(image, iterations=20):
        def blur(x):
            return blur_vv(x)

        def body(_, est):
            blurred = blur(est)
            return est * blur(image / (blurred + 1e-25))

        return jax.lax.fori_loop(0, iterations, body, image)

    rep("rl 20it double-V+T blurs", rl_alternating, img, iters=3)

    def rl_transposed(image, iterations=20):
        # whole loop on x^T: both passes become V-passes on the live layout,
        # one transpose in + one out
        imgT = image.T + 0.0

        def blurT(x):
            a = filter2d(x, k1.reshape(1, -1), "reflect")
            return filter2d(a, k1.reshape(-1, 1), "reflect")

        def body(_, est):
            blurred = blurT(est)
            return est * blurT(imgT / (blurred + 1e-25))

        return jax.lax.fori_loop(0, iterations, body, imgT).T

    rep("rl 20it transposed-loop", rl_transposed, img, iters=3)

    # parity check (same math, different schedule): compare a few iterations
    a = gaussian_rt_deconvolution(img, sigma, 4)
    b = rl_alternating(img, 4)
    err = float(jnp.abs(a - b).max())
    print(f"double-V+T vs reference max abs diff (4 it): {err:.3e}", flush=True)
    results["parity_maxabs_4it"] = err

    print(json.dumps({k: round(v, 4) for k, v in results.items()}))


if __name__ == "__main__":
    main()
