"""Real-chip parity + timing for the banded Pallas remap kernel.

Compares ops/pallas_kernels.remap_bounded_pallas against the XLA bounded remaps
(ops/resample.py) and the gather remaps on radial+jitter maps, at the config-5
probe scale (1000x1504) across small (CA/warp regime) and large displacement
bounds. Run on TPU:  python -m benchmarks.remap_pallas_check [H W]
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
    from pysp_tpu.ops.pallas_kernels import remap_bounded_pallas
    from pysp_tpu.ops.resample import (
        remap_bilinear,
        remap_bilinear_bounded,
        remap_lanczos4,
        remap_lanczos4_bounded,
    )

    H = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    W = int(sys.argv[2]) if len(sys.argv) > 2 else 1504
    rng = np.random.default_rng(0)
    img = jax.device_put(rng.random((H, W), np.float32))
    print(f"[rp] backend={jax.default_backend()} {H}x{W}", flush=True)

    def maps_for(k1):
        yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)
        cy, cx = (H - 1) / 2, (W - 1) / 2
        r2 = ((yy - cy) / cy) ** 2 + ((xx - cx) / cx) ** 2
        s = 1.0 + k1 * r2
        my = np.clip(cy + (yy - cy) * s + rng.uniform(-0.9, 0.9, (H, W)), 0, H - 1)
        mx = np.clip(cx + (xx - cx) * s + rng.uniform(-0.9, 0.9, (H, W)), 0, W - 1)
        dyb = (int(np.floor((my - yy).min())), int(np.floor((my - yy).max())))
        dxb = (int(np.floor((mx - xx).min())), int(np.floor((mx - xx).max())))
        return (
            jax.device_put(mx.astype(np.float32)),
            jax.device_put(my.astype(np.float32)),
            dyb,
            dxb,
        )

    def t(name, fn, *args, iters=30):
        t0 = time.time()
        dt = timed_loop(fn, *args, iters=iters)
        print(
            f"[rp] {name}: {dt*1e3:8.3f} ms [wall {time.time()-t0:.0f}s]",
            flush=True,
        )
        return dt

    # k1 chosen so bounds land in the CA (~+-4), warp (~+-7) and huge regimes
    for k1 in (0.008, 0.015, 0.05, 0.1):
        mx, my, dyb, dxb = maps_for(k1)
        print(f"[rp] --- k1={k1} bounds dy={dyb} dx={dxb}", flush=True)
        for kind, gather, xla_b in (
            ("bilinear", remap_bilinear, remap_bilinear_bounded),
            ("lanczos4", remap_lanczos4, remap_lanczos4_bounded),
        ):
            got = remap_bounded_pallas(img, mx, my, dyb, dxb, kind)
            if got is None:
                print(f"[rp] {kind}: pallas declined (bounds too large)", flush=True)
                continue
            got = np.asarray(got)
            want = np.asarray(gather(img, mx, my))
            exact = np.array_equal(got, want)
            err = float(np.abs(got - want).max())
            print(f"[rp] {kind}: exact={exact} maxerr={err:.2e}", flush=True)

            t(f"{kind} pallas", lambda im, a, b: remap_bounded_pallas(
                im, a, b, dyb, dxb, kind), img, mx, my)
            span = max(dyb[1] - dyb[0], dxb[1] - dxb[0])
            if span <= 20:
                t(f"{kind} xla-bounded", lambda im, a, b: xla_b(
                    im, a, b, dyb, dxb), img, mx, my, iters=8)


if __name__ == "__main__":
    main()
