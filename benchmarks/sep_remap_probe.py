"""Separable two-pass banded remap vs the exact product-select kernel.

The exact banded kernels (ops/pallas_kernels._remap_kernel "bilinear"/
"lanczos4") pay a select cost with a SY*SX product term; the "*_sep" kinds
split the resample into a vertical pass over the halo window and a horizontal
pass on the intermediate plane — linear ~2(SX+SY) selects — at the price of a
bounded position approximation (vertical phase read at the tap column; error
<= Lx*span px, see the kernel docstring). This probe times both on the chip at
CA and DNG-warp magnitudes and prints the measured accuracy delta.

Run on TPU: python -m benchmarks.sep_remap_probe [H W]
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
    from pysp_tpu.ops.resample import remap_lanczos4

    H = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    W = int(sys.argv[2]) if len(sys.argv) > 2 else 1504
    rng = np.random.default_rng(0)
    img1 = jax.device_put(rng.random((H, W), np.float32))
    img3 = jax.device_put(rng.random((3, H, W), np.float32))

    yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)
    cy, cx = (H - 1) / 2, (W - 1) / 2
    r2 = ((yy - cy) / cy) ** 2 + ((xx - cx) / cx) ** 2

    def maps(k1):
        s = 1.0 + k1 * r2
        my = (cy + (yy - cy) * s).astype(np.float32)
        mx = (cx + (xx - cx) * s).astype(np.float32)
        dyb = (int(np.floor((my - yy).min())), int(np.ceil((my - yy).max())))
        dxb = (int(np.floor((mx - xx).min())), int(np.ceil((mx - xx).max())))
        lx = float(np.abs(np.diff(my, axis=1)).max())
        return jax.device_put(mx), jax.device_put(my), dyb, dxb, lx

    def t(name, fn, *args, iters=30):
        t0 = time.time()
        dt = timed_loop(fn, *args, iters=iters)
        print(f"[sep] {name}: {dt*1e3:8.2f} ms [wall {time.time()-t0:.0f}s]",
              flush=True)
        return dt

    for label, k1 in (("CA +-2px", 0.003), ("warp 1.5%", 0.015), ("warp 4%", 0.04)):
        mx, my, dyb, dxb, lx = maps(k1)
        reach_err = lx * (max(abs(dxb[0]), abs(dxb[1])) + 4)
        print(f"[sep] --- {label}: dy{dyb} dx{dxb} Lx={lx:.4f} "
              f"pred err {reach_err:.3f} px", flush=True)
        for kind in ("bilinear", "bilinear_sep", "lanczos4", "lanczos4_sep"):
            fn = lambda im, a, b: remap_bounded_pallas(im, a, b, dyb, dxb, kind)
            try:
                out = fn(img1, mx, my)
                if out is None:
                    print(f"[sep] {kind}: declined", flush=True)
                    continue
                t(f"{kind:14s} 1ch", fn, img1, mx, my)
                t(f"{kind:14s} 3ch shared-map", fn, img3, mx, my)
            except Exception as e:  # compile OOM etc. — keep probing
                print(f"[sep] {kind}: FAILED {type(e).__name__}: "
                      f"{str(e).splitlines()[0][:120]}", flush=True)
        # accuracy of the sep kinds vs the exact kernel output
        for kind in ("bilinear", "lanczos4"):
            try:
                ex = remap_bounded_pallas(img1, mx, my, dyb, dxb, kind)
                sp = remap_bounded_pallas(img1, mx, my, dyb, dxb, kind + "_sep")
            except Exception:
                continue
            if ex is None or sp is None:
                continue
            d = np.abs(np.asarray(ex) - np.asarray(sp))[4:-4, 4:-4]
            rms = float(np.sqrt((d ** 2).mean()))
            print(f"[sep] {kind} sep-vs-exact: max {d.max():.2e} rms {rms:.2e} "
                  f"({20*np.log10(1/max(rms,1e-12)):.1f} dB)", flush=True)


if __name__ == "__main__":
    main()
