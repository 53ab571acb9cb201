"""On-chip tile-height sweep for the banded Pallas remap kernel.

Run: python -m benchmarks.remap_tile_sweep [H W]
"""
from __future__ import annotations

import sys
import time

import numpy as np


def main() -> None:
    import jax

    from benchmarks.cache import enable_compile_cache

    enable_compile_cache()
    from benchmarks.timing import timed_loop
    from pysp_tpu.ops.pallas_kernels import remap_bounded_pallas
    from pysp_tpu.ops.resample import remap_bilinear, remap_lanczos4

    H = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    W = int(sys.argv[2]) if len(sys.argv) > 2 else 1504
    rng = np.random.default_rng(0)
    img = jax.device_put(rng.random((H, W), np.float32))
    print(f"[rs] backend={jax.default_backend()} {H}x{W}", flush=True)

    yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)
    cy, cx = (H - 1) / 2, (W - 1) / 2
    r2 = ((yy - cy) / cy) ** 2 + ((xx - cx) / cx) ** 2
    s = 1.0 + 0.015 * r2
    my = np.clip(cy + (yy - cy) * s + rng.uniform(-0.9, 0.9, (H, W)), 0, H - 1)
    mx = np.clip(cx + (xx - cx) * s + rng.uniform(-0.9, 0.9, (H, W)), 0, W - 1)
    dyb = (int(np.floor((my - yy).min())), int(np.floor((my - yy).max())))
    dxb = (int(np.floor((mx - xx).min())), int(np.floor((mx - xx).max())))
    mx = jax.device_put(mx.astype(np.float32))
    my = jax.device_put(my.astype(np.float32))
    print(f"[rs] bounds dy={dyb} dx={dxb}", flush=True)

    for kind, ref in (("bilinear", remap_bilinear), ("lanczos4", remap_lanczos4)):
        want = np.asarray(ref(img, mx, my))
        for tile in (8, 16, 24, 32, 48, 64):
            try:
                got = remap_bounded_pallas(
                    img, mx, my, dyb, dxb, kind, tile_h=tile
                )
                if got is None:
                    print(f"[rs] {kind} tile {tile}: declined", flush=True)
                    continue
                gotn = np.asarray(got)
                exact = np.array_equal(gotn, want)
                err = float(np.abs(gotn - want).max())
                t0 = time.time()
                dt = timed_loop(
                    lambda im, a, b, tile=tile, kind=kind: remap_bounded_pallas(
                        im, a, b, dyb, dxb, kind, tile_h=tile
                    ),
                    img, mx, my, iters=30,
                )
                print(
                    f"[rs] {kind} tile {tile}: {dt*1e3:7.3f} ms exact={exact} "
                    f"maxerr={err:.2e} [wall {time.time()-t0:.0f}s]",
                    flush=True,
                )
            except Exception as e:
                msg = str(e).splitlines()[0][:120] if str(e) else repr(e)[:120]
                print(f"[rs] {kind} tile {tile}: FAILED {msg}", flush=True)


if __name__ == "__main__":
    main()
