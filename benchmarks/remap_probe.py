"""Find a fast TPU formulation for 2D remap (the CA/warp resample core).

config5_isolate showed the gather-based remap runs at ~10-25 ns per gathered
element (one_dev_warp: 3.16 s for ONE 1.5 MP frame at lanczos4 = 64 taps x 3
channels), which makes the warp ~2000x slower than the whole AHD develop and
trips the TPU execution watchdog under lax.map ("worker crashed").

Candidates, all computing the same bilinear remap of a (H, W) plane with a
smooth rectilinear map (exactness checked vs the shipping path):
 1. flat take          — shipping _gather2d (flatten + jnp.take)
 2. take_along_axis    — row gather (axis 0) then column gather (axis 1)
 3. one-hot row matmul — rows mixed by an MXU matmul per vertical tap window;
                         exploits |map_y - y| <= M (radial warps are smooth):
                         vertical resample = banded matrix x image, built from
                         iota comparisons (exact), then horizontal stays a
                         lane gather
 4. dynamic-slice rows — per-row pair of dynamic slices + lane gather

Run on TPU: python -m benchmarks.remap_probe [H W]
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
    from pysp_tpu.ops.resample import remap_bilinear

    H = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    W = int(sys.argv[2]) if len(sys.argv) > 2 else 1504
    K1 = float(sys.argv[3]) if len(sys.argv) > 3 else 0.015
    rng = np.random.default_rng(0)
    img = jax.device_put(rng.random((H, W), np.float32))

    # smooth radial map (1.5% barrel) — the warp/CA regime
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)
    cy, cx = (H - 1) / 2, (W - 1) / 2
    r2 = (((yy - cy) / cy) ** 2 + ((xx - cx) / cx) ** 2)
    s = 1.0 + K1 * r2
    map_y = jax.device_put((cy + (yy - cy) * s).astype(np.float32))
    map_x = jax.device_put((cx + (xx - cx) * s).astype(np.float32))
    dy_max = int(np.ceil(np.abs(np.asarray(map_y) - yy).max())) + 2
    print(f"[rm] backend={jax.default_backend()} {H}x{W} dy_max={dy_max}", flush=True)

    def t(name, fn, *args, iters=8):
        t0 = time.time()
        dt = timed_loop(fn, *args, iters=iters)
        print(f"[rm] {name}: {dt*1e3:8.2f} ms [wall {time.time()-t0:.0f}s]",
              flush=True)
        return dt

    want = np.asarray(remap_bilinear(img, map_x, map_y))

    def check(name, fn):
        got = np.asarray(fn(img, map_x, map_y))
        ok = np.array_equal(got, want)
        err = float(np.abs(got - want).max())
        print(f"[rm] {name} exact={ok} maxerr={err:.2e}", flush=True)

    # 2. take_along_axis two-step (vertical gather of 2 rows, then lanes)
    def remap_taa(im, mx, my):
        y0 = jnp.floor(my)
        x0 = jnp.floor(mx)
        fy = (my - y0).astype(im.dtype)
        fx = (mx - x0).astype(im.dtype)
        y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
        y1i = jnp.clip(y0i + 1, 0, H - 1)
        x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
        x1i = jnp.clip(x0i + 1, 0, W - 1)
        # gather 4 corners via take_along_axis on each axis in turn
        rows0 = jnp.take_along_axis(im, y0i, axis=0)   # (H, W): im[y0[r,c], c]
        rows1 = jnp.take_along_axis(im, y1i, axis=0)
        # horizontal: values needed at x0/x1 BUT from rows gathered at (r, x)
        # -> gather columns of the already-row-gathered planes is wrong unless
        # rows were gathered at column x. Gather columns FIRST instead:
        c00 = jnp.take_along_axis(rows0, x0i, axis=1)
        c01 = jnp.take_along_axis(rows0, x1i, axis=1)
        c10 = jnp.take_along_axis(rows1, x0i, axis=1)
        c11 = jnp.take_along_axis(rows1, x1i, axis=1)
        # NOTE: rows0[r, x0[r,c]] = im[y0[r, x0[r,c]], x0[r,c]] != im[y0[r,c], x0[r,c]]
        # unless y0 is column-independent — so this candidate is APPROXIMATE for
        # non-separable maps; measured for speed only.
        top = c00 * (1 - fx) + c01 * fx
        bot = c10 * (1 - fx) + c11 * fx
        return top * (1 - fy) + bot * fy

    # 3. one-hot vertical matmul + horizontal lane gather via take_along_axis
    def remap_onehot_v(im, mx, my):
        y0 = jnp.floor(my)
        fy = (my - y0).astype(im.dtype)
        y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
        y1i = jnp.clip(y0i + 1, 0, H - 1)
        x0 = jnp.floor(mx)
        fx = (mx - x0).astype(im.dtype)
        x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
        x1i = jnp.clip(x0i + 1, 0, W - 1)
        # vertical resample at EVERY column first: v[r, c] = (1-fy)*im[y0[r,c],c]
        # + fy*im[y1[r,c],c]; y indices vary per (r, c) so this needs the true
        # column-wise gather — do it via take_along_axis on axis 0 (the exact
        # orientation), which may hit a faster XLA path than flat take.
        v0 = jnp.take_along_axis(im, y0i, axis=0)
        v1 = jnp.take_along_axis(im, y1i, axis=0)
        # EXACTNESS requires gathering x on the ORIGINAL map positions; here we
        # take y at column c, then x along the vertically-resampled plane --
        # exact only when map_y is column-independent. Approximate; speed probe.
        v = v0 * (1 - fy) + v1 * fy
        h0 = jnp.take_along_axis(v, x0i, axis=1)
        h1 = jnp.take_along_axis(v, x1i, axis=1)
        return h0 * (1 - fx) + h1 * fx

    # 4. exact: gather full (1, W) rows per tap via lax.gather, lanes after
    def remap_rowgather(im, mx, my):
        y0 = jnp.floor(my)
        x0 = jnp.floor(mx)
        fy = (my - y0).astype(im.dtype)
        fx = (mx - x0).astype(im.dtype)
        y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
        x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
        flat = im.reshape(-1)

        def corner(dy, dx):
            yi = jnp.clip(y0i + dy, 0, H - 1)
            xi = jnp.clip(x0i + dx, 0, W - 1)
            return jnp.take(flat, (yi * W + xi).reshape(-1), axis=0).reshape(H, W)

        i00, i01 = corner(0, 0), corner(0, 1)
        i10, i11 = corner(1, 0), corner(1, 1)
        top = i00 * (1 - fx) + i01 * fx
        bot = i10 * (1 - fx) + i11 * fx
        return top * (1 - fy) + bot * fy

    t("shipping bilinear   ", remap_bilinear, img, map_x, map_y)
    check("take_along_axis 2ax", remap_taa)
    t("take_along_axis 2ax ", remap_taa, img, map_x, map_y)
    check("onehot-v approx    ", remap_onehot_v)
    t("onehot-v approx     ", remap_onehot_v, img, map_x, map_y)
    check("flat take (ctrl)   ", remap_rowgather)
    t("flat take (ctrl)    ", remap_rowgather, img, map_x, map_y)

    # the shipped fix: gather-free select over statically-bounded shifts
    from pysp_tpu.ops.resample import (
        remap_bilinear_bounded,
        remap_lanczos4,
        remap_lanczos4_bounded,
    )

    yyj = np.arange(H)[:, None]
    xxj = np.arange(W)[None, :]
    myn, mxn = np.asarray(map_y), np.asarray(map_x)
    dyb = (int(np.floor((np.floor(myn) - yyj).min())) - 1,
           int(np.ceil((np.floor(myn) - yyj).max())) + 1)
    dxb = (int(np.floor((np.floor(mxn) - xxj).min())) - 1,
           int(np.ceil((np.floor(mxn) - xxj).max())) + 1)
    print(f"[rm] bounds dy={dyb} dx={dxb}", flush=True)
    check("bounded bilinear   ",
          lambda im, mx, my: remap_bilinear_bounded(im, mx, my, dyb, dxb))
    t("bounded bilinear    ",
      lambda im, mx, my: remap_bilinear_bounded(im, mx, my, dyb, dxb),
      img, map_x, map_y)
    t("shipping lanczos4   ", remap_lanczos4, img, map_x, map_y)
    t("bounded lanczos4    ",
      lambda im, mx, my: remap_lanczos4_bounded(im, mx, my, dyb, dxb),
      img, map_x, map_y)


if __name__ == "__main__":
    main()
