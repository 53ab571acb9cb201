"""Gather-based resampling: bilinear / Lanczos4 remap, fractional crops.

Replaces cv2.remap (INTER_LINEAR at corr_ca/ca_removal.py:100-128, INTER_LANCZOS4 at
dng_warp_corr/chan_distortion_corr.py:94-97) and the reference's vectorized
``bilinear_sample`` (corr_ca/roi/helper.py:38-95) with XLA gathers.

Coordinate convention matches cv2.remap: ``map_x``/``map_y`` give the float source
sample position for every destination pixel. Callers clip coordinates into range
(as the reference does), so edge behavior is clamp-to-edge.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


def _gather2d(img: Array, yi: Array, xi: Array) -> Array:
    """img[(yi, xi)] with indices clamped to the image bounds; img (..., H, W)."""
    h, w = img.shape[-2], img.shape[-1]
    yi = jnp.clip(yi, 0, h - 1)
    xi = jnp.clip(xi, 0, w - 1)
    flat = img.reshape(*img.shape[:-2], h * w)
    idx = yi * w + xi
    return jnp.take(flat, idx.reshape(-1), axis=-1).reshape(
        *img.shape[:-2], *idx.shape
    )


def remap_bilinear(img: Array, map_x: Array, map_y: Array) -> Array:
    """cv2.remap(img, map_x, map_y, INTER_LINEAR) with clamp-to-edge sampling."""
    x0 = jnp.floor(map_x)
    y0 = jnp.floor(map_y)
    fx = (map_x - x0).astype(img.dtype)
    fy = (map_y - y0).astype(img.dtype)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    i00 = _gather2d(img, y0i, x0i)
    i01 = _gather2d(img, y0i, x0i + 1)
    i10 = _gather2d(img, y0i + 1, x0i)
    i11 = _gather2d(img, y0i + 1, x0i + 1)

    top = i00 * (1 - fx) + i01 * fx
    bot = i10 * (1 - fx) + i11 * fx
    return top * (1 - fy) + bot * fy


def _lanczos4_weights(frac: Array) -> Array:
    """8 Lanczos (a=4) tap weights for taps at offsets -3..4 from floor(coord).

    Weights normalized to sum 1 (cv2 does the same). frac shape (...,); output (..., 8).
    """
    taps = jnp.arange(-3, 5, dtype=jnp.float32)  # tap positions relative to floor
    t = frac[..., None] - taps  # distance from sample point to each tap

    pit = jnp.pi * t
    eps = 1e-7
    safe = jnp.where(jnp.abs(t) < eps, 1.0, pit)
    sinc = jnp.where(jnp.abs(t) < eps, 1.0, jnp.sin(safe) / safe)
    safe4 = jnp.where(jnp.abs(t) < eps, 1.0, pit / 4.0)
    sinc4 = jnp.where(jnp.abs(t) < eps, 1.0, jnp.sin(safe4) / safe4)

    w = jnp.where(jnp.abs(t) < 4.0, sinc * sinc4, 0.0)
    return w / jnp.sum(w, axis=-1, keepdims=True)


def remap_lanczos4(img: Array, map_x: Array, map_y: Array) -> Array:
    """cv2.remap(img, map_x, map_y, INTER_LANCZOS4) equivalent (separable 8x8 taps).

    cv2 quantizes fractional positions to 1/32 with fixed-point tables; this computes
    exact continuous weights, so results differ from cv2 by the quantization error
    (~1e-3) — ours is the more accurate resampler.
    """
    x0 = jnp.floor(map_x)
    y0 = jnp.floor(map_y)
    fx = (map_x - x0).astype(img.dtype)
    fy = (map_y - y0).astype(img.dtype)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    wx = _lanczos4_weights(fx)  # (..., 8)
    wy = _lanczos4_weights(fy)

    out = jnp.zeros(jnp.broadcast_shapes(map_x.shape, map_y.shape), img.dtype)
    # separable accumulation: rows then columns, 64 gathers fused by XLA
    for j in range(8):
        row_acc = jnp.zeros_like(out)
        for i in range(8):
            row_acc = row_acc + wx[..., i] * _gather2d(
                img, y0i + (j - 3), x0i + (i - 3)
            )
        out = out + wy[..., j] * row_acc
    return out


def bilinear_sample(
    image: Array, offset: Tuple[float, float], width: int, height: int
) -> Array:
    """Fractional crop via bilinear interpolation (corr_ca/roi/helper.py:38-95).

    ``offset`` is (y, x) of the crop corner through pixel centers.
    """
    off_y, off_x = offset
    ys = jnp.arange(height, dtype=jnp.float32) + off_y
    xs = jnp.arange(width, dtype=jnp.float32) + off_x
    map_y, map_x = jnp.meshgrid(ys, xs, indexing="ij")
    return remap_bilinear(image, map_x, map_y)


def identity_map(height: int, width: int) -> Tuple[np.ndarray, np.ndarray]:
    """Host helper: (map_x, map_y) identity coordinate fields."""
    ys, xs = np.mgrid[0:height, 0:width].astype(np.float32)
    return xs, ys
