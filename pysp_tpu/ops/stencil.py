"""Stencil primitives: padding, small convolutions, blurs, medians — pure XLA.

These replace the reference's cv2 calls (filter2D / GaussianBlur / blur / medianBlur /
copyMakeBorder; see SURVEY.md §2.9 item 4) with jittable equivalents that XLA fuses into
the surrounding develop program. Border semantics match OpenCV:

- ``pad_reflect`` == cv2.BORDER_REFLECT   (edge repeated;  np.pad 'symmetric')
- ``pad_reflect101`` == cv2.BORDER_REFLECT_101 (edge not repeated; np.pad 'reflect') —
  the default border for cv2 filtering ops
- ``pad_replicate`` == cv2.BORDER_REPLICATE

``filter2d`` is cross-correlation with the anchor at the kernel center, exactly like
cv2.filter2D (and like lax.conv_general_dilated, which does not flip kernels).
"""
from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

Array = jnp.ndarray


def pad_reflect(x: Array, pad: int | Sequence[int]) -> Array:
    """cv2.BORDER_REFLECT on the last two axes."""
    t, b, l, r = _expand_pad(pad)
    cfg = [(0, 0)] * (x.ndim - 2) + [(t, b), (l, r)]
    return jnp.pad(x, cfg, mode="symmetric")


def pad_reflect101(x: Array, pad: int | Sequence[int]) -> Array:
    """cv2.BORDER_REFLECT_101 on the last two axes."""
    t, b, l, r = _expand_pad(pad)
    cfg = [(0, 0)] * (x.ndim - 2) + [(t, b), (l, r)]
    return jnp.pad(x, cfg, mode="reflect")


def pad_replicate(x: Array, pad: int | Sequence[int]) -> Array:
    """cv2.BORDER_REPLICATE on the last two axes."""
    t, b, l, r = _expand_pad(pad)
    cfg = [(0, 0)] * (x.ndim - 2) + [(t, b), (l, r)]
    return jnp.pad(x, cfg, mode="edge")


def _expand_pad(pad: int | Sequence[int]) -> tuple[int, int, int, int]:
    if isinstance(pad, int):
        return pad, pad, pad, pad
    pad = tuple(pad)
    if len(pad) == 2:
        return pad[0], pad[0], pad[1], pad[1]
    assert len(pad) == 4, "pad must be int, (py,px) or (top,bottom,left,right)"
    return pad  # type: ignore[return-value]


def _conv_valid(x: Array, kernel: Array) -> Array:
    """VALID cross-correlation on the last two axes; leading axes are batched."""
    lead = x.shape[:-2]
    h, w = x.shape[-2], x.shape[-1]
    xb = x.reshape((-1, 1, h, w))
    k = jnp.asarray(kernel, x.dtype).reshape((1, 1) + kernel.shape)
    # precision=HIGHEST: TPU default conv precision is bf16-accumulated, which costs
    # ~5e-3 absolute error — far above the 50 dB fidelity gate. These stencils are
    # HBM-bound, so full f32 MXU passes are effectively free.
    out = lax.conv_general_dilated(
        xb, k, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=lax.Precision.HIGHEST,
    )
    return out.reshape(lead + out.shape[-2:])


def filter2d(x: Array, kernel: Array, border: str = "reflect101") -> Array:
    """cv2.filter2D equivalent: same-size cross-correlation, center anchor.

    ``x`` is (..., H, W); an (H, W, C) image should be moved to (C, H, W) first (use
    ``filter2d_hwc`` for convenience).
    """
    kh, kw = kernel.shape
    pt, pb = kh // 2, (kh - 1) // 2
    pl, pr = kw // 2, (kw - 1) // 2
    pad_fn = {"reflect101": pad_reflect101, "reflect": pad_reflect, "replicate": pad_replicate}[border]
    return _conv_valid(pad_fn(x, (pt, pb, pl, pr)), kernel)


def filter2d_hwc(x: Array, kernel: Array, border: str = "reflect101") -> Array:
    """filter2d for channel-last images (H, W, C) or single-channel (H, W)."""
    if x.ndim == 2:
        return filter2d(x, kernel, border)
    return jnp.moveaxis(filter2d(jnp.moveaxis(x, -1, 0), kernel, border), 0, -1)


def box_blur3(x: Array) -> Array:
    """cv2.blur(src, (3,3)) equivalent (normalized box, reflect101 border)."""
    k = jnp.full((3, 3), 1.0 / 9.0, jnp.float32)
    return filter2d(x, k)


# cv2.getGaussianKernel(3, 1.0): exp(-x^2/2) at {-1,0,1}, normalized.
_G3 = np.exp(-0.5 * np.array([1.0, 0.0, 1.0]))
_G3 = _G3 / _G3.sum()
GAUSSIAN3_SIGMA1 = np.outer(_G3, _G3).astype(np.float32)


def gaussian_blur3(x: Array) -> Array:
    """cv2.GaussianBlur(src, (3,3), 1.0) equivalent (reflect101 border)."""
    return filter2d(x, jnp.asarray(GAUSSIAN3_SIGMA1))


def _window_stack(x: Array, k: int, pad_fn) -> Array:
    """Stack the k*k shifted neighborhoods of each pixel: (..., H, W) -> (k*k, ..., H, W)."""
    p = k // 2
    xp = pad_fn(x, p)
    h, w = x.shape[-2], x.shape[-1]
    views = [
        xp[..., dy : dy + h, dx : dx + w]
        for dy in range(k)
        for dx in range(k)
    ]
    return jnp.stack(views, axis=0)


def median5(x: Array) -> Array:
    """cv2.medianBlur(src, 5) equivalent for float32 (replicate border).

    Exact 25-element median via sort along the window axis. (Pallas selection-network
    kernel is the fast path; this XLA version is the portable fallback.)
    """
    stack = _window_stack(x, 5, pad_replicate)
    return jnp.sort(stack, axis=0)[12]


def median3(x: Array) -> Array:
    """cv2.medianBlur(src, 3) equivalent for float32 (replicate border)."""
    stack = _window_stack(x, 3, pad_replicate)
    return jnp.sort(stack, axis=0)[4]


def median2(x: Array) -> Array:
    """Reference's 2x2 median (raw_bad_pixel_corr.py:9-28): median of
    {self, E, S, SE} with np.pad-reflect(101) border = mean of the two middle values."""
    xp = pad_reflect101(x, 1)
    h, w = x.shape[-2], x.shape[-1]
    views = jnp.stack(
        [
            xp[..., 1 : 1 + h, 1 : 1 + w],
            xp[..., 1 : 1 + h, 2 : 2 + w],
            xp[..., 2 : 2 + h, 1 : 1 + w],
            xp[..., 2 : 2 + h, 2 : 2 + w],
        ],
        axis=0,
    )
    s = jnp.sort(views, axis=0)
    return (s[1] + s[2]) * 0.5


def shift2d(x: Array, dy: int, dx: int, pad_fn=pad_reflect) -> Array:
    """Return x sampled at (y+dy, x+dx) with the given border handling."""
    py, px = abs(dy), abs(dx)
    if py == 0 and px == 0:
        return x
    xp = pad_fn(x, (py, py, px, px))
    h, w = x.shape[-2], x.shape[-1]
    return xp[..., py + dy : py + dy + h, px + dx : px + dx + w]


def upsample2x_bilinear_cv2(x: Array) -> Array:
    """cv2.resize(src, (2W, 2H), INTER_LINEAR) equivalent.

    Half-pixel-center bilinear 2x upsample reduces to a fixed 2-tap stencil per output
    parity: even outputs = 0.75*p[i] + 0.25*p[i-1], odd = 0.75*p[i] + 0.25*p[i+1]
    (edges replicate). Used by the Draft demosaic (fast_resize.py:39).
    """

    def up_axis(v: Array, axis: int) -> Array:
        v = jnp.moveaxis(v, axis, -1)
        n = v.shape[-1]
        vp = jnp.pad(v, [(0, 0)] * (v.ndim - 1) + [(1, 1)], mode="edge")
        prev_ = vp[..., 0:n]        # p[i-1]
        cur = vp[..., 1 : n + 1]    # p[i]
        nxt = vp[..., 2 : n + 2]    # p[i+1]
        even = 0.75 * cur + 0.25 * prev_
        odd = 0.75 * cur + 0.25 * nxt
        out = jnp.stack([even, odd], axis=-1).reshape(*v.shape[:-1], 2 * n)
        return jnp.moveaxis(out, -1, axis)

    if x.ndim == 2:
        return up_axis(up_axis(x, 0), 1)
    return up_axis(up_axis(x, -3), -2)  # (H, W, C) or leading batch dims
