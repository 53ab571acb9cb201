"""Separable Gaussian blur with auto-sized windows.

Reference behavior: /root/reference/filter/blur/blur_gaussian.py — window = ceil(6*sigma)
odd, minimum 3 (:4-30); unnormalized 1D bell ``exp(-x^2/2s^2)/(sqrt(2pi)s)`` (:32-55);
2-pass separable convolution with reflect borders (:57-102).

The window size depends only on sigma (a Python float), so the kernel is a trace-time
constant and the blur compiles to two small convolutions.
"""
from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from ..ops.stencil import filter2d_hwc

Array = jnp.ndarray


def get_gaussian_filter_window_size(sigma: float, cutoff: int = 3) -> int:
    """Odd window size covering ``cutoff`` standard deviations (blur_gaussian.py:4-30)."""
    if sigma < 0:
        raise ValueError("Filter cannot be computed with negative sigma!")
    radius = sigma * cutoff
    diameter = math.ceil(radius * 2)
    if diameter % 2 == 0:
        diameter += 1
    return max(3, int(diameter))


def get_1d_gaussian_filter(sigma: float) -> np.ndarray:
    """1D Gaussian bell, unnormalized-by-sum like the reference (blur_gaussian.py:32-55)."""
    try:
        radius = get_gaussian_filter_window_size(sigma) // 2
    except ValueError:
        return np.array([1.0], dtype=np.float32)

    xs = np.arange(-radius, radius + 1, dtype=np.float64)
    denom = 1.0 / (np.sqrt(2 * np.pi) * sigma)
    return (denom * np.exp(-(xs**2) / (2 * sigma**2))).astype(np.float32)


def blur_gaussian(image: Array, sigma: float) -> Array:
    """Separable Gaussian blur, reflect border (blur_gaussian.py:57-102).

    Accepts (H, W) or (H, W, C). NOTE: like the reference, the kernel is NOT
    normalized by its sum — overall gain is sum(filter)^2 (~1 for reasonable sigma).

    Two 1-D passes (H then V, like the reference): symmetric padding copies whole
    rows/columns, so each pass commutes with the other axis's padding and the
    result equals the pad-once outer-product convolution at 2k taps/pixel
    instead of k^2.
    """
    k1 = get_1d_gaussian_filter(float(sigma))
    h_pass = filter2d_hwc(image, k1.reshape(1, -1), border="reflect")
    return filter2d_hwc(h_pass, k1.reshape(-1, 1), border="reflect")
