"""Edge-assisted Gaussian ("Fast") demosaic.

Reference behavior: /root/reference/debayer/edge_assisted_gaussian.py. Green is filled
to full resolution by edge-weighted bilinear interpolation (:10-124); R/B are recovered
by photosite-phase Gaussian upsampling of the (channel - G) difference plus re-injection
of green high frequencies (:126-201).

All stages are shifts + 3x3 correlations, expressed so XLA fuses them into one program.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from ..core.bayer import bayer_to_rgbg, rgbg_to_bayer
from ..core.frame import DevelopedImage, RawFrame
from ..ops.phase_kernels import BayerPatternPosition, get_rgbg_kernel
from ..ops.stencil import filter2d, gaussian_blur3, pad_reflect

Array = jnp.ndarray


def simple_delta_mix_bilinear(top: Array, bottom: Array, left: Array, right: Array) -> Array:
    """Direction-weighted bilinear infill (edge_assisted_gaussian.py:10-49).

    More change top-bottom => blend more along top-bottom axis to preserve the edge
    running left-right (and vice versa); equal weights where the neighborhood is flat.
    """
    delta_y = jnp.abs(top - bottom)
    delta_x = jnp.abs(left - right)
    sum_delta = delta_y + delta_x

    avg_x = (left + right) * 0.5
    avg_y = (top + bottom) * 0.5

    strength_y = jnp.where(sum_delta != 0, delta_y / jnp.where(sum_delta != 0, sum_delta, 1.0), 0.5)
    strength_x = 1.0 - strength_y

    return avg_y * strength_x + avg_x * strength_y


def resample_g_to_full_resolution(
    g1: Array, g2: Array, use_bilinear_weighting: bool = True
) -> Array:
    """Fill G to sensor resolution from the two green phases (edge_assisted_gaussian.py:51-124).

    Original photosites are preserved; the missing R/B positions are interpolated from
    the 4 cardinal greens (reflect padding hides the borders).
    """
    g1p = pad_reflect(g1, 1)
    g2p = pad_reflect(g2, 1)

    h, w = g1.shape[-2], g1.shape[-1]

    # G value at the B photosite (bottom-right of quad): greens at N/S from g1, W/E from g2
    b_t = g1p[..., 1 : 1 + h, 1 : 1 + w]
    b_b = g1p[..., 2 : 2 + h, 1 : 1 + w]
    b_l = g2p[..., 1 : 1 + h, 1 : 1 + w]
    b_r = g2p[..., 1 : 1 + h, 2 : 2 + w]

    # G value at the R photosite (top-left of quad)
    r_t = g2p[..., 0:h, 1 : 1 + w]
    r_b = g2p[..., 1 : 1 + h, 1 : 1 + w]
    r_l = g1p[..., 1 : 1 + h, 0:w]
    r_r = g1p[..., 1 : 1 + h, 1 : 1 + w]

    if not use_bilinear_weighting:
        r = (r_t + r_b + r_l + r_r) * 0.25
        b = (b_t + b_b + b_l + b_r) * 0.25
    else:
        r = simple_delta_mix_bilinear(r_t, r_b, r_l, r_r)
        b = simple_delta_mix_bilinear(b_t, b_b, b_l, b_r)

    return rgbg_to_bayer(r, g1, b, g2)


def _phase_upsample(plane: Array, position: BayerPatternPosition) -> Array:
    """Upsample a quarter-res plane to full res with the 4 phase kernels."""
    k_tl, k_tr, k_bl, k_br = get_rgbg_kernel(position)
    return rgbg_to_bayer(
        filter2d(plane, k_tl),
        filter2d(plane, k_tr),
        filter2d(plane, k_br),
        filter2d(plane, k_bl),
    )


def resample_channel(
    subpixel: Array,
    g_at_subpixel: Array,
    g_hf_pass: Array,
    position: BayerPatternPosition,
) -> Array:
    """Full-res channel from quarter-res samples via G-difference upsampling
    (edge_assisted_gaussian.py:126-143).

    The reference computes ``up(sub - g) + (up(g) + hf)`` — but ``up`` (the
    photosite-phase convolution) is linear, so this is algebraically
    ``up(sub) + hf``: the green channel cancels exactly. Computed in the reduced
    form (half the convolutions); difference vs the reference is one float32
    rounding order (~1e-7), far inside every fidelity gate."""
    del g_at_subpixel  # cancels by linearity
    return _phase_upsample(subpixel, position) + g_hf_pass


def resample_rb(r: Array, b: Array, g_upscaled: Array) -> Tuple[Array, Array]:
    """Resample R and B to full resolution (edge_assisted_gaussian.py:145-159)."""
    g_hf_cut = g_upscaled - gaussian_blur3(g_upscaled)
    g_r, _g1, g_b, _g2 = bayer_to_rgbg(g_upscaled)
    return (
        resample_channel(r, g_r, g_hf_cut, BayerPatternPosition.TOP_LEFT),
        resample_channel(b, g_b, g_hf_cut, BayerPatternPosition.BOTTOM_RIGHT),
    )


def resample_r(r: Array, g_upscaled: Array) -> Array:
    """Resample R alone (edge_assisted_gaussian.py:172-186)."""
    g_hf_cut = g_upscaled - gaussian_blur3(g_upscaled)
    g_r = bayer_to_rgbg(g_upscaled)[0]
    return resample_channel(r, g_r, g_hf_cut, BayerPatternPosition.TOP_LEFT)


def resample_b(b: Array, g_upscaled: Array) -> Array:
    """Resample B alone (edge_assisted_gaussian.py:161-170)."""
    g_hf_cut = g_upscaled - gaussian_blur3(g_upscaled)
    g_b = bayer_to_rgbg(g_upscaled)[2]
    return resample_channel(b, g_b, g_hf_cut, BayerPatternPosition.BOTTOM_RIGHT)


def demosaic_eag_channels(frame: RawFrame):
    """Fast demosaic returning separate (r, g, b) channels (the TPU hot path)."""
    r, g1, b, g2 = bayer_to_rgbg(frame.bayer)
    wb = frame.wb_reciprocal()

    g_up = resample_g_to_full_resolution(g1, g2) * wb[1]
    r_up, b_up = resample_rb(r * wb[0], b * wb[2], g_up)
    return r_up, g_up, b_up


def demosaic_eag(frame: RawFrame) -> DevelopedImage:
    """Fast demosaic entry point (edge_assisted_gaussian.py:188-201)."""
    r_up, g_up, b_up = demosaic_eag_channels(frame)
    wb = frame.wb_reciprocal()

    rgb = jnp.stack([r_up, g_up, b_up], axis=-1)
    return DevelopedImage(
        image=rgb.astype(jnp.float32),
        wb_coeff=wb,
        cam_mat=frame.cam_mat,
        cam_white=frame.cam_white,
        ev=frame.ev,
        wb_applied=True,
        wb_normalized=False,
    )
