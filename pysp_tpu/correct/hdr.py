"""HDR exposure stacking, Bayer-domain and RGB-domain.

Reference behavior: /root/reference/raw_hdr.py — EV-normalize each frame
(``2^(ev - target)``), weight by the tent curve ``0.5 - |x - 0.5|`` times a noise bias
``1.6^(-0.1*|ev_offset * wb_plane_weight|)`` (WB-aware per-plane weighting in the raw
variant, :127-137), weighted-average, and fall back to the brightest frame where total
weight is zero (:143-148).

TPU-native shape: inputs are batched pytrees (leading frame axis N) so the whole fuse is
one fused reduction — no per-frame Python loop, vmappable and shardable over the batch.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from ..colorimetry.transforms import cam_to_lin_srgb
from ..core.bayer import rgbg_to_bayer
from ..core.frame import DevelopedImage, RawFrame

Array = jnp.ndarray


def fuse_exposures_to_raw(
    frames: RawFrame, target_ev: Optional[float] = None
) -> Tuple[RawFrame, Array]:
    """Fuse a batched RawFrame (leading axis N on every leaf) into one HDR raw.

    Returns (HDR frame, per-pixel contribution counts). The output keeps the first
    frame's color metadata, ``lim_sat = max(ev_offsets)`` and the HDR flag set
    (raw_hdr.py:85-158).
    """
    evs = frames.ev  # (N,)
    if target_ev is None:
        target = jnp.mean(evs)
    else:
        target = jnp.asarray(target_ev, jnp.float32)

    ev_offsets = 2.0 ** (evs - target)  # (N,)

    wb = 1.0 / frames.wb_neutral[0]  # first frame's reciprocal multipliers (3,)
    h2, w2 = frames.bayer.shape[-2] // 2, frames.bayer.shape[-1] // 2
    ones = jnp.ones((h2, w2), jnp.float32)
    bayer_noise_weight = rgbg_to_bayer(
        ones * wb[0], ones * wb[1], ones * wb[2], ones * wb[1]
    )

    off = ev_offsets[:, None, None]
    bias = 1.6 ** (-0.1 * jnp.abs(off * bayer_noise_weight[None]))
    weights = (0.5 - jnp.abs(frames.bayer - 0.5)) * bias

    sum_weight = jnp.sum(weights, axis=0)
    sum_pixel = jnp.sum(frames.bayer * weights * off, axis=0)

    idx_max = jnp.argmax(ev_offsets)
    max_exposure = (
        jnp.take(frames.bayer, idx_max, axis=0) * jnp.max(ev_offsets)
    )

    fused = jnp.where(sum_weight == 0, max_exposure, sum_pixel / sum_weight)
    debug_counts = jnp.sum((weights > 0).astype(jnp.int32), axis=0)

    first = lambda leaf: jnp.take(leaf, 0, axis=0)  # noqa: E731
    hdr = RawFrame(
        bayer=fused.astype(jnp.float32),
        cam_mat=first(frames.cam_mat),
        cam_white=first(frames.cam_white),
        wb_neutral=first(frames.wb_neutral),
        ev=target,
        lim_sat=jnp.max(ev_offsets),
        is_hdr=True,
        source_pattern=frames.source_pattern,
    )
    return hdr, debug_counts


def fuse_exposures_from_debayer(
    images: DevelopedImage, target_ev: Optional[float] = None
) -> Tuple[Array, Array]:
    """Fuse batched demosaiced images to linear sRGB HDR (raw_hdr.py:7-83).

    ``images`` carries a leading batch axis on every leaf; WB must be applied (the
    standard demosaic output state). Weights are computed on the WB-undone pixels, the
    accumulation on the WB-applied pixels, exactly like the reference's
    wb_undo/wb_apply dance (:54-65).
    """
    evs = images.ev
    if target_ev is None:
        target = jnp.mean(evs)
    else:
        target = jnp.asarray(target_ev, jnp.float32)

    ev_offsets = 2.0 ** (evs - target)  # (N,)
    off = ev_offsets[:, None, None, None]

    undone = images.image / images.wb_coeff[:, None, None, :3]
    weights = 0.5 - jnp.abs(undone - 0.5)
    bias = 1.6 ** (-0.1 * off)
    weights = weights * bias

    sum_weight = jnp.sum(weights, axis=0)
    sum_pixel = jnp.sum(images.image * weights * off, axis=0)

    idx_max = jnp.argmax(ev_offsets)
    max_exposure = jnp.take(images.image, idx_max, axis=0) * jnp.max(ev_offsets)

    fused = jnp.where(sum_weight == 0, max_exposure, sum_pixel / sum_weight)
    debug_counts = jnp.sum((weights > 0).astype(jnp.int32), axis=0)

    lin = cam_to_lin_srgb(
        fused.astype(jnp.float32),
        jnp.take(images.cam_mat, 0, axis=0),
        jnp.take(images.cam_white, 0, axis=0),
        clip_highlights=False,
    )
    return lin, debug_counts
