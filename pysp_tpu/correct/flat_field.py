"""Flat-field (shading) correction + dark/bias frame subtraction.

Reference behavior: /root/reference/raw_correction.py:25-63 — per plane
``chan * mean(flat_chan) / flat_chan``; infinities replaced with the channel max,
negatives clamped to 0, optional clamp at 1. Dark/bias-frame subtraction are stubs in
the reference (:7-23); here they are implemented with the obvious semantics
(black-level-corrected frame subtraction, clamped at 0).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.bayer import bayer_to_planes, planes_to_bayer
from ..core.frame import RawFrame

Array = jnp.ndarray


def flat_frame_correction(
    frame: RawFrame, flat: RawFrame, clamp_high: bool = False
) -> RawFrame:
    """Per-plane flat division; returns a corrected frame (raw_correction.py:25-63)."""
    import jax

    planes = bayer_to_planes(frame.bayer)
    flat_planes = bayer_to_planes(flat.bayer)

    mean_flat = jnp.mean(flat_planes, axis=(-2, -1), keepdims=True)

    def _fast(planes, flat_planes, mean_flat):
        # All-positive flat: the division is finite everywhere, so the
        # inf-replacement machinery (3 extra full passes over the output)
        # vanishes — identical results by construction.
        out = jnp.maximum(planes * mean_flat / flat_planes, 0.0)
        if clamp_high:
            out = jnp.minimum(out, 1.0)
        return out

    def _general(planes, flat_planes, mean_flat):
        out = planes * mean_flat / flat_planes

        finite = jnp.isfinite(out)
        # All-infinite plane (completely black flat): leave the channel untouched
        any_finite = jnp.any(finite, axis=(-2, -1), keepdims=True)

        neg_inf = jnp.where(finite, out, -jnp.inf)
        max_finite = jnp.max(neg_inf, axis=(-2, -1), keepdims=True)

        out = jnp.where(finite, out, max_finite)  # inf -> channel max
        out = jnp.maximum(out, 0.0)
        if clamp_high:
            out = jnp.minimum(out, 1.0)
        return jnp.where(any_finite, out, planes)

    out = jax.lax.cond(
        jnp.all(flat_planes > 0), _fast, _general, planes, flat_planes, mean_flat
    )
    return frame.replace(bayer=planes_to_bayer(out))


def dark_frame_subtraction(frame: RawFrame, dark: RawFrame) -> RawFrame:
    """Remove dark-current noise (reference stub raw_correction.py:7-14; implemented)."""
    return frame.replace(bayer=jnp.maximum(frame.bayer - dark.bayer, 0.0))


def bias_frame_subtraction(frame: RawFrame, bias: RawFrame) -> RawFrame:
    """Remove fixed-pattern read noise (reference stub raw_correction.py:16-23;
    implemented)."""
    return frame.replace(bayer=jnp.maximum(frame.bayer - bias.bayer, 0.0))
