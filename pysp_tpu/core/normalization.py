"""Sensor-range normalization (black-level subtract, saturation clip, scale to [0,1]).

Reference behavior: /root/reference/normalization.py:4-25. The reference deswizzles to
planes, normalizes per channel, and re-interleaves; here the whole thing is one fused
elementwise program over the plane stack.
"""
from __future__ import annotations

import jax.numpy as jnp

from .bayer import bayer_to_planes, planes_to_bayer

Array = jnp.ndarray


def bayer_normalize(bayer: Array, chan_black: Array, chan_sat: Array) -> Array:
    """Normalize an RGGB mosaic from sensor counts to [0,1] float32.

    ``chan_black`` / ``chan_sat`` are length-4 per-plane levels in (R, G1, B, G2)
    order, matching the reference's channel indexing (normalization.py:19-23).

    NOTE: like the reference, saturation is interpreted as the clip ceiling applied
    AFTER black subtraction, and the scale divisor — i.e.
    ``clip(x - black, 0, sat) / sat``.
    """
    planes = bayer_to_planes(jnp.asarray(bayer, jnp.float32))
    black = jnp.asarray(chan_black, jnp.float32).reshape(4, 1, 1)
    sat = jnp.asarray(chan_sat, jnp.float32).reshape(4, 1, 1)
    planes = jnp.clip(planes - black, 0.0, sat) / sat
    return planes_to_bayer(planes)
