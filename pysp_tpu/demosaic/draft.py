"""Draft demosaic: quarter-res resolve + bilinear 2x upsample.

Reference behavior: /root/reference/debayer/fast_resize.py:7-44. G = mean of both green
photosites; R/B are re-centered at pixel centers by blending 25% of the diagonal
neighbor; the quarter-res RGB is then bilinearly resized to sensor resolution
(cv2.resize INTER_LINEAR semantics).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.bayer import bayer_to_rgbg
from ..core.frame import DevelopedImage, RawFrame
from ..ops.stencil import pad_reflect, upsample2x_bilinear_cv2

Array = jnp.ndarray


def demosaic_draft_channels(frame: RawFrame):
    """Draft demosaic returning separate (r, g, b) channels."""
    r, g1, b, g2 = bayer_to_rgbg(frame.bayer)
    wb = frame.wb_reciprocal()

    g = (g1 + g2) * 0.5 * wb[1]

    # R sits at the quad's top-left: nudge toward the bottom-right diagonal
    # (fast_resize.py:28-35; reflect border).
    rp = pad_reflect(r, (0, 1, 0, 1))
    r_center = 0.75 * rp[:-1, :-1] + 0.25 * rp[1:, 1:]

    # B sits at the bottom-right: nudge toward the top-left diagonal.
    bp = pad_reflect(b, (1, 0, 1, 0))
    b_center = 0.75 * bp[1:, 1:] + 0.25 * bp[:-1, :-1]

    return (
        upsample2x_bilinear_cv2(r_center * wb[0]),
        upsample2x_bilinear_cv2(g),
        upsample2x_bilinear_cv2(b_center * wb[2]),
    )


def demosaic_draft(frame: RawFrame) -> DevelopedImage:
    r, g, b = demosaic_draft_channels(frame)
    wb = frame.wb_reciprocal()
    rgb = jnp.stack([r, g, b], axis=-1)

    return DevelopedImage(
        image=rgb.astype(jnp.float32),
        wb_coeff=wb,
        cam_mat=frame.cam_mat,
        cam_white=frame.cam_white,
        ev=frame.ev,
        wb_applied=True,
        wb_normalized=False,
    )
