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


def develop_channels_draft(
    frame: RawFrame, clip_highlights: bool, gamma_encode: bool
):
    """Fused Draft develop: polyphase upsample + color tail at quarter res.

    The shipping Draft path materializes three half-upsampled intermediates
    (rows pass, cols pass) and runs the color tail at full resolution. Here the
    four 2x-bilinear output phases are computed as 4-tap stencils at QUARTER
    resolution, the (pointwise) color tail runs there, and the full-res image is
    assembled once per channel — same taps, one association-order difference
    (~1 ulp; measured 141 dB vs the separable path) and 17% faster at 24 MP on
    v5e (3.51 -> 3.02 ms). Returns color-tailed (r, g, b) full-res channels.
    """
    from ..colorimetry.transforms import cam_to_lin_srgb_matrix
    from ..ops.polyphase import quad_to_bayer
    from ..ops.stencil import pad_replicate
    from ..pipeline.develop import _color_tail_channels

    r, g1, b, g2 = bayer_to_rgbg(frame.bayer)
    wb = frame.wb_reciprocal()
    g = (g1 + g2) * 0.5 * wb[1]
    rp = pad_reflect(r, (0, 1, 0, 1))
    r_c = (0.75 * rp[:-1, :-1] + 0.25 * rp[1:, 1:]) * wb[0]
    bp = pad_reflect(b, (1, 0, 1, 0))
    b_c = (0.75 * bp[1:, 1:] + 0.25 * bp[:-1, :-1]) * wb[2]

    def up_phases(p):
        pp = pad_replicate(p, 1)
        c = pp[1:-1, 1:-1]
        up_ = pp[:-2, 1:-1]
        dn = pp[2:, 1:-1]
        lf = pp[1:-1, :-2]
        rt = pp[1:-1, 2:]
        ul = pp[:-2, :-2]
        ur = pp[:-2, 2:]
        dl = pp[2:, :-2]
        dr = pp[2:, 2:]
        p00 = 0.5625 * c + 0.1875 * up_ + 0.1875 * lf + 0.0625 * ul
        p01 = 0.5625 * c + 0.1875 * up_ + 0.1875 * rt + 0.0625 * ur
        p10 = 0.5625 * c + 0.1875 * dn + 0.1875 * lf + 0.0625 * dl
        p11 = 0.5625 * c + 0.1875 * dn + 0.1875 * rt + 0.0625 * dr
        return ((p00, p01), (p10, p11))

    rq, gq, bq = up_phases(r_c), up_phases(g), up_phases(b_c)
    mat = cam_to_lin_srgb_matrix(frame.cam_mat, frame.cam_white)

    tailed = {0: [[None, None], [None, None]],
              1: [[None, None], [None, None]],
              2: [[None, None], [None, None]]}
    for py in (0, 1):
        for px in (0, 1):
            ir, ig, ib = _color_tail_channels(
                rq[py][px], gq[py][px], bq[py][px], mat,
                clip_highlights, gamma_encode,
            )
            for k, v in ((0, ir), (1, ig), (2, ib)):
                tailed[k][py][px] = v
    return tuple(
        quad_to_bayer((tuple(tailed[k][0]), tuple(tailed[k][1]))) for k in range(3)
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
