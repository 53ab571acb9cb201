"""AHD demosaic formulated entirely in CFA-phase (polyphase) space.

Megakernel groundwork (ROADMAP.md item 1): every stage of demosaic_ahd_channels —
directional interpolation, phase-kernel reconstruction, CIELAB homogeneity, box-blurred
decision, chroma-median postprocess — expressed on the four quarter-res phase planes,
with full-resolution stencils mapped through ops.polyphase (conv3x3_poly, median5_poly,
shift_fullres). No (H, W) interleave exists anywhere in the computation, which is the
property a VMEM-banded Pallas kernel needs (Mosaic cannot (de)interleave in VMEM).

Bit-identical to demosaic_ahd_channels (tests/test_polyphase.py): identical formulas
and accumulation orders, with the interleave/deinterleave steps removed.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from ..colorimetry.transforms import cam_to_lin_srgb_matrix, rgb_to_lab_channels
from ..core.frame import RawFrame
from ..ops.phase_kernels import BayerPatternPosition, get_rgbg_kernel
from ..ops.polyphase import Quad, conv3x3_poly, median5_poly, shift_fullres
from ..ops.stencil import GAUSSIAN3_SIGMA1, filter2d, pad_reflect
from .ahd import _H

Array = jnp.ndarray

# Decision filter: unnormalized box SUM (see ops.stencil.box_sum3 — exact
# integer compare, the 1/9 was monotone)
_BOX3 = np.ones((3, 3), np.float32)


def _qmap(fn, *quads: Quad) -> Quad:
    return (
        (fn(*(q[0][0] for q in quads)), fn(*(q[0][1] for q in quads))),
        (fn(*(q[1][0] for q in quads)), fn(*(q[1][1] for q in quads))),
    )


def _phase_upsample_quad(plane: Array, position: BayerPatternPosition) -> Quad:
    """eag._phase_upsample without the interleave: kernels land on their phases."""
    k_tl, k_tr, k_bl, k_br = get_rgbg_kernel(position)
    return (
        (filter2d(plane, k_tl), filter2d(plane, k_tr)),
        (filter2d(plane, k_bl), filter2d(plane, k_br)),
    )


def _homogeneity_quad(
    r_q: Quad, g_q: Quad, b_q: Quad, frame: RawFrame, is_vertical: bool
) -> Quad:
    """ahd._build_homogeneity_map in phase space (symmetric full-res LAB border)."""
    wb = frame.wb_reciprocal()
    mat = cam_to_lin_srgb_matrix(frame.cam_mat, frame.cam_white)

    def to_lab(r, g, b):
        rr, gg, bb = r * wb[0], g * wb[1], b * wb[2]
        ir = mat[0, 0] * rr + mat[0, 1] * gg + mat[0, 2] * bb
        ig = mat[1, 0] * rr + mat[1, 1] * gg + mat[1, 2] * bb
        ib = mat[2, 0] * rr + mat[2, 1] * gg + mat[2, 2] * bb
        if frame.is_hdr:
            luma = 0.2126 * ir + 0.7152 * ig + 0.0722 * ib
            ir = ir / (1.0 + ir)
            ig = ig / (1.0 + ig)
            ib = ib / (1.0 + ib)
            lum, a, bb2 = rgb_to_lab_channels(ir, ig, ib)
            lum = luma
        else:
            lum, a, bb2 = rgb_to_lab_channels(ir, ig, ib)
        return lum, a, bb2

    lab = [[to_lab(r_q[py][px], g_q[py][px], b_q[py][px]) for px in (0, 1)]
           for py in (0, 1)]
    lum_q = ((lab[0][0][0], lab[0][1][0]), (lab[1][0][0], lab[1][1][0]))
    a_q = ((lab[0][0][1], lab[0][1][1]), (lab[1][0][1], lab[1][1][1]))
    b_q = ((lab[0][0][2], lab[0][1][2]), (lab[1][0][2], lab[1][1][2]))

    out = [[None, None], [None, None]]
    for py in (0, 1):
        for px in (0, 1):
            def win(q, dy, dx):
                return shift_fullres(q, py, px, dy, dx, "symmetric")

            cl = lum_q[py][px]
            ca = a_q[py][px]
            cb = b_q[py][px]
            if is_vertical:
                n1 = (win(lum_q, -1, 0), win(a_q, -1, 0), win(b_q, -1, 0))
                n2 = (win(lum_q, 1, 0), win(a_q, 1, 0), win(b_q, 1, 0))
            else:
                n1 = (win(lum_q, 0, -1), win(a_q, 0, -1), win(b_q, 0, -1))
                n2 = (win(lum_q, 0, 1), win(a_q, 0, 1), win(b_q, 0, 1))

            eps_l = jnp.maximum(jnp.abs(cl - n1[0]), jnp.abs(cl - n2[0]))
            eps_c2 = jnp.maximum(
                (ca - n1[1]) ** 2 + (cb - n1[2]) ** 2,
                (ca - n2[1]) ** 2 + (cb - n2[2]) ** 2,
            )

            # Center and the two eps-defining neighbors pass their own bounds
            # identically in f32 (see demosaic/homogeneity.py) — constant 3.
            free = (
                {(0, 0), (-1, 0), (1, 0)} if is_vertical
                else {(0, 0), (0, -1), (0, 1)}
            )
            count = jnp.full_like(cl, 3.0)
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    if (dy, dx) in free:
                        continue
                    wl = win(lum_q, dy, dx)
                    wa = win(a_q, dy, dx)
                    wb2 = win(b_q, dy, dx)
                    ok = ((wl - cl) <= eps_l) & (
                        ((wa - ca) ** 2 + (wb2 - cb) ** 2) <= eps_c2
                    )
                    count = count + ok.astype(jnp.float32)
            out[py][px] = count
    return ((out[0][0], out[0][1]), (out[1][0], out[1][1]))


def demosaic_ahd_quads(
    frame_planes: Tuple[Array, Array, Array, Array],
    frame: RawFrame,
    postprocess_stages: int = 1,
) -> Tuple[Quad, Quad, Quad]:
    """AHD on the four CFA planes (r, g1, g2, b at phases 00/01/10/11).

    Returns the demosaiced (r, g, b) channels as phase quads. ``frame`` supplies
    color metadata only (wb/cam matrices, HDR flag); pixel data comes from
    ``frame_planes`` so a banded kernel can feed VMEM blocks.
    """
    r0, g1_0, g2_0, b0 = frame_planes
    wb = frame.wb_reciprocal()

    # Pad planes 1px (BORDER_REFLECT on the planes) + WB — identical to ahd.py:77-80
    r = pad_reflect(r0, 1) * wb[0]
    g1 = pad_reflect(g1_0, 1) * wb[1]
    b = pad_reflect(b0, 1) * wb[2]
    g2 = pad_reflect(g2_0, 1) * wb[1]

    h = [float(v) for v in _H]

    gh_r = (r[1:-1, :-2] * h[0] + g1[1:-1, :-2] * h[1] + r[1:-1, 1:-1] * h[2]
            + g1[1:-1, 1:-1] * h[3] + r[1:-1, 2:] * h[4])
    gv_r = (r[:-2, 1:-1] * h[0] + g2[:-2, 1:-1] * h[1] + r[1:-1, 1:-1] * h[2]
            + g2[1:-1, 1:-1] * h[3] + r[2:, 1:-1] * h[4])
    gh_b = (b[1:-1, :-2] * h[0] + g2[1:-1, 1:-1] * h[1] + b[1:-1, 1:-1] * h[2]
            + g2[1:-1, 2:] * h[3] + b[1:-1, 2:] * h[4])
    gv_b = (b[:-2, 1:-1] * h[0] + g1[1:-1, 1:-1] * h[1] + b[1:-1, 1:-1] * h[2]
            + g1[2:, 1:-1] * h[3] + b[2:, 1:-1] * h[4])

    g1_c = g1[1:-1, 1:-1]
    g2_c = g2[1:-1, 1:-1]
    r_c = r[1:-1, 1:-1]
    b_c = b[1:-1, 1:-1]

    # full-res green fields as quads (rgbg_to_bayer(gh_r, g1, gh_b, g2) layout)
    g_h: Quad = ((gh_r, g1_c), (g2_c, gh_b))
    g_v: Quad = ((gv_r, g1_c), (g2_c, gv_b))

    sub = lambda a, bq: a - bq  # noqa: E731
    add = lambda a, bq: a + bq  # noqa: E731

    delta_gh_hf = _qmap(sub, g_h, conv3x3_poly(g_h, GAUSSIAN3_SIGMA1))
    delta_gv_hf = _qmap(sub, g_v, conv3x3_poly(g_v, GAUSSIAN3_SIGMA1))

    # resample_channel == phase_upsample(subpixel) + hf (linearity identity)
    r_h = _qmap(add, _phase_upsample_quad(r_c, BayerPatternPosition.TOP_LEFT), delta_gh_hf)
    r_v = _qmap(add, _phase_upsample_quad(r_c, BayerPatternPosition.TOP_LEFT), delta_gv_hf)
    b_h = _qmap(add, _phase_upsample_quad(b_c, BayerPatternPosition.BOTTOM_RIGHT), delta_gh_hf)
    b_v = _qmap(add, _phase_upsample_quad(b_c, BayerPatternPosition.BOTTOM_RIGHT), delta_gv_hf)

    map_h = conv3x3_poly(_homogeneity_quad(r_h, g_h, b_h, frame, False), _BOX3)
    map_v = conv3x3_poly(_homogeneity_quad(r_v, g_v, b_v, frame, True), _BOX3)

    def select(mh, mv, xh, xv):
        pick = (mh < mv).astype(jnp.float32)
        return xh * pick + xv * (1.0 - pick)

    out_r = _qmap(select, map_h, map_v, r_h, r_v)
    out_g = _qmap(select, map_h, map_v, g_h, g_v)
    out_b = _qmap(select, map_h, map_v, b_h, b_v)

    for _ in range(max(int(postprocess_stages), 0)):
        m_rg = median5_poly(_qmap(sub, out_r, out_g))
        new_r = _qmap(add, m_rg, out_g)
        m_bg = median5_poly(_qmap(sub, out_b, out_g))
        new_b = _qmap(add, m_bg, out_g)
        m_gr = median5_poly(_qmap(sub, out_g, new_r))
        m_gb = median5_poly(_qmap(sub, out_g, new_b))
        out_g = _qmap(
            lambda a, bq, c, d: (a + bq + c + d) * 0.5, m_gr, m_gb, new_r, new_b
        )
        out_r, out_b = new_r, new_b

    return out_r, out_g, out_b
