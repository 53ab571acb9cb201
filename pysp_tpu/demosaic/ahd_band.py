"""Valid-mode (halo-consuming) polyphase AHD — the megakernel's band core.

Reference behavior: /root/reference/debayer/ahd.py:14-170 (see demosaic/ahd.py for
the stage map). This module re-expresses demosaic_ahd_quads (demosaic/ahd_poly.py)
with every full-resolution stencil shift implemented as a wrap-around ``jnp.roll``
of the quarter-res phase planes instead of a border-resolving pad: all intermediates
keep one static (rows, cols) shape, which is exactly what a VMEM-banded Pallas kernel
needs (Mosaic supports rolls/concats but no shape-changing pads mid-kernel).

Rolled-in wrap values are garbage that contaminates at most one plane row/col per
stencil level from each edge; after the full pipeline the contamination depth is

    MARGIN(stages) = 4 + 2 * stages          (plane rows/cols, each side)

so a band with >= MARGIN rows of halo on each side yields a bit-exact interior:
identical formulas and accumulation orders to demosaic_ahd_quads, hence (with
``cbrt_fn=jnp.cbrt``) bit-identical to demosaic_ahd_channels away from the global
image border (tests/test_polyphase.py::test_ahd_band_valid_interior).

Inside Mosaic, ``cbrt_fn`` must be exp(log(x)/3) (no cbrt primitive, ~2 ulp off),
which can flip homogeneity picks on exact adaptive-epsilon boundaries — the same
documented divergence class as ops.pallas_kernels.ahd_decision_pallas.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from ..colorimetry.transforms import rgb_to_lab_channels
from ..ops.phase_kernels import BayerPatternPosition, get_rgbg_kernel
from ..ops.polyphase import Quad
from ..ops.stencil import GAUSSIAN3_SIGMA1
from .ahd import _H

Array = jnp.ndarray

# Decision filter: unnormalized box SUM (see ops.stencil.box_sum3 — exact
# integer compare, the 1/9 was monotone)
_BOX3 = np.ones((3, 3), np.float32)


def margin_for(postprocess_stages: int) -> int:
    """Garbage contamination depth (plane rows/cols per side) of ahd_band_quads."""
    return 4 + 2 * max(int(postprocess_stages), 0)


def _shift(p: Array, oy: int, ox: int) -> Array:
    """plane[i + oy, j + ox] with wrap-around (garbage enters one edge per axis)."""
    if oy:
        p = jnp.roll(p, -oy, axis=-2)
    if ox:
        p = jnp.roll(p, -ox, axis=-1)
    return p


def _qshift(quad: Quad, py: int, px: int, dy: int, dx: int) -> Array:
    """Full-res field at (2i+py+dy, 2j+px+dx) as a plane for phase (py, px) —
    shift_fullres (ops/polyphase.py) with rolls in place of border pads."""
    sy, sx = py + dy, px + dx
    qy, qx = sy & 1, sx & 1
    return _shift(quad[qy][qx], (sy - qy) // 2, (sx - qx) // 2)


def _qmap(fn, *quads: Quad) -> Quad:
    return (
        (fn(*(q[0][0] for q in quads)), fn(*(q[0][1] for q in quads))),
        (fn(*(q[1][0] for q in quads)), fn(*(q[1][1] for q in quads))),
    )


def _conv3x3_quad(quad: Quad, kernel: np.ndarray) -> Quad:
    """Full-res 3x3 cross-correlation (== conv3x3_poly, rolls for borders)."""
    k = np.asarray(kernel, np.float64)
    out = [[None, None], [None, None]]
    for py in (0, 1):
        for px in (0, 1):
            acc = None
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    c = float(k[dy + 1, dx + 1])
                    if c == 0.0:
                        continue
                    term = _qshift(quad, py, px, dy, dx)
                    if c != 1.0:
                        term = term * jnp.float32(c)
                    acc = term if acc is None else acc + term
            out[py][px] = acc
    return ((out[0][0], out[0][1]), (out[1][0], out[1][1]))


def _conv3x3_plane(plane: Array, kernel: np.ndarray) -> Array:
    """Plane-level 3x3 cross-correlation (== ops.stencil filter2d accumulation)."""
    k = np.asarray(kernel, np.float64)
    acc = None
    for dy in range(3):
        for dx in range(3):
            c = float(k[dy, dx])
            if c == 0.0:
                continue
            term = _shift(plane, dy - 1, dx - 1) * jnp.float32(c)
            acc = term if acc is None else acc + term
    return acc


def _phase_upsample_quad(plane: Array, position: BayerPatternPosition) -> Quad:
    k_tl, k_tr, k_bl, k_br = get_rgbg_kernel(position)
    return (
        (_conv3x3_plane(plane, k_tl), _conv3x3_plane(plane, k_tr)),
        (_conv3x3_plane(plane, k_bl), _conv3x3_plane(plane, k_br)),
    )


def _median5_quad(quad: Quad) -> Quad:
    """Full-res 5x5 median in phase space via shared sorted columns.

    For output phase (py, px) at plane (i, j) the window spans full-res columns
    2j+px-2 .. 2j+px+2; each full-res column-of-5 sorts once per (row-parity,
    col-parity) and is shared by every window crossing it, adjacent sorted-column
    pairs merge into 10-sorted fields shared by both px outputs, and the final
    rank-12-of-25 uses the two-sorted-list selection identity (see
    ops.stencil.median5_from_padded). ~230 min/max ops per quad vs 808 for four
    direct pruned networks; medians are selections, so values are bit-identical.
    Roll-contamination depth is unchanged: 1 plane row/col per side.
    """
    from ..ops.stencil import median25_select, merge_sorted, sort5, _Q_RANKS

    out = [[None, None], [None, None]]
    for py in (0, 1):
        # sorted column fields: s[cx][k](i,j) = k-th smallest of full-res column
        # 2j+cx, rows 2i+py-2 .. 2i+py+2
        s = {
            cx: sort5([_qshift(quad, py, cx, dy, 0) for dy in (-2, -1, 0, 1, 2)])
            for cx in (0, 1)
        }
        # pairs(j): sorted 10 of full-res columns {2j, 2j+1}
        pairs = merge_sorted(s[0], s[1])
        pairs_m1 = [_shift(p, 0, -1) for p in pairs]  # columns {2j-2, 2j-1}
        # q(j): sorted 20 of columns 2j-2 .. 2j+1, ranks 7..12 only
        q = merge_sorted(pairs_m1, pairs, ranks=_Q_RANKS)

        # px=0 window: columns 2j-2..2j+2 = q(j) + column 2j+2 (= s[0] at j+1)
        out[py][0] = median25_select(q, [_shift(v, 0, 1) for v in s[0]])
        # px=1 window: columns 2j-1..2j+3 = q(j+1) + column 2j-1 (= s[1] at j-1)
        q_p1 = {r: _shift(v, 0, 1) for r, v in q.items()}
        out[py][1] = median25_select(q_p1, [_shift(v, 0, -1) for v in s[1]])
    return ((out[0][0], out[0][1]), (out[1][0], out[1][1]))


def _homogeneity_quad(
    r_q: Quad, g_q: Quad, b_q: Quad,
    mat: Array, wb: Array, is_hdr: bool, is_vertical: bool, cbrt_fn,
) -> Quad:
    """ahd._build_homogeneity_map in phase space (ahd_poly._homogeneity_quad)."""

    def to_lab(r, g, b):
        rr, gg, bb = r * wb[0], g * wb[1], b * wb[2]
        ir = mat[0, 0] * rr + mat[0, 1] * gg + mat[0, 2] * bb
        ig = mat[1, 0] * rr + mat[1, 1] * gg + mat[1, 2] * bb
        ib = mat[2, 0] * rr + mat[2, 1] * gg + mat[2, 2] * bb
        if is_hdr:
            luma = 0.2126 * ir + 0.7152 * ig + 0.0722 * ib
            ir = ir / (1.0 + ir)
            ig = ig / (1.0 + ig)
            ib = ib / (1.0 + ib)
            lum, a, bb2 = rgb_to_lab_channels(ir, ig, ib, cbrt_fn=cbrt_fn)
            lum = luma
        else:
            lum, a, bb2 = rgb_to_lab_channels(ir, ig, ib, cbrt_fn=cbrt_fn)
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
                return _qshift(q, py, px, dy, dx)

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


def ahd_band_quads(
    planes: Tuple[Array, Array, Array, Array],
    mat: Array,
    wb: Array,
    is_hdr: bool,
    postprocess_stages: int = 1,
    cbrt_fn=jnp.cbrt,
) -> Tuple[Quad, Quad, Quad]:
    """AHD on one band of CFA phase planes (r, g1, g2, b at phases 00/01/10/11).

    All four planes share one (rows, cols) shape, as do all outputs; only the
    region >= margin_for(postprocess_stages) plane rows/cols from every edge is
    valid. ``mat``/``wb`` are the cam->lin-sRGB matrix and reciprocal WB gains
    (host-precomputed; inside Pallas they come from SMEM refs).
    """
    r0, g1_0, g2_0, b0 = planes
    q: Quad = (
        (r0 * wb[0], g1_0 * wb[1]),
        (g2_0 * wb[1], b0 * wb[2]),
    )

    h = [float(v) for v in _H]

    def green_candidates(py, px, vertical):
        acc = None
        for k in range(5):
            d = k - 2
            term = (_qshift(q, py, px, d, 0) if vertical
                    else _qshift(q, py, px, 0, d)) * jnp.float32(h[k])
            acc = term if acc is None else acc + term
        return acc

    g_h: Quad = (
        (green_candidates(0, 0, False), q[0][1]),
        (q[1][0], green_candidates(1, 1, False)),
    )
    g_v: Quad = (
        (green_candidates(0, 0, True), q[0][1]),
        (q[1][0], green_candidates(1, 1, True)),
    )

    sub = lambda a, bq: a - bq  # noqa: E731
    add = lambda a, bq: a + bq  # noqa: E731

    delta_gh_hf = _qmap(sub, g_h, _conv3x3_quad(g_h, GAUSSIAN3_SIGMA1))
    delta_gv_hf = _qmap(sub, g_v, _conv3x3_quad(g_v, GAUSSIAN3_SIGMA1))

    up_r = _phase_upsample_quad(q[0][0], BayerPatternPosition.TOP_LEFT)
    up_b = _phase_upsample_quad(q[1][1], BayerPatternPosition.BOTTOM_RIGHT)
    r_h = _qmap(add, up_r, delta_gh_hf)
    r_v = _qmap(add, up_r, delta_gv_hf)
    b_h = _qmap(add, up_b, delta_gh_hf)
    b_v = _qmap(add, up_b, delta_gv_hf)

    map_h = _conv3x3_quad(
        _homogeneity_quad(r_h, g_h, b_h, mat, wb, is_hdr, False, cbrt_fn),
        _BOX3,
    )
    map_v = _conv3x3_quad(
        _homogeneity_quad(r_v, g_v, b_v, mat, wb, is_hdr, True, cbrt_fn),
        _BOX3,
    )

    def select(mh, mv, xh, xv):
        pick = (mh < mv).astype(jnp.float32)
        return xh * pick + xv * (1.0 - pick)

    out_r = _qmap(select, map_h, map_v, r_h, r_v)
    out_g = _qmap(select, map_h, map_v, g_h, g_v)
    out_b = _qmap(select, map_h, map_v, b_h, b_v)

    for _ in range(max(int(postprocess_stages), 0)):
        m_rg = _median5_quad(_qmap(sub, out_r, out_g))
        new_r = _qmap(add, m_rg, out_g)
        m_bg = _median5_quad(_qmap(sub, out_b, out_g))
        new_b = _qmap(add, m_bg, out_g)
        m_gr = _median5_quad(_qmap(sub, out_g, new_r))
        m_gb = _median5_quad(_qmap(sub, out_g, new_b))
        out_g = _qmap(
            lambda a, bq, c, d: (a + bq + c + d) * 0.5, m_gr, m_gb, new_r, new_b
        )
        out_r, out_b = new_r, new_b

    return out_r, out_g, out_b


def color_tail_quads(
    r_q: Quad, g_q: Quad, b_q: Quad, mat, clip_highlights: bool,
    gamma_encode: bool, pow_fn=jnp.power,
) -> Tuple[Quad, Quad, Quad]:
    """Develop's color tail (clip -> cam->lin-sRGB matrix -> sRGB gamma) applied
    per phase plane — same formulas and op order as pipeline.develop's channelwise
    tail, so fusing it into the megernel changes values only through ``pow_fn``
    (Mosaic uses exp(log·p), ~2 ulp vs jnp.power; pure value noise, no decisions
    downstream)."""

    def gamma(x):
        x = jnp.clip(x, 0.0, 1.0)
        return jnp.where(
            x <= 0.0031308,
            x * 12.92,
            1.055 * pow_fn(jnp.maximum(x, 1e-12), jnp.float32(1.0 / 2.4)) - 0.055,
        )

    out = [[None, None], [None, None]], [[None, None], [None, None]], [[None, None], [None, None]]
    for py in (0, 1):
        for px in (0, 1):
            r, g, b = r_q[py][px], g_q[py][px], b_q[py][px]
            if clip_highlights:
                r = jnp.clip(r, 0.0, 1.0)
                g = jnp.clip(g, 0.0, 1.0)
                b = jnp.clip(b, 0.0, 1.0)
            ir = mat[0, 0] * r + mat[0, 1] * g + mat[0, 2] * b
            ig = mat[1, 0] * r + mat[1, 1] * g + mat[1, 2] * b
            ib = mat[2, 0] * r + mat[2, 1] * g + mat[2, 2] * b
            if gamma_encode:
                ir, ig, ib = gamma(ir), gamma(ig), gamma(ib)
            out[0][py][px] = ir
            out[1][py][px] = ig
            out[2][py][px] = ib
    return tuple(
        ((c[0][0], c[0][1]), (c[1][0], c[1][1])) for c in out
    )


def _delta_mix(top: Array, bottom: Array, left: Array, right: Array) -> Array:
    """eag.simple_delta_mix_bilinear — identical formula/op order."""
    delta_y = jnp.abs(top - bottom)
    delta_x = jnp.abs(left - right)
    sum_delta = delta_y + delta_x
    avg_x = (left + right) * 0.5
    avg_y = (top + bottom) * 0.5
    strength_y = jnp.where(
        sum_delta != 0, delta_y / jnp.where(sum_delta != 0, sum_delta, 1.0), 0.5
    )
    strength_x = 1.0 - strength_y
    return avg_y * strength_x + avg_x * strength_y
