"""Whole-AHD megakernel dispatch: banded Pallas interior + XLA border strips.

Reference behavior: /root/reference/debayer/ahd.py:14-170 — same output contract as
demosaic_ahd_channels. The interior comes from ops.pallas_kernels.ahd_mega_pallas
(every demosaic stage in VMEM, one HBM read + write per pixel); pixels within
2*margin_for(stages) of the global image border depend on border rules applied to
*intermediates* (reflect101 convs, symmetric LAB, replicate medians), which a
halo-fed band kernel cannot reproduce, so those strips are recomputed with the exact
XLA path on narrow crops (~2.5% extra pixels at 24MP) and stitched over.

Result: bit-identical to demosaic_ahd_channels everywhere except interior
homogeneity picks that land on exact adaptive-epsilon boundaries (Mosaic's
exp(log/3) cbrt vs XLA cbrt, ~2 ulp) — both picks equally valid; see
DIVERGENCES.md.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..colorimetry.transforms import cam_to_lin_srgb_matrix
from ..core.bayer import bayer_to_rgbg
from ..core.frame import RawFrame
from ..ops.polyphase import quad_to_bayer
from .ahd import demosaic_ahd_channels
from .ahd_band import margin_for

Array = jnp.ndarray


_CHUNK_TARGET_W2 = 1024  # plane cols per kernel launch: small wp => tall VMEM tiles
_CHUNK_OVERLAP = 8       # >= margin_for(stages<=2); discarded after compute
# Row-chunk target: 0 disables row chunking. Measured (BASELINE.md ledger): short
# launches whose bands form a ~3-step grid ran up to ~2x faster per pixel at burst
# shapes; set to ~512 to split tall planes into grid-3 pieces if that regime
# verifies at 24MP scale.
_CHUNK_TARGET_H2 = 0


def _row_chunked(planes, mat, wb, is_hdr, stages: int, interpret: bool,
                 tail, target_h2: int):
    """Split plane rows into overlapping pieces and stitch (row twin of
    _mega_chunked's column logic); tile height per piece targets a 3-step grid."""
    from ..ops.pallas_kernels import ahd_mega_pallas

    h2 = planes[0].shape[-2]
    n_chunks = max(1, round(h2 / target_h2))
    if n_chunks == 1:
        return ahd_mega_pallas(
            planes, mat, wb, is_hdr, postprocess_stages=stages,
            interpret=interpret, tail=tail,
        )
    bounds = [round(i * h2 / n_chunks) for i in range(n_chunks + 1)]
    pieces = None
    for r0, r1 in zip(bounds[:-1], bounds[1:]):
        lo = max(r0 - _CHUNK_OVERLAP, 0)
        hi = min(r1 + _CHUNK_OVERLAP, h2)
        sub = tuple(p[..., lo:hi, :] for p in planes)
        tile = -(-(hi - lo) // 3)
        tile = tile + (-tile) % 8  # next multiple of 8 -> 3 bands per piece
        out = ahd_mega_pallas(
            sub, mat, wb, is_hdr, postprocess_stages=stages,
            tile_h=tile, interpret=interpret, tail=tail,
        )
        if out is None:
            return None
        keep = [o[..., r0 - lo : r0 - lo + (r1 - r0), :] for o in out]
        pieces = keep if pieces is None else [
            jnp.concatenate([a, b], axis=-2) for a, b in zip(pieces, keep)
        ]
    return pieces


def _mega_chunked(planes, mat, wb, is_hdr, stages: int, interpret: bool,
                  tail: tuple | None = None):
    """Run the megakernel over vertical column chunks and reassemble.

    VMEM limits band height as ~1/width: at 24 MP full-width bands are 24 rows
    (67% halo-recompute overhead), while ~1024-col chunks run 80+ row bands
    (<20% overhead) for ~1.6% column-overlap cost. Chunks overlap by
    _CHUNK_OVERLAP plane cols; the contaminated overlap is discarded, so chunk
    interiors equal the unchunked kernel's output exactly (same formulas on the
    same real halo data).
    """
    from ..ops.pallas_kernels import ahd_mega_pallas

    def launch(sub):
        if _CHUNK_TARGET_H2:
            return _row_chunked(
                sub, mat, wb, is_hdr, stages, interpret, tail,
                _CHUNK_TARGET_H2,
            )
        return ahd_mega_pallas(
            sub, mat, wb, is_hdr, postprocess_stages=stages,
            interpret=interpret, tail=tail,
        )

    w2 = planes[0].shape[-1]
    n_chunks = max(1, round(w2 / _CHUNK_TARGET_W2))
    if n_chunks == 1:
        return launch(planes)

    bounds = [round(i * w2 / n_chunks) for i in range(n_chunks + 1)]
    pieces = None
    for c0, c1 in zip(bounds[:-1], bounds[1:]):
        lo = max(c0 - _CHUNK_OVERLAP, 0)
        hi = min(c1 + _CHUNK_OVERLAP, w2)
        sub = tuple(p[..., lo:hi] for p in planes)
        out = launch(sub)
        if out is None:
            return None
        keep = [o[..., c0 - lo : c0 - lo + (c1 - c0)] for o in out]
        pieces = keep if pieces is None else [
            jnp.concatenate([a, b], axis=-1) for a, b in zip(pieces, keep)
        ]
    return pieces


def _stitch_edges(c, t, bo, le, ri, f: int, s: int, h: int, w: int):
    """Overwrite the f-wide global-border frame of ``c`` with the XLA strips.

    dynamic_update_slice instead of the former two-concatenate topology: the
    concats rewrote the full channel twice (~1.7 ms/3ch at 24 MP vs 0.63 —
    benchmarks/border_probe.py) and forced the phase-interleave producer to
    materialize separately. Values are identical: row strips first, then the
    full-height column strips override the corners, exactly as the concat
    version's precedence did."""
    c = jax.lax.dynamic_update_slice(c, t[:f, :], (0, 0))
    c = jax.lax.dynamic_update_slice(c, bo[s - f :, :], (h - f, 0))
    c = jax.lax.dynamic_update_slice(c, le[:, :f], (0, 0))
    c = jax.lax.dynamic_update_slice(c, ri[:, s - f :], (0, w - f))
    return c


def demosaic_ahd_mega(
    frame: RawFrame, postprocess_stages: int = 1, interpret: bool = False
):
    """AHD demosaic via the Pallas megakernel; falls back to the XLA path when the
    image is too small for the border strips or no VMEM tiling divides H/2."""
    from ..ops.pallas_kernels import ahd_mega_pallas

    h, w = frame.bayer.shape[-2], frame.bayer.shape[-1]
    f = 2 * margin_for(postprocess_stages)  # full-res border width to restitch
    s = 2 * f + 8  # strip size: f pasted rows + f reach + CFA/tile slack
    if frame.bayer.ndim != 2 or h < 4 * s or w < 4 * s:
        return demosaic_ahd_channels(frame, postprocess_stages, use_pallas=True)

    r0, g1, b0, g2 = bayer_to_rgbg(frame.bayer)
    mat = cam_to_lin_srgb_matrix(frame.cam_mat, frame.cam_white)
    out = _mega_chunked(
        (r0, g1, g2, b0), mat, frame.wb_reciprocal(), frame.is_hdr,
        postprocess_stages, interpret,
    )
    if out is None:
        return demosaic_ahd_channels(frame, postprocess_stages, use_pallas=True)

    chans = [
        quad_to_bayer(((out[k], out[k + 1]), (out[k + 2], out[k + 3])))
        for k in (0, 4, 8)
    ]

    def crop(rows, cols):
        sub = frame.replace(bayer=frame.bayer[rows, cols])
        return demosaic_ahd_channels(sub, postprocess_stages)

    top = crop(slice(0, s), slice(None))
    bot = crop(slice(h - s, h), slice(None))
    left = crop(slice(None), slice(0, s))
    right = crop(slice(None), slice(w - s, w))

    stitched = [
        _stitch_edges(c, t, bo, le, ri, f, s, h, w)
        for c, t, bo, le, ri in zip(chans, top, bot, left, right)
    ]
    return stitched[0], stitched[1], stitched[2]


def develop_channels_mega(
    frame: RawFrame, postprocess_stages: int, clip_highlights: bool,
    gamma_encode: bool, interpret: bool = False,
):
    """Full Best develop (demosaic + clip + cam->lin-sRGB + gamma) with the color
    tail fused INTO the megakernel — the 12 phase planes leave the kernel already
    sRGB-encoded, saving the separate full-resolution tail passes.

    Border strips run the exact XLA path (demosaic + identical channelwise tail).
    Returns stitched (r, g, b) sRGB channels, or None when the megakernel can't
    run (caller falls back to the unfused path). Tail values differ from the XLA
    path only by Mosaic's exp(log·p) pow (~2 ulp; no decisions downstream).

    A fused (H, W, 3) producer variant (stack before stitch, 3-D DUS) was
    probed and REJECTED: 17.5-17.7 ms vs 15.6-16.1 ms for this per-channel
    form at 24 MP — C=3 as the minor dim wastes 125/128 lanes in every
    post-stack op (BASELINE.md round-3 ledger)."""
    from ..pipeline.develop import _color_tail_channels

    h, w = frame.bayer.shape[-2], frame.bayer.shape[-1]
    f = 2 * margin_for(postprocess_stages)
    s = 2 * f + 8
    if frame.bayer.ndim != 2 or h < 4 * s or w < 4 * s:
        return None

    r0, g1, b0, g2 = bayer_to_rgbg(frame.bayer)
    mat = cam_to_lin_srgb_matrix(frame.cam_mat, frame.cam_white)
    out = _mega_chunked(
        (r0, g1, g2, b0), mat, frame.wb_reciprocal(), frame.is_hdr,
        postprocess_stages, interpret, tail=(clip_highlights, gamma_encode),
    )
    if out is None:
        return None

    def crop(rows, cols):
        sub = frame.replace(bayer=frame.bayer[rows, cols])
        rr, gg, bb = demosaic_ahd_channels(sub, postprocess_stages)
        return _color_tail_channels(rr, gg, bb, mat, clip_highlights, gamma_encode)

    top = crop(slice(0, s), slice(None))
    bot = crop(slice(h - s, h), slice(None))
    left = crop(slice(None), slice(0, s))
    right = crop(slice(None), slice(w - s, w))

    chans = [
        quad_to_bayer(((out[k], out[k + 1]), (out[k + 2], out[k + 3])))
        for k in (0, 4, 8)
    ]
    stitched = [
        _stitch_edges(c, t, bo, le, ri, f, s, h, w)
        for c, t, bo, le, ri in zip(chans, top, bot, left, right)
    ]
    return stitched[0], stitched[1], stitched[2]
