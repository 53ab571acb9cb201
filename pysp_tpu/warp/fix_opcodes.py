"""DNG OpcodeList1 bad-pixel operators: FixBadPixelsConstant (4), FixBadPixelsList (5).

Additive over the reference (it implements only OpcodeList3 WarpRectilinear and finds
bad pixels statistically, raw_bad_pixel_corr.py); cameras that ship factory defect
lists carry these opcodes in OpcodeList1. Decoding follows DNG 1.4 §Opcode Lists;
healing reuses the masked-diffusion repair (correct/bad_pixels.py), the in-graph
replacement for cv2's Navier-Stokes inpainting.
"""
from __future__ import annotations

import struct
from typing import List, NamedTuple, Optional, Tuple

import numpy as np

from .opcodes import iter_opcodes

OPCODE_FIX_BAD_PIXELS_CONSTANT = 4
OPCODE_FIX_BAD_PIXELS_LIST = 5


class BadPixelsConstant(NamedTuple):
    constant: int
    bayer_phase: int


class BadPixelsList(NamedTuple):
    bayer_phase: int
    points: np.ndarray  # (N, 2) int32 (row, col)
    rects: np.ndarray   # (M, 4) int32 (top, left, bottom, right)


def decode_fix_bad_pixels_constant(data: bytes) -> Optional[BadPixelsConstant]:
    if len(data) != 8:
        return None
    constant, phase = struct.unpack(">2L", data)
    return BadPixelsConstant(constant, phase)


def encode_fix_bad_pixels_constant(op: BadPixelsConstant) -> bytes:
    return struct.pack(">2L", op.constant, op.bayer_phase)


def decode_fix_bad_pixels_list(data: bytes) -> Optional[BadPixelsList]:
    if len(data) < 12:
        return None
    phase, n_points, n_rects = struct.unpack(">3L", data[:12])
    need = 12 + 8 * n_points + 16 * n_rects
    if len(data) != need:
        return None
    pts = np.frombuffer(data[12 : 12 + 8 * n_points], dtype=">u4")
    pts = pts.reshape(-1, 2).astype(np.int32)
    rects = np.frombuffer(data[12 + 8 * n_points :], dtype=">u4")
    rects = rects.reshape(-1, 4).astype(np.int32)
    return BadPixelsList(phase, pts, rects)


def encode_fix_bad_pixels_list(op: BadPixelsList) -> bytes:
    body = struct.pack(">3L", op.bayer_phase, len(op.points), len(op.rects))
    body += np.asarray(op.points, ">u4").tobytes()
    body += np.asarray(op.rects, ">u4").tobytes()
    return body


def bad_pixel_mask_from_opcodes(
    stored: np.ndarray, opcode_block: bytes
) -> Optional[np.ndarray]:
    """(H, W) bool mask of pixels flagged by FixBadPixels* opcodes.

    ``stored`` is the raw stored-value mosaic (pre-linearization): the Constant
    variant marks pixels equal to its sentinel value. Returns None if the block
    contains no bad-pixel opcodes.
    """
    h, w = stored.shape
    mask = None
    for opcode_id, _ver, _flags, data in iter_opcodes(opcode_block):
        if opcode_id == OPCODE_FIX_BAD_PIXELS_CONSTANT:
            op = decode_fix_bad_pixels_constant(data)
            if op is None:
                continue
            m = stored == op.constant
        elif opcode_id == OPCODE_FIX_BAD_PIXELS_LIST:
            op = decode_fix_bad_pixels_list(data)
            if op is None:
                continue
            m = np.zeros((h, w), bool)
            pts = op.points[
                (op.points[:, 0] >= 0) & (op.points[:, 0] < h)
                & (op.points[:, 1] >= 0) & (op.points[:, 1] < w)
            ]
            m[pts[:, 0], pts[:, 1]] = True
            for top, left, bottom, right in op.rects:
                m[max(top, 0) : min(bottom, h), max(left, 0) : min(right, w)] = True
        else:
            continue
        mask = m if mask is None else (mask | m)
    return mask


def heal_bad_pixels_from_opcodes(
    bayer, stored: np.ndarray, opcode_block: bytes, iterations: int = 32
):
    """Heal opcode-flagged photosites on a normalized mosaic via masked diffusion."""
    import jax.numpy as jnp

    from ..core.bayer import bayer_to_planes, planes_to_bayer

    mask = bad_pixel_mask_from_opcodes(stored, opcode_block)
    if mask is None or not mask.any():
        return bayer

    from ..correct.bad_pixels import diffusion_inpaint

    planes = bayer_to_planes(jnp.asarray(bayer))
    mask_planes = bayer_to_planes(jnp.asarray(mask))
    healed = diffusion_inpaint(planes, mask_planes, iterations)
    return planes_to_bayer(healed)
