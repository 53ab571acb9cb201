"""Radial template matching for CA scale-pair extraction (host-side NumPy).

Reference behavior: /root/reference/corr_ca/solver/tiled_template_matcher.py:4-99 —
slide a blurred tile along its center-ray segment in quarter-pixel coarse steps,
L1 error against the reference channel, then interval-halving sub-pixel refinement.

Vectorized over the coarse steps (the reference loops in Python per step): all step
positions are sampled in one bilinear gather batch. The reference weights the error as
``abs(diff) ** 1 / 2.2`` — which by operator precedence is a constant 1/2.2 scale, not a
gamma; argmin is unchanged, so plain L1 is used here.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np


def _bilinear_patch(
    image: np.ndarray, offset_y: np.ndarray, offset_x: np.ndarray, th: int, tw: int
) -> np.ndarray:
    """Sample (len(offsets), th, tw) patches at fractional corners (vectorized)."""
    h, w = image.shape[:2]
    ys = offset_y[:, None, None] + np.arange(th, dtype=np.float32)[None, :, None]
    xs = offset_x[:, None, None] + np.arange(tw, dtype=np.float32)[None, None, :]
    ys = np.broadcast_to(ys, (len(offset_y), th, tw))
    xs = np.broadcast_to(xs, (len(offset_x), th, tw))

    y0 = np.floor(ys).astype(np.int64)
    x0 = np.floor(xs).astype(np.int64)
    fy = ys - y0
    fx = xs - x0
    y0c = np.clip(y0, 0, h - 1)
    y1c = np.clip(y0 + 1, 0, h - 1)
    x0c = np.clip(x0, 0, w - 1)
    x1c = np.clip(x0 + 1, 0, w - 1)

    return (
        (1 - fx) * (1 - fy) * image[y0c, x0c]
        + fx * (1 - fy) * image[y0c, x1c]
        + (1 - fx) * fy * image[y1c, x0c]
        + fx * fy * image[y1c, x1c]
    )


def template_match(
    target: np.ndarray,
    tile_blurred: np.ndarray,
    start: np.ndarray,
    end: np.ndarray,
    integer_only: bool = False,
    resample: bool = True,
    resample_max_steps: int = 8,
) -> np.ndarray:
    """Optimal (y, x) tile position along the start->end axis minimizing L1 error.

    Matches the reference semantics: quarter-pixel coarse scan from ``start`` (endpoint
    excluded, :60-66), then interval-halving refinement around the coarse winner
    (:82-97). ``integer_only`` floors sampling positions for fast lookups.
    """
    start = np.asarray(start, np.float64)
    end = np.asarray(end, np.float64)
    th, tw = tile_blurred.shape[:2]

    delta = end - start
    mag = float(np.sqrt(np.sum(delta**2)))
    vec = delta / mag / 4.0  # quarter-pixel steps
    n_steps = int(np.floor(mag * 4.0))
    if n_steps <= 0:
        return np.copy(start)

    steps = np.arange(n_steps, dtype=np.float64)
    pos = start[None, :] + steps[:, None] * vec[None, :]

    if integer_only:
        pos_i = np.floor(pos).astype(np.int64)
        errs = np.empty(n_steps)
        for i, (py, px) in enumerate(pos_i):
            section = target[py : py + th, px : px + tw]
            errs[i] = np.sum(np.abs(section - tile_blurred))
        best_step = int(np.argmin(errs))
        return start + best_step * vec

    patches = _bilinear_patch(
        target, pos[:, 0].astype(np.float32), pos[:, 1].astype(np.float32), th, tw
    )
    errs = np.sum(np.abs(patches - tile_blurred[None]), axis=(1, 2))
    best_step = int(np.argmin(errs))

    if not resample:
        return start + best_step * vec

    def err_at(p: np.ndarray) -> float:
        patch = _bilinear_patch(
            target,
            np.array([p[0]], np.float32),
            np.array([p[1]], np.float32),
            th,
            tw,
        )[0]
        return float(np.sum(np.abs(patch - tile_blurred)))

    solver_start = start + (best_step - 1) * vec
    solver_end = start + (best_step + 1) * vec
    solver_center = (solver_start + solver_end) / 2
    last_center = np.copy(solver_end)

    for _ in range(resample_max_steps):
        err_start = err_at(solver_start)
        err_middle = err_at(solver_center)
        err_end = err_at(solver_end)

        if abs(err_middle - err_start) > abs(err_middle - err_end):
            solver_start = solver_center
        else:
            solver_end = solver_center

        solver_center = (solver_start + solver_end) / 2
        if np.all(solver_center == last_center):
            break
        last_center = np.copy(solver_center)

    return solver_center
