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


def _bilinear_patch_jnp(image, py, px, th: int, tw: int):
    """Device twin of _bilinear_patch for ONE fractional corner (py, px)."""
    import jax.numpy as jnp

    h, w = image.shape
    ys = py + jnp.arange(th, dtype=jnp.float32)[:, None]
    xs = px + jnp.arange(tw, dtype=jnp.float32)[None, :]
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    fy = ys - y0
    fx = xs - x0
    y0c = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    y1c = jnp.clip(y0.astype(jnp.int32) + 1, 0, h - 1)
    x0c = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    x1c = jnp.clip(x0.astype(jnp.int32) + 1, 0, w - 1)
    return (
        (1 - fx) * (1 - fy) * image[y0c, x0c]
        + fx * (1 - fy) * image[y0c, x1c]
        + (1 - fx) * fy * image[y1c, x0c]
        + fx * fy * image[y1c, x1c]
    )


def _one_tile_match(target, tile, tile_pos, tile_mask, vec, refine_steps: int):
    import jax
    import jax.numpy as jnp

    th, tw = tile.shape

    def tile_err(p):
        patch = _bilinear_patch_jnp(target, p[0], p[1], th, tw)
        return jnp.sum(jnp.abs(patch - tile))

    errs = jax.vmap(tile_err)(tile_pos)
    errs = jnp.where(tile_mask, errs, jnp.inf)
    best_pos = tile_pos[jnp.argmin(errs)]

    # interval-halving refinement (tiled_template_matcher.py:82-97), fixed-trip
    s_start = best_pos - vec
    s_end = best_pos + vec
    s_center = (s_start + s_end) * 0.5

    def body(_, carry):
        s_start, s_end, s_center = carry
        e_s = tile_err(s_start)
        e_m = tile_err(s_center)
        e_e = tile_err(s_end)
        move_start = jnp.abs(e_m - e_s) > jnp.abs(e_m - e_e)
        s_start = jnp.where(move_start, s_center, s_start)
        s_end = jnp.where(move_start, s_end, s_center)
        s_center = (s_start + s_end) * 0.5
        return s_start, s_end, s_center

    _, _, s_center = jax.lax.fori_loop(
        0, refine_steps, body, (s_start, s_end, s_center)
    )
    return s_center


def template_match_batch(target, tiles, pos, step_mask, vecs, refine_steps: int = 8):
    """Device-side batched template matcher: all tiles' coarse scans and bisection
    refinements in ONE jitted program (the reference loops tiles x steps in Python,
    tiled_template_matcher.py:60-97; this is the vmapped fixed-shape reformulation
    from SURVEY.md §7 hard part 3).

    target (H, W); tiles (N, th, tw); pos (N, S, 2) coarse scan positions (padded);
    step_mask (N, S) True for real steps; vecs (N, 2) quarter-pixel step vectors.
    Returns (N, 2) refined positions. Positions are f32 (the host path is f64; the
    ~1e-4 px difference is far below the fit's tile-to-tile spread).
    """
    import jax.numpy as jnp

    return _template_match_batch_jit(
        jnp.asarray(target, jnp.float32),
        jnp.asarray(tiles, jnp.float32),
        jnp.asarray(pos, jnp.float32),
        jnp.asarray(step_mask),
        jnp.asarray(vecs, jnp.float32),
        refine_steps,
    )


def _make_batch_jit():
    import jax
    from functools import partial

    @partial(jax.jit, static_argnames=("refine_steps",))
    def f(target, tiles, pos, step_mask, vecs, refine_steps):
        return jax.vmap(
            lambda t, p, m, v: _one_tile_match(target, t, p, m, v, refine_steps)
        )(tiles, pos, step_mask, vecs)

    return f


_template_match_batch_jit = _make_batch_jit()
