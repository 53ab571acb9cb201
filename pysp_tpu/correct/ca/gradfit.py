"""Gradient-based CA model fitting/refinement (JAX-native additive capability).

No reference equivalent: the reference fits radial models by tile template
matching only (/root/reference/corr_ca/ca_removal.py:15-46,
solver/tiled_template_matcher.py:4-99). Here the *entire correction operator*
— Newton model inversion + bilinear remap — is differentiable almost
everywhere, so model coefficients can be fitted (or template-match fits
refined) by gradient descent on a direct channel-alignment loss. This is a
capability the NumPy/cv2 reference structurally cannot have, and it needs no
detectable ROI features: every gradient pixel contributes signal.

Scope: Poly3 (``Rd = k1·Ru³ + (1−k1)·Ru``), the model whose single coefficient
makes the loss landscape well-behaved at CA magnitudes (|k1| ≲ 0.05). The loss
aligns a ``moving`` channel against a ``reference`` channel on an interior
window (borders are excluded: clipped samples there are non-differentiable
plateaus). All ops are jittable; the fit runs equally on CPU or TPU.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ...ops.resample import remap_bilinear
from .models import Poly3CorrectionModel, radius_field

Array = jnp.ndarray


def _poly3_undistort_radii(r: Array, k1: Array, iterations: int = 8) -> Array:
    """Newton-invert the poly3 radial map for (possibly traced) ``k1``.

    Same iteration as models.NewtonRaphsonModel.estimate_undistorted
    (zeros start, fixed trip count) so a gradient fit converges to the same
    operator the host-fitted model applies."""
    k1 = jnp.asarray(k1, jnp.float32)

    def body(_, und):
        f = k1 * und * und * und + (1.0 - k1) * und - r
        fp = 3.0 * k1 * und * und + (1.0 - k1)
        return und - f / fp

    return jax.lax.fori_loop(0, iterations, body, jnp.zeros_like(r))


def poly3_correct_channel(channel: Array, k1: Array) -> Array:
    """Apply the poly3 *correction* (inverse warp) with a traced coefficient.

    out(p) = channel(U_k(p)) where U_k is the Newton-inverted radial map —
    matches what remove_ca_from_raw's G→channel-grid warp does for a
    host-fitted Poly3 model, but stays differentiable w.r.t. ``k1``."""
    h, w = channel.shape[-2], channel.shape[-1]
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    r = radius_field((h, w))
    scale = _poly3_undistort_radii(r, k1) / r
    ys = (jnp.arange(h, dtype=jnp.float32) - cy)[:, None]
    xs = (jnp.arange(w, dtype=jnp.float32) - cx)[None, :]
    map_y = jnp.clip(ys * scale + cy, 0, h - 1)
    map_x = jnp.clip(xs * scale + cx, 0, w - 1)
    return remap_bilinear(channel, map_x, map_y)


def poly3_alignment_loss(
    k1: Array, moving: Array, reference: Array, margin: int = 8
) -> Array:
    """Interior MSE between the k1-corrected ``moving`` channel and ``reference``."""
    corrected = poly3_correct_channel(moving, k1)
    sl = (slice(margin, -margin), slice(margin, -margin))
    d = corrected[sl] - reference[sl]
    return jnp.mean(d * d)


def fit_poly3_gradient(
    moving: Array,
    reference: Array,
    k1_init: float = 0.0,
    steps: int = 80,
    learning_rate: float = 2e-3,
    margin: int = 8,
) -> Tuple[float, float]:
    """Fit poly3 ``k1`` aligning ``moving`` onto ``reference`` by Adam descent.

    Returns ``(k1, final_loss)``. The loop is a single jitted lax.scan — one
    compile, one dispatch. Typical use: R (or B) plane vs the G plane of a
    CFA-split raw, either from scratch or seeded with a template-match fit's
    coefficient (``k1_init=float(model.get_coefficients()[0])``)."""
    import optax

    opt = optax.adam(learning_rate)
    grad_fn = jax.value_and_grad(poly3_alignment_loss)
    moving = jnp.asarray(moving, jnp.float32)
    reference = jnp.asarray(reference, jnp.float32)

    @jax.jit
    def run(k0):
        state0 = opt.init(k0)

        def step(carry, _):
            k, state = carry
            loss, g = grad_fn(k, moving, reference, margin)
            updates, state = opt.update(g, state)
            return (k + updates, state), loss

        (k, _), losses = jax.lax.scan(
            step, (k0, state0), None, length=steps
        )
        return k, losses[-1]

    k, loss = run(jnp.float32(k1_init))
    return float(k), float(loss)


def fit_ca_models_gradient(
    frame,
    k1_init_r: float = 0.0,
    k1_init_b: float = 0.0,
    steps: int = 80,
    learning_rate: float = 2e-3,
) -> Tuple[Poly3CorrectionModel, Poly3CorrectionModel]:
    """Gradient-fit Poly3 R→G and B→G models straight from a RawFrame.

    Drop-in alternative to compute_ca_lens_models_for_raw for poly3: aligns
    the R and B CFA planes against the mean of the two G planes (quarter-res
    plane space — the same grid relationship the template-match solver
    measures). Returns models compatible with remove_ca_from_raw."""
    from ...core.bayer import bayer_to_rgbg

    r0, g1, b0, g2 = bayer_to_rgbg(frame.bayer)
    g = 0.5 * (g1 + g2)
    models = []
    for plane, k0 in ((r0, k1_init_r), (b0, k1_init_b)):
        k1, _ = fit_poly3_gradient(
            plane, g, k1_init=k0, steps=steps, learning_rate=learning_rate
        )
        m = Poly3CorrectionModel()
        # direct assignment: the constructor clamps initial_k1 to [0, 1] but
        # fitted coefficients may legitimately be negative (pincushion CA),
        # exactly as compute_coefficients can set them
        m._k1 = float(k1)
        models.append(m)
    return models[0], models[1]
