"""Gradient-based CA fitting (correct/ca/gradfit.py) — additive capability.

The whole correction operator (Newton inversion + bilinear remap) is
differentiable, so poly3's k1 is recoverable by Adam descent on a direct
channel-alignment MSE. No reference equivalent (the reference fits by tile
template matching only); gates here are synthetic-recovery bounds.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pysp_tpu.correct.ca.gradfit import (
    fit_ca_models_gradient,
    fit_poly3_gradient,
    fit_radial_gradient,
    poly3_alignment_loss,
    poly3_correct_channel,
    radial_alignment_loss,
    refine_ca_models_gradient,
)
from pysp_tpu.correct.ca.models import (
    Poly3CorrectionModel,
    Poly5CorrectionModel,
    PtLensCorrectionModel,
    radius_field,
)
from pysp_tpu.ops.resample import remap_bilinear


def _smooth_scene(h: int, w: int, seed: int = 0) -> np.ndarray:
    """Band-limited random field: gradients everywhere, no aliasing."""
    rng = np.random.default_rng(seed)
    coarse = rng.random((h // 16, w // 16), np.float32)
    up = jax.image.resize(jnp.asarray(coarse), (h, w), method="cubic")
    return np.asarray(0.1 + 0.8 * up, np.float32)


def _distort_model(channel: np.ndarray, model) -> jnp.ndarray:
    """Observed channel: scene sampled at the model-distorted positions."""
    h, w = channel.shape
    r = radius_field((h, w))
    scale = model.get_distorted(r) / r
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    ys = (jnp.arange(h, dtype=jnp.float32) - cy)[:, None]
    xs = (jnp.arange(w, dtype=jnp.float32) - cx)[None, :]
    map_y = jnp.clip(ys * scale + cy, 0, h - 1)
    map_x = jnp.clip(xs * scale + cx, 0, w - 1)
    return remap_bilinear(jnp.asarray(channel), map_x, map_y)


def _distort(channel: np.ndarray, k1: float) -> jnp.ndarray:
    model = Poly3CorrectionModel(initial_k1=max(k1, 0.0))
    model._k1 = k1
    return _distort_model(channel, model)


def test_correct_channel_inverts_distortion():
    scene = _smooth_scene(160, 192)
    k1 = 0.012
    moving = _distort(scene, k1)
    corrected = poly3_correct_channel(moving, jnp.float32(k1))
    sl = (slice(12, -12), slice(12, -12))
    err = np.abs(np.asarray(corrected)[sl] - scene[sl]).max()
    assert err < 2e-2  # two bilinear resamples of a band-limited field


def test_loss_minimized_at_true_k1():
    scene = _smooth_scene(160, 192, seed=1)
    k1 = 0.015
    moving = _distort(scene, k1)
    losses = {
        k: float(poly3_alignment_loss(jnp.float32(k), moving, jnp.asarray(scene)))
        for k in (0.0, k1 / 2, k1, k1 * 2)
    }
    assert losses[k1] < losses[0.0]
    assert losses[k1] < losses[k1 / 2]
    assert losses[k1] < losses[k1 * 2]


@pytest.mark.parametrize("k_true", [0.01, -0.008])
def test_gradient_fit_recovers_k1(k_true):
    scene = _smooth_scene(160, 192, seed=2)
    moving = _distort(scene, k_true)
    k_fit, loss = fit_poly3_gradient(moving, scene, steps=120)
    assert abs(k_fit - k_true) < 0.25 * abs(k_true) + 5e-4
    assert loss < float(
        poly3_alignment_loss(jnp.float32(0.0), moving, jnp.asarray(scene))
    )


def test_poly5_gradient_fit_recovers_operator():
    """Multi-coefficient fit: the recovered (h1, h2) must reproduce the true
    model's radial map (coefficients can trade off; the operator is the
    observable)."""
    scene = _smooth_scene(160, 192, seed=4)
    true = Poly5CorrectionModel(0.012, -0.004)
    moving = _distort_model(scene, true)
    theta, loss = fit_radial_gradient(moving, scene, "poly5", steps=160)
    fit = Poly5CorrectionModel(float(theta[0]), float(theta[1]))
    rs = np.linspace(0.1, 0.95, 64)
    map_err = np.abs(
        np.asarray(fit.get_distorted(rs)) - np.asarray(true.get_distorted(rs))
    ).max()
    assert map_err < 2.5e-3  # vs 1.2e-2 peak displacement of the true model
    assert loss < float(
        radial_alignment_loss(
            jnp.zeros(2, jnp.float32), moving, jnp.asarray(scene), "poly5"
        )
    )


def test_ptlens_gradient_fit_recovers_operator():
    scene = _smooth_scene(160, 192, seed=5)
    true = PtLensCorrectionModel(0.0, 0.01, -0.003)
    moving = _distort_model(scene, true)
    theta, _ = fit_radial_gradient(moving, scene, "ptlens", steps=160)
    fit = PtLensCorrectionModel(*(float(v) for v in theta))
    rs = np.linspace(0.1, 0.95, 64)
    map_err = np.abs(
        np.asarray(fit.get_distorted(rs)) - np.asarray(true.get_distorted(rs))
    ).max()
    assert map_err < 2.5e-3


def test_refine_improves_quantized_template_fit():
    """refine_ca_models_gradient: seeding with a deliberately-off coefficient
    (a template fit quantized to its bisection step) converges back toward the
    truth and keeps the model class."""
    from pysp_tpu.core.frame import RawFrame

    h, w = 192, 224
    scene = _smooth_scene(h, w, seed=6)
    k_true = 0.02
    r_full = np.asarray(_distort(scene, k_true))
    bayer = np.empty((h, w), np.float32)
    bayer[0::2, 0::2] = r_full[0::2, 0::2]
    bayer[0::2, 1::2] = scene[0::2, 1::2]
    bayer[1::2, 0::2] = scene[1::2, 0::2]
    bayer[1::2, 1::2] = scene[1::2, 1::2]
    frame = RawFrame.synthetic(bayer)

    rough_r = Poly3CorrectionModel()
    rough_r._k1 = k_true * 1.4  # off by 40%: a coarse template-match result
    rough_b = Poly3CorrectionModel()
    fine_r, fine_b = refine_ca_models_gradient(
        frame, rough_r, rough_b, steps=80, learning_rate=1e-3
    )
    assert isinstance(fine_r, Poly3CorrectionModel)
    assert abs(float(fine_r.get_coefficients()[0]) - k_true) < abs(
        float(rough_r.get_coefficients()[0]) - k_true
    )
    # inputs untouched
    assert float(rough_r.get_coefficients()[0]) == k_true * 1.4


def test_frame_level_fit_recovers_r_channel_model():
    from pysp_tpu.core.frame import RawFrame

    h, w = 192, 224
    scene = _smooth_scene(h, w, seed=3)
    k_true = 0.02
    r_full = np.asarray(_distort(scene, k_true))
    bayer = np.empty((h, w), np.float32)
    bayer[0::2, 0::2] = r_full[0::2, 0::2]          # R: distorted
    bayer[0::2, 1::2] = scene[0::2, 1::2]           # G1
    bayer[1::2, 0::2] = scene[1::2, 0::2]           # G2
    bayer[1::2, 1::2] = scene[1::2, 1::2]           # B: aligned
    frame = RawFrame.synthetic(bayer)

    model_r, model_b = fit_ca_models_gradient(frame, steps=120)
    k_r = float(model_r.get_coefficients()[0])
    k_b = float(model_b.get_coefficients()[0])
    # plane-space fit: same normalized-radius model, half-pixel phase offsets
    # between the R and mean-G grids loosen the bound vs the unit test
    assert abs(k_r - k_true) < 0.5 * k_true
    assert abs(k_b) < 0.35 * k_true  # aligned channel stays near identity
    # models are remove_ca_from_raw-compatible (reversible radial API)
    rs = jnp.linspace(0.05, 1.0, 64)
    rt = model_r.get_distorted(model_r.estimate_undistorted(rs))
    assert float(jnp.abs(rt - rs).max()) < 1e-4
