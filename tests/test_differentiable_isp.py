"""The develop pipeline is differentiable end to end (examples/differentiable_isp.py).

jax.grad flows from a loss on the developed sRGB back through gamma, the color
matrix, WB and the demosaic stencils to capture parameters — the functional-JAX
capability the in-place NumPy/cv2 reference structurally cannot have.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from examples.differentiable_isp import (
    CFG,
    develop_with_params,
    fit,
    loss_fn,
    make_scene,
)
from pysp_tpu.core.frame import RawFrame
from pysp_tpu.pipeline.develop import develop


def _small_frame():
    bayer, neutral_true = make_scene(128, 160, seed=1)
    return RawFrame.synthetic(bayer, wb_neutral=np.ones(3, np.float32)), neutral_true


def test_grad_through_develop_finite_and_nonzero():
    frame, _ = _small_frame()
    params = {"log_gain": jnp.zeros(()), "neutral_rb": jnp.array([1.0, 1.0])}
    g = jax.grad(loss_fn)(params, frame)
    flat = jnp.concatenate([g["log_gain"].reshape(1), g["neutral_rb"]])
    assert bool(jnp.all(jnp.isfinite(flat)))
    assert float(jnp.max(jnp.abs(flat))) > 1e-6


def test_gradient_descent_recovers_exposure_and_wb():
    frame, neutral_true = _small_frame()
    p0 = {"log_gain": jnp.zeros(()), "neutral_rb": jnp.array([1.0, 1.0])}
    l0 = float(loss_fn(p0, frame))
    params, loss = fit(frame, steps=80)
    assert loss < 0.05 * l0
    # gray-world pins the R/G ratio exactly on this gray-world scene
    assert abs(float(params["neutral_rb"][0]) - neutral_true[0]) < 0.08
    # the developed image actually sits at the exposure target
    out = develop_with_params(params, frame)
    assert abs(float(jnp.mean(out[8:-8, 8:-8])) - 0.5) < 0.05


def test_grad_wrt_bayer_exists():
    """Pixels themselves are differentiable inputs (e.g. for raw-domain
    optimization or inverse rendering)."""
    frame, _ = _small_frame()

    def f(bayer):
        out = develop(frame.replace(bayer=bayer), CFG)
        return jnp.mean(out**2)

    g = jax.grad(f)(frame.bayer)
    assert g.shape == frame.bayer.shape
    assert bool(jnp.all(jnp.isfinite(g)))
    assert float(jnp.max(jnp.abs(g))) > 0.0
