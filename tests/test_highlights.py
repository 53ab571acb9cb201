"""Highlight reconstruction (correct/highlights.py) — additive over the
reference, which only ever clips blown areas to white
(/root/reference/colorize/transform.py:29, image.py:331-339's clipped-highlight
libraw postprocess). Gates: pyramid fill semantics, chroma-propagation accuracy
on a constant-chroma blown blob, untouched unclipped pixels, and the develop()
integration path.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from pysp_tpu import DevelopConfig, QualityDemosaic, develop
from pysp_tpu.core.frame import RawFrame
from pysp_tpu.correct.highlights import (
    compress_highlights,
    masked_fill_pyramid,
    reconstruct_highlights_channels,
)
from pysp_tpu.utils.testing import mosaic_rggb


# ---- masked_fill_pyramid -------------------------------------------------------------

def test_pyramid_fill_keeps_valid_and_fills_holes():
    rng = np.random.default_rng(0)
    x = rng.random((64, 96)).astype(np.float32) + 2.0
    valid = np.ones_like(x, bool)
    valid[20:44, 30:80] = False  # a 24x50 hole — far beyond a marching fill
    filled = np.asarray(masked_fill_pyramid(jnp.asarray(x), jnp.asarray(valid)))
    np.testing.assert_array_equal(filled[valid], x[valid])
    hole = filled[~valid]
    assert np.all(np.isfinite(hole))
    # hole values live in the range of the surrounding data, not at 0 or mean-
    # of-everything artifacts
    assert hole.min() > 1.9 and hole.max() < 3.1


def test_pyramid_fill_constant_field_is_exact():
    x = np.full((40, 40), 0.7, np.float32)
    valid = np.zeros_like(x, bool)
    valid[:2] = True  # only the top rows are valid
    filled = np.asarray(masked_fill_pyramid(jnp.asarray(x), jnp.asarray(valid)))
    np.testing.assert_allclose(filled, 0.7, atol=1e-6)


# ---- reconstruct_highlights_channels ---------------------------------------------------

def _blown_scene(h=96, w=128, peak=3.0):
    """Constant-chroma scene with a smooth blob blowing out the middle.

    Returns WB'd-camera-space truth channels, the clipped version, gains.
    """
    gains = np.array([2.0, 1.0, 1.6], np.float32)
    rho = np.array([1.2, 1.0, 0.8], np.float32)  # scene chroma (ratio to I)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    bump = np.exp(-(((yy - h / 2) / (h / 5)) ** 2 + ((xx - w / 2) / (w / 5)) ** 2))
    intensity = 0.15 + (peak - 0.15) * bump  # [0.15, peak]
    truth = [rho[c] * intensity for c in range(3)]
    limits = gains * 1.0
    clipped = [np.minimum(truth[c], limits[c]).astype(np.float32) for c in range(3)]
    return truth, clipped, gains


def test_reconstruct_recovers_constant_chroma_blob():
    truth, clipped, gains = _blown_scene()
    r, g, b = reconstruct_highlights_channels(
        jnp.asarray(clipped[0]), jnp.asarray(clipped[1]), jnp.asarray(clipped[2]),
        jnp.asarray(gains), jnp.asarray(1.0),
    )
    rec = [np.asarray(v) for v in (r, g, b)]
    limits = gains * 1.0

    any_clip = np.zeros(clipped[0].shape, bool)
    for c in range(3):
        any_clip |= clipped[c] >= 0.95 * limits[c]
    assert any_clip.sum() > 100  # the scene actually blows out

    for c in range(3):
        # unclipped pixels bit-untouched
        m = clipped[c] >= 0.95 * limits[c]
        np.testing.assert_array_equal(rec[c][~m], clipped[c][~m])
        # monotone: reconstruction only raises clipped values
        assert np.all(rec[c] >= clipped[c] - 1e-6)

    # where at least one channel is unclipped, constant-chroma reconstruction
    # is near-exact; overall the clipped-region error must collapse
    witnessed = any_clip & (clipped[2] < 0.95 * limits[2])  # B still unclipped
    err_in = sum(np.abs(clipped[c] - truth[c])[witnessed].mean() for c in range(3))
    err_out = sum(np.abs(rec[c] - truth[c])[witnessed].mean() for c in range(3))
    assert err_out < 0.15 * err_in, (err_in, err_out)

    # fully-clipped core: still a strict improvement (lower-bound continuation)
    core = np.ones_like(any_clip)
    for c in range(3):
        core &= clipped[c] >= 0.95 * limits[c]
    if core.sum():
        err_in = sum(np.abs(clipped[c] - truth[c])[core].mean() for c in range(3))
        err_out = sum(np.abs(rec[c] - truth[c])[core].mean() for c in range(3))
        assert err_out < err_in


def test_reconstruct_noop_on_unclipped_scene():
    rng = np.random.default_rng(3)
    vals = [jnp.asarray(rng.random((32, 48), np.float32) * 0.5) for _ in range(3)]
    gains = jnp.asarray([2.0, 1.0, 1.6])
    out = reconstruct_highlights_channels(*vals, gains, jnp.asarray(1.0))
    for o, v in zip(out, vals):
        np.testing.assert_array_equal(np.asarray(o), np.asarray(v))


# ---- compress_highlights ----------------------------------------------------------------

def test_compress_identity_below_knee_and_bounded():
    x = jnp.asarray(np.linspace(0.0, 6.0, 200, dtype=np.float32))
    y = np.asarray(compress_highlights(x, knee=0.85))
    np.testing.assert_array_equal(y[np.asarray(x) <= 0.85], np.asarray(x)[np.asarray(x) <= 0.85])
    assert np.all(y <= 1.0 + 1e-6) and np.all(np.diff(y) >= -1e-7)


# ---- develop() integration --------------------------------------------------------------

def _blown_frame(h=64, w=96):
    gains = np.array([2.0, 1.0, 1.6], np.float32)
    truth, clipped, _ = _blown_scene(h, w, peak=2.5)
    # un-apply WB to get sensor-space mosaic values in [0, 1]
    rgb_sensor = np.dstack([clipped[c] / gains[c] for c in range(3)])
    bayer = mosaic_rggb(np.clip(rgb_sensor, 0, 1))
    return RawFrame.synthetic(bayer, wb_neutral=1.0 / gains)


@pytest.mark.parametrize("quality", [QualityDemosaic.Draft, QualityDemosaic.Best])
def test_develop_reconstruct_mode(quality):
    frame = _blown_frame()
    out_clip = np.asarray(develop(frame, DevelopConfig(quality=quality)))
    out_rec = np.asarray(
        develop(frame, DevelopConfig(quality=quality, highlights="reconstruct"))
    )
    assert out_rec.shape == out_clip.shape
    assert np.all(np.isfinite(out_rec))
    assert out_rec.min() >= 0.0 and out_rec.max() <= 1.0 + 1e-6
    # the blown core renders flat white when clipping; reconstruction keeps
    # tonal separation there (strictly below white, with real variance)
    h, w, _ = out_rec.shape
    core = out_clip[..., 1] > 0.995
    assert core.sum() > 50
    assert out_rec[core].mean() < 0.995
    # dark corner (unclipped, below the knee) matches the clip path closely
    corner_clip = out_clip[: h // 8, : w // 8]
    corner_rec = out_rec[: h // 8, : w // 8]
    np.testing.assert_allclose(corner_rec, corner_clip, atol=2e-3)
