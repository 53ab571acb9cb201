"""Bayer-domain wavelet denoise (correct/denoise.py)."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pysp_tpu.core.frame import RawFrame
from pysp_tpu.correct.denoise import denoise_bayer_wavelet

from test_demosaic import make_scene, mosaic_rggb


def _psnr(a, b):
    mse = float(np.mean((np.asarray(a) - np.asarray(b)) ** 2))
    return 10.0 * np.log10(1.0 / max(mse, 1e-12))


def test_improves_psnr_on_noisy_mosaic():
    rng = np.random.default_rng(0)
    clean = mosaic_rggb(make_scene(128, 128, seed=5))
    noisy = np.clip(clean + rng.normal(0, 0.06, clean.shape), 0, 1).astype(
        np.float32
    )
    frame = RawFrame.synthetic(noisy)
    out = denoise_bayer_wavelet(frame, strength=1.0)
    before = _psnr(noisy, clean)
    after = _psnr(out.bayer, clean)
    assert after > before + 3.0, (before, after)


def test_zero_strength_is_identity():
    frame = RawFrame.synthetic(mosaic_rggb(make_scene(64, 64, seed=6)))
    out = denoise_bayer_wavelet(frame, strength=0.0)
    np.testing.assert_array_equal(np.asarray(out.bayer), np.asarray(frame.bayer))


def test_edges_survive():
    """A clean step edge must not be washed out (wavelet shrinkage keeps
    coefficients far above the threshold)."""
    h = w = 64
    img = np.zeros((h, w), np.float32)
    img[:, w // 2 :] = 0.8
    frame = RawFrame.synthetic(img)
    out = np.asarray(denoise_bayer_wavelet(frame, strength=1.0).bayer)
    # the step magnitude at the boundary survives to within 10%
    step = out[:, w // 2 + 4].mean() - out[:, w // 2 - 4].mean()
    assert step > 0.7


def test_jit_and_pipeline_stage():
    from pysp_tpu.pipeline.pipeline import PipelineConfig, develop_pipeline

    rng = np.random.default_rng(1)
    clean = mosaic_rggb(make_scene(64, 64, seed=7))
    noisy = np.clip(clean + rng.normal(0, 0.02, clean.shape), 0, 1).astype(
        np.float32
    )
    frame = RawFrame.synthetic(noisy)
    cfg_on = PipelineConfig(denoise_strength=1.0)
    cfg_off = PipelineConfig()
    out_on = np.asarray(develop_pipeline(frame, cfg_on))
    out_off = np.asarray(develop_pipeline(frame, cfg_off))
    assert out_on.shape == out_off.shape
    assert not np.array_equal(out_on, out_off)
    # the denoised develop is smoother: lower high-frequency energy
    hf = lambda x: float(np.mean(np.abs(np.diff(x, axis=1))))  # noqa: E731
    assert hf(out_on) < hf(out_off)


def test_cli_denoise_flag(tmp_path):
    from pysp_tpu.cli import main
    from pysp_tpu.io.tiff import write_synthetic_dng

    rng = np.random.default_rng(2)
    u16 = np.clip(
        mosaic_rggb(make_scene(64, 64, seed=8)) * 3000 + 300
        + rng.normal(0, 40, (64, 64)),
        260, 4000,
    ).astype(np.uint16)
    p = tmp_path / "n.dng"
    p.write_bytes(write_synthetic_dng(u16))
    rc = main([
        "develop", str(p), "-o", str(tmp_path / "out.png"),
        "--quality", "fast", "--denoise", "1.0",
    ])
    assert rc == 0 and (tmp_path / "out.png").exists()
