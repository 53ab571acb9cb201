"""AHD megakernel: interpret-mode validation of banding/DMA/stitch plumbing.

The band core is bit-verified against the XLA path in test_polyphase.py. The Pallas
kernel and the XLA path are separately compiled programs, so FMA-contraction choices
differ at the ~1e-7 level; that noise flips homogeneity H/V picks only where the two
directions' blurred counts land within an ulp of each other (~1-3% of pixels on real
content, measured quality-neutral vs ground truth — see DIVERGENCES.md). The plumbing
gates below (>=50 dB PSNR, <5% pixels off by >1e-4, bit-exact stitched border) are
far tighter than any geometry bug would pass: a misaligned band or margin produces
garbage rows and collapses PSNR entirely.
"""
import jax.numpy as jnp
import numpy as np
import pytest

# Interpret-mode Pallas runs are minutes-per-test on CPU; the whole module is
# opt-in (`pytest -m slow`). The band core itself stays gated in the default
# suite via test_polyphase.py's bit-exact XLA comparison.
pytestmark = pytest.mark.slow

from pysp_tpu.colorimetry.transforms import cam_to_lin_srgb_matrix
from pysp_tpu.core.bayer import bayer_to_rgbg
from pysp_tpu.core.frame import RawFrame
from pysp_tpu.demosaic.ahd import demosaic_ahd_channels
from pysp_tpu.demosaic.ahd_band import ahd_band_quads
from pysp_tpu.demosaic.ahd_mega import demosaic_ahd_mega
from pysp_tpu.ops.pallas_kernels import ahd_mega_pallas
from pysp_tpu.ops.polyphase import quad_to_bayer

CAM_MAT = np.array(
    [[0.9, -0.2, -0.1], [-0.3, 1.1, 0.2], [0.0, -0.4, 1.3]], np.float32
)
WB = np.array([0.45, 1.0, 0.62], np.float32)


def make_frame(h=128, w=128, seed=11, is_hdr=False):
    """Mosaicked synthetic scene (smooth gradients + edges + mild noise)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    r = 0.3 + 0.4 * np.sin(xx / 9) * np.cos(yy / 13) + 0.2 * (xx > w / 2)
    g = 0.4 + 0.3 * np.cos(xx / 7) + 0.15 * (yy > h / 3)
    b = 0.5 - 0.3 * np.sin(yy / 11) + 0.1 * ((xx + yy) % 17 > 8)
    rgb = np.clip(np.dstack([r, g, b]) + rng.normal(0, 0.01, (h, w, 3)), 0.02, 0.98)
    bayer = np.zeros((h, w), np.float32)
    bayer[0::2, 0::2] = rgb[0::2, 0::2, 0]
    bayer[0::2, 1::2] = rgb[0::2, 1::2, 1]
    bayer[1::2, 0::2] = rgb[1::2, 0::2, 1]
    bayer[1::2, 1::2] = rgb[1::2, 1::2, 2]
    return RawFrame.synthetic(
        bayer.astype(np.float32), cam_mat=CAM_MAT, wb_neutral=WB, is_hdr=is_hdr
    )


def _psnr(a, b):
    mse = np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2)
    return np.inf if mse == 0 else 10 * np.log10(1.0 / mse)


def _explog_cbrt(x):
    return jnp.exp(jnp.log(x) * jnp.float32(1.0 / 3.0))


@pytest.mark.parametrize("tile_h", [16, 64])
def test_mega_pallas_matches_band_emulation(tile_h):
    """Banded kernel vs whole-image band core: only FMA-level tie flips allowed."""
    frame = make_frame()
    r0, g1, b0, g2 = bayer_to_rgbg(frame.bayer)
    planes = (r0, g1, g2, b0)
    mat = cam_to_lin_srgb_matrix(frame.cam_mat, frame.cam_white)
    wb = frame.wb_reciprocal()

    got = ahd_mega_pallas(
        planes, mat, wb, frame.is_hdr, postprocess_stages=1,
        tile_h=tile_h, interpret=True,
    )
    assert got is not None

    h2, w2 = r0.shape
    padded = [jnp.pad(p, 8, mode="edge") for p in planes]
    want = ahd_band_quads(
        padded, mat, (wb[0], wb[1], wb[2]), frame.is_hdr,
        postprocess_stages=1, cbrt_fn=_explog_cbrt,
    )
    for c, name in zip(range(3), "rgb"):
        got_full = np.asarray(quad_to_bayer(
            ((got[4 * c], got[4 * c + 1]), (got[4 * c + 2], got[4 * c + 3]))
        ))
        want_full = np.asarray(quad_to_bayer(tuple(
            tuple(p[8 : 8 + h2, 8 : 8 + w2] for p in row) for row in want[c]
        )))
        psnr = _psnr(got_full, want_full)
        frac = np.mean(np.abs(got_full - want_full) > 1e-4)
        assert psnr > 50, f"{name} t={tile_h}: PSNR {psnr:.1f}"
        assert frac < 0.05, f"{name} t={tile_h}: {frac:.4f} pixels off"


@pytest.mark.parametrize("is_hdr", [False, True])
def test_demosaic_ahd_mega_stitch(is_hdr):
    """Stitched entry vs XLA path: exact border strips, tie-flip-only interior."""
    frame = make_frame(h=160, w=144, is_hdr=is_hdr)
    want = demosaic_ahd_channels(frame, postprocess_stages=1)
    got = demosaic_ahd_mega(frame, postprocess_stages=1, interpret=True)

    f = 12  # 2 * margin_for(1) full-res border pixels come from the XLA path
    for g, w_, name in zip(got, want, "rgb"):
        g = np.asarray(g)
        w_ = np.asarray(w_)
        assert g.shape == w_.shape
        # border frame: bit-exact (recomputed with the exact XLA path on crops)
        np.testing.assert_array_equal(g[:f, :], w_[:f, :], err_msg=f"{name} top")
        np.testing.assert_array_equal(g[-f:, :], w_[-f:, :], err_msg=f"{name} bot")
        np.testing.assert_array_equal(g[:, :f], w_[:, :f], err_msg=f"{name} left")
        np.testing.assert_array_equal(g[:, -f:], w_[:, -f:], err_msg=f"{name} right")
        # interior: tie flips only
        gi, wi = g[f:-f, f:-f], w_[f:-f, f:-f]
        psnr = _psnr(gi, wi)
        frac = np.mean(np.abs(gi - wi) > 1e-4)
        assert psnr > 50, f"{name}: PSNR {psnr:.1f}"
        assert frac < 0.05, f"{name}: {frac:.4f} pixels off"


def test_demosaic_ahd_mega_small_image_fallback():
    """Images too small for border strips fall back to the XLA path exactly."""
    frame = make_frame(h=64, w=64)
    want = demosaic_ahd_channels(frame, postprocess_stages=1)
    got = demosaic_ahd_mega(frame, postprocess_stages=1, interpret=True)
    for g, w_ in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w_))


def test_chunked_equals_unchunked():
    """Column-chunked megakernel == single-launch kernel in the kept regions
    (bit-exact in interpret mode: same formulas on the same real halo data)."""
    from pysp_tpu.demosaic import ahd_mega as M

    frame = make_frame(h=96, w=384)
    r0, g1, b0, g2 = bayer_to_rgbg(frame.bayer)
    planes = (r0, g1, g2, b0)
    mat = cam_to_lin_srgb_matrix(frame.cam_mat, frame.cam_white)
    wb = frame.wb_reciprocal()

    single = ahd_mega_pallas(planes, mat, wb, False, postprocess_stages=1,
                             interpret=True)

    old = M._CHUNK_TARGET_W2
    M._CHUNK_TARGET_W2 = 64  # force 3 chunks at w2=192
    try:
        chunked = M._mega_chunked(planes, mat, wb, False, 1, True)
    finally:
        M._CHUNK_TARGET_W2 = old
    assert chunked is not None

    for k in range(12):
        np.testing.assert_array_equal(
            np.asarray(chunked[k]), np.asarray(single[k]), err_msg=f"plane {k}"
        )


def test_develop_channels_mega_fused_tail():
    """The in-kernel color tail (clip + matrix + gamma) matches the external
    channelwise tail applied to the same kernel's demosaic output to pow-noise
    (same kernel, same decisions — only the tail arithmetic differs)."""
    from pysp_tpu.demosaic.ahd_mega import develop_channels_mega
    from pysp_tpu.pipeline.develop import _color_tail_channels

    frame = make_frame(160, 192)
    r, g, b = demosaic_ahd_mega(frame, postprocess_stages=1, interpret=True)
    mat = cam_to_lin_srgb_matrix(frame.cam_mat, frame.cam_white)
    ref = jnp.stack(_color_tail_channels(r, g, b, mat, True, True), axis=-1)

    out = develop_channels_mega(frame, 1, True, True, interpret=True)
    assert out is not None
    got = jnp.stack(out, axis=-1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6, rtol=0)


def test_develop_channels_mega_no_gamma_no_clip():
    """Tail flags propagate: linear (gamma off) fused output matches the XLA tail."""
    from pysp_tpu.demosaic.ahd_mega import develop_channels_mega
    from pysp_tpu.pipeline.develop import _color_tail_channels

    frame = make_frame(160, 192, seed=5)
    r, g, b = demosaic_ahd_mega(frame, postprocess_stages=1, interpret=True)
    mat = cam_to_lin_srgb_matrix(frame.cam_mat, frame.cam_white)
    ref = jnp.stack(
        _color_tail_channels(r, g, b, mat, False, False), axis=-1
    )
    out = develop_channels_mega(frame, 1, False, False, interpret=True)
    got = jnp.stack(out, axis=-1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6, rtol=0)


def test_row_chunked_equals_unchunked():
    """Row-chunked megakernel dispatch (ahd_mega._row_chunked) is bit-exact:
    overlapping row pieces discard their contaminated margins, so piece interiors
    see the same real halo data as the unchunked kernel."""
    import importlib

    M = importlib.import_module("pysp_tpu.demosaic.ahd_mega")

    frame = make_frame(320, 256, seed=13)
    ref = demosaic_ahd_mega(frame, postprocess_stages=1, interpret=True)
    old = M._CHUNK_TARGET_H2
    M._CHUNK_TARGET_H2 = 64
    try:
        got = demosaic_ahd_mega(frame, postprocess_stages=1, interpret=True)
    finally:
        M._CHUNK_TARGET_H2 = old
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
