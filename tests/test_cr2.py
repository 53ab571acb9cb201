"""CR2 decode: synthetic-fixture roundtrips through the native SOF3 codec.

The reference opens CR2 via libraw (image.py:224); these tests gate the
built-in replacement end to end: container walk, slice reassembly, MakerNote
SensorInfo/ColorData parsing, black level from masked pixels, WB neutral,
pattern parity after border crops, and the load_raw dispatch.
"""
import numpy as np
import pytest

from pysp_tpu.io import native
from pysp_tpu.io.cr2 import (
    _sof3_precision,
    _unslice,
    _wb_neutral_from_colordata,
    is_cr2,
    load_raw_cr2,
    write_synthetic_cr2,
)

needs_native = pytest.mark.skipif(
    not native.available(), reason="native codec not built"
)


def _mosaic(h=64, w=96, seed=3, black=128, top=1.0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    scene = 0.4 + 0.3 * np.sin(xx / 7) * np.cos(yy / 9) + rng.normal(0, 0.01, (h, w))
    return np.clip(black + scene * top * 12000, 0, 16383).astype(np.uint16)


def test_unslice_roundtrip():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 16384, (10, 34), np.uint16)
    n, w1 = 2, 12
    w_last = 34 - n * w1
    pieces = [img[:, k * w1 : k * w1 + (w1 if k < n else w_last)].reshape(-1)
              for k in range(n + 1)]
    flat = np.concatenate(pieces)
    np.testing.assert_array_equal(_unslice(flat, 10, [n, w1, w_last]), img)


def test_wb_from_colordata_offsets():
    for count, off in ((582, 2), (653, 4), (5120, 8), (1273, 63)):
        words = [0] * count
        words[off : off + 4] = [2048, 1024, 1024, 1536]
        n = _wb_neutral_from_colordata(words)
        np.testing.assert_allclose(n, [0.5, 1.0, 2.0 / 3.0])


@needs_native
def test_cr2_signature_and_load_dispatch():
    data = write_synthetic_cr2(_mosaic())
    assert is_cr2(data)
    from pysp_tpu.io.raw_loader import load_raw

    frame = load_raw(data)
    assert frame.bayer.shape == (64, 96)


@needs_native
@pytest.mark.parametrize("n_slices", [1, 2, 3])
def test_cr2_pixel_roundtrip(n_slices):
    """Decoded normalized mosaic == (stored - black) / (white - black)."""
    mosaic = _mosaic()
    data = write_synthetic_cr2(mosaic, n_slices=n_slices)
    assert _sof3_precision(data) == 14
    frame = load_raw_cr2(data)
    want = np.clip((mosaic.astype(np.float64) - 0.0), 0, 16383) / 16383.0
    np.testing.assert_allclose(
        np.asarray(frame.bayer), want.astype(np.float32), atol=1e-6
    )


@needs_native
def test_cr2_borders_black_level_and_pattern():
    """Masked region sets the black level; odd borders flip the CFA pattern."""
    from pysp_tpu.const import BayerPattern

    h, w = 64, 96
    black = 512
    mosaic = _mosaic(h, w, black=black)
    # masked columns on the left: constant black
    mosaic[:, :8] = black
    borders = (9, 1, w - 2, h - 2)  # left, top, right, bottom (inclusive)
    data = write_synthetic_cr2(
        mosaic, borders=borders, black_mask=(0, 0, 7, h - 1)
    )
    frame = load_raw_cr2(data)

    top, left = borders[1], borders[0]
    hh = (borders[3] - top + 1) & ~1
    ww = (borders[2] - left + 1) & ~1
    assert frame.bayer.shape == (hh, ww)
    # (top, left) = (1, 9) -> both odd -> BGGR source, canonicalized to RGGB
    assert frame.source_pattern == BayerPattern.Bggr

    crop = mosaic[top : top + hh, left : left + ww].astype(np.float64)
    want = np.clip(crop - black, 0, 16383 - black) / (16383.0 - black)
    # canonical frame is the BGGR sensor flipped both ways
    np.testing.assert_allclose(
        np.asarray(frame.bayer), want[::-1, ::-1].astype(np.float32), atol=1e-6
    )


@needs_native
def test_cr2_wb_and_ev():
    data = write_synthetic_cr2(_mosaic(), wb_rggb=(2048, 1024, 1024, 1536))
    frame = load_raw_cr2(data)
    np.testing.assert_allclose(
        np.asarray(frame.wb_neutral), [0.5, 1.0, 2.0 / 3.0], atol=1e-6
    )
    # EV from 1/100s, f/4, ISO 100 (image.py:31-73 formula)
    assert np.isfinite(float(frame.ev))


@needs_native
def test_cr2_registered_matrix_is_used():
    from pysp_tpu.io.camera_matrices import (
        _REGISTRY,
        generic_matrices,
        register_camera_matrices,
    )

    mats = generic_matrices()
    mats[0].mat = mats[0].mat * 1.07  # distinguishable
    register_camera_matrices("Canon EOS SYNTH", mats)
    try:
        frame = load_raw_cr2(write_synthetic_cr2(_mosaic()))
        got = np.asarray(frame.cam_mat)
        base = load_raw_cr2(
            write_synthetic_cr2(_mosaic(), model=b"Canon EOS OTHER")
        )
        assert not np.allclose(got, np.asarray(base.cam_mat))
    finally:
        _REGISTRY.pop("Canon EOS SYNTH", None)


@needs_native
def test_cr2_develops():
    from pysp_tpu import DevelopConfig, QualityDemosaic, develop

    frame = load_raw_cr2(write_synthetic_cr2(_mosaic()))
    out = np.asarray(develop(frame, DevelopConfig(quality=QualityDemosaic.Fast)))
    assert out.shape == (64, 96, 3)
    assert np.isfinite(out).all()
