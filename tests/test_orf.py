"""Olympus ORF decode: synthetic-fixture roundtrips through the lossless codec.

Mirrors test_rw2.py for the sixth built-in raw format (the reference opens ORF
via libraw, image.py:224): the dcraw-documented compressed bitstream (unary
magnitude classes, carry chains, W/N/NW gradient predictor), the "IIRO" TIFF
magic, the Olympus MakerNote (offsets relative to its own start) with the
ImageProcessing WB/black tags, the Compression=1-but-short-strip quirk, and
load_raw dispatch.
"""
import numpy as np
import pytest

from pysp_tpu.io.orf import (
    is_orf,
    load_raw_orf,
    olympus_decode,
    olympus_encode,
    write_synthetic_orf,
)

H, W = 16, 64


def _smooth12(h=H, w=W, seed=7):
    rng = np.random.default_rng(seed)
    base = 600 + np.cumsum(rng.integers(-20, 21, (h, w)), axis=1)
    return np.clip(base, 30, 4000).astype(np.uint16)


def test_codec_lossless_all_content():
    rng = np.random.default_rng(3)
    for vals in (
        _smooth12(),
        rng.integers(0, 4096, (8, 32)).astype(np.uint16),
        np.where(rng.random((8, 32)) < 0.5, 0, 4095).astype(np.uint16),
        np.zeros((4, 8), np.uint16),
    ):
        h, w = vals.shape
        assert np.array_equal(olympus_decode(olympus_encode(vals), h, w), vals)


def test_native_codec_parity():
    """C++ fast path is bit-identical to the Python codec both directions."""
    from pysp_tpu.io import native

    if not native.has_orf():
        pytest.skip("native codec not built")
    rng = np.random.default_rng(11)
    for vals in (_smooth12(12, 48, seed=2), rng.integers(0, 4096, (6, 20)).astype(np.uint16)):
        h, w = vals.shape
        blob_py = olympus_encode(vals)
        blob_c = native.orf_encode(vals)
        assert blob_py == blob_c
        assert np.array_equal(native.orf_decode(blob_py, h, w), vals)
        assert np.array_equal(olympus_decode(blob_c, h, w), vals)


def test_native_decode_fuzz_random_bitstreams():
    from pysp_tpu.io import native

    if not native.has_orf():
        pytest.skip("native codec not built")
    rng = np.random.default_rng(23)
    for _ in range(4):
        n = int(rng.integers(64, 2000))
        blob = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        assert np.array_equal(
            native.orf_decode(blob, 4, 20), olympus_decode(blob, 4, 20)
        )


def test_orf_signature_and_dispatch():
    from pysp_tpu.io.raw_loader import load_raw

    data = write_synthetic_orf(_smooth12())
    assert data[:4] == b"IIRO"
    assert is_orf(data)
    frame = load_raw(data)
    assert frame.bayer.shape == (H, W)


def test_orf_pixel_values_and_blacks():
    vals = _smooth12(seed=5)
    data = write_synthetic_orf(vals, black_rggb=(255, 254, 253, 252))
    frame = load_raw_orf(data)
    got = np.asarray(frame.bayer, np.float64)
    # default pattern RGGB; blacks (R, G1, G2, B) on (TL, TR, BL, BR)
    for (dy, dx), b in (
        ((0, 0), 255.0), ((0, 1), 254.0), ((1, 0), 253.0), ((1, 1), 252.0)
    ):
        want = np.clip(vals[dy::2, dx::2].astype(np.float64) - b, 0, 4095.0) / 4095.0
        np.testing.assert_allclose(got[dy::2, dx::2], want, atol=2e-7)


def test_orf_wb_and_ev():
    data = write_synthetic_orf(_smooth12(), wb_rb=(568, 412))
    frame = load_raw_orf(data)
    np.testing.assert_allclose(
        np.asarray(frame.wb_neutral), [256 / 568, 1.0, 256 / 412], atol=1e-6
    )
    # 1/200 s, f/4, ISO 200: EV = log2(16 * 200) - log2(2)
    np.testing.assert_allclose(float(frame.ev), np.log2(16 * 200) - 1.0, atol=1e-3)


def test_orf_uncompressed_strip():
    vals = _smooth12()
    data = write_synthetic_orf(vals, uncompressed=True)
    frame = load_raw_orf(data)
    assert frame.bayer.shape == (H, W)


def test_orf_develops():
    from pysp_tpu import DevelopConfig, QualityDemosaic, develop

    frame = load_raw_orf(write_synthetic_orf(_smooth12(32, 48)))
    out = np.asarray(develop(frame, DevelopConfig(quality=QualityDemosaic.Fast)))
    assert out.shape == (32, 48, 3) and np.isfinite(out).all()
