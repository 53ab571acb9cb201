"""NEF decode: synthetic-fixture roundtrips through the native Huffman codec.

Mirrors test_cr2.py for the second built-in non-DNG format (reference opens
NEF via libraw, image.py:224): container walk, MakerNote embedded-TIFF
parsing, 0x0096 metadata (trees, vpred, curve), WB_RBLevels, CFA pattern from
the SubIFD, and load_raw dispatch.
"""
import numpy as np
import pytest

from pysp_tpu.io import native
from pysp_tpu.io.nef import is_nef, load_raw_nef, write_synthetic_nef

needs_native = pytest.mark.skipif(
    not native.available(), reason="native codec not built"
)


def _mosaic(h=64, w=96, seed=5, top=16383):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    scene = 0.4 + 0.3 * np.sin(xx / 7) * np.cos(yy / 9) + rng.normal(0, 0.01, (h, w))
    return np.clip(scene * top, 0, top).astype(np.uint16)


@needs_native
def test_nef_signature_and_dispatch():
    data = write_synthetic_nef(_mosaic())
    assert is_nef(data)
    from pysp_tpu.io.raw_loader import load_raw

    frame = load_raw(data)
    assert frame.bayer.shape == (64, 96)


@needs_native
@pytest.mark.parametrize("bits", [12, 14])
def test_nef_pixel_roundtrip(bits):
    top = (1 << bits) - 1
    mosaic = np.minimum(_mosaic(top=top), top)
    data = write_synthetic_nef(mosaic, bits=bits)
    frame = load_raw_nef(data)
    want = mosaic.astype(np.float64) / top
    np.testing.assert_allclose(
        np.asarray(frame.bayer), want.astype(np.float32), atol=1e-6
    )


@needs_native
def test_nef_wb_and_ev():
    data = write_synthetic_nef(_mosaic(), wb_rb=(2.0, 1.4))
    frame = load_raw_nef(data)
    np.testing.assert_allclose(
        np.asarray(frame.wb_neutral), [0.5, 1.0, 1.0 / 1.4], atol=1e-5
    )
    assert np.isfinite(float(frame.ev))


@needs_native
def test_nef_cfa_pattern_canonicalization():
    from pysp_tpu.const import BayerPattern

    mosaic = _mosaic()
    data = write_synthetic_nef(mosaic, cfa=(2, 1, 1, 0))  # BGGR
    frame = load_raw_nef(data)
    assert frame.source_pattern == BayerPattern.Bggr
    want = (mosaic.astype(np.float64) / 16383.0)[::-1, ::-1]
    np.testing.assert_allclose(
        np.asarray(frame.bayer), want.astype(np.float32), atol=1e-6
    )


@needs_native
def test_nef_linearization_curve():
    """Stored values index the curve LUT; normalization uses the curve max."""
    bits = 12
    curve = (np.arange(1 << bits, dtype=np.float64) ** 2 / (1 << bits)).astype(
        np.uint16
    )
    stored = np.minimum(_mosaic(top=(1 << bits) - 1), (1 << bits) - 1)
    data = write_synthetic_nef(stored, bits=bits, curve=curve)
    frame = load_raw_nef(data)
    want = curve[stored].astype(np.float64) / float(curve.max())
    np.testing.assert_allclose(
        np.asarray(frame.bayer), want.astype(np.float32), atol=1e-6
    )


@needs_native
def test_nef_develops():
    from pysp_tpu import DevelopConfig, QualityDemosaic, develop

    frame = load_raw_nef(write_synthetic_nef(_mosaic()))
    out = np.asarray(develop(frame, DevelopConfig(quality=QualityDemosaic.Fast)))
    assert out.shape == (64, 96, 3) and np.isfinite(out).all()
