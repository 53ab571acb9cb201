"""Sony ARW decode: synthetic-fixture roundtrips through the ARW2 block codec.

Mirrors test_cr2.py/test_nef.py for the third built-in non-DNG format (the
reference opens ARW via libraw, image.py:224): ARW2 delta-block codec, Sony
MakerNote (file-absolute offsets), 0x7010 tone curve, WB_RGGBLevels, CFA
pattern from the SubIFD, and load_raw dispatch. Pure NumPy — no native codec.
"""
import numpy as np
import pytest

from pysp_tpu.io.arw import (
    arw2_decode,
    arw2_encode,
    is_arw,
    load_raw_arw,
    sony_curve_table,
    write_synthetic_arw,
)


def _stored11(h=64, w=96, seed=7, spread=100):
    """11-bit mosaic whose per-block spread < 128 so ARW2 encoding is exact.

    A block covers one column parity of a 32-col span, so the base must be
    constant per (row, 32-col span); the noise supplies the in-block spread.
    """
    rng = np.random.default_rng(seed)
    base = rng.integers(200, 0x7FF - spread, (h, w // 32))
    base = np.repeat(base, 32, axis=1)
    noise = rng.integers(0, spread, (h, w))
    return np.clip(base + noise, 0, 0x7FF).astype(np.uint16)


def test_arw2_roundtrip_exact_when_spread_small():
    stored = _stored11()
    assert np.array_equal(arw2_decode(arw2_encode(stored), 64, 96), stored)


def test_arw2_roundtrip_lossy_bounds():
    """Full-range blocks: max/min exact, others within the shift quantum."""
    rng = np.random.default_rng(3)
    stored = rng.integers(0, 0x800, (8, 64)).astype(np.uint16)
    got = arw2_decode(arw2_encode(stored), 8, 64).astype(np.int64)
    want = stored.astype(np.int64)
    # per 16-site block (parity-interleaved over a 32-col span)
    for r in range(8):
        for b in range(4):
            cols = np.arange(16) * 2 + (b % 2) + 32 * (b // 2)
            blk_w, blk_g = want[r, cols], got[r, cols]
            sh = 0
            while sh < 4 and (0x80 << sh) <= blk_w.max() - blk_w.min():
                sh += 1
            assert blk_g[blk_w.argmax()] == blk_w.max()
            assert blk_g[blk_w.argmin()] == blk_w.min()
            assert np.all(np.abs(blk_g - blk_w) < (1 << sh) + 1)
            assert np.all(blk_g <= 0x7FF)


def test_arw_signature_and_dispatch():
    data = write_synthetic_arw(_stored11())
    assert is_arw(data)
    from pysp_tpu.io.raw_loader import load_raw

    frame = load_raw(data)
    assert frame.bayer.shape == (64, 96)


def test_arw_pixel_roundtrip_default_curve():
    """No 0x7010 curve -> linear slope-16 table; normalized = stored / 0x7FF."""
    stored = _stored11()
    frame = load_raw_arw(write_synthetic_arw(stored))
    want = stored.astype(np.float64) / 0x7FF
    np.testing.assert_allclose(
        np.asarray(frame.bayer), want.astype(np.float32), atol=1e-6
    )


def test_arw_wb_and_ev():
    frame = load_raw_arw(
        write_synthetic_arw(_stored11(), wb_rggb=(2048, 1024, 1024, 1433))
    )
    np.testing.assert_allclose(
        np.asarray(frame.wb_neutral), [0.5, 1.0, 1024.0 / 1433.0], atol=1e-5
    )
    assert np.isfinite(float(frame.ev))


def test_arw_cfa_pattern_canonicalization():
    from pysp_tpu.const import BayerPattern

    stored = _stored11()
    frame = load_raw_arw(write_synthetic_arw(stored, cfa=(2, 1, 1, 0)))  # BGGR
    assert frame.source_pattern == BayerPattern.Bggr
    want = (stored.astype(np.float64) / 0x7FF)[::-1, ::-1]
    np.testing.assert_allclose(
        np.asarray(frame.bayer), want.astype(np.float32), atol=1e-6
    )


def test_arw_sony_curve():
    """0x7010 knots bend the LUT: slope doubles per segment, indexed at v<<1."""
    knots = (0x800, 0x1000, 0x2000, 0x3000)
    table = sony_curve_table(np.array(knots, np.uint16))
    bounds = [(k >> 2) & 0xFFF for k in knots]
    # slope within each segment
    assert table[1] - table[0] == 1
    assert table[bounds[0] + 1] - table[bounds[0]] == 2
    assert table[bounds[1] + 1] - table[bounds[1]] == 4
    assert table[bounds[2] + 1] - table[bounds[2]] == 8
    assert table[bounds[3] + 1] - table[bounds[3]] == 16
    assert np.all(np.diff(table.astype(np.int64)) >= 0)

    stored = _stored11()
    frame = load_raw_arw(write_synthetic_arw(stored, curve_knots=knots))
    want = table[stored.astype(np.int64) << 1] / float(table[0x7FF << 1])
    np.testing.assert_allclose(
        np.asarray(frame.bayer), want.astype(np.float32), atol=1e-6
    )


def test_arw_develops():
    from pysp_tpu import DevelopConfig, QualityDemosaic, develop

    frame = load_raw_arw(write_synthetic_arw(_stored11()))
    out = np.asarray(develop(frame, DevelopConfig(quality=QualityDemosaic.Fast)))
    assert out.shape == (64, 96, 3) and np.isfinite(out).all()


def test_native_arw2_matches_python():
    from pysp_tpu.io import native

    if not native.has_arw2():
        import pytest

        pytest.skip("native codec not built")
    import numpy as np

    from pysp_tpu.io.arw import arw2_decode, arw2_encode

    rng = np.random.default_rng(5)
    vals = rng.integers(0, 0x800, (24, 64), dtype=np.uint16)
    blob = arw2_encode(vals)
    py = arw2_decode(blob, 24, 64)
    nat = native.arw2_decode(blob, 24, 64)
    np.testing.assert_array_equal(py, nat)
