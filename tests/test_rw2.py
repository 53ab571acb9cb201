"""Panasonic RW2 decode: synthetic-fixture roundtrips through the v4 codec.

Mirrors test_arw.py for the fourth built-in non-DNG format (the reference
opens RW2 via libraw, image.py:224, and special-cases the Panasonic ISO maker
tag 0x0017 at image.py:68-70): the v4 bitstream (rotated 0x4000 sections,
down-counting cursor, 14-pixel packets), the 0x55 TIFF magic, Panasonic IFD0
private tags (borders, CFA phase, blacks, WB levels), and load_raw dispatch.
"""
import numpy as np
import pytest

from pysp_tpu.io.rw2 import (
    is_rw2,
    load_raw_rw2,
    pana_v4_decode,
    pana_v4_encode,
    write_synthetic_rw2,
)

H, W = 16, 56  # w % 14 == 0


def _smooth12(h=H, w=W, seed=7):
    """12-bit mosaic with small column-to-column steps: v4 delta coding is
    exact when jumps fit an 8-bit code at shift 0 (|step| <= 127 against the
    same-parity predecessor)."""
    rng = np.random.default_rng(seed)
    base = 600 + np.cumsum(rng.integers(-20, 21, (h, w)), axis=1)
    return np.clip(base, 30, 4000).astype(np.uint16)


def test_v4_roundtrip_exact_on_smooth_content():
    vals = _smooth12()
    blob, achieved = pana_v4_encode(vals)
    assert np.array_equal(achieved, vals)
    assert np.array_equal(pana_v4_decode(blob, H, W), vals)


def test_v4_random_content_decoder_matches_achieved_within_shift_quantum():
    rng = np.random.default_rng(3)
    vals = rng.integers(16, 4096, (8, 42)).astype(np.uint16)
    blob, achieved = pana_v4_encode(vals)
    assert np.array_equal(pana_v4_decode(blob, 8, 42), achieved)
    # shift 4 quantises deltas to 16; the greedy shift choice optimises a
    # 3-pixel horizon jointly, so one step of slack on top of the half-quantum
    assert np.abs(achieved.astype(int) - vals.astype(int)).max() <= 16


def test_v4_multi_section_stream():
    """One 0x4000-byte section carries 14336 pixels; cross into a second."""
    vals = _smooth12(32, 560, seed=11)
    blob, achieved = pana_v4_encode(vals)
    assert len(blob) == 2 * 0x4000
    assert np.array_equal(pana_v4_decode(blob, 32, 560), achieved)
    assert np.array_equal(achieved, vals)


def test_v4_packet_and_section_state_quirks():
    """Packet leaders clamp to >= 16, and the fixed-rate layout is exactly
    16 bytes per 14-pixel packet."""
    vals = _smooth12(2, 28)
    vals[:, :2] = 3  # below the initialiser floor
    blob, achieved = pana_v4_encode(vals)
    assert achieved[0, 0] == 16 and achieved[1, 0] == 16
    assert np.array_equal(pana_v4_decode(blob, 2, 28), achieved)


def test_rw2_signature_and_dispatch():
    from pysp_tpu.io.raw_loader import load_raw

    data, _ = write_synthetic_rw2(_smooth12())
    assert data[:4] == b"II\x55\x00"
    assert is_rw2(data)
    frame = load_raw(data)  # dispatches to the RW2 loader
    assert frame.bayer.shape == (H, W)


def test_rw2_pixel_values_and_blacks():
    """Loader output = (stored - per-channel black) / (4095 - ... ) per plane."""
    vals = _smooth12(seed=5)
    black = (143, 142, 141)
    data, achieved = write_synthetic_rw2(vals, black_rgb=black, cfa_phase=1)
    frame = load_raw_rw2(data)
    got = np.asarray(frame.bayer, np.float64)
    # RGGB: plane -> black channel
    for (dy, dx), b in (
        ((0, 0), 143.0), ((0, 1), 142.0), ((1, 0), 142.0), ((1, 1), 141.0)
    ):
        want = np.clip(achieved[dy::2, dx::2].astype(np.float64) - b, 0, 4095.0)
        want = want / 4095.0
        np.testing.assert_allclose(got[dy::2, dx::2], want, atol=2e-7)


def test_rw2_ev_uses_panasonic_iso_quirk():
    """The fixture has no EXIF ISO tag — EV must come from maker tag 0x0017
    (reference image.py:68-70)."""
    data, _ = write_synthetic_rw2(_smooth12(), iso=200)
    lo = load_raw_rw2(data)
    data2, _ = write_synthetic_rw2(_smooth12(), iso=800)
    hi = load_raw_rw2(data2)
    # EV = log2(N^2/t) - log2(ISO/100): 4x the ISO costs 2 EV
    np.testing.assert_allclose(float(lo.ev) - float(hi.ev), 2.0, atol=1e-5)
    np.testing.assert_allclose(float(lo.ev), np.log2(2.8**2 * 125) - 1.0, atol=1e-3)


def test_rw2_wb_neutral():
    data, _ = write_synthetic_rw2(_smooth12(), wb_rgb=(580, 263, 410))
    frame = load_raw_rw2(data)
    np.testing.assert_allclose(
        np.asarray(frame.wb_neutral), [263 / 580, 1.0, 263 / 410], atol=1e-6
    )


@pytest.mark.parametrize("phase,pattern", [(1, "RGGB"), (2, "GRBG"), (3, "GBRG"), (4, "BGGR")])
def test_rw2_cfa_phase_canonicalization(phase, pattern):
    """All four CFA phases canonicalise to RGGB planes holding the right colors."""
    vals = np.zeros((H, W), np.uint16)
    grid = {"R": 3000, "G": 2000, "B": 1000}
    for dy in (0, 1):
        for dx in (0, 1):
            vals[dy::2, dx::2] = grid[pattern[2 * dy + dx]]
    data, achieved = write_synthetic_rw2(vals, cfa_phase=phase, black_rgb=(0, 0, 0))
    assert np.array_equal(achieved, vals), "constant planes must encode exactly"
    frame = load_raw_rw2(data)
    from pysp_tpu.core.bayer import bayer_to_planes

    planes = np.asarray(bayer_to_planes(frame.bayer))
    # canonical RGGB plane order (R, G1, B, G2)
    np.testing.assert_allclose(planes[0], 3000 / 4095, atol=1e-6)
    np.testing.assert_allclose(planes[1], 2000 / 4095, atol=1e-6)
    np.testing.assert_allclose(planes[2], 1000 / 4095, atol=1e-6)
    np.testing.assert_allclose(planes[3], 2000 / 4095, atol=1e-6)


def test_rw2_odd_borders_shift_cfa_phase():
    """Active-area borders at odd sensor offsets shift the Bayer phase."""
    vals = np.zeros((H, W), np.uint16)
    # RGGB on the full grid
    for (dy, dx), v in (((0, 0), 3000), ((0, 1), 2000), ((1, 0), 2000), ((1, 1), 1000)):
        vals[dy::2, dx::2] = v
    data, _ = write_synthetic_rw2(
        vals, cfa_phase=1, black_rgb=(0, 0, 0), borders=(1, 1, H - 1, W - 1)
    )
    frame = load_raw_rw2(data)
    assert frame.bayer.shape == (H - 2, W - 2)
    from pysp_tpu.core.bayer import bayer_to_planes

    planes = np.asarray(bayer_to_planes(frame.bayer))
    np.testing.assert_allclose(planes[0], 3000 / 4095, atol=1e-6)  # R
    np.testing.assert_allclose(planes[2], 1000 / 4095, atol=1e-6)  # B


def test_rw2_rejects_newer_raw_formats():
    """RawFormat > 4 (v5 packed / v6/v7 compressed) must raise, not decode
    garbage through the v4 codec; load_raw lets it fall through to rawpy."""
    data, _ = write_synthetic_rw2(_smooth12())
    # patch the RawFormat tag value (SHORT, inline) from 4 to 6
    import struct

    idx = data.find(struct.pack("<HHL", 0x2D, 3, 1))
    assert idx > 0
    patched = data[: idx + 8] + struct.pack("<H", 6) + data[idx + 10 :]
    assert is_rw2(patched)
    with pytest.raises(ValueError, match="unsupported RawFormat"):
        load_raw_rw2(patched)
    from pysp_tpu.io.raw_loader import load_raw

    with pytest.raises(ValueError, match="rawpy"):
        load_raw(patched)  # falls through; rawpy absent here


def test_rw2_uncompressed_variant():
    vals = _smooth12()
    data, achieved = write_synthetic_rw2(vals, uncompressed=True)
    assert np.array_equal(achieved, vals)
    frame = load_raw_rw2(data)
    assert frame.bayer.shape == (H, W)


def test_native_codec_parity():
    """C++ fast path (native/dng_fast.cc rw2_*) is bit-identical to the
    pure-Python codec: same payload bytes, same achieved values, and each
    decoder reads the other's output."""
    from pysp_tpu.io import native

    if not native.has_rw2():
        pytest.skip("native codec not built")
    rng = np.random.default_rng(19)
    for vals in (
        _smooth12(12, 70, seed=2),
        rng.integers(0, 4096, (6, 28)).astype(np.uint16),
        _smooth12(20, 14 * 80, seed=4),  # crosses a section boundary
    ):
        h, w = vals.shape
        blob_py, ach_py = pana_v4_encode(vals)
        blob_c, ach_c = native.rw2_encode(vals)
        assert blob_py == blob_c
        assert np.array_equal(ach_py, ach_c)
        assert np.array_equal(native.rw2_decode(blob_py, h, w), ach_py)
        assert np.array_equal(pana_v4_decode(blob_c, h, w), ach_py)


def test_native_decode_fuzz_random_bitstreams():
    """Both decoders agree on arbitrary bytes (the decoder is total: any
    bitstream yields *some* pixel array; state quirks must match)."""
    from pysp_tpu.io import native

    if not native.has_rw2():
        pytest.skip("native codec not built")
    rng = np.random.default_rng(23)
    for trial in range(4):
        n = int(rng.integers(64, 3000))
        blob = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        h, w = 4, 42
        assert np.array_equal(
            native.rw2_decode(blob, h, w), pana_v4_decode(blob, h, w)
        )


def test_rw2_develops():
    from pysp_tpu import DevelopConfig, QualityDemosaic, develop

    data, _ = write_synthetic_rw2(_smooth12(32, 42))
    frame = load_raw_rw2(data)
    out = np.asarray(develop(frame, DevelopConfig(quality=QualityDemosaic.Fast)))
    assert out.shape == (32, 42, 3) and np.isfinite(out).all()
