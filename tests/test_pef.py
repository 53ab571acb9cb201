"""Pentax PEF decode: container, codec, MakerNote, and loader dispatch."""
import numpy as np
import numpy.testing as npt
import pytest

from pysp_tpu.io import native
from pysp_tpu.io.pef import (
    is_pef,
    load_raw_pef,
    make_huff_spec,
    parse_huff_spec,
    pef_decode,
    pef_encode,
    write_synthetic_pef,
)


def test_is_pef_accepts_fixture_rejects_others():
    vals = np.full((4, 4), 1000, np.uint16)
    assert is_pef(write_synthetic_pef(vals))

    from pysp_tpu.io.tiff import write_synthetic_dng

    # a DNG (no PENTAX make) and random bytes are rejected
    assert not is_pef(write_synthetic_dng(vals))
    assert not is_pef(b"II*\x00garbagegarbage")
    assert not is_pef(b"")


def test_codec_roundtrip_random():
    rng = np.random.default_rng(7)
    vals = rng.integers(0, 4096, (18, 26)).astype(np.uint16)
    blob, spec = make_huff_spec()
    payload = pef_encode(vals, spec)
    npt.assert_array_equal(pef_decode(payload, 18, 26, spec), vals)
    # spec blob parses back to the same tables
    pre2, len2 = parse_huff_spec(blob, "<")
    npt.assert_array_equal(pre2, spec[0])
    npt.assert_array_equal(len2, spec[1])


def test_codec_roundtrip_smooth_gradient():
    yy, xx = np.mgrid[0:12, 0:40]
    vals = (500 + 30 * np.sin(xx * 0.3) + 20 * yy).astype(np.uint16)
    _, spec = make_huff_spec()
    npt.assert_array_equal(pef_decode(pef_encode(vals, spec), 12, 40, spec), vals)


@pytest.mark.skipif(not native.has_pef(), reason="native codec not built")
def test_native_decode_matches_python():
    rng = np.random.default_rng(3)
    vals = rng.integers(0, 4096, (16, 32)).astype(np.uint16)
    blob, spec = make_huff_spec()
    payload = pef_encode(vals, spec)
    nat = native.pef_decode(payload, 16, 32, blob, "<")
    pyd = pef_decode(payload, 16, 32, spec)
    npt.assert_array_equal(nat, pyd)
    npt.assert_array_equal(nat, vals)


def test_adversarial_vector_hand_built():
    """Bitstream assembled BY HAND from the published pentax_load_raw
    semantics (dcraw), with pixel values derived on paper — independent of
    pef_encode. Covers: both vpred banks, per-parity hpred chains, negative
    sign extension (v < 2^(L-1) -> v - 2^L + 1), a 12-bit max-symbol residual,
    and zero-length (sym 0) codes at stream end with zero-fill padding."""
    # canonical fixture code: sym lengths (2,2,2,3,4,5,6,7,8,9,10,11,11)
    codes = {
        0: "00", 1: "01", 2: "10", 3: "110", 4: "1110", 5: "11110",
        6: "111110", 7: "1111110", 8: "11111110", 9: "111111110",
        10: "1111111110", 11: "11111111110", 12: "11111111111",
    }
    # (symbol, value-bits) per pixel, row-major — hand-derived:
    stream = [
        (7, "1100100"),   # row0 col0: vpred[0][0] += 100          -> 100
        (8, "11001000"),  # row0 col1: vpred[0][1] += 200          -> 200
        (7, "1101110"),   # row0 col2: hpred[0]=100, +110          -> 210
        (4, "0101"),      # row0 col3: hpred[1]=200, v=5 -> -10    -> 190
        (7, "1101001"),   # row1 col0: vpred[1][0] += 105          -> 105
        (8, "11000011"),  # row1 col1: vpred[1][1] += 195          -> 195
        (4, "1111"),      # row1 col2: hpred[0]=105, +15           -> 120
        (6, "110111"),    # row1 col3: hpred[1]=195, +55           -> 250
        (2, "10"),        # row2 col0: vpred[0][0]=100, +2         -> 102
        (3, "100"),       # row2 col1: vpred[0][1]=200, +4         -> 204
        (7, "0011001"),   # row2 col2: hpred[0]=102, v=25 -> -102  -> 0
        (12, "111100110011"),  # row2 col3: hpred[1]=204, +3891    -> 4095
        (2, "00"),        # row3 col0: vpred[1][0]=105, v=0 -> -3  -> 102
        (0, ""),          # row3 col1: vpred[1][1]=195, diff 0     -> 195
        (0, ""),          # row3 col2: hpred[0]=102, diff 0        -> 102
        (0, ""),          # row3 col3: hpred[1]=195, diff 0        -> 195
    ]
    bits = "".join(codes[s] + v for s, v in stream)
    payload = bytes(
        int(bits[i : i + 8].ljust(8, "0"), 2) for i in range(0, len(bits), 8)
    )
    want = np.array(
        [
            [100, 200, 210, 190],
            [105, 195, 120, 250],
            [102, 204, 0, 4095],
            [102, 195, 102, 195],
        ],
        np.uint16,
    )
    blob, spec = make_huff_spec()
    npt.assert_array_equal(pef_decode(payload, 4, 4, spec), want)
    if native.has_pef():
        npt.assert_array_equal(native.pef_decode(payload, 4, 4, blob, "<"), want)


def test_decoder_survives_fuzz():
    """Random payloads must decode (to garbage) or raise ValueError — never
    hang or crash. The fixture code is Kraft-complete so every 12-bit peek
    resolves; truncated streams zero-fill."""
    rng = np.random.default_rng(11)
    blob, spec = make_huff_spec()
    for n in (0, 1, 7, 64):
        payload = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        out = pef_decode(payload, 6, 8, spec, bits=12)
        assert out.shape == (6, 8) and out.dtype == np.uint16
        assert out.max() <= 4095
        if native.has_pef():
            npt.assert_array_equal(
                native.pef_decode(payload, 6, 8, blob, "<"), out
            )


def test_load_raw_pef_full_fixture():
    rng = np.random.default_rng(1)
    h, w = 20, 28
    vals = rng.integers(40, 4000, (h, w)).astype(np.uint16)
    data = write_synthetic_pef(
        vals, black_rggb=(32, 33, 34, 35), wb_rggb=(18000, 8192, 8192, 11000)
    )
    # the generic-matrix warning fires once per model per process: clear any
    # earlier test's firing so this check is order-independent
    from pysp_tpu.io import camera_matrices

    camera_matrices._warned_generic.discard("PENTAX SYNTH")
    with pytest.warns(UserWarning, match="generic"):
        frame = load_raw_pef(data)
    b = np.asarray(frame.bayer)
    assert b.shape == (h, w)
    for (dy, dx), blk in (((0, 0), 32), ((0, 1), 33), ((1, 0), 34), ((1, 1), 35)):
        expect = np.clip(vals[dy::2, dx::2].astype(np.float64) - blk, 0, 4095) / 4095
        npt.assert_allclose(b[dy::2, dx::2], expect, atol=1e-6)
    g = 8192.0
    npt.assert_allclose(
        np.asarray(frame.wb_neutral), [g / 18000, 1.0, g / 11000], rtol=1e-5
    )
    assert np.isfinite(float(frame.ev))


def test_load_raw_pef_uncompressed():
    rng = np.random.default_rng(2)
    vals = rng.integers(0, 4096, (12, 16)).astype(np.uint16)
    data = write_synthetic_pef(vals, uncompressed=True, black_rggb=(0, 0, 0, 0))
    frame = load_raw_pef(data)
    npt.assert_allclose(
        np.asarray(frame.bayer), vals.astype(np.float64) / 4095, atol=1e-6
    )


def test_load_raw_dispatches_pef():
    from pysp_tpu.io.raw_loader import load_raw

    vals = np.full((8, 8), 2000, np.uint16)
    data = write_synthetic_pef(vals)
    frame = load_raw(data)
    assert frame.bayer.shape == (8, 8)


def test_bggr_pattern_canonicalizes():
    vals = np.zeros((8, 8), np.uint16)
    vals[0::2, 0::2] = 3000  # TL brightest
    data = write_synthetic_pef(vals, cfa=(2, 1, 1, 0), black_rggb=(0, 0, 0, 0))
    frame = load_raw_pef(data)
    # BGGR: the bright TL photosites are BLUE; canonical RGGB puts B at (1,1)
    b = np.asarray(frame.bayer)
    assert b[1, 1] > 0.7 and b[0, 0] < 0.1
