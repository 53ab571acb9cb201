"""Core data model: Bayer swizzle, normalization, pattern canonicalization."""
import numpy as np
import pytest

from pysp_tpu.const import BayerPattern
from pysp_tpu.core.bayer import (
    bayer_to_planes,
    bayer_to_rgbg,
    planes_to_bayer,
    reversible_transform_rggb,
    rgbg_to_bayer,
)
from pysp_tpu.core.normalization import bayer_normalize


def _ref_bayer_to_rgbg(rgbg):
    # Transcription of reference bayer_chan_mixer.py:4-21
    evens = rgbg[0::2, :].astype(np.float32)
    odds = rgbg[1::2, :].astype(np.float32)
    return evens[:, 0::2], evens[:, 1::2], odds[:, 1::2], odds[:, 0::2]


def _ref_rgbg_to_bayer(r, g1, b, g2):
    out = np.zeros((r.shape[0] * 2, r.shape[1] * 2), dtype=r.dtype)
    out[0::2, 0::2] = r
    out[0::2, 1::2] = g1
    out[1::2, 1::2] = b
    out[1::2, 0::2] = g2
    return out


def test_bayer_roundtrip_matches_reference():
    rng = np.random.default_rng(0)
    bayer = rng.random((8, 12)).astype(np.float32)
    r, g1, b, g2 = (np.asarray(p) for p in bayer_to_rgbg(bayer))
    rr, rg1, rb, rg2 = _ref_bayer_to_rgbg(bayer)
    np.testing.assert_array_equal(r, rr)
    np.testing.assert_array_equal(g1, rg1)
    np.testing.assert_array_equal(b, rb)
    np.testing.assert_array_equal(g2, rg2)

    back = np.asarray(rgbg_to_bayer(r, g1, b, g2))
    np.testing.assert_array_equal(back, _ref_rgbg_to_bayer(rr, rg1, rb, rg2))
    np.testing.assert_array_equal(back, bayer)


def test_planes_roundtrip_batched():
    rng = np.random.default_rng(1)
    bayer = rng.random((3, 8, 10)).astype(np.float32)
    planes = bayer_to_planes(bayer)
    assert planes.shape == (3, 4, 4, 5)
    np.testing.assert_array_equal(np.asarray(planes_to_bayer(planes)), bayer)


def test_normalize_matches_reference():
    rng = np.random.default_rng(2)
    raw = rng.integers(0, 4096, (16, 16)).astype(np.float32)
    black = np.array([256, 255, 254, 257], np.float32)
    sat = np.array([4095, 4094, 4093, 4092], np.float32)

    # reference normalization.py:4-25
    r, g1, b, g2 = _ref_bayer_to_rgbg(raw)
    r = np.clip(r - black[0], 0, sat[0]).astype(np.float32) / sat[0]
    g1 = np.clip(g1 - black[1], 0, sat[1]).astype(np.float32) / sat[1]
    b = np.clip(b - black[2], 0, sat[2]).astype(np.float32) / sat[2]
    g2 = np.clip(g2 - black[3], 0, sat[3]).astype(np.float32) / sat[3]
    expected = _ref_rgbg_to_bayer(r, g1, b, g2)

    got = np.asarray(bayer_normalize(raw, black, sat))
    np.testing.assert_allclose(got, expected, atol=1e-7)


@pytest.mark.parametrize(
    "pattern",
    [BayerPattern.Rggb, BayerPattern.Bggr, BayerPattern.Grbg, BayerPattern.Gbrg],
)
def test_reversible_transform_roundtrips_and_canonicalizes(pattern):
    rng = np.random.default_rng(3)
    bayer = rng.random((6, 8)).astype(np.float32)
    once = np.asarray(reversible_transform_rggb(bayer, pattern))
    twice = np.asarray(reversible_transform_rggb(once, pattern))
    np.testing.assert_array_equal(twice, bayer)

    # Canonicalization moves the pattern's R photosite to the (0,0) corner.
    # Build a mosaic where each photosite encodes its CFA color.
    cfa = {
        BayerPattern.Rggb: np.array([[0, 1], [1, 2]]),
        BayerPattern.Bggr: np.array([[2, 1], [1, 0]]),
        BayerPattern.Grbg: np.array([[1, 0], [2, 1]]),
        BayerPattern.Gbrg: np.array([[1, 2], [0, 1]]),
    }[pattern]
    tiled = np.tile(cfa, (3, 4)).astype(np.float32)
    canon = np.asarray(reversible_transform_rggb(tiled, pattern))
    np.testing.assert_array_equal(canon[:2, :2], np.array([[0, 1], [1, 2]]))
