"""Minolta MRW container decode (io/mrw.py)."""
from __future__ import annotations

import struct

import numpy as np
import pytest

from pysp_tpu.io.mrw import (
    STORAGE_PACKED,
    STORAGE_UNPACKED,
    is_mrw,
    load_raw_mrw,
    write_synthetic_mrw,
)
from pysp_tpu.io.raw_loader import load_raw
from pysp_tpu.io.tiff import write_synthetic_dng


def _mosaic(h=64, w=80, seed=0, bits=12):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 1 << bits, (h, w), dtype=np.uint16)


def test_is_mrw():
    stored = _mosaic()
    mrw = write_synthetic_mrw(stored)
    assert is_mrw(mrw)
    assert not is_mrw(write_synthetic_dng(stored))
    assert not is_mrw(b"\x00MRX" + b"\x00" * 64)


@pytest.mark.parametrize("storage", [STORAGE_PACKED, STORAGE_UNPACKED])
def test_roundtrip_values_and_wb(storage):
    stored = _mosaic(seed=1)
    mrw = write_synthetic_mrw(
        stored, storage=storage, wb_gains=(359, 256, 256, 736)
    )
    frame = load_raw_mrw(mrw)
    assert frame.bayer.shape == stored.shape
    white = float((1 << 12) - 1)
    np.testing.assert_allclose(
        np.asarray(frame.bayer), stored.astype(np.float64) / white, atol=1e-6
    )
    # RGGB reading order: gains (R, G1, G2, B) / (64 << 2); neutral = gG/gchan
    np.testing.assert_allclose(
        np.asarray(frame.wb_neutral), [256 / 359, 1.0, 256 / 736], rtol=1e-6
    )
    assert np.isfinite(float(frame.ev))


def test_hand_built_packed_vector():
    """Byte-level vector worked on paper, independent of the fixture packer:
    12-bit big-endian MSB-first, 2 photosites per 3 bytes."""
    vals = np.array([[0xABC, 0xDEF], [0x123, 0x456]], np.uint16)
    strip = bytes([0xAB, 0xCD, 0xEF, 0x12, 0x34, 0x56])
    # splice the hand-packed strip into a writer-built container
    built = write_synthetic_mrw(vals, storage=STORAGE_PACKED)
    assert built.endswith(strip), "fixture packer disagrees with the paper packing"
    frame = load_raw_mrw(built)
    np.testing.assert_allclose(
        np.asarray(frame.bayer), vals.astype(np.float64) / 4095.0, atol=1e-6
    )


def test_gbrg_pattern():
    stored = _mosaic(seed=3)
    # GBRG reading order: gains are (G1, B, R, G2)
    mrw = write_synthetic_mrw(
        stored, pattern_code=0x0004, wb_gains=(256, 736, 359, 256)
    )
    frame = load_raw_mrw(mrw)
    assert frame.bayer.shape == stored.shape
    np.testing.assert_allclose(
        np.asarray(frame.wb_neutral), [256 / 359, 1.0, 256 / 736], rtol=1e-6
    )


def test_img_size_crop():
    stored = _mosaic(h=64, w=80, seed=4)
    mrw = write_synthetic_mrw(stored, img_dims=(60, 72))
    frame = load_raw_mrw(mrw)
    assert frame.bayer.shape == (60, 72)
    np.testing.assert_allclose(
        np.asarray(frame.bayer),
        stored[:60, :72].astype(np.float64) / 4095.0,
        atol=1e-6,
    )


def test_load_raw_dispatch():
    stored = _mosaic(seed=2)
    frame = load_raw(write_synthetic_mrw(stored))
    assert frame.bayer.shape == stored.shape


def test_file_path_source(tmp_path):
    stored = _mosaic(seed=5)
    p = tmp_path / "synth.mrw"
    p.write_bytes(write_synthetic_mrw(stored))
    frame = load_raw_mrw(str(p))
    assert frame.bayer.shape == stored.shape


def test_cli_info_mrw(tmp_path, capsys):
    from pysp_tpu.cli import main

    p = tmp_path / "synth.mrw"
    p.write_bytes(write_synthetic_mrw(_mosaic(seed=6), model=b"DYNAX 7D"))
    rc = main(["info", str(p)])
    assert rc == 0
    out = capsys.readouterr().out
    assert '"MRW"' in out and "DYNAX 7D" in out


def test_malformed_inputs_raise_cleanly():
    stored = _mosaic(seed=7)
    good = write_synthetic_mrw(stored)
    # truncated strip
    with pytest.raises(ValueError, match="truncated"):
        load_raw_mrw(good[:-64])
    # header length overruns the file
    bad = bytearray(good)
    struct.pack_into(">L", bad, 4, len(good) + 100)
    with pytest.raises(ValueError, match="overruns"):
        load_raw_mrw(bytes(bad))
    # unsupported storage method
    mrw = bytearray(write_synthetic_mrw(stored))
    prd_off = mrw.index(b"\x00PRD") + 8
    mrw[prd_off + 18] = 0x99
    with pytest.raises(ValueError, match="storage"):
        load_raw_mrw(bytes(mrw))


def test_compat_class_api():
    from pysp_tpu.compat import RawBayerDataFromRaw

    data = write_synthetic_mrw(_mosaic(seed=8))
    rd = RawBayerDataFromRaw(data)
    rggb = rd.to_rggb()
    assert rggb.sensor_scaled.shape == (64, 80)
    rd.cam_wb.update_by_temperature(5500.0, allow_cross_blend=True)
