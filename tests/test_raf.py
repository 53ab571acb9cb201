"""Fujifilm RAF container decode (io/raf.py)."""
from __future__ import annotations

import numpy as np
import pytest

from pysp_tpu.io.raf import is_raf, load_raw_raf, write_synthetic_raf
from pysp_tpu.io.raw_loader import load_raw
from pysp_tpu.io.tiff import write_synthetic_dng


def _mosaic(h=64, w=80, seed=0, bits=14):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 1 << bits, (h, w), dtype=np.uint16)


def test_is_raf():
    stored = _mosaic()
    raf = write_synthetic_raf(stored)
    assert is_raf(raf)
    assert not is_raf(write_synthetic_dng(stored))
    assert not is_raf(b"FUJIFILM-NOT-RAW" + b"\x00" * 64)


def test_roundtrip_values_and_wb():
    stored = _mosaic(seed=1)
    raf = write_synthetic_raf(stored, wb_grgb=(302, 580, 302, 388))
    frame = load_raw_raf(raf)
    assert frame.bayer.shape == stored.shape
    white = float((1 << 14) - 1)
    np.testing.assert_allclose(
        np.asarray(frame.bayer), stored.astype(np.float64) / white, atol=1e-6
    )
    # neutral = mul_G / mul_chan for the (G, R, G2, B) record
    np.testing.assert_allclose(
        np.asarray(frame.wb_neutral),
        [302 / 580, 1.0, 302 / 388],
        rtol=1e-6,
    )
    assert np.isfinite(float(frame.ev))


def test_load_raw_dispatch():
    stored = _mosaic(seed=2)
    frame = load_raw(write_synthetic_raf(stored))
    assert frame.bayer.shape == stored.shape


def test_black_level_and_pattern():
    stored = _mosaic(seed=3)
    raf = write_synthetic_raf(stored, cfa_pattern=(2, 1, 1, 0))  # BGGR
    frame = load_raw_raf(raf)
    # canonicalized to RGGB internally; loader must not reject the pattern
    assert frame.bayer.shape == stored.shape


def test_xtrans_rejected():
    stored = _mosaic(seed=4)
    raf = write_synthetic_raf(stored, xtrans=True)
    with pytest.raises(ValueError, match="X-Trans"):
        load_raw_raf(raf)


def test_file_path_source(tmp_path):
    stored = _mosaic(seed=5)
    p = tmp_path / "synth.raf"
    p.write_bytes(write_synthetic_raf(stored))
    frame = load_raw_raf(str(p))
    assert frame.bayer.shape == stored.shape


def test_cli_info_raf(tmp_path, capsys):
    from pysp_tpu.cli import main

    p = tmp_path / "synth.raf"
    p.write_bytes(write_synthetic_raf(_mosaic(seed=6), model=b"GFX100S"))
    rc = main(["info", str(p)])
    assert rc == 0
    out = capsys.readouterr().out
    assert '"RAF"' in out and "GFX100S" in out


def test_exif_in_jpeg_thumbnail():
    """Real RAFs keep the exposure EXIF in the JPEG thumbnail's APP1 segment,
    not in the CFA-data TIFF — the loader must read EV from there (code-review
    r3 finding: the CFA-TIFF-only read made every real Bayer RAF unloadable)."""
    stored = _mosaic(seed=9)
    data = write_synthetic_raf(stored, exif_in_jpeg=True)
    frame = load_raw_raf(data)
    assert np.isfinite(float(frame.ev))
    # the CFA TIFF carries no EXIF IFD in this layout: the value came from APP1
    import struct

    from pysp_tpu.io import tiff as T

    off, ln = struct.unpack_from(">LL", data, 100)
    tf = T.read_tiff(data[off : off + ln])
    assert all(ifd.exif_ifd is None for ifd in tf.ifds)


def test_controller_rebuild_on_raf():
    """controller_for_source must survive non-TIFF containers (code-review r3
    finding: read_tiff raised and broke CLI --temperature / the compat class)."""
    from pysp_tpu.io.raw_loader import controller_for_source

    data = write_synthetic_raf(_mosaic(seed=10), exif_in_jpeg=True)
    frame = load_raw_raf(data)
    ctl = controller_for_source(data, frame)
    ctl.update_by_temperature(5200.0, allow_cross_blend=True)
    assert np.all(np.isfinite(ctl.get_reciprocal_multipliers()))
