"""Canon CR3 container metadata layer (io/cr3.py)."""
from __future__ import annotations

import numpy as np
import pytest

from pysp_tpu.io.cr3 import (
    cr3_info,
    is_cr3,
    load_raw_cr3,
    load_raw_cr3_rawpy,
    parse_cr3_meta,
    write_synthetic_cr3,
)
from pysp_tpu.io.tiff import write_synthetic_dng


def test_is_cr3():
    data = write_synthetic_cr3()
    assert is_cr3(data)
    assert not is_cr3(write_synthetic_dng(np.zeros((4, 4), np.uint16)))
    assert not is_cr3(b"\x00\x00\x00\x18ftypisom" + b"\x00" * 32)


def test_meta_blocks_present():
    meta = parse_cr3_meta(write_synthetic_cr3())
    assert set(meta) >= {"CNCV", "CMT1", "CMT2", "CMT3"}
    assert meta["CNCV"].startswith(b"CanonCR3")


def test_info_model_ev_wb():
    info = cr3_info(write_synthetic_cr3(model=b"Canon EOS R6", wb_rggb=(2100, 1024, 1024, 1700)))
    assert info["model"] == "Canon EOS R6"
    assert np.isfinite(info["ev"])
    np.testing.assert_allclose(
        info["as_shot_neutral"], [1024 / 2100, 1.0, 1024 / 1700], rtol=1e-6
    )


def test_load_raw_cr3_raises_clear_error():
    with pytest.raises(ValueError, match="CRX"):
        load_raw_cr3(write_synthetic_cr3())
    # without rawpy the dispatch surfaces the same clear message
    with pytest.raises(ValueError, match="rawpy"):
        load_raw_cr3_rawpy(write_synthetic_cr3())


def test_load_raw_dispatch_routes_cr3():
    from pysp_tpu.io.raw_loader import load_raw

    with pytest.raises(ValueError, match="CRX"):
        load_raw(write_synthetic_cr3())


def test_cli_info_cr3(tmp_path, capsys):
    from pysp_tpu.cli import main

    p = tmp_path / "synth.cr3"
    p.write_bytes(write_synthetic_cr3(model=b"Canon EOS R5"))
    rc = main(["info", str(p)])
    assert rc == 0
    out = capsys.readouterr().out
    assert '"CR3"' in out and "EOS R5" in out and "CRX" in out


def test_rawpy_path_with_mock(monkeypatch):
    """Pixels via a mock libraw, metadata from the CMT blocks."""
    import sys
    import types

    rng = np.random.default_rng(3)
    bayer = rng.integers(300, 3900, (32, 32)).astype(np.uint16)

    class FakeRaw:
        raw_image = bayer
        black_level_per_channel = [256] * 4
        camera_white_level_per_channel = [4095] * 4
        raw_pattern = np.array([[0, 1], [3, 2]])
        color_desc = b"RGBG"

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    fake = types.ModuleType("rawpy")
    fake.imread = lambda reader: FakeRaw()
    monkeypatch.setitem(sys.modules, "rawpy", fake)

    frame = load_raw_cr3_rawpy(write_synthetic_cr3(model=b"Canon EOS R5"))
    assert frame.bayer.shape == (32, 32)
    expect = np.clip(bayer.astype(np.float64) - 256, 0, 4095) / 4095
    np.testing.assert_allclose(np.asarray(frame.bayer), expect, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(frame.wb_neutral), [1024 / 2100, 1.0, 1024 / 1700], rtol=1e-6
    )


def test_largesize_and_malformed_boxes():
    import struct

    data = bytearray(write_synthetic_cr3())
    # rewrite the mdat box with a 64-bit largesize header: parser must walk it
    idx = data.find(b"mdat") - 4
    payload = bytes(data[idx + 8 :])
    large = struct.pack(">L", 1) + b"mdat" + struct.pack(">Q", 16 + len(payload)) + payload
    data = data[:idx] + large
    assert set(parse_cr3_meta(bytes(data))) >= {"CMT1"}
    # truncated box sizes must terminate cleanly, not loop or raise
    assert parse_cr3_meta(bytes(data[: idx + 6])) is not None
    bad = bytearray(write_synthetic_cr3())
    struct.pack_into(">L", bad, 0, 3)  # box size < 8
    assert parse_cr3_meta(bytes(bad)) == {}
