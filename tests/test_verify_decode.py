"""verify-decode: first-contact cross-validation of built-in codecs vs rawpy.

VERDICT r3 item 5: the hand-built bitstream vectors are the best offline
evidence, but when a real libraw becomes reachable nothing turned that into
per-file parity reports. These tests drive the harness with the mock-rawpy
fixture (the real module is absent here): bit-equal parity, a seeded mismatch,
the no-oracle path, and the CLI surface.
"""
import json
import sys
import types

import numpy as np
import pytest

from pysp_tpu.io.tiff import write_synthetic_dng
from pysp_tpu.io.verify_decode import verify_decode


def _dng_with_u16(seed=5, shape=(32, 48)):
    rng = np.random.default_rng(seed)
    u16 = rng.integers(300, 3900, shape).astype(np.uint16)
    return u16, write_synthetic_dng(u16)


class _FakeRaw:
    def __init__(self, bayer_u16):
        self.raw_image = bayer_u16
        self.black_level_per_channel = [256] * 4
        self.camera_white_level_per_channel = [4095] * 4
        self.raw_pattern = np.array([[0, 1], [3, 2]])
        self.color_desc = b"RGBG"
        self.camera_whitebalance = [2100.0, 1024.0, 1700.0, 1024.0]

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def _install_mock_rawpy(monkeypatch, bayer_u16):
    fake = types.ModuleType("rawpy")
    fake.imread = lambda reader: _FakeRaw(bayer_u16)
    monkeypatch.setitem(sys.modules, "rawpy", fake)


def test_match_bit_exact(monkeypatch, tmp_path):
    u16, dng = _dng_with_u16()
    p = tmp_path / "a.dng"
    p.write_bytes(dng)
    _install_mock_rawpy(monkeypatch, u16)

    report = verify_decode(str(p), name="a.dng")
    assert report["format"] == "DNG"
    assert report["builtin"]["ok"] and report["rawpy"]["ok"]
    assert report["verdict"] == "match", report
    assert report["parity"]["bit_equal"] is True
    assert report["parity"]["pixels_differ"] == 0
    # both sides decode through the same normalization; EV metadata agrees
    assert report["parity"]["ev_diff"] < 1e-6


def test_mismatch_detected_and_quantified(monkeypatch, tmp_path):
    u16, dng = _dng_with_u16(seed=6)
    corrupted = u16.copy()
    corrupted[4:8, 4:8] += 512  # a decoder bug would look like this
    p = tmp_path / "b.dng"
    p.write_bytes(dng)
    _install_mock_rawpy(monkeypatch, corrupted)

    report = verify_decode(str(p))
    assert report["verdict"] == "mismatch"
    par = report["parity"]
    assert par["pixels_differ"] == 16
    assert par["bit_equal"] is False
    assert par["psnr_db"] is not None and par["psnr_db"] < 60.0
    # +512 counts, minus saturation clipping on the values pushed past 4095
    assert 0.05 < par["max_abs_diff"] <= 512 / (4095 - 256) + 1e-6


def test_rawpy_unavailable_reports_builtin_side(monkeypatch, tmp_path):
    _, dng = _dng_with_u16(seed=7)
    p = tmp_path / "c.dng"
    p.write_bytes(dng)
    # make `import rawpy` fail even if something registered a mock earlier
    monkeypatch.setitem(sys.modules, "rawpy", None)

    report = verify_decode(str(p))
    assert report["verdict"] == "rawpy-unavailable"
    assert report["builtin"]["ok"] is True
    assert report["rawpy"]["ok"] is False


def test_detects_native_formats(tmp_path):
    from pysp_tpu.io.cr2 import write_synthetic_cr2
    from pysp_tpu.io.verify_decode import _detect

    rng = np.random.default_rng(8)
    blob = write_synthetic_cr2(rng.integers(300, 3900, (24, 32)).astype(np.uint16))
    fmt, loader = _detect(blob)
    assert fmt == "CR2" and loader is not None

    _, dng = _dng_with_u16(seed=9)
    fmt, loader = _detect(dng)
    assert fmt == "DNG" and loader is not None


def test_cli_surface(monkeypatch, tmp_path, capsys):
    from pysp_tpu.cli import main

    u16, dng = _dng_with_u16(seed=10)
    p = tmp_path / "d.dng"
    p.write_bytes(dng)
    _install_mock_rawpy(monkeypatch, u16)

    rc = main(["verify-decode", str(p)])
    out = json.loads(capsys.readouterr().out)
    assert rc == 0
    assert out["verdict"] == "match"

    # a mismatching file flips the exit code
    _install_mock_rawpy(monkeypatch, u16 + 700)
    rc = main(["verify-decode", str(p)])
    out = json.loads(capsys.readouterr().out)
    assert rc == 1
    assert out["verdict"] == "mismatch"


def test_fallthrough_formats_report_no_builtin(monkeypatch):
    """Formats load_raw deliberately routes to rawpy (X-Trans RAF, ARW
    lossless, ...) classify 'no-builtin', not 'builtin-error'."""
    from pysp_tpu.io import verify_decode as vd

    monkeypatch.setattr(
        vd,
        "_detect",
        lambda src: (
            "ARW",
            lambda s: (_ for _ in ()).throw(
                ValueError("ARW: unsupported compression 7")
            ),
        ),
    )
    report = vd.verify_decode(b"xxxx")
    assert report["builtin"]["rawpy_fallthrough_by_design"] is True
    assert report["verdict"] == "no-builtin"  # rawpy absent here -> no oracle


def test_directory_sweep(monkeypatch, tmp_path, capsys):
    """verify-decode <dir> recurses, prints JSON lines + per-format summary
    table, and flips the exit code on any mismatch (VERDICT r4 item 7)."""
    from pysp_tpu.cli import main
    from pysp_tpu.io.cr2 import write_synthetic_cr2

    u16, dng = _dng_with_u16(seed=20)
    (tmp_path / "sub").mkdir()
    (tmp_path / "a.dng").write_bytes(dng)
    (tmp_path / "sub" / "b.DNG").write_bytes(dng)  # extension case-insensitive
    rng = np.random.default_rng(21)
    cr2_u16 = rng.integers(300, 3900, (24, 32)).astype(np.uint16)
    (tmp_path / "sub" / "c.cr2").write_bytes(write_synthetic_cr2(cr2_u16))
    (tmp_path / "notes.txt").write_text("not a raw")  # ignored by extension
    monkeypatch.setitem(sys.modules, "rawpy", None)  # no oracle -> all green

    rc = main(["verify-decode", str(tmp_path)])
    out = capsys.readouterr().out
    assert rc == 0
    lines = [ln for ln in out.splitlines() if ln.startswith("{")]
    assert len(lines) == 3
    reports = [json.loads(ln) for ln in lines]
    assert sorted(r["format"] for r in reports) == ["CR2", "DNG", "DNG"]
    assert all(r["verdict"] == "rawpy-unavailable" for r in reports)
    assert "format" in out and "TOTAL" in out  # summary table rendered

    # seed one mismatching file: oracle returns wrong pixels for everything
    _install_mock_rawpy(monkeypatch, u16 + 700)
    rc = main(["verify-decode", str(tmp_path / "sub")])
    out = capsys.readouterr().out
    assert rc == 1
    assert "mismatch" in out


def test_sweep_survives_crashing_file(tmp_path, monkeypatch):
    """A file that crashes the harness mid-tree becomes a builtin-error
    report; the sweep finishes the rest of the tree."""
    import pysp_tpu.io.verify_decode as vd

    _, dng = _dng_with_u16(seed=22)
    (tmp_path / "ok.dng").write_bytes(dng)
    (tmp_path / "bad.dng").write_bytes(dng)
    monkeypatch.setitem(sys.modules, "rawpy", None)

    real = vd.verify_decode

    def maybe_crash(src, name=None):
        if name and "bad" in name:
            raise OSError("disk went away")
        return real(src, name=name)

    monkeypatch.setattr(vd, "verify_decode", maybe_crash)
    reports, summary = vd.sweep_decode(
        [str(tmp_path / "bad.dng"), str(tmp_path / "ok.dng")]
    )
    assert reports[0]["verdict"] == "builtin-error"
    assert reports[1]["verdict"] == "rawpy-unavailable"
    assert summary["DNG"]["rawpy-unavailable"] == 1


def test_builtin_error_flips_cli_exit_code(monkeypatch, tmp_path, capsys):
    """A built-in decoder CRASH on a decodable file is the bug class the
    harness exists for: exit code 1, not a silent pass."""
    import pysp_tpu.io.verify_decode as vd
    from pysp_tpu.cli import main

    _, dng = _dng_with_u16(seed=11)
    p = tmp_path / "e.dng"
    p.write_bytes(dng)

    def broken(src):
        raise RuntimeError("decoder crashed")

    monkeypatch.setattr(vd, "_detect", lambda src: ("DNG", broken))
    rc = main(["verify-decode", str(p)])
    out = json.loads(capsys.readouterr().out)
    assert out["verdict"] == "builtin-error"
    assert rc == 1
