"""CLI surface: ``develop``/``info`` driven in-process on synthetic fixtures.

The reference has no CLI (README usage is import-only); this gates the rebuild's
production entry point — argument wiring, format dispatch, PNG output, stats and
metadata JSON — on the CPU backend the conftest forces.
"""
import json

import numpy as np
import pytest

from pysp_tpu.cli import main
from pysp_tpu.io.arw import write_synthetic_arw
from pysp_tpu.io.tiff import write_synthetic_dng


@pytest.fixture(scope="module")
def dng_path(tmp_path_factory):
    rng = np.random.default_rng(3)
    h, w = 64, 96
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    scene = 0.4 + 0.3 * np.sin(xx / 9) * np.cos(yy / 7)
    u16 = np.clip(200 + scene * 3000 + rng.normal(0, 5, (h, w)), 0, 65535)
    p = tmp_path_factory.mktemp("cli") / "scene.dng"
    p.write_bytes(write_synthetic_dng(u16.astype(np.uint16)))
    return str(p)


@pytest.fixture(scope="module")
def arw_path(tmp_path_factory):
    rng = np.random.default_rng(4)
    base = np.repeat(rng.integers(200, 1700, (32, 2)), 32, axis=1)
    st = np.clip(base + rng.integers(0, 100, (32, 64)), 0, 0x7FF).astype(np.uint16)
    p = tmp_path_factory.mktemp("cli") / "scene.arw"
    p.write_bytes(write_synthetic_arw(st))
    return str(p)


def _read_png(path):
    from PIL import Image

    return np.asarray(Image.open(path))


def test_cli_develop_dng(dng_path, tmp_path):
    out = str(tmp_path / "out.png")
    assert main(["develop", dng_path, "-o", out, "--quality", "fast"]) == 0
    im = _read_png(out)
    assert im.shape == (64, 96, 3) and im.dtype == np.uint8


def test_cli_develop_draft_and_stats(dng_path, tmp_path, capsys):
    out = str(tmp_path / "out.png")
    rc = main(["develop", dng_path, "-o", out, "--quality", "draft", "--stats"])
    assert rc == 0
    stats = json.loads(capsys.readouterr().err)
    assert "sensor" in stats and "output" in stats


def test_cli_develop_arw(arw_path, tmp_path):
    out = str(tmp_path / "arw.png")
    assert main(["develop", arw_path, "-o", out, "--quality", "draft"]) == 0
    assert _read_png(out).shape == (32, 64, 3)


def test_cli_develop_warp(tmp_path):
    """--warp applies the embedded OpcodeList3; output differs from unwarped."""
    from pysp_tpu.warp.opcodes import encode_warp_rectilinear

    rng = np.random.default_rng(5)
    u16 = np.clip(
        200 + rng.random((64, 96)) * 3000, 0, 65535
    ).astype(np.uint16)
    block = encode_warp_rectilinear(
        [(1.02, -0.05, 0.0, 0.0, 0.0, 0.0)] * 3, (0.5, 0.5)
    )
    src = str(tmp_path / "warped.dng")
    with open(src, "wb") as f:
        f.write(write_synthetic_dng(u16, opcode_list_3=block))

    out_plain = str(tmp_path / "plain.png")
    out_warp = str(tmp_path / "warp.png")
    assert main(["develop", src, "-o", out_plain, "--quality", "draft"]) == 0
    assert main(
        ["develop", src, "-o", out_warp, "--quality", "draft", "--warp"]
    ) == 0
    a, b = _read_png(out_plain), _read_png(out_warp)
    assert a.shape == b.shape and not np.array_equal(a, b)


def test_cli_develop_warp_absent_is_noop(dng_path, tmp_path, capsys):
    """--warp on a file without OpcodeList3 warns and still succeeds."""
    out = str(tmp_path / "o.png")
    assert main(["develop", dng_path, "-o", out, "--quality", "draft", "--warp"]) == 0
    assert "no OpcodeList3" in capsys.readouterr().err


def test_cli_develop_ca(dng_path, tmp_path, capsys):
    """--ca runs the blind fit end-to-end; a featureless scene fails the fit
    gracefully (warn + develop untouched) rather than crashing."""
    out = str(tmp_path / "ca.png")
    assert main(["develop", dng_path, "-o", out, "--quality", "draft", "--ca"]) == 0
    assert _read_png(out).shape == (64, 96, 3)
    assert "CA fit failed" in capsys.readouterr().err


def test_cli_develop_ca_gradient(dng_path, tmp_path, capsys):
    """--ca gradient needs no detectable features: the differentiable fit
    runs (and corrects) even on the featureless fixture the template fit
    rejects above."""
    out = str(tmp_path / "ca_grad.png")
    assert main(
        ["develop", dng_path, "-o", out, "--quality", "draft", "--ca", "gradient"]
    ) == 0
    assert _read_png(out).shape == (64, 96, 3)
    assert "CA fit failed" not in capsys.readouterr().err


def test_cli_temperature_works_on_arw(arw_path, tmp_path):
    """--temperature rebuilds WB for MakerNote formats too (used to require a
    DNG: the old path went through load_raw_dng + EXIF matrices only)."""
    out = str(tmp_path / "t.png")
    rc = main(
        ["develop", arw_path, "-o", out, "--quality", "draft",
         "--temperature", "5000"]
    )
    assert rc == 0
    assert _read_png(out).shape == (32, 64, 3)


def test_cli_temperature_bggr_orientation(tmp_path):
    """--temperature on a BGGR file matches the RGGB result flipped (the old
    path fed the canonical mosaic back through canonicalization, undoing it)."""
    rng = np.random.default_rng(8)
    h, w = 64, 96
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    scene = 0.4 + 0.3 * np.sin(xx / 9) * np.cos(yy / 7)
    rggb = np.clip(300 + scene * 3000 + rng.normal(0, 5, (h, w)), 0, 4095)
    rggb = rggb.astype(np.uint16)
    bggr = rggb[::-1, ::-1]  # same canonical mosaic, BGGR orientation

    p_rggb = str(tmp_path / "r.dng")
    p_bggr = str(tmp_path / "b.dng")
    with open(p_rggb, "wb") as f:
        f.write(write_synthetic_dng(rggb))
    with open(p_bggr, "wb") as f:
        f.write(write_synthetic_dng(bggr, cfa_pattern=(2, 1, 1, 0)))

    o_rggb = str(tmp_path / "r.png")
    o_bggr = str(tmp_path / "b.png")
    args = ["--quality", "draft", "--temperature", "5500"]
    assert main(["develop", p_rggb, "-o", o_rggb] + args) == 0
    assert main(["develop", p_bggr, "-o", o_bggr] + args) == 0
    np.testing.assert_array_equal(
        _read_png(o_bggr), _read_png(o_rggb)[::-1, ::-1]
    )


def test_cli_filters(dng_path, tmp_path):
    """--unsharp/--deconv/--blur run on LINEAR output, then gamma re-applies:
    outputs differ from the unfiltered develop but stay valid images."""
    base = str(tmp_path / "base.png")
    assert main(["develop", dng_path, "-o", base, "--quality", "draft"]) == 0
    ref = _read_png(base)

    for name, flags in (
        ("unsharp", ["--unsharp", "1.5:2.0"]),
        ("deconv", ["--deconv", "1.0:5"]),
        ("blur", ["--blur", "1.2"]),
    ):
        out = str(tmp_path / f"{name}.png")
        assert main(
            ["develop", dng_path, "-o", out, "--quality", "draft"] + flags
        ) == 0
        im = _read_png(out)
        assert im.shape == ref.shape
        assert not np.array_equal(im, ref), name

    # blur + no-gamma stays linear (darker midtones than the encoded blur)
    out_lin = str(tmp_path / "blur_lin.png")
    assert main(
        ["develop", dng_path, "-o", out_lin, "--quality", "draft",
         "--blur", "1.2", "--no-gamma"]
    ) == 0
    assert _read_png(out_lin).mean() < _read_png(str(tmp_path / "blur.png")).mean()


def test_cli_info_dng(dng_path, capsys):
    assert main(["info", dng_path]) == 0
    meta = json.loads(capsys.readouterr().out)
    assert meta["format"] == "DNG/TIFF"
    assert meta["size"] == [64, 96]
    assert np.isfinite(meta["ev"])


def test_cli_info_arw_reports_makernote_wb(arw_path, capsys):
    assert main(["info", arw_path]) == 0
    meta = json.loads(capsys.readouterr().out)
    assert meta["format"] == "ARW"
    # WB comes from the Sony MakerNote (WB_RGGBLevels), not DNG EXIF tags
    np.testing.assert_allclose(
        meta["as_shot_neutral"], [0.5, 1.0, 1024.0 / 1433.0], atol=1e-5
    )


def test_cli_bit_depth_16_png(tmp_path):
    """--bit-depth 16 writes a true 16-bit PNG (native fast writer)."""
    import struct

    from pysp_tpu.io import native

    if not native.has_png():
        import pytest

        pytest.skip("native library not built")

    rng = np.random.default_rng(31)
    u16 = rng.integers(300, 3900, (32, 48)).astype(np.uint16)
    src = str(tmp_path / "d16.dng")
    with open(src, "wb") as f:
        f.write(write_synthetic_dng(u16))
    out = str(tmp_path / "d16.png")
    rc = main(["develop", src, "-o", out, "--quality", "draft",
               "--bit-depth", "16"])
    assert rc == 0
    data = open(out, "rb").read()
    # IHDR bit depth byte (offset: 8 sig + 8 chunk hdr + 8 w/h)
    assert data[24] == 16 and data[25] == 2  # 16-bit, RGB
    # and the default stays 8-bit
    out8 = str(tmp_path / "d8.png")
    assert main(["develop", src, "-o", out8, "--quality", "draft"]) == 0
    assert open(out8, "rb").read()[24] == 8
