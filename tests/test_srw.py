"""Samsung SRW decode (io/srw.py)."""
from __future__ import annotations

import numpy as np
import numpy.testing as npt
import pytest

from pysp_tpu.io import native
from pysp_tpu.io.srw import (
    is_srw,
    load_raw_srw,
    samsung_swap,
    srw_decode,
    srw_encode,
    write_synthetic_srw,
)
from pysp_tpu.io.raw_loader import load_raw
from pysp_tpu.io.tiff import write_synthetic_dng


def _mosaic(h=64, w=96, seed=0, bits=12):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 1 << bits, (h, w), dtype=np.uint16)


def test_is_srw():
    data = write_synthetic_srw(_mosaic())
    assert is_srw(data)
    assert not is_srw(write_synthetic_dng(_mosaic()))
    assert not is_srw(b"II*\x00" + b"\x00" * 64)


def test_roundtrip_compressed():
    vals = _mosaic(seed=1)
    data = write_synthetic_srw(vals, black_rggb=(0, 0, 0, 0), cfa=(0, 1, 1, 2))
    frame = load_raw_srw(data)
    assert frame.bayer.shape == vals.shape
    npt.assert_allclose(
        np.asarray(frame.bayer), vals.astype(np.float64) / 4095.0, atol=1e-6
    )


def test_roundtrip_gradients_and_flats():
    """Structured content exercises every opcode transition (op1/op2 ramps,
    op3 jumps, len-0 flats) and both predictors."""
    h, w = 32, 64
    yy, xx = np.mgrid[0:h, 0:w]
    vals = (
        2048
        + 900 * np.sin(xx / 5.0)
        + 600 * (yy % 7 == 0)
        - 500 * (xx > 40)
    ).astype(np.int64)
    vals = np.clip(vals, 0, 4095).astype(np.uint16)
    vals[8:12, :] = 777  # flat region -> zero residuals
    data = write_synthetic_srw(vals, black_rggb=(0, 0, 0, 0), cfa=(0, 1, 1, 2))
    frame = load_raw_srw(data)
    npt.assert_allclose(
        np.asarray(frame.bayer), vals.astype(np.float64) / 4095.0, atol=1e-6
    )


def test_black_and_wb():
    vals = _mosaic(seed=2)
    data = write_synthetic_srw(
        vals, wb_rggb=(580, 302, 302, 388), black_rggb=(60, 61, 62, 63)
    )
    frame = load_raw_srw(data)
    npt.assert_allclose(
        np.asarray(frame.wb_neutral), [302 / 580, 1.0, 302 / 388], rtol=1e-6
    )
    # GRBG reading order: TL=G1(61), TR=R(60), BL=B(63), BR=G2(62)
    white = 4095.0
    expect = np.empty(vals.shape, np.float64)
    for (dy, dx), blk in (((0, 0), 61), ((0, 1), 60), ((1, 0), 63), ((1, 1), 62)):
        expect[dy::2, dx::2] = (
            np.clip(vals[dy::2, dx::2].astype(np.float64) - blk, 0, white) / white
        )
    # frame.bayer is canonical RGGB; undo for comparison via the raw pattern
    from pysp_tpu.core.bayer import reversible_transform_rggb

    import jax.numpy as jnp

    back = np.asarray(
        reversible_transform_rggb(
            jnp.asarray(expect, jnp.float32), frame.source_pattern
        )
    )
    npt.assert_allclose(np.asarray(frame.bayer), back, atol=1e-6)


def test_native_matches_python():
    if not native.has_srw():
        pytest.skip("native codec not built")
    vals = _mosaic(h=16, w=32, seed=3)
    stored = samsung_swap(vals)
    payload, offsets = srw_encode(stored)
    py = srw_decode(payload, offsets, 0, 16, 32)
    nat = native.srw_decode(payload, offsets, 0, 16, 32)
    npt.assert_array_equal(py, nat)
    npt.assert_array_equal(py, stored)


def test_swap_is_involution_and_correct():
    a = np.arange(16, dtype=np.uint16).reshape(4, 4)
    s = samsung_swap(a)
    # TR of each 2x2 gets BL and vice versa
    assert s[0, 1] == a[1, 0] and s[1, 0] == a[0, 1]
    assert s[0, 0] == a[0, 0] and s[1, 1] == a[1, 1]
    npt.assert_array_equal(samsung_swap(s), a)


def test_uncompressed_variant():
    vals = _mosaic(seed=4)
    data = write_synthetic_srw(
        vals, uncompressed=True, black_rggb=(0, 0, 0, 0), cfa=(0, 1, 1, 2)
    )
    frame = load_raw_srw(data)
    npt.assert_allclose(
        np.asarray(frame.bayer), vals.astype(np.float64) / 4095.0, atol=1e-6
    )


def test_load_raw_dispatch_and_cli(tmp_path, capsys):
    vals = _mosaic(seed=5)
    frame = load_raw(write_synthetic_srw(vals))
    assert frame.bayer.shape == vals.shape

    from pysp_tpu.cli import main

    p = tmp_path / "synth.srw"
    p.write_bytes(write_synthetic_srw(vals, model=b"NX300"))
    rc = main(["info", str(p)])
    assert rc == 0
    out = capsys.readouterr().out
    assert '"SRW"' in out and "NX300" in out


def test_unsupported_compression_falls_through():
    """samsung2/3 generations (other compression tags) must raise the
    'unsupported compression' ValueError load_raw keys its fallthrough on."""
    import struct

    data = bytearray(write_synthetic_srw(_mosaic(seed=6)))
    # patch the raw IFD's compression value 32770 -> 32772
    idx = data.find(struct.pack("<HH", 0x0103, 3))
    assert idx > 0
    struct.pack_into("<H", data, idx + 8, 32772)
    with pytest.raises(ValueError, match="unsupported compression"):
        load_raw_srw(bytes(data))


def test_corrupt_stream_raises_cleanly():
    vals = _mosaic(h=8, w=16, seed=7)
    stored = samsung_swap(vals)
    payload, offsets = srw_encode(stored)
    # op2 underflow attack: a row-2 stream of repeated "0 00 10 10 10 10 ..."
    # decrements until the group length leaves [0, 16]
    bad = bytes([0b01010101] * 64)  # arbitrary garbage with op2 patterns
    try:
        srw_decode(bad, np.zeros(8, np.uint32), 0, 8, 16)
    except ValueError as e:
        assert "out of range" in str(e)
    # truncated payload: zero-fill semantics must not crash
    srw_decode(payload[: len(payload) // 2], offsets, 0, 8, 16)


def test_compat_class_api():
    from pysp_tpu.compat import RawBayerDataFromRaw

    data = write_synthetic_srw(_mosaic(seed=8))
    rd = RawBayerDataFromRaw(data)
    rggb = rd.to_rggb()
    assert rggb.sensor_scaled.shape == (64, 96)
