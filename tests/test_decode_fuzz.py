"""Mutation fuzz over every built-in container: flips + truncations decode
cleanly or raise, never crash/hang/huge-allocate.

The reference delegates malformed-file robustness to libraw; the built-in
decoders must provide it themselves. Every mutated blob must either decode
(fuzz can leave a file valid) or raise a normal Python exception — and a
corrupted dimension field must hit the decode-dimension caps
(pysp_tpu.io.tiff.check_decode_dims), not a multi-gigapixel allocation.
"""
from __future__ import annotations

import struct

import numpy as np
import pytest

from pysp_tpu.io.raw_loader import load_raw
from pysp_tpu.io.tiff import MAX_DECODE_PIXELS, check_decode_dims

# exceptions a malformed file may legitimately raise from the host decode path
_CLEAN = (
    ValueError,
    KeyError,
    IndexError,
    NotImplementedError,
    EOFError,
    OverflowError,
    ZeroDivisionError,
    struct.error,
)


def _fixtures():
    from pysp_tpu.io.arw import write_synthetic_arw
    from pysp_tpu.io.cr2 import write_synthetic_cr2
    from pysp_tpu.io.cr3 import write_synthetic_cr3
    from pysp_tpu.io.mrw import write_synthetic_mrw
    from pysp_tpu.io.nef import write_synthetic_nef
    from pysp_tpu.io.orf import write_synthetic_orf
    from pysp_tpu.io.pef import write_synthetic_pef
    from pysp_tpu.io.raf import write_synthetic_raf
    from pysp_tpu.io.rw2 import write_synthetic_rw2
    from pysp_tpu.io.srw import write_synthetic_srw
    from pysp_tpu.io.tiff import write_synthetic_dng

    rng = np.random.default_rng(0)
    m = rng.integers(0, 1 << 11, (16, 224), dtype=np.uint16)
    smooth = np.clip(
        600 + np.cumsum(rng.integers(-20, 21, (16, 224)), axis=1), 30, 2000
    ).astype(np.uint16)
    return {
        "DNG": write_synthetic_dng(m),
        "CR2": write_synthetic_cr2(m),
        "CR3": write_synthetic_cr3(),
        "NEF": write_synthetic_nef(m),
        "ARW": write_synthetic_arw(m),
        "RW2": write_synthetic_rw2(smooth)[0],
        "ORF": write_synthetic_orf(m),
        "RAF": write_synthetic_raf(m),
        "PEF": write_synthetic_pef(m),
        "MRW": write_synthetic_mrw(m),
        "SRW": write_synthetic_srw(m),
    }


FIXTURES = _fixtures()


def _attempt(blob: bytes) -> None:
    """Decode must succeed with sane output or raise a clean exception."""
    try:
        frame = load_raw(blob)
    except _CLEAN:
        return
    sensor = np.asarray(frame.bayer)
    assert sensor.size <= MAX_DECODE_PIXELS
    assert sensor.dtype == np.float32


@pytest.mark.parametrize("fmt", sorted(FIXTURES))
def test_byte_flip_fuzz(fmt):
    base = FIXTURES[fmt]
    # zlib.crc32, not hash(): str hashes are salted per process, and a fuzz
    # that explores different offsets each run is unreproducible
    import zlib

    rng = np.random.default_rng(zlib.crc32(fmt.encode()))
    n = len(base)
    # sample offsets with a bias toward the header (metadata is the fragile part)
    offsets = np.concatenate(
        [
            rng.integers(0, min(256, n), 40),
            rng.integers(0, n, 24),
        ]
    )
    for off in offsets:
        for flip in (0xFF, 0x80, 0x01):
            blob = bytearray(base)
            blob[off] ^= flip
            _attempt(bytes(blob))


@pytest.mark.parametrize("fmt", sorted(FIXTURES))
def test_truncation_fuzz(fmt):
    base = FIXTURES[fmt]
    n = len(base)
    cuts = sorted({0, 1, 3, 7, 16, 64, n // 4, n // 2, n - 17, n - 1})
    for cut in cuts:
        _attempt(base[: max(0, cut)])


def test_dimension_caps_direct():
    check_decode_dims(4000, 6000)  # a real 24 MP sensor passes
    for h, w in [(0, 100), (100, 0), (-1, 4), (70_000, 4), (4, 70_000),
                 (30_000, 30_000)]:
        with pytest.raises(ValueError):
            check_decode_dims(h, w)


def test_corrupt_dng_dims_raise_not_allocate():
    """A DNG whose ImageLength field claims 4 gigapixels raises cleanly."""
    from pysp_tpu.io import tiff as T

    base = FIXTURES["DNG"]
    tf = T.read_tiff(base)
    raw_ifd = tf.find_raw_ifd()
    # rewrite the ImageLength tag value in place: find its 12-byte IFD entry
    blob = bytearray(base)
    needle = struct.pack("<HHL", T.TAG_IMAGE_LENGTH, 3, 1)
    idx = bytes(blob).find(needle)
    if idx < 0:  # LONG-typed variant
        needle = struct.pack("<HHL", T.TAG_IMAGE_LENGTH, 4, 1)
        idx = bytes(blob).find(needle)
    assert idx >= 0, "fixture layout changed; update the tag probe"
    blob[idx + 8 : idx + 12] = struct.pack("<L", 65_000)
    with pytest.raises((ValueError, KeyError)):
        load_raw(bytes(blob))
    assert raw_ifd is not None  # silence unused warning, fixture sanity
