"""Cross-format routing matrix: every is_* detector must claim exactly its
own fixtures.

A misrouted file decodes as garbage silently (ADVICE r2 flagged exactly this
for is_rw2's missing magic check), so the detectors are tested pairwise
against every other format's synthetic fixture plus adversarial non-raw
bytes."""
from __future__ import annotations

import numpy as np
import pytest

from pysp_tpu.io.arw import is_arw, write_synthetic_arw
from pysp_tpu.io.cr2 import is_cr2, write_synthetic_cr2
from pysp_tpu.io.cr3 import is_cr3, write_synthetic_cr3
from pysp_tpu.io.mrw import is_mrw, write_synthetic_mrw
from pysp_tpu.io.nef import is_nef, write_synthetic_nef
from pysp_tpu.io.orf import is_orf, write_synthetic_orf
from pysp_tpu.io.pef import is_pef, write_synthetic_pef
from pysp_tpu.io.raf import is_raf, write_synthetic_raf
from pysp_tpu.io.rw2 import is_rw2, write_synthetic_rw2
from pysp_tpu.io.srw import is_srw, write_synthetic_srw
from pysp_tpu.io.tiff import write_synthetic_dng


def _mosaic(bits=11):
    # 11-bit values satisfy every fixture encoder (ARW2 stores 11-bit)
    rng = np.random.default_rng(0)
    # w = 224 = lcm of the encoders' width constraints (ARW 32, SRW 16, RW2 14)
    return rng.integers(0, 1 << bits, (16, 224), dtype=np.uint16)


@pytest.fixture(scope="module")
def fixtures():
    m = _mosaic()
    # v4 RW2 coding wants smooth column steps (see test_rw2._smooth12)
    rng = np.random.default_rng(7)
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


DETECTORS = {
    "CR2": is_cr2,
    "CR3": is_cr3,
    "NEF": is_nef,
    "ARW": is_arw,
    "RW2": is_rw2,
    "ORF": is_orf,
    "RAF": is_raf,
    "PEF": is_pef,
    "MRW": is_mrw,
    "SRW": is_srw,
}


def test_routing_matrix(fixtures):
    for fmt, data in fixtures.items():
        for det_fmt, det in DETECTORS.items():
            claimed = det(data)
            assert claimed == (fmt == det_fmt), (
                f"is_{det_fmt.lower()} returned {claimed} on a {fmt} fixture"
            )


def test_detectors_reject_garbage(fixtures):
    rng = np.random.default_rng(1)
    garbage = [
        b"",
        b"\x00",
        bytes(rng.integers(0, 256, 64, dtype=np.uint8)),
        b"II*\x00" + b"\xff" * 8,   # TIFF magic, broken body
        b"MM\x00*" + b"\xff" * 8,
    ]
    for data in garbage:
        for det_fmt, det in DETECTORS.items():
            assert not det(data), f"is_{det_fmt.lower()} claimed garbage bytes"
    # magic-probe detectors legitimately claim a matching magic with a broken
    # body; the LOADER must then reject it cleanly
    from pysp_tpu.io.mrw import load_raw_mrw

    bad_mrw = b"\x00MRM" + b"\xff" * 4
    assert is_mrw(bad_mrw)
    with pytest.raises(ValueError):
        load_raw_mrw(bad_mrw)


def test_load_raw_rejects_garbage_cleanly():
    from pysp_tpu.io.raw_loader import load_raw

    rng = np.random.default_rng(2)
    for data in (b"", b"not a raw file", bytes(rng.integers(0, 256, 256, dtype=np.uint8))):
        with pytest.raises((ValueError, KeyError)):
            load_raw(data)
