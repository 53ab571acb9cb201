"""Streaming driver: pipelined decode -> develop -> save."""
import os

import numpy as np

from pysp_tpu import DevelopConfig, QualityDemosaic, develop, develop_files, develop_stream
from pysp_tpu.io import tiff as T
from pysp_tpu.io.raw_loader import load_raw_dng


def _write_files(tmp_path, n=5, h=32, w=40):
    rng = np.random.default_rng(0)
    paths = []
    for i in range(n):
        counts = rng.integers(300, 4000, (h, w)).astype(np.uint16)
        p = tmp_path / f"f{i}.dng"
        p.write_bytes(T.write_synthetic_dng(counts))
        paths.append(str(p))
    return paths


def test_develop_stream_matches_sequential(tmp_path):
    paths = _write_files(tmp_path)
    cfg = DevelopConfig(quality=QualityDemosaic.Fast)

    got = dict(develop_stream(paths, cfg))
    assert list(got.keys()) == paths  # input order preserved

    for p in paths:
        want = np.asarray(develop(load_raw_dng(p), cfg))
        np.testing.assert_array_equal(got[p], want)


def test_develop_files_writes_all(tmp_path):
    paths = _write_files(tmp_path, n=3)
    out = tmp_path / "out"
    written = develop_files(paths, str(out), DevelopConfig(quality=QualityDemosaic.Draft))
    assert len(written) == 3
    for w in written:
        assert os.path.exists(w) and os.path.getsize(w) > 0
