"""Persistent matrix harvesting (io/matrix_cache.py + the auto-harvest hook).

VERDICT r4 missing #2: round-4 harvesting registered into the in-memory
registry only, so "first file contact" upgraded exactly one process and was
forgotten. These tests gate the durable path: persist -> fresh-process load,
the DNG-load auto-harvest side effect, estimate-vs-real delta evidence, and
the loader-integration case (a CR2 of body X picks up matrices harvested from
a DNG of body X in a PREVIOUS process).

Reference anchor: libraw serves real per-body calibration for every file
(/root/reference/image.py:224 feeding /root/reference/wb_cct/cam_wb.py:81-165).
"""
import io
import json
import os

import numpy as np
import pytest

import pysp_tpu.io.camera_matrices as cm
from pysp_tpu.colorimetry.illuminants import StandardIlluminantSeries, xy_to_xyz
from pysp_tpu.colorimetry.spaces import MatXyzToCamera
from pysp_tpu.io import matrix_cache as mc
from pysp_tpu.io.tiff import write_synthetic_dng

CM1 = np.array([[0.81, -0.11, -0.05], [-0.31, 1.21, 0.15], [0.01, -0.21, 1.11]])
CM2 = np.array([[0.61, 0.05, -0.08], [-0.51, 1.41, 0.21], [-0.11, 0.15, 0.71]])


def _mats(provenance="harvested"):
    return [
        MatXyzToCamera(
            CM1,
            xy_to_xyz((0.44758, 0.40745)),
            StandardIlluminantSeries.STANDALONE,
            provenance=provenance,
        ),
        MatXyzToCamera(
            CM2,
            xy_to_xyz((0.31272, 0.32903)),
            StandardIlluminantSeries.SERIES_DAYLIGHT,
            provenance=provenance,
        ),
    ]


@pytest.fixture
def fresh_cache(tmp_path, monkeypatch):
    """Point the persistent cache at an empty per-test file and simulate a
    fresh process (lazy-load flag reset; registry keys cleaned afterwards)."""
    path = str(tmp_path / "harvested_matrices.json")
    monkeypatch.setenv("PYSP_TPU_MATRIX_CACHE", path)
    monkeypatch.setattr(cm, "_cache_loaded", False)
    before = set(cm._REGISTRY)
    yield path
    for k in set(cm._REGISTRY) - before:
        cm._REGISTRY.pop(k, None)


def test_persist_then_fresh_process_lookup(fresh_cache):
    model = "PYSP CACHE BODY"
    mc.persist_harvest(model, _mats(), source_name="x.dng")
    assert os.path.exists(fresh_cache)

    # simulate a new process: empty registry, lazy flag reset
    cm._REGISTRY.pop(model, None)
    cm._REGISTRY.pop(cm._norm_model(model), None)
    cm._cache_loaded = False

    looked = cm.lookup_camera_matrices(model)
    assert looked is not None and len(looked) == 2
    assert all(m.provenance == "harvested" for m in looked)
    got = {m.series: m.mat for m in looked}
    np.testing.assert_allclose(got[StandardIlluminantSeries.STANDALONE], CM1)
    np.testing.assert_allclose(got[StandardIlluminantSeries.SERIES_DAYLIGHT], CM2)


def test_harvest_persists_and_beats_estimate_across_processes(fresh_cache):
    """The full first-contact story for a TABLE body: harvest a DNG, then in a
    'new process' the registry serves harvested digits, not the estimate."""
    model = "Canon EOS 5D Mark III"
    dng = write_synthetic_dng(
        np.full((8, 8), 1000, np.uint16), color_matrix_1=CM1, color_matrix_2=CM2
    )
    got_model, _ = cm.harvest_camera_matrices_from_dng(
        io.BytesIO(dng), model=model, source_name="5d3.dng"
    )
    assert got_model == model

    cm._REGISTRY.pop(model, None)
    cm._REGISTRY.pop(cm._norm_model(model), None)
    cm._cache_loaded = False

    looked = cm.lookup_camera_matrices("EOS 5D Mark III")  # normalized lookup
    assert all(m.provenance == "harvested" for m in looked)
    # delta evidence stream recorded for both the estimate and the D65 table
    doc = json.load(open(fresh_cache))
    deltas = doc["bodies"][model]["estimate_vs_real"]
    assert "estimated_stda_vs_harvested" in deltas
    assert "d65_table_vs_harvested" in deltas
    assert all(v >= 0 for v in deltas.values())


def test_cr2_loader_integration_previous_process_harvest(fresh_cache):
    """CR2 of body X uses matrices harvested from a DNG of body X in a
    previous process (the VERDICT item's done-condition, verbatim)."""
    from pysp_tpu.io.cr2 import load_raw_cr2, write_synthetic_cr2
    from pysp_tpu.io.raw_loader import controller_for_source

    model = "Canon EOS 5D Mark III"
    dng = write_synthetic_dng(
        np.full((8, 8), 1000, np.uint16), color_matrix_1=CM1, color_matrix_2=CM2
    )
    cm.harvest_camera_matrices_from_dng(io.BytesIO(dng), model=model)

    # new process
    cm._REGISTRY.clear()
    cm._cache_loaded = False

    rng = np.random.default_rng(3)
    blob = write_synthetic_cr2(
        rng.integers(300, 3900, (24, 32)).astype(np.uint16),
        model=b"Canon EOS 5D Mark III",
    )
    frame = load_raw_cr2(blob)
    ctrl = controller_for_source(blob, frame)
    assert all(m.provenance == "harvested" for m in ctrl._mats)
    got = {m.series: m.mat for m in ctrl._mats}
    np.testing.assert_allclose(
        got[StandardIlluminantSeries.STANDALONE], CM1, atol=1e-4
    )


def test_autoharvest_on_dng_load(fresh_cache):
    """Loading a dual-illuminant DNG harvests as a side effect; a repeat load
    of the same body skips the disk write."""
    from pysp_tpu.io.raw_loader import load_raw_dng

    dng = write_synthetic_dng(
        np.full((16, 16), 1000, np.uint16), color_matrix_1=CM1, color_matrix_2=CM2
    )
    load_raw_dng(dng)
    assert os.path.exists(fresh_cache)
    looked = cm.lookup_camera_matrices("synthetic")
    assert looked is not None
    assert all(m.provenance == "harvested" for m in looked)

    mtime = os.path.getmtime(fresh_cache)
    os.utime(fresh_cache, (mtime - 100, mtime - 100))
    load_raw_dng(dng)  # identical rows -> no rewrite
    assert os.path.getmtime(fresh_cache) == mtime - 100


def test_autoharvest_opt_out(fresh_cache, monkeypatch):
    from pysp_tpu.io.raw_loader import load_raw_dng

    monkeypatch.setenv("PYSP_TPU_NO_AUTOHARVEST", "1")
    dng = write_synthetic_dng(
        np.full((16, 16), 1000, np.uint16), color_matrix_1=CM1, color_matrix_2=CM2
    )
    load_raw_dng(dng)
    assert not os.path.exists(fresh_cache)


def test_single_matrix_dng_not_harvested(fresh_cache):
    """One matrix would DISABLE the registry's two-row blend — skip it.

    (The synthetic writer always emits both matrices, so drive the hook with
    the parsed TiffFile and a truncated mats list — exactly what load_raw_dng
    passes for a single-matrix DNG.)"""
    from pysp_tpu.io import tiff as T

    dng = write_synthetic_dng(
        np.full((16, 16), 1000, np.uint16), color_matrix_1=CM1, color_matrix_2=CM2
    )
    tf = T.read_tiff(dng)
    harvested = cm.autoharvest_from_tiff(tf, _mats()[:1], source_name="one.dng")
    assert harvested is False
    assert not os.path.exists(fresh_cache)


def test_corrupt_cache_never_breaks_lookup(fresh_cache):
    with open(fresh_cache, "w") as f:
        f.write('{"version": 1, "bodies": {"X": {"mats": [{"mat": [1,2]}]}}')
    cm._cache_loaded = False
    assert cm.lookup_camera_matrices("EOS 5D") is not None  # table still works

    with open(fresh_cache, "w") as f:
        json.dump(
            {"version": 1, "bodies": {"BADBODY": {"mats": [{"mat": [1, 2]}]}}}, f
        )
    cm._cache_loaded = False
    assert cm.lookup_camera_matrices("BADBODY") is None  # skipped, no crash


def test_cli_harvest_sweep(fresh_cache, tmp_path, capsys):
    from pysp_tpu.cli import main

    sub = tmp_path / "tree" / "sub"
    sub.mkdir(parents=True)
    dng = write_synthetic_dng(
        np.full((8, 8), 1000, np.uint16), color_matrix_1=CM1, color_matrix_2=CM2
    )
    (sub / "a.dng").write_bytes(dng)
    (tmp_path / "tree" / "skipme.cr2").write_bytes(b"II*\x00garbage")  # not a DNG

    rc = main(["harvest", str(tmp_path / "tree")])
    out = capsys.readouterr().out
    assert rc == 0
    assert "harvested 1 bodies" in out
    doc = json.load(open(fresh_cache))
    assert "synthetic" in doc["bodies"]
