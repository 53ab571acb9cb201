"""Dual-illuminant registry rows: invariants, blending engagement, harvesting.

VERDICT r3 item 2: with only a D65 row per body, ``update_by_temperature``
collapsed to the single-matrix path for every non-DNG format — the reference's
flagship mired-blend (wb_cct/cam_wb.py:81-165) never engaged. The registry now
ships an estimated StdA row per body (camera-space metamerism transform from
the Canon 5D Mark II anchor pair — see io/camera_matrices.py docstring for why
real ColorMatrix1 digits cannot be derived offline) plus
``harvest_camera_matrices_from_dng`` to register REAL Adobe data at first
contact. These tests lock:

- invariant sanity gates over EVERY registry row (catching transcription slips,
  VERDICT r3 weak #4);
- that a registry body develops differently (and plausibly) at 3000 K vs
  6500 K via the two-matrix path;
- the harvest + re-lookup round trip.
"""
import io

import numpy as np
import pytest

from pysp_tpu.colorimetry.cct import xyz_to_cct_ohno
from pysp_tpu.colorimetry.illuminants import StandardIlluminantSeries, xy_to_xyz
from pysp_tpu.colorimetry.wb import CameraWhiteBalanceController
from pysp_tpu.io import camera_matrices as cm
from pysp_tpu.io.camera_matrices import (
    _ADOBE_D65,
    _D65_XY,
    _STD_A_XY,
    estimate_std_a_matrix,
    harvest_camera_matrices_from_dng,
    lookup_camera_matrices,
)
from pysp_tpu.io.tiff import write_synthetic_dng

XYZ_A = xy_to_xyz(_STD_A_XY)
XYZ_D65 = xy_to_xyz(_D65_XY)


# ---------------------------------------------------------------------------
# Invariant gates over every registry row (VERDICT r3 weak #4)
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("model", sorted(_ADOBE_D65))
def test_registry_row_invariants(model):
    """Every body's D65 row and estimated StdA row map whites plausibly.

    A transposed digit in a 3x3 calibration matrix still 'develops fine', so
    structure-only tests cannot catch it; these gates bound the colorimetry:
    the matrix must map its calibration white to all-positive camera values
    with green dominant at its own illuminant, have a positive determinant
    (orientation-preserving), and bounded channel ratios.
    """
    mats = lookup_camera_matrices(model)
    assert len(mats) == 2
    std_a, d65 = mats
    assert std_a.series == StandardIlluminantSeries.STANDALONE
    assert d65.series == StandardIlluminantSeries.SERIES_DAYLIGHT

    for row, white in ((std_a, XYZ_A), (d65, XYZ_D65)):
        mult = row.mat @ white
        assert (mult > 0).all(), f"{model}: white maps outside the sensor gamut"
        assert np.linalg.det(row.mat) > 0, f"{model}: orientation flip"
        r, g, b = mult / mult[1]
        # G is the most sensitive channel at the row's own illuminant for every
        # shipped body (Dynax 7D's tungsten red response reaches ~1.01 g).
        assert r < 1.1 and b < 1.1, f"{model}: non-G-dominant white {r, g, b}"
        assert r > 0.15 and b > 0.1, f"{model}: implausible channel ratio {r, g, b}"

    # the two rows must actually differ (else blending is vacuous)
    assert np.abs(std_a.mat - d65.mat).max() > 1e-3

    # implied calibration CCTs bracket the blend range: StdA ~2856 K, D65 ~6504 K
    cct_a = xyz_to_cct_ohno(std_a.xyz)[0]
    cct_d = xyz_to_cct_ohno(d65.xyz)[0]
    assert 2700 < cct_a < 3000 < 6000 < cct_d < 7000


def test_estimate_reproduces_anchor_pair_exactly():
    """By construction R @ CM2_anchor == CM1_anchor; locks the R computation."""
    cm2 = np.array(cm._CM2_ANCHOR, np.float64).reshape(3, 3) / 10000.0
    cm1 = np.array(cm._CM1_ANCHOR, np.float64).reshape(3, 3) / 10000.0
    np.testing.assert_allclose(estimate_std_a_matrix(cm2), cm1, atol=1e-12)


# ---------------------------------------------------------------------------
# Two-matrix blending actually engages
# ---------------------------------------------------------------------------
def _controller(model="Canon EOS 5D Mark III"):
    mats = lookup_camera_matrices(model)
    neutral = mats[-1].mat @ XYZ_D65  # a daylight as-shot neutral
    return CameraWhiteBalanceController(mats, neutral / neutral[1])


def test_update_by_temperature_blends_between_rows():
    ctrl = _controller()
    std_a, d65 = lookup_camera_matrices("Canon EOS 5D Mark III")

    ctrl.update_by_temperature(3000.0, allow_cross_blend=True)
    m3000 = ctrl.get_matrix().mat
    ctrl.update_by_temperature(6500.0, allow_cross_blend=True)
    m6500 = ctrl.get_matrix().mat

    # the MATRIX itself moves with temperature (not just the target XYZ):
    assert np.abs(m3000 - m6500).max() > 1e-3
    # 3000 K sits near the StdA end in mired space (333 vs [350, 154]),
    # 6500 K lands essentially on the D65 row
    assert np.abs(m3000 - std_a.mat).max() < np.abs(m3000 - d65.mat).max()
    np.testing.assert_allclose(m6500, d65.mat, atol=5e-3)
    # and the blend is a genuine interpolation: every entry between the rows
    lo = np.minimum(std_a.mat, d65.mat) - 1e-12
    hi = np.maximum(std_a.mat, d65.mat) + 1e-12
    assert ((m3000 >= lo) & (m3000 <= hi)).all()


def test_daylight_only_blend_still_single_matrix_without_cross_blend():
    """Default allow_cross_blend=False restricts to the daylight series — with
    one daylight row that is the single-matrix path (reference semantics,
    cam_wb.py:126-146)."""
    ctrl = _controller()
    _, d65 = lookup_camera_matrices("Canon EOS 5D Mark III")
    ctrl.update_by_temperature(3000.0)  # default: no cross-series blending
    np.testing.assert_allclose(ctrl.get_matrix().mat, d65.mat, atol=1e-12)


def test_registry_body_develops_differently_and_plausibly_by_temperature():
    """The VERDICT 'done' criterion: a registry body at 3000 K vs 6500 K."""
    import jax.numpy as jnp

    from pysp_tpu import DevelopConfig, QualityDemosaic, develop
    from pysp_tpu.core.frame import RawFrame

    rng = np.random.default_rng(7)
    bayer = (0.15 + 0.7 * rng.random((32, 32))).astype(np.float32)

    images = {}
    mults = {}
    for cct in (3000.0, 6500.0):
        ctrl = _controller("NIKON D7000")
        ctrl.update_by_temperature(cct, allow_cross_blend=True)
        mat = ctrl.get_matrix()
        frame = RawFrame(
            bayer=jnp.asarray(bayer),
            cam_mat=jnp.asarray(mat.mat, jnp.float32),
            cam_white=jnp.asarray(mat.xyz, jnp.float32),
            wb_neutral=jnp.asarray(ctrl.get_neutral(), jnp.float32),
            ev=jnp.asarray(10.0, jnp.float32),
            lim_sat=jnp.asarray(1.0, jnp.float32),
        )
        images[cct] = np.asarray(
            develop(frame, DevelopConfig(quality=QualityDemosaic.Draft))
        )
        mults[cct] = ctrl.get_reciprocal_multipliers()

    for img in images.values():
        assert np.isfinite(img).all() and img.min() >= 0.0 and img.max() <= 1.0
    # different temperature -> different render
    assert np.abs(images[3000.0] - images[6500.0]).max() > 1e-3
    # plausibly: tungsten WB boosts blue relative to red vs the daylight WB
    blue_over_red = lambda m: m[2] / m[0]  # noqa: E731
    assert blue_over_red(mults[3000.0]) > blue_over_red(mults[6500.0])


def test_update_by_reference_uses_both_rows():
    """A tungsten-ish as-shot neutral pulls the bisection toward the StdA row."""
    std_a, d65 = lookup_camera_matrices("ILCE-7M3")
    warm_neutral = std_a.mat @ XYZ_A
    ctrl = CameraWhiteBalanceController(
        [std_a, d65], warm_neutral / warm_neutral[1]
    )
    got = ctrl.get_matrix().mat
    assert np.abs(got - std_a.mat).max() < np.abs(got - d65.mat).max()


# ---------------------------------------------------------------------------
# Harvesting real data from a DNG (first-contact upgrade path)
# ---------------------------------------------------------------------------
def test_harvest_from_dng_registers_and_overrides_estimate(tmp_path):
    model = "PYSP TEST HARVEST BODY"
    cm1 = np.array([[0.8, -0.1, -0.05], [-0.3, 1.2, 0.15], [0.01, -0.2, 1.1]])
    cm2 = np.array([[0.6, 0.05, -0.08], [-0.5, 1.4, 0.2], [-0.1, 0.15, 0.7]])
    dng = write_synthetic_dng(
        np.full((8, 8), 1000, np.uint16), color_matrix_1=cm1, color_matrix_2=cm2
    )
    got_model, mats = harvest_camera_matrices_from_dng(
        io.BytesIO(dng), model=model
    )
    try:
        assert got_model == model
        assert len(mats) == 2
        assert all(m.provenance == "harvested" for m in mats)
        looked = lookup_camera_matrices(model)
        by_illum = {xyz_to_cct_ohno(m.xyz)[0] < 4000: m for m in looked}
        np.testing.assert_allclose(by_illum[True].mat, cm1, atol=1e-4)
        np.testing.assert_allclose(by_illum[False].mat, cm2, atol=1e-4)
    finally:
        cm._REGISTRY.pop(model, None)
        cm._REGISTRY.pop(cm._norm_model(model), None)


def test_harvest_uses_exif_model_when_unnamed():
    dng = write_synthetic_dng(np.full((8, 8), 1000, np.uint16))
    got_model, mats = harvest_camera_matrices_from_dng(io.BytesIO(dng))
    try:
        assert got_model == "synthetic"
        assert lookup_camera_matrices("synthetic") is not None
    finally:
        cm._REGISTRY.pop("synthetic", None)
        cm._REGISTRY.pop(cm._norm_model("synthetic"), None)


def test_controller_for_source_gets_dual_rows_for_registry_model(tmp_path):
    """Rebuilt controllers for MakerNote formats see the registry rows
    (previously: the frame's single matrix only)."""
    from pysp_tpu.io.cr2 import load_raw_cr2, write_synthetic_cr2
    from pysp_tpu.io.raw_loader import controller_for_source

    rng = np.random.default_rng(3)
    blob = write_synthetic_cr2(
        rng.integers(300, 3900, (24, 32)).astype(np.uint16),
        model=b"Canon EOS 5D Mark III",
    )
    frame = load_raw_cr2(blob)
    ctrl = controller_for_source(blob, frame)
    assert len(ctrl._mats) == 2
    series = {m.series for m in ctrl._mats}
    assert StandardIlluminantSeries.STANDALONE in series
    assert StandardIlluminantSeries.SERIES_DAYLIGHT in series
