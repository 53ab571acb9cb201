"""CCT math anchors + white-balance controller behavior."""
import numpy as np
import pytest

from pysp_tpu.colorimetry.cct import (
    blackbody_xyz,
    cct_to_mired,
    cct_to_xy_cie_d,
    cct_to_xyz_ohno,
    get_ideal_duv,
    xyz_to_cct_ohno,
)
from pysp_tpu.colorimetry.illuminants import StandardIlluminantSeries, xy_to_xyz
from pysp_tpu.colorimetry.spaces import MatXyzToCamera
from pysp_tpu.colorimetry.wb import CameraWhiteBalanceController


def test_blackbody_roundtrip():
    for t in [2000.0, 3456.0, 5000.0, 6500.0, 12000.0]:
        cct, duv = xyz_to_cct_ohno(blackbody_xyz(t))
        assert abs(cct - t) / t < 2e-4, (t, cct)
        assert abs(duv) < 1e-6


def test_known_illuminant_anchors():
    # D65: CCT ~6504K, Duv ~+0.0032 (allow CMF-fit tolerance)
    cct, duv = xyz_to_cct_ohno(xy_to_xyz((0.31272, 0.32903)))
    assert abs(cct - 6504) < 40, cct
    assert abs(duv - 0.0032) < 5e-4, duv

    # Illuminant A: blackbody at 2856K, Duv ~ 0
    cct, duv = xyz_to_cct_ohno(xy_to_xyz((0.44758, 0.40745)))
    assert abs(cct - 2856) < 40, cct
    assert abs(duv) < 1.5e-3, duv


def test_cct_duv_roundtrip():
    for cct in [2500.0, 4000.0, 5500.0, 8000.0, 15000.0]:
        for duv in [-0.004, 0.0, 0.003, 0.01]:
            xyz = cct_to_xyz_ohno((cct, duv))
            cct2, duv2 = xyz_to_cct_ohno(xyz)
            assert abs(cct2 - cct) / cct < 1e-4, (cct, duv, cct2)
            assert abs(duv2 - duv) < 1e-6, (cct, duv, duv2)


def test_cie_d_series():
    # D65 corresponds to ~6504K on the modern scale; the formula uses nominal 6500
    xy = cct_to_xy_cie_d(6500 * 1.4388 / 1.438)
    np.testing.assert_allclose(xy, [0.31272, 0.32903], atol=5e-4)
    xy55 = cct_to_xy_cie_d(5500 * 1.4388 / 1.438)
    np.testing.assert_allclose(xy55, [0.33242, 0.34743], atol=5e-4)


def test_ideal_duv():
    assert get_ideal_duv(3000) == 0.0
    assert abs(get_ideal_duv(6500) - 0.0032) < 5e-4
    assert get_ideal_duv(5000) > 0


def test_mired():
    assert cct_to_mired(5000.0) == 200.0


# --- WB controller --------------------------------------------------------------------
def _make_cam_mats():
    """Two plausible DNG-style calibrations: StdA (~2856K) and D65."""
    # diagonal-ish XYZ->cam with channel crosstalk; scaled per illuminant
    base = np.array([[0.7, -0.1, -0.05], [-0.2, 1.1, 0.1], [0.02, -0.2, 1.2]])
    warm = base @ np.diag([1.1, 1.0, 0.8])
    cool = base @ np.diag([0.9, 1.0, 1.15])
    mat_a = MatXyzToCamera(
        warm, xy_to_xyz((0.44758, 0.40745)), StandardIlluminantSeries.STANDALONE
    )
    mat_d65 = MatXyzToCamera(
        cool, xy_to_xyz((0.31272, 0.32903)), StandardIlluminantSeries.SERIES_DAYLIGHT
    )
    return [mat_a, mat_d65]


def test_controller_basics():
    mats = _make_cam_mats()
    neutral = np.array([0.45, 1.0, 0.62])
    ctrl = CameraWhiteBalanceController(mats, neutral)

    mult = ctrl.get_reciprocal_multipliers()
    assert mult.shape == (3,)
    assert ctrl.get_matrix() is not None
    # neutral preserved (update_by_reference keeps the provided neutral)
    np.testing.assert_allclose(ctrl.get_neutral(), neutral)

    c2 = ctrl.copy()
    np.testing.assert_allclose(
        c2.get_reciprocal_multipliers(), ctrl.get_reciprocal_multipliers()
    )


def test_update_by_temperature_blend_and_edges():
    mats = _make_cam_mats()
    ctrl = CameraWhiteBalanceController(mats, np.array([0.5, 1.0, 0.6]))

    # Cross-blend allowed: mid temperature interpolates between the two matrices
    ctrl.update_by_temperature(4500, allow_cross_blend=True)
    m_mid = ctrl.get_matrix().mat
    lo = np.minimum(mats[0].mat, mats[1].mat) - 1e-9
    hi = np.maximum(mats[0].mat, mats[1].mat) + 1e-9
    assert np.all(m_mid >= lo) and np.all(m_mid <= hi)

    # Neutral multipliers G-normalized
    ctrl.update_by_temperature(6500, allow_cross_blend=True)
    neutral = ctrl.get_neutral()
    assert neutral[1] == pytest.approx(1.0)

    # Below calibration range: warm edge matrix
    ctrl.update_by_temperature(2000, allow_cross_blend=True)
    np.testing.assert_allclose(ctrl.get_matrix().mat, mats[0].mat)

    # Above range: cool edge matrix
    ctrl.update_by_temperature(20000, allow_cross_blend=True)
    np.testing.assert_allclose(ctrl.get_matrix().mat, mats[1].mat)


def test_update_by_temperature_daylight_only():
    mats = _make_cam_mats()
    ctrl = CameraWhiteBalanceController(mats, np.array([0.5, 1.0, 0.6]))
    # only one daylight matrix -> it is used directly
    ctrl.update_by_temperature(5000, allow_cross_blend=False)
    np.testing.assert_allclose(ctrl.get_matrix().mat, mats[1].mat)


def test_update_by_temperature_single_matrix():
    mats = [_make_cam_mats()[1]]
    ctrl = CameraWhiteBalanceController(mats, np.array([0.5, 1.0, 0.6]))
    # reference crashed here (targ_xyz used before assignment); we fix the intent
    ctrl.update_by_temperature(5000)
    np.testing.assert_allclose(ctrl.get_matrix().mat, mats[0].mat)
    assert ctrl.get_neutral()[1] == pytest.approx(1.0)


def test_update_by_reference_warm_scene_prefers_warm_matrix():
    """A neutral implied by a warm illuminant should weight the warm calibration."""
    mats = _make_cam_mats()
    warm_xyz = blackbody_xyz(3000.0)
    neutral_warm = mats[0].mat @ warm_xyz

    ctrl = CameraWhiteBalanceController(mats, neutral_warm)
    got_xyz = ctrl.get_matrix().xyz
    cct, _ = xyz_to_cct_ohno(got_xyz)
    assert cct < 4500, cct

    # and a cool neutral lands cool
    cool_xyz = blackbody_xyz(6500.0)
    ctrl.update_by_reference(mats[1].mat @ cool_xyz)
    cct2, _ = xyz_to_cct_ohno(ctrl.get_matrix().xyz)
    assert cct2 > 5000, cct2
