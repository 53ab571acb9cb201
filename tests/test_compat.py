"""Reference-compatible class API: the pySP README flow verbatim."""
import numpy as np

from pysp_tpu.compat import (
    RawBayerData,
    RawBayerDataFromRaw,
    RawDemosaicData,
    RawRggbBayerData,
    lin_srgb_to_srgb,
)
from pysp_tpu.const import BayerPattern, QualityDemosaic
from pysp_tpu.io.tiff import write_synthetic_dng
from pysp_tpu.utils.testing import make_scene, mosaic_rggb, psnr


def test_readme_flow_from_synthetic_dng():
    """The reference README pipeline (README.md:55-63) against a synthetic DNG."""
    rng = np.random.default_rng(0)
    raw_counts = rng.integers(300, 3900, (64, 64)).astype(np.uint16)
    blob = write_synthetic_dng(raw_counts)

    image = RawBayerDataFromRaw(blob)
    assert image.sensor_pattern == BayerPattern.Rggb
    assert np.isfinite(image.current_ev)

    dem = image.demosaic(QualityDemosaic.Best)
    assert isinstance(dem, RawDemosaicData)
    assert dem.is_valid()

    rgb = dem.to_lin_srgb()
    srgb = np.asarray(lin_srgb_to_srgb(rgb))
    assert srgb.shape == (64, 64, 3)
    assert srgb.min() >= 0 and srgb.max() <= 1


def test_wb_controller_accessible_for_retemperature():
    rng = np.random.default_rng(1)
    blob = write_synthetic_dng(rng.integers(300, 3900, (32, 32)).astype(np.uint16))
    image = RawBayerDataFromRaw(blob)

    before = np.asarray(image.cam_wb.get_reciprocal_multipliers())
    image.cam_wb.update_by_temperature(6500, allow_cross_blend=True)
    after = np.asarray(image.cam_wb.get_reciprocal_multipliers())
    assert not np.allclose(before, after)

    # re-demosaic picks up the new WB
    dem = image.demosaic(QualityDemosaic.Draft)
    assert dem.is_valid()


def test_wb_undo_apply_cycle():
    rgb = make_scene(32, 32)
    bayer = mosaic_rggb(rgb)
    from pysp_tpu.colorimetry.spaces import MatXyzToCamera
    from pysp_tpu.colorimetry.wb import CameraWhiteBalanceController
    from pysp_tpu.colorimetry.illuminants import (
        StandardIlluminantSeries,
        xy_to_xyz,
    )

    mats = [
        MatXyzToCamera(
            np.eye(3) * s,
            xy_to_xyz(xy),
            StandardIlluminantSeries.SERIES_DAYLIGHT,
        )
        for s, xy in [(1.1, (0.3457, 0.3585)), (0.95, (0.31272, 0.32903))]
    ]
    ctrl = CameraWhiteBalanceController(mats, np.array([0.5, 1.0, 0.7]))

    data = RawRggbBayerData(bayer, ctrl, shot_ev=10.0)
    dem = data.demosaic(QualityDemosaic.Fast)

    img_before = np.asarray(dem.image)
    dem.wb_undo()
    assert not np.allclose(np.asarray(dem.image), img_before)
    dem.wb_apply()
    np.testing.assert_allclose(np.asarray(dem.image), img_before, rtol=1e-5)


def test_pattern_roundtrip_through_compat():
    rgb = make_scene(32, 32)
    bayer = mosaic_rggb(rgb)
    from pysp_tpu.colorimetry.spaces import MatXyzToCamera
    from pysp_tpu.colorimetry.wb import CameraWhiteBalanceController
    from pysp_tpu.colorimetry.illuminants import (
        StandardIlluminantSeries,
        xy_to_xyz,
    )

    mats = [
        MatXyzToCamera(np.eye(3), xy_to_xyz((0.3457, 0.3585)),
                       StandardIlluminantSeries.SERIES_DAYLIGHT),
        MatXyzToCamera(np.eye(3), xy_to_xyz((0.31272, 0.32903)),
                       StandardIlluminantSeries.SERIES_DAYLIGHT),
    ]
    ctrl = CameraWhiteBalanceController(mats, np.array([0.5, 1.0, 0.7]))

    # feed the same canonical content with a BGGR wrapper: output flips back
    rggb = RawBayerData(bayer, ctrl, 10.0, sensor_pattern=BayerPattern.Rggb)
    bggr = RawBayerData(bayer[::-1, ::-1].copy(), ctrl.copy(), 10.0,
                        sensor_pattern=BayerPattern.Bggr)

    out_rggb = np.asarray(rggb.demosaic(QualityDemosaic.Draft).image)
    out_bggr = np.asarray(bggr.demosaic(QualityDemosaic.Draft).image)
    np.testing.assert_allclose(out_bggr, out_rggb[::-1, ::-1], atol=1e-6)
