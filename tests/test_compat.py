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


def test_rawpy_loader_paths_with_mock(monkeypatch):
    """Execute the rawpy-gated branches (raw_loader.load_raw fallback and
    compat.RawDebayerDataFromRaw, image.py:309-357) against a mock libraw:
    the environment has no rawpy, so the gate tests only ever saw the raise.
    The synthetic DNG supplies the metadata side (EXIF matrices, EV)."""
    import sys
    import types

    import numpy as np

    from pysp_tpu.io import raw_loader
    from pysp_tpu.io.tiff import write_synthetic_dng

    rng = np.random.default_rng(8)
    bayer = rng.integers(300, 3900, (32, 32)).astype(np.uint16)
    data = write_synthetic_dng(bayer)

    class FakeRaw:
        raw_image = bayer
        black_level_per_channel = [256, 256, 256, 256]
        camera_white_level_per_channel = [4095] * 4
        raw_pattern = np.array([[0, 1], [3, 2]])
        color_desc = b"RGBG"
        daylight_whitebalance = (2.0, 1.0, 1.5, 0.0)

        def postprocess(self, **kw):
            assert kw["no_auto_bright"] and kw["use_camera_wb"]
            return np.full((32, 32, 3), 1 << 15, np.uint16)

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    fake = types.ModuleType("rawpy")
    fake.imread = lambda reader: FakeRaw()
    fake.DemosaicAlgorithm = types.SimpleNamespace(AHD=1)
    fake.FBDDNoiseReductionMode = types.SimpleNamespace(Full=1)
    fake.ColorSpace = types.SimpleNamespace(raw=1)
    fake.HighlightMode = types.SimpleNamespace(Clip=1)
    monkeypatch.setitem(sys.modules, "rawpy", fake)

    # force the fallback: pretend the built-in DNG path cannot read this file
    monkeypatch.setattr(
        raw_loader, "load_raw_dng",
        lambda src, **kw: (_ for _ in ()).throw(ValueError("forced")),
    )

    frame = raw_loader.load_raw(data)
    assert frame.bayer.shape == (32, 32)
    want = np.clip(bayer.astype(np.float64) - 256, 0, 4095) / 4095.0
    np.testing.assert_allclose(
        np.asarray(frame.bayer), want.astype(np.float32), atol=1e-6
    )

    from pysp_tpu.compat import RawDebayerDataFromRaw

    dem = RawDebayerDataFromRaw(data)
    img = np.asarray(dem.image)
    assert img.shape == (32, 32, 3)
    np.testing.assert_allclose(img, (1 << 15) / (2**16 - 1), atol=1e-6)
    assert np.isfinite(float(dem.current_ev))


def test_raw_bayer_from_cr2_and_nef():
    """compat's class API opens the built-in non-DNG formats: no EXIF color
    matrices exist there, so the controller falls back to the loader's."""
    import numpy as np

    from pysp_tpu.io import native

    if not native.available():
        import pytest

        pytest.skip("native codec not built")

    from pysp_tpu.compat import RawBayerDataFromRaw
    from pysp_tpu.io.cr2 import write_synthetic_cr2
    from pysp_tpu.io.nef import write_synthetic_nef

    rng = np.random.default_rng(12)
    mosaic = rng.integers(100, 16000, (64, 96)).astype(np.uint16)
    for data in (write_synthetic_cr2(mosaic), write_synthetic_nef(mosaic)):
        raw = RawBayerDataFromRaw(data)
        assert np.asarray(raw.sensor_scaled).shape == (64, 96)
        from pysp_tpu.const import QualityDemosaic
        dev = raw.demosaic(QualityDemosaic.Fast)
        img = np.asarray(dev.to_lin_srgb())
        assert img.shape == (64, 96, 3) and np.isfinite(img).all()


def test_class_api_on_rw2_and_orf():
    """The reference-compat class API (image.py:199-307) opens the newest
    built-in formats too: full WB-controller rebuild + demosaic."""
    from pysp_tpu.compat import RawBayerDataFromRaw
    from pysp_tpu.io.orf import write_synthetic_orf
    from pysp_tpu.io.pef import write_synthetic_pef
    from pysp_tpu.io.rw2 import write_synthetic_rw2

    rng = np.random.default_rng(13)
    vals = np.clip(
        600 + np.cumsum(rng.integers(-20, 21, (32, 56)), axis=1), 30, 4000
    ).astype(np.uint16)
    rw2, _ = write_synthetic_rw2(vals)
    orf = write_synthetic_orf(vals)
    pef = write_synthetic_pef(vals)
    for data in (rw2, orf, pef):
        raw = RawBayerDataFromRaw(data)
        assert np.asarray(raw.sensor_scaled).shape == (32, 56)
        dev = raw.demosaic(QualityDemosaic.Fast)
        img = np.asarray(dev.to_lin_srgb())
        assert img.shape == (32, 56, 3) and np.isfinite(img).all()
        # update_by_* works through the rebuilt controller
        raw.cam_wb.update_by_temperature(5000.0, allow_cross_blend=True)
