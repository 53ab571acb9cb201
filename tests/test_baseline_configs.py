"""Integration tests: one per BASELINE.json benchmark config.

These exercise the exact end-to-end compositions the driver benchmarks, on small
shapes (the perf numbers come from bench.py on the TPU; these gate correctness).
"""
import jax
import jax.numpy as jnp
import numpy as np

from pysp_tpu import (
    DevelopConfig,
    QualityDemosaic,
    RawFrame,
    Poly3CorrectionModel,
    develop,
    find_erroneous_pixels_median,
    flat_frame_correction,
    fuse_exposures_to_raw,
    remove_ca_from_raw,
    repair_bad_pixels,
)
from pysp_tpu.colorimetry.wb import CameraWhiteBalanceController
from pysp_tpu.colorimetry.spaces import MatXyzToCamera
from pysp_tpu.colorimetry.illuminants import StandardIlluminantSeries, xy_to_xyz
from pysp_tpu.io.raw_loader import frame_from_parts
from pysp_tpu.io.tiff import write_synthetic_dng
from pysp_tpu.io.raw_loader import load_raw_dng
from pysp_tpu.pipeline.develop import develop_burst
from pysp_tpu.warp.opcodes import apply_opcode_3_warp, encode_warp_rectilinear
from pysp_tpu.utils.testing import make_scene, mosaic_rggb
from pysp_tpu.const import BayerPattern


def _dng_frame(h=48, w=48, seed=0):
    rng = np.random.default_rng(seed)
    return load_raw_dng(
        write_synthetic_dng(rng.integers(300, 3900, (h, w)).astype(np.uint16))
    )


def test_config1_draft_develop():
    """Config 1: single DNG, Draft debayer -> to_lin_srgb -> lin_srgb_to_srgb."""
    frame = _dng_frame()
    out = np.asarray(develop(frame, DevelopConfig(quality=QualityDemosaic.Draft)))
    assert out.shape == (48, 48, 3) and np.isfinite(out).all()


def test_config2_fast_with_temperature_wb():
    """Config 2: Fast debayer + WB from temperature (Planckian/D-series blend)."""
    rng = np.random.default_rng(1)
    base = np.array([[0.7, -0.1, -0.05], [-0.2, 1.1, 0.1], [0.02, -0.2, 1.2]])
    mats = [
        MatXyzToCamera(base @ np.diag([1.1, 1.0, 0.8]), xy_to_xyz((0.44758, 0.40745)),
                       StandardIlluminantSeries.STANDALONE),
        MatXyzToCamera(base @ np.diag([0.9, 1.0, 1.15]), xy_to_xyz((0.31272, 0.32903)),
                       StandardIlluminantSeries.SERIES_DAYLIGHT),
    ]
    ctrl = CameraWhiteBalanceController(mats, np.array([0.5, 1.0, 0.6]))
    ctrl.update_by_temperature(5200, allow_cross_blend=True)

    bayer = mosaic_rggb(make_scene(48, 48, seed=1))
    frame = frame_from_parts(bayer, BayerPattern.Rggb, ctrl, ev=10.0)
    out = np.asarray(develop(frame, DevelopConfig(quality=QualityDemosaic.Fast)))
    assert out.shape == (48, 48, 3) and np.isfinite(out).all()


def test_config3_best_with_healing_and_flat_field():
    """Config 3: AHD + postprocess + bad-pixel healing + flat-field correction."""
    rng = np.random.default_rng(2)
    bayer = mosaic_rggb(make_scene(48, 48, seed=2))
    bayer[10, 10] = 1.0  # hot pixel
    frame = RawFrame.synthetic(bayer)

    flat = RawFrame.synthetic((0.85 + 0.15 * rng.random((48, 48))).astype(np.float32))
    frame = flat_frame_correction(frame, flat)

    masks = find_erroneous_pixels_median(frame, quantile=0.999)
    frame = repair_bad_pixels(frame, masks)

    out = np.asarray(
        develop(frame, DevelopConfig(quality=QualityDemosaic.Best, postprocess_stages=1))
    )
    assert out.shape == (48, 48, 3) and np.isfinite(out).all()


def test_config4_hdr_stack_to_srgb():
    """Config 4: 5 bracketed raws -> Bayer-space HDR -> AHD develop -> sRGB."""
    frames = [
        RawFrame.synthetic(
            np.clip(mosaic_rggb(make_scene(48, 48, seed=3)) * (0.4 + 0.3 * i), 0, 1),
            ev=8.0 + i,
        )
        for i in range(5)
    ]
    batch = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *frames)
    hdr, counts = fuse_exposures_to_raw(batch)
    assert hdr.is_hdr and float(hdr.lim_sat) > 1.0
    assert int(np.asarray(counts).max()) <= 5

    out = np.asarray(develop(hdr, DevelopConfig(quality=QualityDemosaic.Best)))
    assert out.shape == (48, 48, 3) and np.isfinite(out).all()


def test_config5_burst_with_warp_and_ca():
    """Config 5: vmapped 16-frame burst develop + rectilinear warp + CA correction."""
    n = 16
    frames = []
    model = Poly3CorrectionModel(0.01)
    for i in range(n):
        f = RawFrame.synthetic(mosaic_rggb(make_scene(32, 32, seed=10 + i)))
        f = remove_ca_from_raw(f, model, model)
        frames.append(f)
    batch = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *frames)

    out = np.asarray(
        develop_burst(batch, DevelopConfig(quality=QualityDemosaic.Fast))
    )
    assert out.shape == (n, 32, 32, 3) and np.isfinite(out).all()

    # DNG rectilinear warp applied per developed frame
    block = encode_warp_rectilinear(
        [(1.005, -0.01, 0.0, 0.0, 0.0, 0.0)] * 3, (0.5, 0.5)
    )
    warped = np.asarray(
        apply_opcode_3_warp(out[0], block, interpolation="bilinear")
    )
    assert warped.shape == (32, 32, 3) and np.isfinite(warped).all()
