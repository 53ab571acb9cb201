"""develop_pipeline: the statically-composed one-jit flow == manual stage calls.

Tolerance: the fused program and the separate per-stage jits are different XLA
programs, so FMA-contraction choices differ at the last ulp — asserts use a tight
allclose (2e-5 on [0,1] sRGB output), which any composition/order bug would blow
through by orders of magnitude."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pysp_tpu import (
    DevelopConfig,
    PipelineConfig,
    QualityDemosaic,
    develop,
    develop_pipeline,
    find_erroneous_pixels_median,
    find_shared_pixels,
    flat_frame_correction,
    fuse_exposures_to_raw,
    repair_bad_pixels,
)
from pysp_tpu.core.frame import RawFrame
from pysp_tpu.correct.flat_field import dark_frame_subtraction
from pysp_tpu.utils.testing import mosaic_rggb

DEV = DevelopConfig(quality=QualityDemosaic.Fast)


def make_burst(n=3, h=48, w=64, seed=0):
    rng = np.random.default_rng(seed)
    frames = []
    for i in range(n):
        gain = 0.3 * 2.0**i / 2.0 ** (n - 1)
        base = np.clip(
            rng.random((h, w)).astype(np.float32) * 0.5 + 0.2, 0, 1
        ) * gain
        base[10 + i, 12] = 1.0  # hot pixel (per-frame position differs on purpose)
        base[20, 30] = 1.0      # hot pixel shared by all frames
        frames.append(RawFrame.synthetic(base.astype(np.float32), ev=10.0 + i))
    batch = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *frames)
    return frames, batch


def vignette_flat(h=48, w=64):
    yy, xx = np.mgrid[0:h, 0:w]
    r2 = ((yy - h / 2) ** 2 + (xx - w / 2) ** 2) / (h * w / 2)
    v = (1.0 - 0.3 * r2).astype(np.float32)
    return RawFrame.synthetic(mosaic_rggb(np.dstack([v, v, v])))


def test_single_frame_corrections_match_manual():
    frames, _ = make_burst(1)
    frame = frames[0]
    flat = vignette_flat()
    dark = RawFrame.synthetic(jnp.full_like(frame.bayer, 0.01))

    cfg = PipelineConfig(
        develop=DEV, dark_frame=True, flat_field=True, repair_hot_pixels=True,
        hot_pixel_quantile=0.999,
    )
    got = develop_pipeline(frame, cfg, flat=flat, dark=dark)

    f = dark_frame_subtraction(frame, dark)
    f = flat_frame_correction(f, flat)
    masks = find_erroneous_pixels_median(f, 1.5, 0.999)
    f = repair_bad_pixels(f, masks)
    want = develop(f, DEV)

    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=0)


def test_burst_hdr_fuse_matches_manual():
    frames, batch = make_burst(3)
    cfg = PipelineConfig(develop=DEV, fuse_hdr=True)
    got = develop_pipeline(batch, cfg)

    fused, _ = fuse_exposures_to_raw(batch)
    want = develop(fused, DEV)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=0)
    assert got.ndim == 3


def test_burst_consensus_masks_match_find_shared():
    frames, batch = make_burst(3)
    cfg = PipelineConfig(
        develop=DEV, repair_hot_pixels=True, hot_pixel_quantile=0.999,
        hot_pixel_shared_ratio=0.5, fuse_hdr=True,
    )
    got = develop_pipeline(batch, cfg)

    masks = [find_erroneous_pixels_median(f, 1.5, 0.999) for f in frames]
    shared = find_shared_pixels(masks, min_ratio=0.5)
    healed = [repair_bad_pixels(f, shared) for f in frames]
    fused, _ = fuse_exposures_to_raw(
        jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *healed)
    )
    want = develop(fused, DEV)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=0)


def test_burst_no_fuse_returns_batch():
    _, batch = make_burst(2)
    got = develop_pipeline(batch, PipelineConfig(develop=DEV))
    assert got.shape[0] == 2 and got.ndim == 4
    want0 = develop(jax.tree_util.tree_map(lambda x: x[0], batch), DEV)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want0), atol=2e-5, rtol=0)


def test_fuse_hdr_single_frame_raises():
    frames, _ = make_burst(1)
    with pytest.raises(ValueError):
        develop_pipeline(frames[0], PipelineConfig(develop=DEV, fuse_hdr=True))
