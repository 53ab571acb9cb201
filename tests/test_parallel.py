"""Multi-device sharding on the 8-device virtual CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pysp_tpu.const import QualityDemosaic
from pysp_tpu.core.frame import RawFrame
from pysp_tpu.parallel.mesh import make_mesh
from pysp_tpu.parallel.spatial import develop_burst_sharded, develop_spatial
from pysp_tpu.pipeline.develop import DevelopConfig, develop

from test_demosaic import make_scene, mosaic_rggb, psnr


requires_multi = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices"
)


@requires_multi
def test_spatial_sharded_develop_matches_monolithic():
    rgb = make_scene(128, 64, seed=7)
    bayer = mosaic_rggb(rgb)
    frame = RawFrame.synthetic(bayer)
    cfg = DevelopConfig(quality=QualityDemosaic.Best)

    mesh = make_mesh((1, 4))
    got = np.asarray(develop_spatial(frame, cfg, mesh, halo=16))
    want = np.asarray(develop(frame, cfg))

    assert got.shape == want.shape
    # interior rows exact; global edge rows may differ within the stencil reach
    interior = np.s_[16:-16, :]
    np.testing.assert_allclose(got[interior], want[interior], atol=2e-5)
    assert psnr(got, want) > 45


@requires_multi
def test_spatial_sharded_draft_and_fast():
    rgb = make_scene(64, 48, seed=8)
    frame = RawFrame.synthetic(mosaic_rggb(rgb))
    mesh = make_mesh((1, 2))
    for q in (QualityDemosaic.Draft, QualityDemosaic.Fast):
        cfg = DevelopConfig(quality=q)
        got = np.asarray(develop_spatial(frame, cfg, mesh, halo=16))
        want = np.asarray(develop(frame, cfg))
        np.testing.assert_allclose(got[16:-16], want[16:-16], atol=2e-5)


@requires_multi
def test_burst_sharded_develop():
    frames = []
    for i in range(8):
        rgb = make_scene(32, 32, seed=10 + i)
        frames.append(RawFrame.synthetic(mosaic_rggb(rgb), ev=9.0 + i * 0.1))
    batch = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *frames)

    mesh = make_mesh((8, 1))
    cfg = DevelopConfig(quality=QualityDemosaic.Fast)
    got = np.asarray(develop_burst_sharded(batch, cfg, mesh))
    assert got.shape == (8, 32, 32, 3)

    for i in (0, 3, 7):
        want = np.asarray(develop(frames[i], cfg))
        np.testing.assert_allclose(got[i], want, atol=2e-5)


@requires_multi
def test_combined_mesh_axes():
    """2x4 mesh: burst sharded over batch while rows shard spatially."""
    mesh = make_mesh((2, 4))
    assert mesh.shape["batch"] == 2 and mesh.shape["spatial"] == 4

    rgb = make_scene(64, 32, seed=20)
    frame = RawFrame.synthetic(mosaic_rggb(rgb))
    cfg = DevelopConfig(quality=QualityDemosaic.Fast)
    got = np.asarray(develop_spatial(frame, cfg, mesh, halo=8))
    want = np.asarray(develop(frame, cfg))
    np.testing.assert_allclose(got[8:-8], want[8:-8], atol=2e-5)
