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
@pytest.mark.slow
def test_spatial_sharded_pallas_megakernel_interpret():
    """The Pallas megakernel runs INSIDE shard_map (interpret mode on the virtual
    mesh): halos are exchanged before the local develop, so the kernel is purely
    device-local. Gate: sharded interpret-mega == monolithic interpret-mega on
    every interior row (identical kernel on identical padded data)."""
    from pysp_tpu.demosaic.ahd_mega import develop_channels_mega

    def mega_develop(frame, cfg):
        out = develop_channels_mega(
            frame, cfg.postprocess_stages, cfg.clip_highlights, cfg.gamma_encode,
            interpret=True,
        )
        assert out is not None, "megakernel fell back (block too small?)"
        return jnp.stack(out, axis=-1).astype(jnp.float32)

    rgb = make_scene(320, 144, seed=21)
    frame = RawFrame.synthetic(mosaic_rggb(rgb))
    cfg = DevelopConfig(quality=QualityDemosaic.Best)

    mesh = make_mesh((1, 2))
    got = np.asarray(
        develop_spatial(frame, cfg, mesh, halo=16, _develop_fn=mega_develop)
    )
    want = np.asarray(mega_develop(frame, cfg))
    assert got.shape == want.shape
    # Band boundaries differ between the 192-row sharded launches and the
    # 320-row monolithic launch, so homogeneity tie flips are expected
    # (test_ahd_mega gating); geometry bugs would collapse PSNR entirely.
    gi, wi = got[16:-16], want[16:-16]
    assert psnr(gi, wi) > 50
    assert np.mean(np.abs(gi - wi) > 1e-4) < 0.05


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


@requires_multi
@pytest.mark.slow
def test_burst_spatial_pallas_megakernel_interpret():
    """The production layout (batch x spatial) with the Pallas megakernel as the
    local develop (interpret mode): every frame matches the monolithic
    interpret-mega develop to tie-flip noise."""
    from pysp_tpu.demosaic.ahd_mega import develop_channels_mega
    from pysp_tpu.parallel.spatial import develop_burst_spatial

    def mega_develop(frame, cfg):
        out = develop_channels_mega(
            frame, cfg.postprocess_stages, cfg.clip_highlights, cfg.gamma_encode,
            interpret=True,
        )
        assert out is not None
        return jnp.stack(out, axis=-1).astype(jnp.float32)

    frames = []
    for i in range(2):
        rgb = make_scene(320, 144, seed=30 + i)
        frames.append(RawFrame.synthetic(mosaic_rggb(rgb)))
    batch = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *frames)

    cfg = DevelopConfig(quality=QualityDemosaic.Best)
    mesh = make_mesh((2, 2))
    got = np.asarray(
        develop_burst_spatial(batch, cfg, mesh, halo=16, _develop_fn=mega_develop)
    )
    assert got.shape == (2, 320, 144, 3)
    for i in range(2):
        want = np.asarray(mega_develop(frames[i], cfg))
        gi, wi = got[i, 16:-16], want[16:-16]
        assert psnr(gi, wi) > 50
        assert np.mean(np.abs(gi - wi) > 1e-4) < 0.05
