"""Demosaic parity vs reference transcription + PSNR quality gates."""
import numpy as np
import pytest

from pysp_tpu.const import BayerPattern, QualityDemosaic
from pysp_tpu.core.frame import RawFrame
from pysp_tpu.demosaic import demosaic_ahd, demosaic_draft, demosaic_eag
from pysp_tpu.pipeline.develop import DevelopConfig, develop

import golden_ref as ref


def psnr(a, b, peak=1.0):
    mse = np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2)
    if mse == 0:
        return np.inf
    return 10 * np.log10(peak**2 / mse)


def make_scene(h=64, w=80, seed=0):
    """A mosaicked synthetic scene: smooth gradients + edges + texture."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    r = 0.3 + 0.4 * np.sin(xx / 9) * np.cos(yy / 13) + 0.2 * (xx > w / 2)
    g = 0.4 + 0.3 * np.cos(xx / 7) + 0.15 * (yy > h / 3)
    b = 0.5 - 0.3 * np.sin(yy / 11) + 0.1 * ((xx + yy) % 17 > 8)
    rgb = np.clip(np.dstack([r, g, b]) + rng.normal(0, 0.01, (h, w, 3)), 0.02, 0.98)
    return rgb.astype(np.float32)


def mosaic_rggb(rgb):
    h, w, _ = rgb.shape
    bayer = np.zeros((h, w), np.float32)
    bayer[0::2, 0::2] = rgb[0::2, 0::2, 0]
    bayer[0::2, 1::2] = rgb[0::2, 1::2, 1]
    bayer[1::2, 0::2] = rgb[1::2, 0::2, 1]
    bayer[1::2, 1::2] = rgb[1::2, 1::2, 2]
    return bayer


WB = np.array([0.45, 1.0, 0.62], np.float32)  # neutral (reciprocal = gains)
CAM_MAT = np.array(
    [[0.9, -0.2, -0.1], [-0.3, 1.1, 0.2], [0.0, -0.4, 1.3]], np.float32
)
CAM_WHITE = np.array([0.95047, 1.0, 1.08883], np.float32)


def make_frame(bayer, **kw):
    return RawFrame.synthetic(
        bayer, cam_mat=CAM_MAT, cam_white=CAM_WHITE, wb_neutral=WB, **kw
    )


@pytest.fixture(scope="module")
def scene():
    rgb = make_scene()
    return rgb, mosaic_rggb(rgb)


def test_draft_matches_reference(scene):
    _, bayer = scene
    got = np.asarray(demosaic_draft(make_frame(bayer)).image)
    want = ref.ref_demosaic_draft(bayer, 1.0 / WB)
    assert psnr(got, want) > 60, psnr(got, want)


def test_eag_matches_reference(scene):
    _, bayer = scene
    got = np.asarray(demosaic_eag(make_frame(bayer)).image)
    want = ref.ref_demosaic_eag(bayer, 1.0 / WB)
    assert psnr(got, want) > 60, psnr(got, want)


def test_ahd_matches_reference(scene):
    """Full parity vs cv2-LAB golden: decision flips only occur at H/V ties, driven
    by cv2's internal gamma-LUT error (~4e-3) vs our exact closed form."""
    _, bayer = scene
    got = np.asarray(demosaic_ahd(make_frame(bayer), postprocess_stages=1).image)
    want = ref.ref_demosaic_ahd(bayer, 1.0 / WB, CAM_MAT, CAM_WHITE, postprocess_stages=1)
    p = psnr(got, want)
    assert p > 45, p


def test_ahd_matches_reference_exact_lab(scene):
    """Strict gate: with the same (exact) LAB on both sides, everything else in AHD —
    interpolation, reconstruction, homogeneity counts, medians — must match tightly."""
    from pysp_tpu.colorimetry.transforms import rgb_to_lab

    _, bayer = scene
    got = np.asarray(demosaic_ahd(make_frame(bayer), postprocess_stages=1).image)
    want = ref.ref_demosaic_ahd(
        bayer, 1.0 / WB, CAM_MAT, CAM_WHITE, postprocess_stages=1,
        lab_fn=lambda im: np.asarray(rgb_to_lab(im)),
    )
    p = psnr(got, want)
    assert p > 55, p


def test_ahd_hdr_mode_runs(scene):
    _, bayer = scene
    frame = make_frame(bayer * 2.0, is_hdr=True, lim_sat=4.0)
    got = np.asarray(demosaic_ahd(frame).image)
    want = ref.ref_demosaic_ahd(
        bayer * 2.0, 1.0 / WB, CAM_MAT, CAM_WHITE, is_hdr=True, postprocess_stages=1
    )
    p = psnr(got / 4, want / 4)
    assert p > 45, p


def test_demosaic_reconstruction_quality(scene):
    """Demosaic of a mosaicked scene should approximate the original RGB."""
    rgb, bayer = scene
    frame = RawFrame.synthetic(bayer)  # identity color, unit WB
    interior = np.s_[4:-4, 4:-4]

    out_draft = np.asarray(demosaic_draft(frame).image)[interior]
    out_eag = np.asarray(demosaic_eag(frame).image)[interior]
    out_ahd = np.asarray(demosaic_ahd(frame).image)[interior]
    truth = rgb[interior]

    p_draft, p_eag, p_ahd = psnr(out_draft, truth), psnr(out_eag, truth), psnr(out_ahd, truth)
    assert p_draft > 20, p_draft
    assert p_eag > 25, p_eag
    assert p_ahd > 25, p_ahd


def test_quality_ordering_on_edges():
    """On a sharp edge chart the quality tiers must order: AHD/EAG beat Draft
    (on smooth noisy scenes Draft's blur can flatter PSNR — edges are the
    discriminating content)."""
    h, w = 64, 64
    xx = np.mgrid[0:h, 0:w][1].astype(np.float32)
    bars = (np.sin(xx * 1.1) > 0).astype(np.float32) * 0.8 + 0.1
    rgb = np.dstack([bars, bars, bars])
    bayer = mosaic_rggb(rgb)
    frame = RawFrame.synthetic(bayer)
    interior = np.s_[8:-8, 8:-8]

    p_draft = psnr(np.asarray(demosaic_draft(frame).image)[interior], rgb[interior])
    p_eag = psnr(np.asarray(demosaic_eag(frame).image)[interior], rgb[interior])
    p_ahd = psnr(np.asarray(demosaic_ahd(frame).image)[interior], rgb[interior])
    assert p_ahd > p_draft, (p_ahd, p_draft)
    assert p_eag > p_draft, (p_eag, p_draft)


def test_develop_draft_fused_matches_separable(scene):
    """The polyphase fused Draft develop == separable upsample + full-res tail.

    Same taps, one association-order difference in the bilinear accumulation
    (~1 ulp); anything structural (phase mix-up, wrong tap, tail-order bug)
    would land orders of magnitude below the gate."""
    from pysp_tpu.colorimetry.transforms import cam_to_lin_srgb_matrix
    from pysp_tpu.pipeline.develop import _color_tail_channels, _demosaic_channels

    _, bayer = scene
    frame = make_frame(bayer)
    for clip, gamma in ((True, True), (False, False)):
        cfg = DevelopConfig(
            quality=QualityDemosaic.Draft, clip_highlights=clip, gamma_encode=gamma
        )
        got = np.asarray(develop(frame, cfg))
        r, g, b = _demosaic_channels(frame, cfg)
        mat = cam_to_lin_srgb_matrix(frame.cam_mat, frame.cam_white)
        want = np.stack(
            [np.asarray(c) for c in _color_tail_channels(r, g, b, mat, clip, gamma)],
            axis=-1,
        )
        p = psnr(got, want)
        assert p > 100, (clip, gamma, p)


def test_develop_fast_fused_matches_separable(scene):
    """The polyphase fused Fast (EAG) develop == unfused demosaic + full-res
    tail. Identical slices/taps; blur3 runs as two separable phase passes
    instead of one 9-tap conv (association order, ~1 ulp) — structural bugs
    (phase mix-up, wrong border parity, HF mis-add) land far below the gate."""
    from pysp_tpu.colorimetry.transforms import cam_to_lin_srgb_matrix
    from pysp_tpu.demosaic.eag import demosaic_eag_channels, develop_channels_eag
    from pysp_tpu.pipeline.develop import _color_tail_channels

    _, bayer = scene
    frame = make_frame(bayer)
    for clip, gamma in ((True, True), (False, False)):
        cfg = DevelopConfig(
            quality=QualityDemosaic.Fast, clip_highlights=clip, gamma_encode=gamma
        )
        got = np.asarray(develop(frame, cfg))  # dispatches the fused path
        fused = np.stack(
            [np.asarray(c) for c in develop_channels_eag(frame, clip, gamma)],
            axis=-1,
        )
        # develop() really took the fused path (jit-vs-eager FMA rounding only)
        np.testing.assert_allclose(got, fused, atol=2e-6)

        r, g, b = demosaic_eag_channels(frame)
        mat = cam_to_lin_srgb_matrix(frame.cam_mat, frame.cam_white)
        want = np.stack(
            [np.asarray(c) for c in _color_tail_channels(r, g, b, mat, clip, gamma)],
            axis=-1,
        )
        p = psnr(got, want)
        assert p > 100, (clip, gamma, p)
        np.testing.assert_allclose(got, want, atol=2e-5)


def test_develop_jit_and_pattern_roundtrip(scene):
    _, bayer = scene
    cfg = DevelopConfig(quality=QualityDemosaic.Draft)

    out = np.asarray(develop(make_frame(bayer), cfg))
    assert out.shape == (*bayer.shape, 3)
    assert np.all(out >= 0) and np.all(out <= 1)

    # a BGGR-sourced frame: canonical mosaic is identical, output flips back
    frame_bggr = make_frame(bayer, source_pattern=BayerPattern.Bggr)
    out_bggr = np.asarray(develop(frame_bggr, cfg))
    np.testing.assert_allclose(out_bggr, out[::-1, ::-1], atol=1e-6)
