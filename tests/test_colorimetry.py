"""Color science: spaces/transforms vs NumPy transcriptions + cv2 LAB golden."""
import cv2
import numpy as np

from pysp_tpu.colorimetry.illuminants import StandardIlluminant, xy_to_xyz
from pysp_tpu.colorimetry.spaces import (
    ArbitraryRgbColorspace,
    LinRgbColorspace,
    bradford_adapt_matrix,
)
from pysp_tpu.colorimetry.transforms import (
    cam_to_lin_srgb,
    lin_srgb_to_oklab,
    lin_srgb_to_srgb,
    oklab_to_lin_srgb,
    rgb_to_lab,
    srgb_to_lin_srgb,
)


def test_rec709_matrix_matches_lindbloom():
    # sRGB D65 RGB->XYZ (Lindbloom): well-known values
    want = np.array(
        [
            [0.4124564, 0.3575761, 0.1804375],
            [0.2126729, 0.7151522, 0.0721750],
            [0.0193339, 0.1191920, 0.9503041],
        ]
    )
    got = LinRgbColorspace.REC709.mat_to_xyz()
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_bradford_identity():
    w = xy_to_xyz((0.31272, 0.32903))
    np.testing.assert_allclose(bradford_adapt_matrix(w, w), np.eye(3), atol=1e-12)


def test_bradford_d65_to_d50_matches_lindbloom():
    d65 = xy_to_xyz((0.31271, 0.32902))  # Lindbloom's D65
    d50 = xy_to_xyz((0.34567, 0.35850))
    got = bradford_adapt_matrix(d65, d50)
    want = np.array(
        [
            [1.0478112, 0.0228866, -0.0501270],
            [0.0295424, 0.9904844, -0.0170491],
            [-0.0092345, 0.0150436, 0.7521316],
        ]
    )
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_srgb_gamma_roundtrip():
    x = np.linspace(0, 1, 256, dtype=np.float32).reshape(16, 16)[..., None].repeat(3, -1)
    enc = np.asarray(lin_srgb_to_srgb(x))
    dec = np.asarray(srgb_to_lin_srgb(enc))
    np.testing.assert_allclose(dec, x, atol=1e-5)
    # anchor values
    assert abs(float(np.asarray(lin_srgb_to_srgb(np.array([0.5])))[0]) - 0.7353569) < 1e-5


def test_oklab_roundtrip_and_anchor():
    rng = np.random.default_rng(0)
    rgb = rng.random((8, 8, 3)).astype(np.float32)
    lab = np.asarray(lin_srgb_to_oklab(rgb))
    back = np.asarray(oklab_to_lin_srgb(lab))
    np.testing.assert_allclose(back, rgb, atol=1e-4)
    # white -> L=1, a=b=0
    white = np.asarray(lin_srgb_to_oklab(np.ones((1, 1, 3), np.float32)))
    np.testing.assert_allclose(white[0, 0], [1.0, 0.0, 0.0], atol=1e-4)


def test_rgb_to_lab_matches_cv2():
    rng = np.random.default_rng(1)
    rgb = rng.random((32, 32, 3)).astype(np.float32)
    want = cv2.cvtColor(rgb, cv2.COLOR_RGB2LAB)
    got = np.asarray(rgb_to_lab(rgb))
    # cv2's float path runs the sRGB decode through a spline LUT, which quantizes
    # dark values by up to ~0.4 LAB units; our closed form is exact. L on grays
    # agrees to ~2e-3.
    np.testing.assert_allclose(got, want, atol=0.5)
    gray = np.linspace(0, 1, 64, dtype=np.float32).reshape(8, 8)[..., None].repeat(3, -1)
    np.testing.assert_allclose(
        np.asarray(rgb_to_lab(gray))[..., 0],
        cv2.cvtColor(gray, cv2.COLOR_RGB2LAB)[..., 0],
        atol=0.25,  # cv2 spline-LUT quantization
    )


def _ref_cam_to_lin_srgb(rgb, cam_mat, cam_white_xyz, clip_highlights=True):
    """NumPy transcription of reference transform.py:21-53 + rgb_space adaptation."""
    if clip_highlights:
        rgb = np.clip(rgb, 0, 1)
    dest = LinRgbColorspace.REC709.mat_to_xyz(tuple(cam_white_xyz))
    color_mat = cam_mat @ dest
    color_mat = color_mat / color_mat.sum(axis=1)[:, None]
    color_mat = np.linalg.inv(color_mat)
    return np.dot(rgb, color_mat.T).astype(np.float32)


def test_cam_to_lin_srgb_matches_reference_transcription():
    rng = np.random.default_rng(2)
    rgb = rng.random((16, 16, 3)).astype(np.float32)
    # a plausible XYZ->cam matrix (diagonal-ish with crosstalk)
    cam_mat = np.array(
        [[0.9, -0.2, -0.1], [-0.3, 1.1, 0.2], [0.0, -0.4, 1.3]], np.float32
    )
    cam_white = xy_to_xyz((0.3227, 0.3324))  # ~5500K-ish white

    want = _ref_cam_to_lin_srgb(rgb, cam_mat, cam_white)
    got = np.asarray(
        cam_to_lin_srgb(rgb, cam_mat.astype(np.float32), cam_white.astype(np.float32))
    )
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_detint_property_gray_stays_gray():
    # cam r=g=b must map to output r=g=b (the row-normalization contract)
    gray = np.full((4, 4, 3), 0.37, np.float32)
    cam_mat = np.array(
        [[0.8, -0.1, -0.05], [-0.25, 1.2, 0.1], [0.05, -0.3, 1.4]], np.float32
    )
    cam_white = xy_to_xyz((0.33, 0.34)).astype(np.float32)
    out = np.asarray(cam_to_lin_srgb(gray, cam_mat, cam_white))
    np.testing.assert_allclose(out[..., 0], out[..., 1], atol=1e-6)
    np.testing.assert_allclose(out[..., 1], out[..., 2], atol=1e-6)
    np.testing.assert_allclose(out, 0.37, atol=1e-5)


def test_arbitrary_colorspace_whitepoint_sums():
    # RGB (1,1,1) must map to the whitepoint XYZ
    cs = ArbitraryRgbColorspace(
        (0.64, 0.33), (0.3, 0.6), (0.15, 0.06), StandardIlluminant.D65
    )
    m = cs.mat_to_xyz()
    np.testing.assert_allclose(m @ np.ones(3), xy_to_xyz((0.31272, 0.32903)), atol=1e-12)
