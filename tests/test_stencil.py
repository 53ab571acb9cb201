"""Stencil ops vs OpenCV golden behavior."""
import cv2
import numpy as np

from pysp_tpu.ops.stencil import (
    box_blur3,
    filter2d,
    filter2d_hwc,
    gaussian_blur3,
    median2,
    median3,
    median5,
    pad_reflect,
    pad_reflect101,
    shift2d,
    upsample2x_bilinear_cv2,
)


def _img(h=32, w=40, seed=0):
    return np.random.default_rng(seed).random((h, w)).astype(np.float32)


def test_pad_matches_cv2():
    x = _img(6, 7)
    np.testing.assert_array_equal(
        np.asarray(pad_reflect(x, 2)),
        cv2.copyMakeBorder(x, 2, 2, 2, 2, cv2.BORDER_REFLECT),
    )
    np.testing.assert_array_equal(
        np.asarray(pad_reflect101(x, 2)),
        cv2.copyMakeBorder(x, 2, 2, 2, 2, cv2.BORDER_REFLECT_101),
    )


def test_filter2d_matches_cv2():
    x = _img()
    k = np.random.default_rng(1).random((3, 3)).astype(np.float32)
    got = np.asarray(filter2d(x, k))
    want = cv2.filter2D(x, -1, k)  # default border reflect101
    np.testing.assert_allclose(got, want, atol=2e-6)

    k5 = np.random.default_rng(2).random((5, 5)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(filter2d(x, k5)), cv2.filter2D(x, -1, k5), atol=1e-5
    )


def test_filter2d_asymmetric_kernel_matches_cv2():
    # The photosite phase kernels are zero-padded/asymmetric — anchor semantics matter.
    x = _img()
    k = np.array([[0.0, 0.5, 0.0], [0.0, 0.25, 0.25], [0.0, 0.0, 0.0]], np.float32)
    np.testing.assert_allclose(
        np.asarray(filter2d(x, k)), cv2.filter2D(x, -1, k), atol=2e-6
    )


def test_box_and_gaussian_match_cv2():
    x = _img()
    np.testing.assert_allclose(
        np.asarray(box_blur3(x)), cv2.blur(x, (3, 3)), atol=2e-6
    )
    np.testing.assert_allclose(
        np.asarray(gaussian_blur3(x)), cv2.GaussianBlur(x, (3, 3), 1.0), atol=2e-6
    )


def test_median_matches_cv2():
    x = _img()
    np.testing.assert_allclose(
        np.asarray(median5(x)), cv2.medianBlur(x, 5), atol=0
    )
    np.testing.assert_allclose(
        np.asarray(median3(x)), cv2.medianBlur(x, 3), atol=0
    )


def test_median2_matches_reference():
    x = _img(10, 11)
    padded = np.pad(x, (1, 1), mode="reflect")
    stack = np.array([x, padded[1:-1, 2:], padded[2:, 1:-1], padded[2:, 2:]])
    want = np.median(stack, axis=0)
    np.testing.assert_allclose(np.asarray(median2(x)), want, atol=1e-7)


def test_shift2d():
    x = _img(5, 6)
    got = np.asarray(shift2d(x, 1, -1))
    pad = np.pad(x, ((1, 1), (1, 1)), mode="symmetric")
    np.testing.assert_array_equal(got, pad[2:, 0:6])


def test_upsample2x_matches_cv2_resize():
    x = _img(9, 7)
    want = cv2.resize(x, (14, 18), interpolation=cv2.INTER_LINEAR)
    got = np.asarray(upsample2x_bilinear_cv2(x))
    np.testing.assert_allclose(got, want, atol=2e-6)

    rgb = np.random.default_rng(5).random((9, 7, 3)).astype(np.float32)
    want3 = cv2.resize(rgb, (14, 18), interpolation=cv2.INTER_LINEAR)
    np.testing.assert_allclose(
        np.asarray(upsample2x_bilinear_cv2(rgb)), want3, atol=2e-6
    )


def test_filter2d_hwc():
    rgb = np.random.default_rng(6).random((12, 13, 3)).astype(np.float32)
    k = np.random.default_rng(7).random((3, 3)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(filter2d_hwc(rgb, k)), cv2.filter2D(rgb, -1, k), atol=2e-6
    )
