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


def test_merge_sorted_networks():
    """merge_sorted (full + rank-pruned) matches numpy sort for random runs."""
    from pysp_tpu.ops.stencil import merge_sorted, _Q_RANKS

    rng = np.random.default_rng(8)
    for m, n in [(5, 5), (10, 10), (3, 7), (1, 4), (10, 5)]:
        a = np.sort(rng.random((m, 6, 6)).astype(np.float32), axis=0)
        b = np.sort(rng.random((n, 6, 6)).astype(np.float32), axis=0)
        want = np.sort(np.concatenate([a, b], axis=0), axis=0)
        got = merge_sorted(list(a), list(b))
        for r in range(m + n):
            np.testing.assert_array_equal(np.asarray(got[r]), want[r])
        if m + n == 20:
            pruned = merge_sorted(list(a), list(b), ranks=_Q_RANKS)
            for r in _Q_RANKS:
                np.testing.assert_array_equal(np.asarray(pruned[r]), want[r])


def test_median25_select_identity():
    """The two-sorted-list rank-12 selection matches a direct 25-way median."""
    from pysp_tpu.ops.stencil import median25_select, merge_sorted, sort5, _Q_RANKS

    rng = np.random.default_rng(9)
    cols = rng.random((5, 5, 4, 4)).astype(np.float32)  # 5 columns of 5 values
    s = [np.sort(c, axis=0) for c in cols]
    p01 = merge_sorted(list(s[0]), list(s[1]))
    p23 = merge_sorted(list(s[2]), list(s[3]))
    q = merge_sorted(p01, p23, ranks=_Q_RANKS)
    got = np.asarray(median25_select(q, list(s[4])))
    want = np.median(cols.reshape(25, 4, 4), axis=0)
    np.testing.assert_array_equal(got, want.astype(np.float32))


def test_box_sum3_is_unnormalized_box():
    from pysp_tpu.ops.stencil import box_sum3

    x = np.round(_img(17, 13) * 9)  # integer-valued, like homogeneity counts
    got = np.asarray(box_sum3(x))
    want = cv2.blur(x.astype(np.float32), (3, 3)) * 9.0
    np.testing.assert_allclose(got, want, atol=1e-4)
    assert np.all(got == np.round(got))  # integer sums are exact
