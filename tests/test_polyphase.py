"""Polyphase stencils: bit-parity with the interleaved full-resolution ops."""
import numpy as np
import jax.numpy as jnp
import pytest

from pysp_tpu.ops.polyphase import (
    bayer_to_quad,
    conv3x3_poly,
    median5_poly,
    quad_to_bayer,
    shift_fullres,
)
from pysp_tpu.ops.stencil import (
    GAUSSIAN3_SIGMA1,
    box_blur3,
    filter2d,
    gaussian_blur3,
    median5,
    pad_replicate,
)


@pytest.mark.parametrize("shape", [(16, 20), (30, 42), (8, 8)])
def test_quad_roundtrip(shape):
    x = jnp.asarray(np.random.default_rng(0).random(shape, np.float32).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(quad_to_bayer(bayer_to_quad(x))), np.asarray(x))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_conv3x3_poly_matches_filter2d(seed):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.random((18, 26)).astype(np.float32))
    q = bayer_to_quad(x)
    k = rng.random((3, 3)).astype(np.float32)
    got = np.asarray(quad_to_bayer(conv3x3_poly(q, k)))
    want = np.asarray(filter2d(x, k))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_conv3x3_poly_gaussian_and_box():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.random((24, 32)).astype(np.float32))
    q = bayer_to_quad(x)
    np.testing.assert_allclose(
        np.asarray(quad_to_bayer(conv3x3_poly(q, GAUSSIAN3_SIGMA1))),
        np.asarray(gaussian_blur3(x)),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(quad_to_bayer(conv3x3_poly(q, np.full((3, 3), 1.0 / 9.0, np.float32)))),
        np.asarray(box_blur3(x)),
        atol=1e-6,
    )


def test_median5_poly_exact():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.random((20, 28)).astype(np.float32))
    got = np.asarray(quad_to_bayer(median5_poly(bayer_to_quad(x))))
    np.testing.assert_array_equal(got, np.asarray(median5(x)))


@pytest.mark.parametrize("border", ["reflect101", "replicate"])
def test_shift_fullres_all_offsets(border):
    """Every (phase, dy, dx) combination vs the padded interleaved reference."""
    rng = np.random.default_rng(5)
    x = np.asarray(rng.random((12, 14)).astype(np.float32))
    q = bayer_to_quad(jnp.asarray(x))

    mode = {"reflect101": "reflect", "replicate": "edge"}[border]
    xp = np.pad(x, 2, mode=mode)

    for py in (0, 1):
        for px in (0, 1):
            for dy in range(-2, 3):
                for dx in range(-2, 3):
                    got = np.asarray(shift_fullres(q, py, px, dy, dx, border))
                    # reference: full-res field at (2i+py+dy, 2j+px+dx)
                    want = xp[2 + py + dy : 2 + py + dy + 12 : 2,
                              2 + px + dx : 2 + px + dx + 14 : 2]
                    np.testing.assert_array_equal(
                        got, want, err_msg=f"{border} p=({py},{px}) d=({dy},{dx})"
                    )
