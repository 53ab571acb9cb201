"""Warp stack: remap vs cv2, rectilinear tables vs reference transcription, opcodes."""
import cv2
import numpy as np
import pytest

from pysp_tpu.ops.resample import bilinear_sample, remap_bilinear, remap_lanczos4
from pysp_tpu.warp.opcodes import (
    apply_opcode_3_warp,
    decode_warp_rectilinear,
    encode_warp_rectilinear,
    iter_opcodes,
    stack_warp_prior,
)
from pysp_tpu.warp.rectilinear import compute_remapping_table


def _img(h=32, w=40, seed=0):
    # smooth image to keep interpolator differences small
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    return (0.5 + 0.3 * np.sin(xx / 5) * np.cos(yy / 7)).astype(np.float32)


def _maps(h, w, seed=1):
    rng = np.random.default_rng(seed)
    xs, ys = np.meshgrid(np.arange(w, dtype=np.float32), np.arange(h, dtype=np.float32))
    map_x = np.clip(xs + rng.uniform(-1.5, 1.5, xs.shape).astype(np.float32), 0, w - 1)
    map_y = np.clip(ys + rng.uniform(-1.5, 1.5, ys.shape).astype(np.float32), 0, h - 1)
    return map_x, map_y


def test_remap_bilinear_matches_cv2():
    img = _img()
    map_x, map_y = _maps(*img.shape[:2][::-1][::-1])
    want = cv2.remap(img, map_x, map_y, cv2.INTER_LINEAR)
    got = np.asarray(remap_bilinear(img, map_x, map_y))
    # cv2 quantizes fractions to 1/32 fixed point; interior should agree closely
    np.testing.assert_allclose(got, want, atol=3e-3)


def test_remap_lanczos4_close_to_cv2():
    img = _img()
    map_x, map_y = _maps(32, 40, seed=2)
    want = cv2.remap(img, map_x, map_y, cv2.INTER_LANCZOS4)
    got = np.asarray(remap_lanczos4(img, map_x, map_y))
    interior = np.s_[8:-8, 8:-8]  # 8-tap reach + displacement hits cv2 zero-border
    np.testing.assert_allclose(got[interior], want[interior], atol=5e-3)


def test_bilinear_sample_matches_reference():
    """vs transcription of corr_ca/roi/helper.py:38-95."""
    img = np.random.default_rng(3).random((20, 24)).astype(np.float32)

    def ref_bilinear_sample(image, offset, width, height):
        offset_y, offset_x = offset
        img_h, img_w = image.shape[:2]
        y = np.arange(height, dtype=np.float32) + offset_y
        x = np.arange(width, dtype=np.float32) + offset_x
        xg, yg = np.meshgrid(x, y)
        x0 = np.floor(xg).astype(np.int32)
        y0 = np.floor(yg).astype(np.int32)
        fx, fy = xg - x0, yg - y0
        x0c, x1c = np.clip(x0, 0, img_w - 1), np.clip(x0 + 1, 0, img_w - 1)
        y0c, y1c = np.clip(y0, 0, img_h - 1), np.clip(y0 + 1, 0, img_h - 1)
        return (
            (1 - fx) * (1 - fy) * image[y0c, x0c]
            + fx * (1 - fy) * image[y0c, x1c]
            + (1 - fx) * fy * image[y1c, x0c]
            + fx * fy * image[y1c, x1c]
        )

    got = np.asarray(bilinear_sample(img, (2.3, 3.7), 8, 6))
    want = ref_bilinear_sample(img, (2.3, 3.7), 8, 6)
    np.testing.assert_allclose(got, want, atol=1e-5)


def _ref_table(kr, width, height, cx_n, cy_n, scale):
    """Transcription of dng_warp_rectilinear_coords.pyx:18-40,67-80."""
    kr0, kr1, kr2, kr3, kt0, kt1 = kr
    cx = (width - 1) * cx_n
    cy = (height - 1) * cy_n
    mx = max(abs(-cx), abs(width - 1 - cx))
    my = max(abs(-cy), abs(height - 1 - cy))
    m = np.sqrt(mx**2 + my**2)
    table = np.zeros((height, width, 2), np.float32)
    for y in range(height):
        dy = (y - cy) / m
        for x in range(width):
            dx = (x - cx) / m
            r = np.sqrt(dx**2 + dy**2)
            f = kr0 + kr1 * r**2 + kr2 * r**4 + kr3 * r**6
            dxr, dyr = f * dx, f * dy
            dxt = kt0 * (2 * dx * dy) + kt1 * (r**2 + 2 * dx**2)
            dyt = kt1 * (2 * dx * dy) + kt0 * (r**2 + 2 * dy**2)
            xp = cx + m * (dxr + dxt)
            yp = cy + m * (dyr + dyt)
            table[y, x, 0] = x + (xp - x) * scale
            table[y, x, 1] = y + (yp - y) * scale
    return table


def test_rectilinear_table_matches_reference():
    coeffs = (1.02, -0.08, 0.02, -0.003, 0.001, -0.0005)
    mx, my = compute_remapping_table(coeffs, 24, 18, (0.5, 0.48), scale=0.9)
    want = _ref_table(coeffs, 24, 18, 0.5, 0.48, 0.9)
    np.testing.assert_allclose(np.asarray(mx), want[..., 0], atol=2e-4)
    np.testing.assert_allclose(np.asarray(my), want[..., 1], atol=2e-4)


def test_opcode_roundtrip_and_apply():
    coeffs = [
        (1.01, -0.05, 0.0, 0.0, 0.0, 0.0),
        (1.0, 0.0, 0.0, 0.0, 0.0, 0.0),
        (0.99, 0.05, 0.0, 0.0, 0.0, 0.0),
    ]
    center = (0.5, 0.5)
    block = encode_warp_rectilinear(coeffs, center)

    ops = list(iter_opcodes(block))
    assert len(ops) == 1
    opcode_id, _, _, data = ops[0]
    assert opcode_id == 1
    decoded = decode_warp_rectilinear(data, 3)
    assert decoded is not None
    got_coeffs, got_center = decoded
    np.testing.assert_allclose(got_coeffs, coeffs)
    np.testing.assert_allclose(got_center, center)

    img = np.dstack([_img(32, 32, s) for s in range(3)])
    out = np.asarray(apply_opcode_3_warp(img, block, interpolation="bilinear"))
    assert out.shape == img.shape
    assert np.all(np.isfinite(out))
    # identity plane (kr=1, rest 0) is preserved
    np.testing.assert_allclose(out[..., 1], img[..., 1], atol=1e-5)
    # warped planes actually moved
    assert np.abs(out[..., 0] - img[..., 0]).max() > 1e-3


def test_warp_composition_single_resample():
    """prior composition == applying the prior remap inside the warp (one resample)."""
    img = _img(24, 24)
    # prior: shift by +2 px in x
    xs, ys = np.meshgrid(
        np.arange(24, dtype=np.float32), np.arange(24, dtype=np.float32)
    )
    prior = [(xs + 2.0, ys)] * 3
    coeffs = [(1.0, 0.0, 0.0, 0.0, 0.0, 0.0)] * 3  # identity warp
    block = encode_warp_rectilinear(coeffs, (0.5, 0.5))
    rgb = np.dstack([img] * 3)
    out = np.asarray(
        apply_opcode_3_warp(rgb, block, prior=prior, interpolation="bilinear")
    )
    want = np.asarray(remap_bilinear(img, np.clip(xs + 2.0, 0, 23), ys))
    np.testing.assert_allclose(out[..., 0], want, atol=1e-5)


def test_stack_warp_prior_identity_fill():
    pri = stack_warp_prior((8, 10), None, None, None)
    assert len(pri) == 3
    np.testing.assert_allclose(np.asarray(pri[0][0])[0], np.arange(10))
    np.testing.assert_allclose(np.asarray(pri[1][1])[:, 0], np.arange(8))


class TestGainOpcodes:
    """OpcodeList1/2 gain operators (GainMap, FixVignetteRadial) — additive over
    the reference (it reads only OpcodeList3)."""

    def _gm(self, h, w, gains, top=0, left=0, pitch=(1, 1)):
        from pysp_tpu.warp.gain_opcodes import GainMap

        pv, ph = gains.shape
        return GainMap(
            top=top, left=left, bottom=h, right=w, plane=0, planes=1,
            row_pitch=pitch[0], col_pitch=pitch[1],
            points_v=pv, points_h=ph,
            spacing_v=1.0 / max(pv - 1, 1), spacing_h=1.0 / max(ph - 1, 1),
            origin_v=0.0, origin_h=0.0, map_planes=1,
            gains=gains[..., None].astype(np.float32),
        )

    def test_gain_map_roundtrip_and_constant(self):
        from pysp_tpu.warp.gain_opcodes import (
            OPCODE_GAIN_MAP, apply_gain_opcodes, decode_gain_map,
            encode_gain_map, encode_opcode_list,
        )

        gm = self._gm(16, 20, np.full((3, 4), 1.5, np.float32))
        rt = decode_gain_map(encode_gain_map(gm))
        assert rt._replace(gains=None) == gm._replace(gains=None)
        np.testing.assert_array_equal(rt.gains, gm.gains)

        block = encode_opcode_list([(OPCODE_GAIN_MAP, encode_gain_map(gm))])
        x = np.ones((16, 20), np.float32)
        out = np.asarray(apply_gain_opcodes(x, block))
        np.testing.assert_allclose(out, 1.5, rtol=1e-6)

    def test_gain_map_strided_plane(self):
        """Per-CFA-plane map (pitch 2) touches only its phase."""
        from pysp_tpu.warp.gain_opcodes import (
            OPCODE_GAIN_MAP, apply_gain_opcodes, encode_gain_map, encode_opcode_list,
        )

        gm = self._gm(16, 20, np.full((2, 2), 2.0, np.float32), top=0, left=1,
                      pitch=(2, 2))
        block = encode_opcode_list([(OPCODE_GAIN_MAP, encode_gain_map(gm))])
        x = np.ones((16, 20), np.float32)
        out = np.asarray(apply_gain_opcodes(x, block))
        np.testing.assert_allclose(out[0::2, 1::2], 2.0, rtol=1e-6)
        np.testing.assert_allclose(out[0::2, 0::2], 1.0)
        np.testing.assert_allclose(out[1::2, :], 1.0)

    def test_gain_map_bilinear_gradient(self):
        from pysp_tpu.warp.gain_opcodes import (
            OPCODE_GAIN_MAP, apply_gain_opcodes, encode_gain_map, encode_opcode_list,
        )

        # horizontal gradient 1 -> 2 across the grid
        gains = np.array([[1.0, 2.0], [1.0, 2.0]], np.float32)
        gm = self._gm(8, 64, gains)
        block = encode_opcode_list([(OPCODE_GAIN_MAP, encode_gain_map(gm))])
        x = np.ones((8, 64), np.float32)
        out = np.asarray(apply_gain_opcodes(x, block))
        # col c samples grid at c/64 -> gain 1 + c/64
        want = 1.0 + np.arange(64) / 64.0
        np.testing.assert_allclose(out[3], want, rtol=1e-5)

    def test_vignette_radial(self):
        from pysp_tpu.warp.gain_opcodes import (
            OPCODE_FIX_VIGNETTE_RADIAL, VignetteRadial, apply_gain_opcodes,
            decode_vignette_radial, encode_vignette_radial, encode_opcode_list,
        )

        v = VignetteRadial((0.3, 0.0, 0.0, 0.0, 0.0), 0.5, 0.5)
        assert decode_vignette_radial(encode_vignette_radial(v)) == v

        block = encode_opcode_list([(OPCODE_FIX_VIGNETTE_RADIAL,
                                     encode_vignette_radial(v))])
        h, w = 17, 25
        x = np.ones((h, w), np.float32)
        out = np.asarray(apply_gain_opcodes(x, block))
        # center gain == 1, corner gain == 1 + k0 (r=1 at the farthest corner)
        np.testing.assert_allclose(out[8, 12], 1.0, atol=1e-6)
        np.testing.assert_allclose(out[0, 0], 1.3, rtol=1e-6)
        assert out[0, 0] == out[-1, -1] == out[0, -1] == out[-1, 0]

    def test_loader_applies_opcode_list_2(self):
        from pysp_tpu.io import tiff as T
        from pysp_tpu.io.raw_loader import load_raw_dng
        from pysp_tpu.warp.gain_opcodes import (
            OPCODE_GAIN_MAP, encode_gain_map, encode_opcode_list,
        )

        h, w = 32, 40
        counts = np.full((h, w), 2304, np.uint16)  # (2304-256)/(4095-256)
        gm = self._gm(h, w, np.full((2, 2), 1.25, np.float32))
        block = encode_opcode_list([(OPCODE_GAIN_MAP, encode_gain_map(gm))])
        blob = T.write_synthetic_dng(counts, opcode_list_2=block)

        frame = load_raw_dng(blob)
        base = (2304 - 256) / 4095  # normalize divides by the white level
        np.testing.assert_allclose(np.asarray(frame.bayer), base * 1.25, rtol=1e-5)

        frame_raw = load_raw_dng(blob, apply_gain_opcodes=False)
        np.testing.assert_allclose(np.asarray(frame_raw.bayer), base, rtol=1e-6)


@pytest.mark.parametrize("bits", [10, 12, 14])
def test_packed_cfa_roundtrip(bits):
    """10/12/14-bit packed uncompressed CFA (additive: reference needs libraw)."""
    from pysp_tpu.io import tiff as T

    rng = np.random.default_rng(bits)
    bayer = rng.integers(0, 1 << bits, (26, 38)).astype(np.uint16)
    blob = T.write_synthetic_dng(bayer, bits_per_sample=bits, white_level=(1 << bits) - 1)
    tf = T.read_tiff(blob)
    np.testing.assert_array_equal(tf.read_strips(tf.find_raw_ifd()), bayer)


class TestFixBadPixelOpcodes:
    def test_roundtrip(self):
        from pysp_tpu.warp.fix_opcodes import (
            BadPixelsConstant, BadPixelsList,
            decode_fix_bad_pixels_constant, decode_fix_bad_pixels_list,
            encode_fix_bad_pixels_constant, encode_fix_bad_pixels_list,
        )

        c = BadPixelsConstant(4095, 0)
        assert decode_fix_bad_pixels_constant(encode_fix_bad_pixels_constant(c)) == c

        l = BadPixelsList(0, np.array([[3, 5], [9, 11]], np.int32),
                          np.array([[0, 0, 2, 2]], np.int32))
        rt = decode_fix_bad_pixels_list(encode_fix_bad_pixels_list(l))
        assert rt.bayer_phase == 0
        np.testing.assert_array_equal(rt.points, l.points)
        np.testing.assert_array_equal(rt.rects, l.rects)

    def test_loader_heals_listed_pixels(self):
        from pysp_tpu.io import tiff as T
        from pysp_tpu.io.raw_loader import load_raw_dng
        from pysp_tpu.warp.fix_opcodes import (
            OPCODE_FIX_BAD_PIXELS_LIST, BadPixelsList, encode_fix_bad_pixels_list,
        )
        from pysp_tpu.warp.gain_opcodes import encode_opcode_list

        h, w = 32, 40
        counts = np.full((h, w), 2000, np.uint16)
        counts[10, 14] = 4095  # defect photosite (phase (0,0))
        op = BadPixelsList(0, np.array([[10, 14]], np.int32),
                           np.zeros((0, 4), np.int32))
        block = encode_opcode_list(
            [(OPCODE_FIX_BAD_PIXELS_LIST, encode_fix_bad_pixels_list(op))]
        )
        blob = T.write_synthetic_dng(counts, opcode_list_1=block)

        frame = load_raw_dng(blob)
        base = (2000 - 256) / 4095
        got = np.asarray(frame.bayer)
        # healed from same-plane neighbors, which are all `base`
        np.testing.assert_allclose(got[10, 14], base, rtol=1e-5)
        np.testing.assert_allclose(got, base, rtol=1e-5)

        leaked = np.asarray(load_raw_dng(blob, apply_gain_opcodes=False).bayer)
        assert leaked[10, 14] > 2 * base


def test_warp_apply_matches_cv2_transcription():
    """North-star per-stage gate: full OpcodeList3 WarpRectilinear apply (table +
    Lanczos4 resample, per channel) vs the reference transcription
    (dng_warp_corr/chan_distortion_corr.py:86-98: table -> clip -> cv2.remap
    INTER_LANCZOS4), >= 50 dB away from cv2's zero border."""
    h, w = 96, 112
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    rng = np.random.default_rng(9)
    img = np.dstack([
        np.clip(0.4 + 0.3 * np.sin(xx / 7 + c) * np.cos(yy / 9 - c)
                + 0.1 * ((xx + yy + 5 * c) % 19 > 9)
                + rng.normal(0, 0.004, (h, w)), 0.02, 0.98).astype(np.float32)
        for c in range(3)
    ])
    coeffs = [
        (1.01, -0.04, 0.006, -0.001, 0.0006, -0.0004),
        (1.0, 0.0, 0.0, 0.0, 0.0, 0.0),
        (0.99, 0.05, -0.004, 0.0008, -0.0005, 0.0007),
    ]
    center = (0.5, 0.47)
    block = encode_warp_rectilinear(coeffs, center)

    got = np.asarray(apply_opcode_3_warp(img, block, interpolation="lanczos4"))

    want = img.copy()
    for c in range(3):
        table = _ref_table(coeffs[c], w, h, center[0], center[1], 1.0)
        want[..., c] = cv2.remap(
            img[..., c],
            np.clip(table[..., 0], 0, w - 1),
            np.clip(table[..., 1], 0, h - 1),
            cv2.INTER_LANCZOS4,
        )

    interior = np.s_[8:-8, 8:-8]  # Lanczos 8-tap reach hits cv2's zero border
    mse = np.mean(
        (got[interior].astype(np.float64) - want[interior].astype(np.float64)) ** 2
    )
    p = np.inf if mse == 0 else 10 * np.log10(1.0 / mse)
    assert p > 50, p


def test_bounded_remaps_bit_identical_to_gather_remaps():
    """The gather-free bounded remaps (select over statically-bounded shifts)
    reproduce the gather remaps bit for bit — radial and jittery maps, maps
    clipped at the edges, both kernels."""
    from pysp_tpu.ops.resample import (
        remap_bilinear,
        remap_bilinear_bounded,
        remap_lanczos4,
        remap_lanczos4_bounded,
    )

    rng = np.random.default_rng(4)
    H, W = 80, 144
    import jax.numpy as jnp

    img = jnp.asarray(rng.random((H, W)).astype(np.float32))
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)
    cy, cx = (H - 1) / 2, (W - 1) / 2
    r2 = ((yy - cy) / cy) ** 2 + ((xx - cx) / cx) ** 2
    s = 1.0 + 0.04 * r2 - 0.015 * r2**2
    maps = [
        (
            np.clip(cx + (xx - cx) * s, 0, W - 1).astype(np.float32),
            np.clip(cy + (yy - cy) * s, 0, H - 1).astype(np.float32),
        ),
        (
            np.clip(xx + rng.uniform(-3.9, 1.4, (H, W)), 0, W - 1).astype(np.float32),
            np.clip(yy + rng.uniform(-2.7, 3.2, (H, W)), 0, H - 1).astype(np.float32),
        ),
    ]
    for mx, my in maps:
        dyb = (
            int(np.floor((np.floor(my) - yy).min())),
            int(np.ceil((np.floor(my) - yy).max())),
        )
        dxb = (
            int(np.floor((np.floor(mx) - xx).min())),
            int(np.ceil((np.floor(mx) - xx).max())),
        )
        np.testing.assert_array_equal(
            np.asarray(remap_bilinear_bounded(img, mx, my, dyb, dxb)),
            np.asarray(remap_bilinear(img, mx, my)),
        )
        np.testing.assert_array_equal(
            np.asarray(remap_lanczos4_bounded(img, mx, my, dyb, dxb)),
            np.asarray(remap_lanczos4(img, mx, my)),
        )


def test_warp_channel_bounded_matches_gather_path():
    """warp_channel_rectilinear's automatic bounded path equals the gather
    path exactly for a realistic distortion."""
    from pysp_tpu.warp.rectilinear import displacement_bounds, warp_channel_rectilinear

    rng = np.random.default_rng(6)
    import jax.numpy as jnp

    chan = jnp.asarray(rng.random((64, 96)).astype(np.float32))
    coeffs = (1.004, -0.012, 0.003, 0.0, 0.0004, -0.0002)
    center = (0.5, 0.5)
    b = displacement_bounds(coeffs, 96, 64, center)
    assert b is not None
    for interp in ("lanczos4", "bilinear"):
        auto = warp_channel_rectilinear(chan, coeffs, center, interpolation=interp)
        # force the gather path by passing bounds=None explicitly impossible —
        # rebuild via the raw remap instead
        from pysp_tpu.ops.resample import remap_bilinear, remap_lanczos4
        from pysp_tpu.warp.rectilinear import compute_remapping_table

        mx, my = compute_remapping_table(coeffs, 96, 64, center)
        mx = jnp.clip(mx, 0, 95)
        my = jnp.clip(my, 0, 63)
        remap = remap_lanczos4 if interp == "lanczos4" else remap_bilinear
        np.testing.assert_array_equal(np.asarray(auto), np.asarray(remap(chan, mx, my)))


def test_ca_removal_bounded_matches_gather():
    """remove_ca_from_raw with the model-derived bound equals the unbounded
    remap path exactly."""
    from pysp_tpu.core.frame import RawFrame
    from pysp_tpu.correct.ca import removal as R
    from pysp_tpu.correct.ca.models import Poly3CorrectionModel

    rng = np.random.default_rng(8)
    frame = RawFrame.synthetic(rng.random((64, 96)).astype(np.float32))
    model = Poly3CorrectionModel(0.02)

    got = np.asarray(R.remove_ca_from_raw(frame, model, model).bayer)

    orig = R._model_bound_px
    R._model_bound_px = lambda *a, **k: None  # force the gather path
    try:
        want = np.asarray(R.remove_ca_from_raw(frame, model, model).bayer)
    finally:
        R._model_bound_px = orig
    np.testing.assert_array_equal(got, want)
