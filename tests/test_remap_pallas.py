"""Interpret-mode parity for the banded Pallas remap kernel.

The kernel (ops/pallas_kernels.remap_bounded_pallas) reimplements the bounded
remaps (ops/resample.py) as one VMEM pass. Bilinear values match the gather
remaps up to FMA-contraction noise (interpret-mode Pallas evaluates
a*(1-f)+b*f unfused while XLA contracts it): gated at a few ulp. Lanczos4
additionally uses the polynomial tap weights (resample._LANCZOS4_POLY,
<= 5.4e-7 per weight; the exact-sin weights dominated kernel runtime), so its
gates sit at ~2e-5 — still ~100x tighter than cv2's own fixed-point weight
quantization. On-chip parity is measured by benchmarks/remap_pallas_check.py.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import pytest

from pysp_tpu.ops.pallas_kernels import remap_bounded_pallas
from pysp_tpu.ops.resample import (
    remap_bilinear,
    remap_bilinear_bounded,
    remap_lanczos4,
    remap_lanczos4_bounded,
)


def _radial_jitter_maps(h, w, k1=0.04, jitter=0.9, seed=0):
    """Smooth radial map + per-pixel jitter, clipped to the image (edge clips
    exercise the clamp-to-edge taps)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    cy, cx = (h - 1) / 2, (w - 1) / 2
    r2 = ((yy - cy) / cy) ** 2 + ((xx - cx) / cx) ** 2
    s = 1.0 + k1 * r2
    my = np.clip(cy + (yy - cy) * s + rng.uniform(-jitter, jitter, (h, w)), 0, h - 1)
    mx = np.clip(cx + (xx - cx) * s + rng.uniform(-jitter, jitter, (h, w)), 0, w - 1)
    dyb = (int(np.floor((my - yy).min())), int(np.floor((my - yy).max())))
    dxb = (int(np.floor((mx - xx).min())), int(np.floor((mx - xx).max())))
    return (
        jnp.asarray(mx.astype(np.float32)),
        jnp.asarray(my.astype(np.float32)),
        dyb,
        dxb,
    )


@pytest.mark.parametrize("kind", ["bilinear", "lanczos4"])
def test_remap_pallas_matches_gather(kind):
    rng = np.random.default_rng(1)
    h, w = 48, 200  # w deliberately not a lane multiple
    img = jnp.asarray(rng.random((h, w), np.float32))
    mx, my, dyb, dxb = _radial_jitter_maps(h, w)

    ref = remap_bilinear if kind == "bilinear" else remap_lanczos4
    want = np.asarray(ref(img, mx, my))
    got = remap_bounded_pallas(img, mx, my, dyb, dxb, kind, interpret=True)
    assert got is not None
    atol = 5e-7 if kind == "bilinear" else 2e-5
    np.testing.assert_allclose(np.asarray(got), want, atol=atol, rtol=0)


@pytest.mark.parametrize("kind", ["bilinear", "lanczos4"])
def test_remap_pallas_matches_xla_bounded_multiband(kind):
    """Forced small tile: multiple bands + non-dividing height padding."""
    rng = np.random.default_rng(2)
    h, w = 52, 140
    img = jnp.asarray(rng.random((h, w), np.float32))
    mx, my, dyb, dxb = _radial_jitter_maps(h, w, k1=0.06, seed=3)

    ref = (
        remap_bilinear_bounded if kind == "bilinear" else remap_lanczos4_bounded
    )
    want = np.asarray(ref(img, mx, my, dyb, dxb))
    got = remap_bounded_pallas(
        img, mx, my, dyb, dxb, kind, tile_h=16, interpret=True
    )
    assert got is not None
    atol = 5e-7 if kind == "bilinear" else 2e-5
    np.testing.assert_allclose(np.asarray(got), want, atol=atol, rtol=0)


def test_remap_pallas_asymmetric_bounds():
    """A one-sided shift map (all displacements positive)."""
    rng = np.random.default_rng(4)
    h, w = 40, 160
    img = jnp.asarray(rng.random((h, w), np.float32))
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    my = np.clip(yy + 2.3 + 0.8 * np.sin(xx / 9.0), 0, h - 1)
    mx = np.clip(xx + 4.1 + 0.8 * np.cos(yy / 7.0), 0, w - 1)
    dyb = (int(np.floor((my - yy).min())), int(np.floor((my - yy).max())))
    dxb = (int(np.floor((mx - xx).min())), int(np.floor((mx - xx).max())))
    mx = jnp.asarray(mx.astype(np.float32))
    my = jnp.asarray(my.astype(np.float32))

    want = np.asarray(remap_lanczos4(img, mx, my))
    got = remap_bounded_pallas(img, mx, my, dyb, dxb, "lanczos4", interpret=True)
    assert got is not None
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=0)


@pytest.mark.skipif(
    __import__("jax").device_count() < 2, reason="needs 2 virtual devices"
)
def test_remap_pallas_inside_shard_map():
    """Pallas (manual DMA + double buffering) inside shard_map — the fast guard
    for the invariant the slow megakernel tests lock (test_parallel.py): kernels
    execute per-shard with check_vma=False. Row-sharded image, vertical-only
    displacement zero so no cross-shard halo is needed; every shard's remap must
    equal the same rows of the monolithic kernel output."""
    import jax
    from jax.sharding import PartitionSpec as P

    from pysp_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(7)
    h, w = 64, 140
    img = jnp.asarray(rng.random((h, w), np.float32))
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    mx = np.clip(xx + 3.0 * np.sin(yy / 5.0), 0, w - 1)
    my = yy  # vertical identity: shards need no row halo
    dxb = (int(np.floor((mx - xx).min())), int(np.floor((mx - xx).max())))
    mx = jnp.asarray(mx.astype(np.float32))
    my = jnp.asarray(my.astype(np.float32))

    mesh = make_mesh((1, 2))

    def local(im, a, b):
        out = remap_bounded_pallas(im, a, b, (0, 0), dxb, "bilinear",
                                   interpret=True)
        assert out is not None
        return out

    sharded = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P("spatial"), P("spatial"), P("spatial")),
        out_specs=P("spatial"),
        check_vma=False,
    )
    got = np.asarray(sharded(img, mx, my))
    want = np.asarray(local(img, mx, my))
    np.testing.assert_allclose(got, want, atol=5e-7, rtol=0)


@pytest.mark.parametrize("shared", [True, False])
def test_remap_pallas_channel_stack(shared):
    """(C, H, W) batched launch: shared (H, W) maps DMA once; per-channel
    (C, H, W) maps select their own. Every channel must match its own 2-D
    kernel result exactly (same code path, same bands)."""
    rng = np.random.default_rng(11)
    h, w = 40, 150
    img = jnp.asarray(rng.random((3, h, w), np.float32))
    mx0, my0, dyb, dxb = _radial_jitter_maps(h, w, seed=12)
    if shared:
        mx, my = mx0, my0
        per_chan = [(mx0, my0)] * 3
    else:
        maps = [_radial_jitter_maps(h, w, k1=0.02 + 0.02 * i, seed=13 + i)
                for i in range(3)]
        dyb = (min(m[2][0] for m in maps), max(m[2][1] for m in maps))
        dxb = (min(m[3][0] for m in maps), max(m[3][1] for m in maps))
        mx = jnp.stack([m[0] for m in maps])
        my = jnp.stack([m[1] for m in maps])
        per_chan = [(m[0], m[1]) for m in maps]

    got = remap_bounded_pallas(
        img, mx, my, dyb, dxb, "lanczos4", tile_h=16, interpret=True
    )
    assert got is not None
    for ci in range(3):
        want = remap_bounded_pallas(
            img[ci], per_chan[ci][0], per_chan[ci][1], dyb, dxb, "lanczos4",
            tile_h=16, interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(got)[ci], np.asarray(want))


def test_remap_pallas_shared_image_per_channel_maps():
    """(H, W) source + (C, H, W) maps: one HBM copy of the source, each
    channel remapped by its own map (the CA G-warp pattern)."""
    rng = np.random.default_rng(21)
    h, w = 32, 140
    img = jnp.asarray(rng.random((h, w), np.float32))
    m0 = _radial_jitter_maps(h, w, k1=0.03, seed=22)
    m1 = _radial_jitter_maps(h, w, k1=0.07, seed=23)
    dyb = (min(m0[2][0], m1[2][0]), max(m0[2][1], m1[2][1]))
    dxb = (min(m0[3][0], m1[3][0]), max(m0[3][1], m1[3][1]))
    mx = jnp.stack([m0[0], m1[0]])
    my = jnp.stack([m0[1], m1[1]])

    got = remap_bounded_pallas(
        img, mx, my, dyb, dxb, "bilinear", tile_h=16, interpret=True
    )
    assert got is not None and got.shape == (2, h, w)
    for ci, m in enumerate((m0, m1)):
        want = remap_bounded_pallas(
            img, m[0], m[1], dyb, dxb, "bilinear", tile_h=16, interpret=True
        )
        np.testing.assert_array_equal(np.asarray(got)[ci], np.asarray(want))


def test_remap_bounded_dispatch_cpu_falls_back():
    """Off-TPU the dispatcher must return the XLA bounded result exactly."""
    from pysp_tpu.ops.resample import remap_bounded

    rng = np.random.default_rng(5)
    h, w = 24, 130
    img = jnp.asarray(rng.random((h, w), np.float32))
    mx, my, dyb, dxb = _radial_jitter_maps(h, w, seed=6)
    want = np.asarray(remap_bilinear_bounded(img, mx, my, dyb, dxb))
    got = np.asarray(remap_bounded(img, mx, my, dyb, dxb, kind="bilinear"))
    assert np.array_equal(got, want)


@pytest.mark.parametrize("kind", ["bilinear", "lanczos4"])
def test_remap_pallas_zoned_bit_identical(kind):
    """Row-zoned launches == the unzoned kernel BIT-exactly: each zone
    re-bases the source window by an integer (exact f32 subtraction at map
    magnitudes), so floor/fraction and every tap are unchanged."""
    from pysp_tpu.ops.pallas_kernels import remap_bounded_pallas_zoned

    rng = np.random.default_rng(5)
    h, w = 64, 144
    img = jnp.asarray(rng.random((h, w), np.float32))
    mx, my, dyb, dxb = _radial_jitter_maps(h, w, k1=0.05, seed=7)

    want = remap_bounded_pallas(img, mx, my, dyb, dxb, kind, interpret=True)
    assert want is not None

    # per-zone bounds measured from the map itself (what the host helpers do
    # from the model); zone edges at multiples of 8
    yy = np.mgrid[0:h, 0:w][0].astype(np.float64)
    myn = np.asarray(my, np.float64)
    zones = []
    for r0, r1 in ((0, 16), (16, 40), (40, h)):
        d = (myn - yy)[r0:r1]
        zones.append(
            (r0, r1,
             (int(np.floor(d.min())) - 1, int(np.floor(d.max())) + 1),
             dxb)
        )
    got = remap_bounded_pallas_zoned(img, mx, my, zones, kind, interpret=True)
    assert got is not None
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_remap_pallas_zoned_channel_stack_shared_maps():
    """Zoned path through the (C, H, W) stack + shared-map mode."""
    from pysp_tpu.ops.pallas_kernels import remap_bounded_pallas_zoned

    rng = np.random.default_rng(6)
    h, w = 48, 136
    img = jnp.asarray(rng.random((2, h, w), np.float32))
    mx, my, dyb, dxb = _radial_jitter_maps(h, w, k1=0.04, seed=9)
    zones = [(0, 24, dyb, dxb), (24, h, dyb, dxb)]
    want = remap_bounded_pallas(img, mx, my, dyb, dxb, "bilinear", interpret=True)
    got = remap_bounded_pallas_zoned(img, mx, my, zones, "bilinear", interpret=True)
    assert got is not None and got.shape == (2, h, w)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


# --- separable two-pass kinds ("bilinear_sep" / "lanczos4_sep") -----------------------
def _smooth_image(h, w, seed=0):
    """Band-limited noise + a hard edge (position-error sensitivity probe)."""
    rng = np.random.default_rng(seed)
    img = rng.random((h, w), np.float32)
    for _ in range(2):
        img = (np.roll(img, 1, 0) + np.roll(img, -1, 0) + np.roll(img, 1, 1)
               + np.roll(img, -1, 1) + 4 * img) / 8.0
    img[:, w // 2:] += 0.4
    return jnp.asarray(img.astype(np.float32))


@pytest.mark.parametrize("kind", ["bilinear_sep", "lanczos4_sep"])
def test_remap_sep_exact_on_axis_separable_map(kind):
    """When map_y is constant along x the separable approximation vanishes:
    the sep kinds must match the gather remap to association-order ulps."""
    rng = np.random.default_rng(11)
    h, w = 48, 200
    img = jnp.asarray(rng.random((h, w), np.float32))
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    my = np.clip(yy + 2.5 * np.sin(yy / 11.0), 0, h - 1)
    mx = np.clip(xx + 1.5 * np.cos(xx / 17.0), 0, w - 1)
    dyb = (int(np.floor((my - yy).min())), int(np.floor((my - yy).max())))
    dxb = (int(np.floor((mx - xx).min())), int(np.floor((mx - xx).max())))
    mx, my = jnp.asarray(mx.astype(np.float32)), jnp.asarray(my.astype(np.float32))

    ref = remap_bilinear if kind == "bilinear_sep" else remap_lanczos4
    want = np.asarray(ref(img, mx, my))
    got = remap_bounded_pallas(img, mx, my, dyb, dxb, kind, interpret=True)
    assert got is not None
    atol = 1e-6 if kind == "bilinear_sep" else 3e-5
    np.testing.assert_allclose(np.asarray(got), want, atol=atol, rtol=0)


@pytest.mark.parametrize("kind", ["bilinear_sep", "lanczos4_sep"])
def test_remap_sep_error_within_position_bound(kind):
    """On a smooth 2D radial map the sep kinds deviate from the exact remap by
    at most (max |d map_y/dx| * horizontal reach) * local gradient — the
    documented approximation (kernel docstring). Gate at the analytic bound."""
    h, w = 64, 176
    img = _smooth_image(h, w, seed=3)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    cy, cx = (h - 1) / 2, (w - 1) / 2
    r2 = ((yy - cy) / cy) ** 2 + ((xx - cx) / cx) ** 2
    s = 1.0 + 0.03 * r2
    my = np.clip(cy + (yy - cy) * s, 0, h - 1)
    mx = np.clip(cx + (xx - cx) * s, 0, w - 1)
    dyb = (int(np.floor((my - yy).min())), int(np.floor((my - yy).max())))
    dxb = (int(np.floor((mx - xx).min())), int(np.floor((mx - xx).max())))
    reach = 4 if kind.startswith("lanczos4") else 1
    lx = np.abs(np.diff(my, axis=1)).max()
    pos_err = lx * (max(abs(dxb[0]), abs(dxb[1])) + reach)
    grad = max(
        np.abs(np.diff(np.asarray(img), axis=0)).max(),
        np.abs(np.diff(np.asarray(img), axis=1)).max(),
    )
    mxj, myj = jnp.asarray(mx.astype(np.float32)), jnp.asarray(my.astype(np.float32))

    exact_kind = "bilinear" if kind == "bilinear_sep" else "lanczos4"
    want = remap_bounded_pallas(img, mxj, myj, dyb, dxb, exact_kind, interpret=True)
    got = remap_bounded_pallas(img, mxj, myj, dyb, dxb, kind, interpret=True)
    assert want is not None and got is not None
    d = np.abs(np.asarray(got) - np.asarray(want))[4:-4, 4:-4]
    # lanczos overshoots on edges: allow a small kernel-dependent factor
    factor = 1.0 if kind == "bilinear_sep" else 2.0
    assert d.max() <= factor * pos_err * grad + 1e-5, (d.max(), pos_err, grad)


def test_remap_sep_zoned_and_channel_stack():
    """Zoned sep launches == the unzoned sep kernel (integer rebase is exact
    for the sep math too), through the (C, H, W) shared-map stack."""
    from pysp_tpu.ops.pallas_kernels import remap_bounded_pallas_zoned

    rng = np.random.default_rng(13)
    h, w = 64, 144
    img = jnp.asarray(rng.random((2, h, w), np.float32))
    mx, my, dyb, dxb = _radial_jitter_maps(h, w, k1=0.05, seed=17)

    want = remap_bounded_pallas(img, mx, my, dyb, dxb, "bilinear_sep", interpret=True)
    assert want is not None

    yy = np.mgrid[0:h, 0:w][0].astype(np.float64)
    myn = np.asarray(my, np.float64)
    zones = []
    for r0, r1 in ((0, 16), (16, 40), (40, h)):
        d = (myn - yy)[r0:r1]
        zones.append(
            (r0, r1,
             (int(np.floor(d.min())) - 1, int(np.floor(d.max())) + 1),
             dxb)
        )
    got = remap_bounded_pallas_zoned(img, mx, my, zones, "bilinear_sep", interpret=True)
    assert got is not None and got.shape == (2, h, w)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_remap_zoned_mixed_kinds():
    """Per-zone ``kinds``: each zone's rows equal the same-kind full-frame
    kernel's rows (the zoned integer rebase is exact for both kinds)."""
    from pysp_tpu.ops.pallas_kernels import remap_bounded_pallas_zoned

    rng = np.random.default_rng(29)
    h, w = 64, 144
    img = jnp.asarray(rng.random((h, w), np.float32))
    mx, my, dyb, dxb = _radial_jitter_maps(h, w, k1=0.05, seed=23)

    full = {
        k: np.asarray(remap_bounded_pallas(img, mx, my, dyb, dxb, k, interpret=True))
        for k in ("bilinear", "bilinear_sep")
    }

    rows = ((0, 16), (16, 40), (40, h))
    kinds = ["bilinear_sep", "bilinear", "bilinear_sep"]
    zones = [(r0, r1, dyb, dxb) for r0, r1 in rows]
    got = remap_bounded_pallas_zoned(
        img, mx, my, zones, "bilinear", kinds=kinds, interpret=True
    )
    assert got is not None
    for (r0, r1), k in zip(rows, kinds):
        np.testing.assert_array_equal(np.asarray(got)[r0:r1], full[k][r0:r1])

    # reach-mismatched kinds must be declined, not mis-launched
    assert remap_bounded_pallas_zoned(
        img, mx, my, zones, "bilinear", kinds=["lanczos4", "bilinear", "bilinear"],
        interpret=True,
    ) is None


# --- column x row grid zones (round 4) ------------------------------------------------
@pytest.mark.parametrize("kind", ["bilinear", "lanczos4"])
def test_remap_pallas_grid_bit_identical_exact_kinds(kind):
    """Grid (column x row) zoned launches == the unzoned kernel BIT-exactly
    for the exact kinds: both the row and the column re-base are integer
    subtractions, exact in f32 at map magnitudes."""
    from pysp_tpu.ops.pallas_kernels import remap_bounded_pallas_grid

    rng = np.random.default_rng(11)
    h, w = 64, 384
    img = jnp.asarray(rng.random((h, w), np.float32))
    mx, my, dyb, dxb = _radial_jitter_maps(h, w, k1=0.05, seed=12)

    want = remap_bounded_pallas(img, mx, my, dyb, dxb, kind, interpret=True)
    assert want is not None

    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    myn, mxn = np.asarray(my, np.float64), np.asarray(mx, np.float64)
    col_zones = []
    for c0, c1 in ((0, 128), (128, 256), (256, w)):
        zones = []
        for r0, r1 in ((0, 24), (24, h)):
            dyz = (np.floor(myn) - yy)[r0:r1, c0:c1]
            dxz = (np.floor(mxn) - xx)[r0:r1, c0:c1]
            zones.append(
                (r0, r1,
                 (int(dyz.min()) - 1, int(dyz.max()) + 1),
                 (int(dxz.min()) - 1, int(dxz.max()) + 1))
            )
        col_zones.append((c0, c1, zones, None))
    got = remap_bounded_pallas_grid(img, mx, my, col_zones, kind, interpret=True)
    assert got is not None
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_remap_pallas_grid_sep_within_budget():
    """Grid + sep kinds: the strip-halo phase approximation stays within 2x
    the single-pass position-error class — gate vs the EXACT unzoned kernel
    on smooth content at warp-like magnitudes."""
    from pysp_tpu.ops.pallas_kernels import remap_bounded_pallas_grid

    h, w = 64, 384
    img = jnp.asarray(_smooth_image(h, w, seed=13))
    mx, my, dyb, dxb = _radial_jitter_maps(h, w, k1=0.03, seed=14, jitter=0.0)

    want = remap_bounded_pallas(img, mx, my, dyb, dxb, "bilinear", interpret=True)
    sep_un = remap_bounded_pallas(
        img, mx, my, dyb, dxb, "bilinear_sep", interpret=True
    )
    assert want is not None and sep_un is not None
    err_sep = float(
        np.abs(np.asarray(sep_un, np.float64) - np.asarray(want, np.float64)).max()
    )

    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    myn, mxn = np.asarray(my, np.float64), np.asarray(mx, np.float64)
    col_zones = []
    for c0, c1 in ((0, 128), (128, 256), (256, w)):
        zones = []
        for r0, r1 in ((0, 32), (32, h)):
            dyz = (np.floor(myn) - yy)[r0:r1, c0:c1]
            dxz = (np.floor(mxn) - xx)[r0:r1, c0:c1]
            zones.append(
                (r0, r1,
                 (int(dyz.min()) - 1, int(dyz.max()) + 1),
                 (int(dxz.min()) - 1, int(dxz.max()) + 1))
            )
        col_zones.append((c0, c1, zones, ["bilinear_sep"] * len(zones)))
    got = remap_bounded_pallas_grid(
        img, mx, my, col_zones, "bilinear", interpret=True
    )
    assert got is not None
    d = np.abs(np.asarray(got, np.float64) - np.asarray(want, np.float64))
    # the strip-halo phase approximation stays in the same error class as the
    # single-pass sep kind: <= ~2x its max error (+ room for f32 noise)
    assert d.max() <= 2.5 * err_sep + 1e-4, (d.max(), err_sep)
    # and vs the UNZONED sep kernel the grid is bit-identical outside the
    # strip-boundary halo reach (the re-bases are exact; only halo-column
    # phases differ, and taps reach at most span+reach columns across an edge)
    d_sep = np.abs(np.asarray(got, np.float64) - np.asarray(sep_un, np.float64))
    reach = max(abs(dxb[0]), abs(dxb[1])) + 2
    interior = np.ones(w, bool)
    for edge in (128, 256):
        interior[max(0, edge - reach):edge + reach] = False
    assert d_sep[:, interior].max() == 0.0, d_sep[:, interior].max()


def test_displacement_bounds_exact_containment():
    """Round-4 exact bounds: every f32 device floor displacement sits inside
    the host f64 full-sweep bounds with margin 1, globally and per rectangle."""
    from pysp_tpu.warp.rectilinear import (
        compute_remapping_table,
        displacement_bounds,
        warp_grid_zones,
    )

    coeffs = (1.01, -0.013, 0.0025, 0.0, 0.0004, -0.0003)
    h, w = 256, 512
    center = (0.45, 0.55)
    mx, my = compute_remapping_table(coeffs, w, h, center)
    mxn = np.asarray(jnp.clip(mx, 0, w - 1), np.float64)
    myn = np.asarray(jnp.clip(my, 0, h - 1), np.float64)
    fdy = np.floor(myn) - np.arange(h)[:, None]
    fdx = np.floor(mxn) - np.arange(w)[None, :]

    dyb, dxb = displacement_bounds(coeffs, w, h, center)
    assert dyb[0] <= fdy.min() and fdy.max() <= dyb[1]
    assert dxb[0] <= fdx.min() and fdx.max() <= dxb[1]
    # exactness: the bound is within margin+1 of the true extrema
    assert fdy.min() - dyb[0] <= 1 and dyb[1] - fdy.max() <= 1
    assert fdx.min() - dxb[0] <= 1 and dxb[1] - fdx.max() <= 1

    grid = warp_grid_zones([coeffs] * 3, w, h, center, interpolation="bilinear")
    assert grid is not None
    col_zones, _ = grid
    assert col_zones[0][0] == 0 and col_zones[-1][1] == w
    for c0, c1, zones, kinds in col_zones:
        assert len(kinds) == len(zones)
        for r0, r1, zdyb, zdxb in zones:
            zy = fdy[r0:r1, c0:c1]
            zx = fdx[r0:r1, c0:c1]
            assert zdyb[0] <= zy.min() and zy.max() <= zdyb[1], (r0, c0)
            assert zdxb[0] <= zx.min() and zx.max() <= zdxb[1], (r0, c0)


def test_full_width_vmem_refusal():
    """Medium-format-width launches that would spill VMEM at the minimum tile
    are REFUSED (None -> caller's grid/XLA ladder), never compiled: the 102 MP
    lanczos4 warp measured a 349.9M-of-128M VMEM program before this gate
    (BASELINE.md round-5 large-frame ledger)."""
    import jax.numpy as jnp

    from pysp_tpu.ops.pallas_kernels import (
        remap_bounded_pallas,
        remap_fits_full_width,
    )

    h, w = 64, 11648
    dyb, dxb = (-12, 16), (-20, 16)  # the measured 102 MP warp bounds
    assert not remap_fits_full_width("lanczos4", w, dyb, dxb)
    img = jnp.zeros((h, w), jnp.float32)
    mx = jnp.zeros((h, w), jnp.float32)
    my = jnp.zeros((h, w), jnp.float32)
    assert remap_bounded_pallas(img, mx, my, dyb, dxb, "lanczos4") is None

    # 24 MP-class widths at in-band spans still fit
    assert remap_fits_full_width("lanczos4", 6000, (-4, 4), (-4, 4))
    assert remap_fits_full_width("bilinear", 6000, (-12, 12), (-12, 12))
