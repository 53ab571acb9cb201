"""Pallas TPU kernels for the stencils XLA won't fuse tightly enough.

Two hot spots remain after the XLA-level work (see ops/stencil.py): the 5x5 median
(XLA materializes the 25 shifted window views => ~26 HBM passes) and the AHD
homogeneity count (ditto for 9+2 views x 3 channels). Both are classic VMEM-tiled
stencils: DMA one row-band per grid step, compute every shifted view out of VMEM,
write one output band — a single read + write of HBM per pixel.

Mosaic constraint: HBM DMA row slices must start and extend at multiples of the (8,128)
tile, so the halo is embedded in an 8-row alignment pad (bands are [i*tile_h,
i*tile_h + tile_h + 2*ALIGN) over an input padded by ALIGN rows on each side; the
stencil views sit at sublane offset ALIGN - reach).

Each kernel has an XLA fallback (ops.stencil / demosaic.homogeneity); the dispatchers
fall back automatically off-TPU or for heights the tiling doesn't divide.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .stencil import (
    _Q_RANKS,
    median25_select,
    median5 as median5_xla,
    merge_sorted,
    sort5,
)

Array = jnp.ndarray

_ALIGN = 8  # sublane tile: HBM DMA slices must be 8-row aligned
_LANE = 128  # lane tile: the DMA'd width must be a 128 multiple


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


_VMEM_LIMIT = 100 * 1024 * 1024  # raise Mosaic's 16MB scoped-vmem default


def _pick_tile(h: int, w: int, live_values: int, max_tile: int = 256) -> int:
    """Largest 8-multiple tile height dividing h whose peak live set fits VMEM.

    ``live_values`` is the kernel's worst-case number of simultaneously live
    tile-sized f32 arrays (sorting-network wires / window views).
    """
    wp = _round_up(w + 4, _LANE)
    budget_rows = (_VMEM_LIMIT // 2) // max(live_values * wp * 4, 1)
    limit = min(max_tile, h, max(budget_rows, 8))
    for cand in range(limit - limit % 8, 7, -8):
        if h % cand == 0:
            return cand
    return 0


def _median5_kernel(x_hbm, out_ref, scratch, sems, *, tile_h: int, width: int):
    # Cross-step double buffering: scratch/semaphores persist across grid steps, so
    # step i waits on the band it prefetched during step i-1 and immediately issues
    # the DMA for band i+1 — transfer overlaps the sorting network.
    i = pl.program_id(0)
    n = pl.num_programs(0)
    rows = tile_h + 2 * _ALIGN

    def band(j, slot):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(j * tile_h, rows), :], scratch.at[slot], sems.at[slot]
        )

    @pl.when(i == 0)
    def _():
        band(0, 0).start()

    @pl.when(i + 1 < n)
    def _():
        band(i + 1, (i + 1) % 2).start()

    band(i, i % 2).wait()
    cur = scratch.at[i % 2]

    out_ref[:] = _median5_field(cur[...], _ALIGN, tile_h, 2, width)


def median5_pallas(x: Array, tile_h: int = 0) -> Array:
    """cv2.medianBlur(5) equivalent: VMEM-banded Pallas kernel, replicate border."""
    h, w = x.shape
    if tile_h == 0:
        # ~30 live tile-sized wires at the widest point of the median network
        tile_h = _pick_tile(h, w, live_values=30)
    if tile_h == 0:
        return median5_xla(x)

    wp = _round_up(w + 4, _LANE)
    padded = jnp.pad(x, ((_ALIGN, _ALIGN), (2, wp - w - 2)), mode="edge")

    kernel = partial(_median5_kernel, tile_h=tile_h, width=w)
    return pl.pallas_call(
        kernel,
        grid=(h // tile_h,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(
            (tile_h, w), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((h, w), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, tile_h + 2 * _ALIGN, wp), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(padded)


def _homogeneity_kernel(
    l_hbm, a_hbm, b_hbm, out_ref, l_s, a_s, b_s, sems, *,
    tile_h: int, width: int, is_vertical: bool
):
    i = pl.program_id(0)
    n = pl.num_programs(0)
    rows = tile_h + 2 * _ALIGN
    srcs = (l_hbm, a_hbm, b_hbm)
    dsts = (l_s, a_s, b_s)

    def band(j, slot, k):
        return pltpu.make_async_copy(
            srcs[k].at[pl.ds(j * tile_h, rows), :],
            dsts[k].at[slot],
            sems.at[slot * 3 + k],
        )

    @pl.when(i == 0)
    def _():
        for k in range(3):
            band(0, 0, k).start()

    @pl.when(i + 1 < n)
    def _():
        for k in range(3):
            band(i + 1, (i + 1) % 2, k).start()

    for k in range(3):
        band(i, i % 2, k).wait()

    slot = i % 2
    l_cur, a_cur, b_cur = l_s.at[slot], a_s.at[slot], b_s.at[slot]

    th, w = tile_h, width
    base = _ALIGN  # center row offset: data row r lives at padded row r + _ALIGN

    def win(ref, dy, dx):
        return ref[base + dy : base + dy + th, 1 + dx : 1 + dx + w]

    lum = win(l_cur, 0, 0)
    aa = win(a_cur, 0, 0)
    bb = win(b_cur, 0, 0)

    if is_vertical:
        n1 = (win(l_cur, -1, 0), win(a_cur, -1, 0), win(b_cur, -1, 0))
        n2 = (win(l_cur, 1, 0), win(a_cur, 1, 0), win(b_cur, 1, 0))
    else:
        n1 = (win(l_cur, 0, -1), win(a_cur, 0, -1), win(b_cur, 0, -1))
        n2 = (win(l_cur, 0, 1), win(a_cur, 0, 1), win(b_cur, 0, 1))

    eps_l = jnp.maximum(jnp.abs(lum - n1[0]), jnp.abs(lum - n2[0]))
    eps_c2 = jnp.maximum(
        (aa - n1[1]) ** 2 + (bb - n1[2]) ** 2,
        (aa - n2[1]) ** 2 + (bb - n2[2]) ** 2,
    )

    # Center + eps-defining neighbors are identically in-bounds (see
    # demosaic/homogeneity.py) — constant 3, checks skipped.
    free = {(0, 0), (-1, 0), (1, 0)} if is_vertical else {(0, 0), (0, -1), (0, 1)}
    count = jnp.full((th, w), 3.0, jnp.float32)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if (dy, dx) in free:
                continue
            wl = win(l_cur, dy, dx)
            wa = win(a_cur, dy, dx)
            wb = win(b_cur, dy, dx)
            ok = ((wl - lum) <= eps_l) & (
                ((wa - aa) ** 2 + (wb - bb) ** 2) <= eps_c2
            )
            count = count + ok.astype(jnp.float32)
    out_ref[:] = count


def homogeneity_map_pallas(lab: Array, is_vertical: bool, tile_h: int = 0) -> Array:
    """AHD homogeneity count (demosaic/homogeneity.py semantics) as one VMEM pass."""
    from ..demosaic.homogeneity import homogeneity_map as homogeneity_xla

    h, w = lab.shape[0], lab.shape[1]
    if tile_h == 0:
        # 3 scratch planes + ~12 live window/epsilon temporaries
        tile_h = _pick_tile(h, w, live_values=16)
    if tile_h == 0 or lab.ndim != 3:
        return homogeneity_xla(lab, is_vertical)

    # Halo rows use symmetric reflection (cv2.BORDER_REFLECT, matching ahd.py:65);
    # the alignment filler rows beyond reach 1 never enter the stencil.
    wp = _round_up(w + 2, _LANE)
    planes = []
    for c in range(3):
        p = jnp.pad(lab[..., c], ((1, 1), (1, 1)), mode="symmetric")
        p = jnp.pad(p, ((_ALIGN - 1, _ALIGN - 1), (0, wp - w - 2)), mode="edge")
        planes.append(p)

    kernel = partial(
        _homogeneity_kernel, tile_h=tile_h, width=w, is_vertical=is_vertical
    )
    return pl.pallas_call(
        kernel,
        grid=(h // tile_h,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)] * 3,
        out_specs=pl.BlockSpec(
            (tile_h, w), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, tile_h + 2 * _ALIGN, wp), jnp.float32),
            pltpu.VMEM((2, tile_h + 2 * _ALIGN, wp), jnp.float32),
            pltpu.VMEM((2, tile_h + 2 * _ALIGN, wp), jnp.float32),
            pltpu.SemaphoreType.DMA((6,)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(*planes)


def _median5_field(buf, row0: int, n_rows: int, col0: int, width: int):
    """5x5 median of ``buf`` (a value array) for output centers at rows
    [row0, row0+n_rows) x cols [col0, col0+width); needs a 2-px halo around that
    region. Shared-column scheme (ops.stencil.median5_from_padded): 86 min/max ops
    per pixel vs 202 for the direct pruned network, bit-identical values."""
    s = sort5([buf[row0 - 2 + dy : row0 - 2 + dy + n_rows, :] for dy in range(5)])
    pairs = merge_sorted([v[:, :-1] for v in s], [v[:, 1:] for v in s])
    q = merge_sorted(
        [p[:, col0 - 2 : col0 - 2 + width] for p in pairs],
        [p[:, col0 : col0 + width] for p in pairs],
        ranks=_Q_RANKS,
    )
    side = [v[:, col0 + 2 : col0 + 2 + width] for v in s]
    return median25_select(q, side)


def _postprocess_kernel(r_hbm, g_hbm, b_hbm, ro, go, bo, r_s, g_s, b_s, sems, *,
                        tile_h: int, width: int):
    """One AHD chroma-median stage (ahd.py:148-161) fused: r/g/b read once,
    all four median-of-25 networks computed in VMEM, r'/g'/b' written once.

    The second-layer medians (g - r', g - b') need r'/b' on a 2-row/col halo, so
    r'/b' are computed over an extended (tile+4, w+4) region; total stencil reach 4
    fits inside the 8-row alignment pad.
    """
    i = pl.program_id(0)
    n = pl.num_programs(0)
    rows = tile_h + 2 * _ALIGN
    srcs = (r_hbm, g_hbm, b_hbm)
    dsts = (r_s, g_s, b_s)

    def band(j, slot, k):
        return pltpu.make_async_copy(
            srcs[k].at[pl.ds(j * tile_h, rows), :], dsts[k].at[slot],
            sems.at[slot * 3 + k],
        )

    @pl.when(i == 0)
    def _():
        for k in range(3):
            band(0, 0, k).start()

    @pl.when(i + 1 < n)
    def _():
        for k in range(3):
            band(i + 1, (i + 1) % 2, k).start()

    for k in range(3):
        band(i, i % 2, k).wait()

    slot = i % 2
    r = r_s[slot]
    g = g_s[slot]
    b = b_s[slot]

    w = width
    ext_rows = tile_h + 4
    ext_w = w + 4
    # extended region: band rows [6, 6+tile_h+4), band cols [2, 2+w+4) relative to
    # the (8, 4)-col alignment pads
    rg = r - g
    bg = b - g

    g_ext = g[6 : 6 + ext_rows, 2 : 2 + ext_w]
    r_prime_ext = _median5_field(rg, 6, ext_rows, 2, ext_w) + g_ext
    b_prime_ext = _median5_field(bg, 6, ext_rows, 2, ext_w) + g_ext

    # XLA/reference semantics pad (g - r') by replication at the global image
    # border; inside the halo we recomputed r' from replicated inputs instead,
    # which differs. Overwrite the halo of the differences with edge replication:
    # columns always (the col halo is always the global border), rows only on the
    # first/last band.
    def fix_halo(diff):
        valid = diff[:, 2 : 2 + w]
        left = valid[:, 0:1]
        right = valid[:, w - 1 : w]
        diff = jnp.concatenate([left, left, valid, right, right], axis=1)

        ri = jax.lax.broadcasted_iota(jnp.int32, (ext_rows, ext_w), 0)
        top_row = diff[2:3, :]
        bot_row = diff[tile_h + 1 : tile_h + 2, :]
        diff = jnp.where((i == 0) & (ri < 2), top_row, diff)
        diff = jnp.where(
            (i == pl.num_programs(0) - 1) & (ri >= tile_h + 2), bot_row, diff
        )
        return diff

    gr = fix_halo(g_ext - r_prime_ext)
    gb = fix_halo(g_ext - b_prime_ext)

    # output centers sit at ext rows/cols [2, 2+tile_h) x [2, 2+w)
    med_gr = _median5_field(gr, 2, tile_h, 2, w)
    med_gb = _median5_field(gb, 2, tile_h, 2, w)

    r_c = r_prime_ext[2 : 2 + tile_h, 2 : 2 + w]
    b_c = b_prime_ext[2 : 2 + tile_h, 2 : 2 + w]
    g_new = (med_gr + med_gb + r_c + b_c) * 0.5

    ro[:] = r_c
    go[:] = g_new
    bo[:] = b_c


def postprocess_color_pallas_channels(
    r: Array, g: Array, b: Array, tile_h: int = 0
):
    """Fused AHD chroma-median postprocess stage on separate channels.

    Border semantics match the XLA path: each median uses replicate padding of its
    *input* (the reference's cv2.medianBlur border), including the second-layer
    medians whose inputs are the healed r'/b' — replicated here by computing r'/b'
    into the halo before the outer medians. Bit-identical to the XLA networks.
    """
    h, w = r.shape[0], r.shape[1]
    if tile_h == 0:
        tile_h = _pick_tile(h, w, live_values=36)
    if tile_h == 0:
        from ..demosaic.ahd import postprocess_color_channels

        return postprocess_color_channels(r, g, b)

    wp = _round_up(w + 8, _LANE)
    planes = [
        jnp.pad(c, ((_ALIGN, _ALIGN), (4, wp - w - 4)), mode="edge")
        for c in (r, g, b)
    ]

    kernel = partial(_postprocess_kernel, tile_h=tile_h, width=w)
    shape = jax.ShapeDtypeStruct((h, w), r.dtype)
    out_r, out_g, out_b = pl.pallas_call(
        kernel,
        grid=(h // tile_h,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)] * 3,
        out_specs=[
            pl.BlockSpec((tile_h, w), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ] * 3,
        out_shape=[shape, shape, shape],
        scratch_shapes=[
            pltpu.VMEM((2, tile_h + 2 * _ALIGN, wp), r.dtype),
            pltpu.VMEM((2, tile_h + 2 * _ALIGN, wp), r.dtype),
            pltpu.VMEM((2, tile_h + 2 * _ALIGN, wp), r.dtype),
            pltpu.SemaphoreType.DMA((6,)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(*planes)
    return out_r, out_g, out_b


def postprocess_color_pallas(image: Array, tile_h: int = 0) -> Array:
    """Stacked-image wrapper over postprocess_color_pallas_channels."""
    r, g, b = postprocess_color_pallas_channels(
        image[..., 0], image[..., 1], image[..., 2], tile_h
    )
    return jnp.stack([r, g, b], axis=-1)


def _ahd_decision_kernel(
    mat_ref, wb_ref,
    rh_hbm, gh_hbm, bh_hbm, rv_hbm, gv_hbm, bv_hbm,
    out_ref,
    scratch, sems, *,
    tile_h: int, width: int, is_hdr: bool,
):
    """Fused AHD direction decision: camera->lin-sRGB, CIELAB, homogeneity count,
    reflect-fixed box blur, H<V compare — one VMEM pass per candidate field band.

    Bit-identical to the XLA path (same channelwise formulas and accumulation
    orders; integer homogeneity counts are order-exact in f32).
    """
    from ..colorimetry.transforms import rgb_to_lab_channels

    def _cbrt(x):
        # Mosaic has no cbrt primitive; x is pre-clamped >= 1e-12
        return jnp.exp(jnp.log(x) * jnp.float32(1.0 / 3.0))

    i = pl.program_id(0)
    n = pl.num_programs(0)
    rows = tile_h + 2 * _ALIGN
    srcs = (rh_hbm, gh_hbm, bh_hbm, rv_hbm, gv_hbm, bv_hbm)

    def band(j, slot, k):
        return pltpu.make_async_copy(
            srcs[k].at[pl.ds(j * tile_h, rows), :],
            scratch.at[slot, k],
            sems.at[slot * 6 + k],
        )

    @pl.when(i == 0)
    def _():
        for k in range(6):
            band(0, 0, k).start()

    @pl.when(i + 1 < n)
    def _():
        for k in range(6):
            band(i + 1, (i + 1) % 2, k).start()

    for k in range(6):
        band(i, i % 2, k).wait()

    slot = i % 2
    w = width
    t = tile_h
    lab_rows = t + 4
    lab_w = w + 4

    def direction_map(kr, kg, kb):
        # lab region: band rows [ALIGN-2, ALIGN+t+2), cols [0, w+4)
        r = scratch[slot, kr][_ALIGN - 2 : _ALIGN + t + 2, 0:lab_w]
        g = scratch[slot, kg][_ALIGN - 2 : _ALIGN + t + 2, 0:lab_w]
        b = scratch[slot, kb][_ALIGN - 2 : _ALIGN + t + 2, 0:lab_w]

        # cam -> lin sRGB (clip_highlights=False): WB then 3x3, same op order as
        # mat3_apply(stack(r*wb0, g*wb1, b*wb2), mat)
        r = r * wb_ref[0, 0]
        g = g * wb_ref[0, 1]
        b = b * wb_ref[0, 2]
        ir = mat_ref[0, 0] * r + mat_ref[0, 1] * g + mat_ref[0, 2] * b
        ig = mat_ref[1, 0] * r + mat_ref[1, 1] * g + mat_ref[1, 2] * b
        ib = mat_ref[2, 0] * r + mat_ref[2, 1] * g + mat_ref[2, 2] * b

        if is_hdr:
            luma = 0.2126 * ir + 0.7152 * ig + 0.0722 * ib
            ir = ir / (1.0 + ir)
            ig = ig / (1.0 + ig)
            ib = ib / (1.0 + ib)
            lum, aa, bb = rgb_to_lab_channels(ir, ig, ib, cbrt_fn=_cbrt)
            lum = luma
        else:
            lum, aa, bb = rgb_to_lab_channels(ir, ig, ib, cbrt_fn=_cbrt)
        return lum, aa, bb

    def homog_blurred(kr, kg, kb, is_vertical):
        lum, aa, bb = direction_map(kr, kg, kb)

        # homogeneity on the (t+2, w+2) region, center at lab local (1..t+2, 1..w+2)
        mh, mw = t + 2, w + 2

        def win(arr, dy, dx):
            return arr[1 + dy : 1 + dy + mh, 1 + dx : 1 + dx + mw]

        cl, ca, cb = win(lum, 0, 0), win(aa, 0, 0), win(bb, 0, 0)
        if is_vertical:
            n1 = (win(lum, -1, 0), win(aa, -1, 0), win(bb, -1, 0))
            n2 = (win(lum, 1, 0), win(aa, 1, 0), win(bb, 1, 0))
        else:
            n1 = (win(lum, 0, -1), win(aa, 0, -1), win(bb, 0, -1))
            n2 = (win(lum, 0, 1), win(aa, 0, 1), win(bb, 0, 1))

        eps_l = jnp.maximum(jnp.abs(cl - n1[0]), jnp.abs(cl - n2[0]))
        eps_c2 = jnp.maximum(
            (ca - n1[1]) ** 2 + (cb - n1[2]) ** 2,
            (ca - n2[1]) ** 2 + (cb - n2[2]) ** 2,
        )

        # Center + eps-defining neighbors are identically in-bounds (see
        # demosaic/homogeneity.py) — constant 3, checks skipped.
        free = (
            {(0, 0), (-1, 0), (1, 0)} if is_vertical
            else {(0, 0), (0, -1), (0, 1)}
        )
        count = jnp.full((mh, mw), 3.0, jnp.float32)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if (dy, dx) in free:
                    continue
                wl = win(lum, dy, dx)
                wa = win(aa, dy, dx)
                wb2 = win(bb, dy, dx)
                ok = ((wl - cl) <= eps_l) & (
                    ((wa - ca) ** 2 + (wb2 - cb) ** 2) <= eps_c2
                )
                count = count + ok.astype(jnp.float32)

        # XLA path box-blurs the map with reflect101 padding; the count halo here
        # was computed from reflected *lab*, which differs. Overwrite it with the
        # mirrored interior (columns always = global border; rows on edge bands).
        left = count[:, 2:3]
        right = count[:, mw - 3 : mw - 2]
        count = jnp.concatenate(
            [left, count[:, 1 : mw - 1], right], axis=1
        )
        ri = jax.lax.broadcasted_iota(jnp.int32, (mh, mw), 0)
        count = jnp.where((i == 0) & (ri < 1), count[2:3, :], count)
        count = jnp.where(
            (i == n - 1) & (ri >= mh - 1), count[mh - 3 : mh - 2, :], count
        )

        # VALID 3x3 box SUM (ops.stencil.box_sum3 semantics): integer counts sum
        # exactly in f32, so the H<V decision is rounding-free and identical
        # across compilations.
        out = None
        for dy in range(3):
            for dx in range(3):
                term = count[dy : dy + t, dx : dx + w]
                out = term if out is None else out + term
        return out

    map_h = homog_blurred(0, 1, 2, False)
    map_v = homog_blurred(3, 4, 5, True)
    out_ref[:] = (map_h < map_v).astype(jnp.float32)


def ahd_decision_pallas(
    r_h: Array, g_h: Array, b_h: Array,
    r_v: Array, g_v: Array, b_v: Array,
    color_mat: Array, wb: Array, is_hdr: bool,
    tile_h: int = 0,
) -> Array:
    """Fused H/V direction pick for AHD: returns (map_h < map_v) as f32 (H, W).

    Replaces the XLA chain cam_to_lin_srgb -> rgb_to_lab -> homogeneity_map ->
    box_blur3 -> compare (x2 directions) with one banded VMEM pass over the six
    candidate fields. Picks differ from the XLA path only at exact homogeneity
    ties (~1.4% of pixels, last-ulp summation noise; either choice is valid).
    """
    h, w = r_h.shape
    if tile_h == 0:
        tile_h = _pick_tile(h, w, live_values=34)
    if tile_h == 0:
        return None  # caller falls back to the XLA path

    wp = _round_up(w + 4, _LANE)
    fields = []
    for f in (r_h, g_h, b_h, r_v, g_v, b_v):
        p = jnp.pad(f, ((2, 2), (2, 2)), mode="symmetric")
        p = jnp.pad(
            p, ((_ALIGN - 2, _ALIGN - 2), (0, wp - w - 4)), mode="edge"
        )
        fields.append(p)

    kernel = partial(
        _ahd_decision_kernel, tile_h=tile_h, width=w, is_hdr=is_hdr
    )
    return pl.pallas_call(
        kernel,
        grid=(h // tile_h,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.HBM)] * 6,
        out_specs=pl.BlockSpec(
            (tile_h, w), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, 6, tile_h + 2 * _ALIGN, wp), jnp.float32),
            pltpu.SemaphoreType.DMA((12,)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(
        jnp.asarray(color_mat, jnp.float32),
        jnp.asarray(wb, jnp.float32).reshape(1, 3),
        *fields,
    )


def _ahd_mega_kernel(
    mat_ref, wb_ref,
    r_hbm, g1_hbm, g2_hbm, b_hbm,
    *refs,
    tile_h: int, width: int, is_hdr: bool, stages: int,
    tail: tuple | None = None,
):
    """Whole-AHD megakernel: one DMA of the 4 CFA phase planes per band, every
    demosaic stage (directional interp, reconstruction, CIELAB homogeneity,
    box-blurred decision, chroma medians) computed in VMEM via the roll-based
    valid-mode band core (demosaic/ahd_band.py), 12 output planes written once.
    HBM traffic: 1 read + 3 writes per pixel — vs ~1 round-trip per stage for XLA.
    """
    from ..demosaic.ahd_band import ahd_band_quads

    outs = refs[:12]
    scratch, sems = refs[12], refs[13]

    def _cbrt(x):
        # Mosaic has no cbrt primitive; inputs are pre-clamped > 0.
        # exp/log measured CHEAP on the VPU: a multiply-only Halley-iteration
        # cbrt/pow replacement ran 16% SLOWER and all LAB transcendentals
        # together are only ~5.5% of the kernel (benchmarks/cbrt_cost_probe.py).
        return jnp.exp(jnp.log(x) * jnp.float32(1.0 / 3.0))

    i = pl.program_id(0)
    n = pl.num_programs(0)
    rows = tile_h + 2 * _ALIGN
    srcs = (r_hbm, g1_hbm, g2_hbm, b_hbm)

    def band(j, slot, k):
        return pltpu.make_async_copy(
            srcs[k].at[pl.ds(j * tile_h, rows), :],
            scratch.at[slot, k],
            sems.at[slot * 4 + k],
        )

    @pl.when(i == 0)
    def _():
        for k in range(4):
            band(0, 0, k).start()

    @pl.when(i + 1 < n)
    def _():
        for k in range(4):
            band(i + 1, (i + 1) % 2, k).start()

    for k in range(4):
        band(i, i % 2, k).wait()

    slot = i % 2
    planes = tuple(scratch[slot, k] for k in range(4))
    wb = (wb_ref[0, 0], wb_ref[0, 1], wb_ref[0, 2])

    out_r, out_g, out_b = ahd_band_quads(
        planes, mat_ref, wb, is_hdr, postprocess_stages=stages, cbrt_fn=_cbrt
    )

    if tail is not None:
        from ..demosaic.ahd_band import color_tail_quads

        def _powf(x, p):
            # Mosaic has no pow primitive; x is pre-clamped >= 1e-12
            return jnp.exp(jnp.log(x) * p)

        clip_highlights, gamma_encode = tail
        out_r, out_g, out_b = color_tail_quads(
            out_r, out_g, out_b, mat_ref, clip_highlights, gamma_encode,
            pow_fn=_powf,
        )

    k = 0
    for quad in (out_r, out_g, out_b):
        for py in (0, 1):
            for px in (0, 1):
                outs[k][:] = quad[py][px][
                    _ALIGN : _ALIGN + tile_h, _ALIGN : _ALIGN + width
                ]
                k += 1


def ahd_mega_pallas(
    planes, color_mat: Array, wb: Array, is_hdr: bool,
    postprocess_stages: int = 1, tile_h: int = 0, interpret: bool = False,
    tail: tuple | None = None,
):
    """Run the AHD megakernel over CFA phase planes (r, g1, g2, b), each (H/2, W/2).

    Returns 12 planes [r00, r01, r10, r11, g00, ..., b11] of shape (H/2, W/2), or
    None if no dividing tile fits VMEM (caller falls back). Values within
    2*margin_for(stages) full-res pixels of the global border are computed from
    replicate-padded halos and must be overwritten by the caller (see
    demosaic.ahd_mega.demosaic_ahd_mega's XLA border strips).
    """
    from ..demosaic.ahd_band import margin_for

    h2, w2 = planes[0].shape
    if margin_for(postprocess_stages) > _ALIGN:
        return None
    wp = _round_up(w2 + 2 * _ALIGN, _LANE)
    if tile_h == 0:
        # Effective live-set divisor tuned empirically (benchmarks/sweep_mega_tile.py
        # + sweep_shapes.py with RTT-proof iteration counts): at wp 1152 tile 112
        # is the VMEM sweet spot (488 ps/px; 136+ regress); at wp<=896 tile 168
        # is ~13% better than 112 (432 vs 500 ps/px) and 144 hits a VMEM cliff,
        # so narrow launches cap at 168. EAG's live set is ~4x smaller.
        live = 96
        budget_rows = (_VMEM_LIMIT // 2) // max(live * wp * 4, 1)
        if budget_rows >= 168 and wp <= 896:
            cap = 168  # never the 144 VMEM cliff: jump 112 -> 168 only when it fits
        else:
            cap = 112
        tile_h = min(cap, _round_up(h2, 8), max(budget_rows - budget_rows % 8, 8))
        if 112 < tile_h < 168:
            tile_h = 112
    if tile_h % 8 or tile_h < 8:
        return None

    # Height needn't divide: planes are edge-padded up to a tile multiple and the
    # overhang rows (garbage computed from replicated data) sliced off after.
    h2p = _round_up(h2, tile_h)
    padded = [
        jnp.pad(
            p, ((_ALIGN, _ALIGN + h2p - h2), (_ALIGN, wp - w2 - _ALIGN)), mode="edge"
        )
        for p in planes
    ]

    kernel = partial(
        _ahd_mega_kernel, tile_h=tile_h, width=w2,
        is_hdr=is_hdr, stages=postprocess_stages, tail=tail,
    )
    shape = jax.ShapeDtypeStruct((h2p, w2), jnp.float32)
    outs = pl.pallas_call(
        kernel,
        grid=(h2p // tile_h,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.HBM)] * 4,
        out_specs=[
            pl.BlockSpec((tile_h, w2), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ] * 12,
        out_shape=[shape] * 12,
        scratch_shapes=[
            pltpu.VMEM((2, 4, tile_h + 2 * _ALIGN, wp), jnp.float32),
            pltpu.SemaphoreType.DMA((8,)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(
        jnp.asarray(color_mat, jnp.float32),
        jnp.asarray(wb, jnp.float32).reshape(1, 3),
        *padded,
    )
    if h2p != h2:
        outs = [o[:h2] for o in outs]
    return outs


# --- hot-pixel heal (masked normalized-convolution fill) --------------------------------
def _heal_kernel(
    means_smem, x_hbm, m_hbm, out_ref, x_s, m_s, sems, *,
    tile_h: int, width: int, plane_h: int,
    fill_iterations: int, smooth_iterations: int,
):
    """All fill+smooth sweeps of correct.bad_pixels.masked_fill_inpaint in VMEM.

    The 4 CFA planes arrive stacked vertically as one (4*plane_h, w) array;
    per-iteration replicate borders (shift2d pad_replicate semantics) are
    applied with global row/col `where` fixes, so plane boundaries never bleed
    and halo rows only need to cover the iteration reach (6 <= _ALIGN).
    Bit-identical to the XLA dense path: same ops, same accumulation order.
    """
    i = pl.program_id(0)
    n = pl.num_programs(0)
    rows = tile_h + 2 * _ALIGN
    srcs = (x_hbm, m_hbm)
    dsts = (x_s, m_s)

    def band(j, slot, k):
        return pltpu.make_async_copy(
            srcs[k].at[pl.ds(j * tile_h, rows), :],
            dsts[k].at[slot],
            sems.at[slot * 2 + k],
        )

    @pl.when(i == 0)
    def _():
        for k in range(2):
            band(0, 0, k).start()

    @pl.when(i + 1 < n)
    def _():
        for k in range(2):
            band(i + 1, (i + 1) % 2, k).start()

    for k in range(2):
        band(i, i % 2, k).wait()

    slot = i % 2
    chan = x_s[slot]
    m = m_s[slot]
    wp = chan.shape[-1]

    # global row/col coordinates of every buffer cell (row 0 = global row
    # i*tile_h - _ALIGN; shifted by +plane_h to keep the modulo operand
    # positive for the alignment pad rows)
    grow = jax.lax.broadcasted_iota(jnp.int32, (rows, wp), 0) + (
        i * tile_h + plane_h - _ALIGN
    )
    rmod = grow % plane_h
    gcol = jax.lax.broadcasted_iota(jnp.int32, (rows, wp), 1)
    at_top = rmod == 0
    at_bot = rmod == plane_h - 1
    at_lf = gcol == 0
    at_rt = gcol == width - 1

    def up(a):  # value at (r-1, c), replicate at each plane's top row
        return jnp.where(at_top, a, jnp.roll(a, 1, axis=0))

    def dn(a):
        return jnp.where(at_bot, a, jnp.roll(a, -1, axis=0))

    def lf(a):
        return jnp.where(at_lf, a, jnp.roll(a, 1, axis=1))

    def rt(a):
        return jnp.where(at_rt, a, jnp.roll(a, -1, axis=1))

    def nb_sum(a):  # ((up + down) + left) + right, the dense path's order
        return ((up(a) + dn(a)) + lf(a)) + rt(a)

    v = 1.0 - m
    x = chan * v
    for _ in range(fill_iterations):
        xs = nb_sum(x)
        vs = nb_sum(v)
        filled = xs / jnp.maximum(vs, 1.0)
        x = jnp.where(v > 0, x, filled)
        v = jnp.minimum(v + vs, 1.0)

    # unreached sites seed from the plane mean (computed outside, one scalar
    # per CFA plane)
    p_idx = jnp.clip((grow - plane_h) // plane_h, 0, 3)
    seed = jnp.where(
        p_idx == 0,
        means_smem[0],
        jnp.where(
            p_idx == 1, means_smem[1], jnp.where(p_idx == 2, means_smem[2], means_smem[3])
        ),
    )
    x = jnp.where(v > 0, x, seed)

    for _ in range(smooth_iterations):
        acc = nb_sum(x) * 0.25
        x = jnp.where(m > 0, acc, chan)

    x = jnp.where(m > 0, x, chan)
    out_ref[:] = x[_ALIGN : _ALIGN + tile_h, :width]


def masked_fill_pallas(
    chan: Array, mask: Array,
    fill_iterations: int = 4, smooth_iterations: int = 2,
    tile_h: int = 0, interpret: bool = False,
):
    """Banded heal: one HBM read + write for ALL fill/smooth sweeps.

    ``chan``/``mask`` are (4, H/2, W/2) CFA planes. The XLA dense path makes
    2 reads + 2 writes of the working set per sweep (measured 8.5 ms at 24 MP);
    the sparse compacted path pays ~25 ns/element TPU gather costs. Here every
    sweep happens on the VMEM band (iteration reach 6 <= the 8-row alignment
    halo), so HBM traffic is one pass regardless of iteration count. Returns
    None when no dividing tile fits (caller falls back).
    """
    if chan.ndim != 3 or chan.shape[0] != 4:
        return None
    if fill_iterations + smooth_iterations > _ALIGN:
        return None
    p4, h2, w2 = chan.shape
    if h2 < _ALIGN:  # keeps the modulo row-coordinate operand positive
        return None
    H = 4 * h2
    if tile_h == 0:
        tile_h = _pick_tile(H, w2, live_values=18)
    if tile_h == 0 or tile_h % 8:
        return None

    wp = _round_up(w2, _LANE)
    stacked = jnp.pad(
        chan.reshape(H, w2).astype(jnp.float32),
        ((_ALIGN, _ALIGN), (0, wp - w2)),
    )
    mstacked = jnp.pad(
        mask.reshape(H, w2).astype(jnp.float32),
        ((_ALIGN, _ALIGN), (0, wp - w2)),
    )
    means = jnp.mean(chan, axis=(-2, -1)).astype(jnp.float32)

    kernel = partial(
        _heal_kernel, tile_h=tile_h, width=w2, plane_h=h2,
        fill_iterations=fill_iterations, smooth_iterations=smooth_iterations,
    )
    out = pl.pallas_call(
        kernel,
        grid=(H // tile_h,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.HBM)] * 2,
        out_specs=pl.BlockSpec(
            (tile_h, w2), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((H, w2), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, tile_h + 2 * _ALIGN, wp), jnp.float32),
            pltpu.VMEM((2, tile_h + 2 * _ALIGN, wp), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(means, stacked, mstacked)
    return out.reshape(4, h2, w2).astype(chan.dtype)


# --- banded remap (bounded bilinear / Lanczos4 resample) --------------------------------
def _remap_kernel(
    x_hbm, mx_hbm, my_hbm, out_ref, x_s, mx_s, my_s, sems, e_s=None, *,
    tile_h: int, width: int, wq: int, pad_r: int, pad_c: int,
    dy_bounds, dx_bounds, kind: str, n_chan: int, shared_maps: bool,
    shared_img: bool,
):
    """One VMEM pass of the displacement-bounded remap (ops/resample.py
    remap_bilinear_bounded / remap_lanczos4_bounded semantics, themselves
    bit-identical to the gather remaps for in-bound maps).

    The XLA bounded remaps are HBM-bound: their select chains are hundreds of
    full-frame passes XLA cannot fuse into one loop. Here the source band plus
    displacement halo sits in VMEM, so every shifted view is a register-level
    slice and the whole resample costs one HBM read + write per pixel.

    Bilinear: corner VALUES resolved by where-chains (exact picks), then the
    same lerps — bit-identical to remap_bilinear. Lanczos4: absolute-shift
    weight planes W_t = wx[t + 3 - dxv] (zero outside the pixel's 8-tap
    window); summing S_t * W_t over ascending t visits the pixel's taps in
    remap_lanczos4's exact accumulation order, and the interleaved zero terms
    add exactly +-0.0. The tap weights themselves are the polynomial fits
    (resample._LANCZOS4_POLY, <= 5.4e-7/weight): exact-sin weights cost ~32
    VPU transcendentals per pixel and dominated the kernel; output differs
    from remap_lanczos4 by <= ~1e-5 on [0, 1] data (vs cv2's own ~1e-3
    fixed-point weight quantization).

    ``*_sep`` kinds: two-pass SEPARABLE variants (vertical resample of every
    window column into an intermediate plane E, then the horizontal pass reads
    shifted slices of E). Select cost is LINEAR in the displacement spans —
    ~2(SX+SY) vs the exact kinds' 2(SY+2)SX — at the price of a bounded
    approximation: the vertical sample position of a tap at source column c is
    taken from the map at output column c instead of the output pixel's own
    column x, a position error <= Lx*(|c-x|) where Lx = max |d map_y / dx|
    (host-checkable from the warp/CA model; ~1e-2 px for real lens warps,
    under cv2's own 1/32-px fixed-point quantization). See DIVERGENCES.md.
    """
    dy0, dy1 = dy_bounds
    dx0, dx1 = dx_bounds
    c = pl.program_id(0)
    i = pl.program_id(1)
    n = pl.num_programs(1)
    src_rows = tile_h + 2 * pad_r
    step = c * n + i  # flattened grid step (band index fastest)

    def band(cc, j, slot, k):
        src = (x_hbm, mx_hbm, my_hbm)[k]
        dst = (x_s, mx_s, my_s)[k]
        rows = src_rows if k == 0 else tile_h
        shared = shared_img if k == 0 else shared_maps
        mc = 0 if shared else cc
        return pltpu.make_async_copy(
            src.at[mc, pl.ds(j * tile_h, rows), :],
            dst.at[slot],
            sems.at[slot * 3 + k],
        )

    @pl.when(step == 0)
    def _():
        for k in range(3):
            band(0, 0, 0, k).start()

    @pl.when(step + 1 < n_chan * n)
    def _():
        nc = jnp.where(i + 1 < n, c, c + 1)
        nj = jnp.where(i + 1 < n, i + 1, 0)
        for k in range(3):
            band(nc, nj, (step + 1) % 2, k).start()

    for k in range(3):
        band(c, i, step % 2, k).wait()

    slot = step % 2
    src = x_s[slot]
    mx = mx_s[slot][...]
    my = my_s[slot][...]

    if kind.endswith("_sep"):
        # --- pass 1: vertical resample of EVERY window column into E -------
        # maps are DMA'd over the full halo window (width wm = wp), so each
        # window column carries its own vertical phase; select cost = SY per
        # tap instead of SY*SX overall.
        wm = my.shape[-1]
        y0w = jnp.floor(my)
        fyw = my - y0w
        groww = jax.lax.broadcasted_iota(jnp.int32, (tile_h, wm), 0) + i * tile_h
        dyw = jnp.clip(y0w.astype(jnp.int32) - groww, dy0, dy1)

        def Vf(s: int):
            """Full-width source rows at vertical offset s (no column shift)."""
            return src[pad_r + s : pad_r + s + tile_h, :]

        def vself(tap: int):
            o = Vf(dy0 + tap)
            for a in range(dy0 + 1, dy1 + 1):
                o = jnp.where(dyw == a, Vf(a + tap), o)
            return o

        if kind == "bilinear_sep":
            e_s[...] = vself(0) * (1 - fyw) + vself(1) * fyw
        else:  # lanczos4_sep
            from .resample import _lanczos4_weight_planes_fast

            wyw = _lanczos4_weight_planes_fast(fyw)
            acc = jnp.zeros((tile_h, wm), jnp.float32)
            for j in range(8):
                o = Vf(dy0 + j - 3)
                for a in range(dy0 + 1, dy1 + 1):
                    o = jnp.where(dyw == a, Vf(a + j - 3), o)
                acc = acc + wyw[j] * o
            e_s[...] = acc

        # --- pass 2: horizontal resample of E at the output columns --------
        mxo = mx[:, pad_c : pad_c + wq]
        x0 = jnp.floor(mxo)
        fx = mxo - x0
        gcol = jax.lax.broadcasted_iota(jnp.int32, (tile_h, wq), 1)
        dxv = jnp.clip(x0.astype(jnp.int32) - gcol, dx0, dx1)

        def hself(tap: int):
            o = e_s[:, pad_c + dx0 + tap : pad_c + dx0 + tap + wq]
            for b in range(dx0 + 1, dx1 + 1):
                o = jnp.where(
                    dxv == b, e_s[:, pad_c + b + tap : pad_c + b + tap + wq], o
                )
            return o

        if kind == "bilinear_sep":
            res = hself(0) * (1 - fx) + hself(1) * fx
        else:
            from .resample import _lanczos4_weight_planes_fast

            wx = _lanczos4_weight_planes_fast(fx)
            res = jnp.zeros((tile_h, wq), jnp.float32)
            for jj in range(8):
                res = res + wx[jj] * hself(jj - 3)

        out_ref[0] = res[:, :width]
        return

    x0 = jnp.floor(mx)
    y0 = jnp.floor(my)
    fx = mx - x0
    fy = my - y0
    grow = jax.lax.broadcasted_iota(jnp.int32, (tile_h, wq), 0) + i * tile_h
    gcol = jax.lax.broadcasted_iota(jnp.int32, (tile_h, wq), 1)
    dyv = jnp.clip(y0.astype(jnp.int32) - grow, dy0, dy1)
    dxv = jnp.clip(x0.astype(jnp.int32) - gcol, dx0, dx1)

    def V(s: int, t: int):
        """Source values at (row + s, col + t), clamp-to-edge via the pads."""
        return src[pad_r + s : pad_r + s + tile_h, pad_c + t : pad_c + t + wq]

    if kind == "bilinear":
        def hsel(s: int, tap: int):
            o = V(s, dx0 + tap)
            for b in range(dx0 + 1, dx1 + 1):
                o = jnp.where(dxv == b, V(s, b + tap), o)
            return o

        h0 = {s: hsel(s, 0) for s in range(dy0, dy1 + 2)}
        h1 = {s: hsel(s, 1) for s in range(dy0, dy1 + 2)}

        def vsel(rows_d, tap: int):
            out = rows_d[dy0 + tap]
            for a in range(dy0 + 1, dy1 + 1):
                out = jnp.where(dyv == a, rows_d[a + tap], out)
            return out

        i00 = vsel(h0, 0)
        i01 = vsel(h1, 0)
        i10 = vsel(h0, 1)
        i11 = vsel(h1, 1)
        top = i00 * (1 - fx) + i01 * fx
        bot = i10 * (1 - fx) + i11 * fx
        res = top * (1 - fy) + bot * fy
    else:  # lanczos4
        from .resample import _lanczos4_weight_planes_fast

        # polynomial weights: 8 fma/tap instead of 2 VPU sins (which
        # dominated the kernel); <= ~1e-5 output delta vs the exact weights
        wx = _lanczos4_weight_planes_fast(fx)
        wy = _lanczos4_weight_planes_fast(fy)

        wplanes = {}
        for t in range(dx0 - 3, dx1 + 5):
            jt = t + 3 - dxv
            acc = jnp.zeros((tile_h, wq), jnp.float32)
            for j in range(8):
                acc = jnp.where(jt == j, wx[j], acc)
            wplanes[t] = acc

        rows = {}
        for s in range(dy0 - 3, dy1 + 5):
            acc = jnp.zeros((tile_h, wq), jnp.float32)
            for t in range(dx0 - 3, dx1 + 5):
                acc = acc + wplanes[t] * V(s, t)
            rows[s] = acc

        res = jnp.zeros((tile_h, wq), jnp.float32)
        for j in range(8):
            row = rows[dy0 + j - 3]
            for a in range(dy0 + 1, dy1 + 1):
                row = jnp.where(dyv == a, rows[a + j - 3], row)
            res = res + wy[j] * row

    out_ref[0] = res[:, :width]


def _remap_budget_rows(live: int, wq: int) -> int:
    """Rows of remap tile fitting a third of VMEM at this live-set estimate
    (the /3 absorbs Mosaic's ~2.5x actual stack allocation near span caps)."""
    return (_VMEM_LIMIT // 3) // max(live * wq * 4, 1)


def _remap_live_estimate(kind: str, dy_bounds, dx_bounds) -> int:
    """The dispatchers' shared worst-case live-value count for a remap launch
    (see remap_bounded_pallas's notes; deliberately fat)."""
    dy0, dy1 = int(dy_bounds[0]), int(dy_bounds[1])
    dx0, dx1 = int(dx_bounds[0]), int(dx_bounds[1])
    if kind == "lanczos4":
        return 3 * ((dy1 - dy0 + 9) + (dx1 - dx0 + 9)) + 30
    if kind == "lanczos4_sep":
        return 48
    if kind == "bilinear_sep":
        return 24
    return 6 * (dy1 - dy0 + 2) + 16


def remap_fits_full_width(kind: str, width: int, dy_bounds, dx_bounds) -> bool:
    """Host-side: would a full-width banded remap launch fit VMEM at the
    minimum 8-row tile? False at medium-format widths x medium-format spans —
    the caller should zone columns (grid) instead of rows."""
    wq = _round_up(width, _LANE)
    return _remap_budget_rows(_remap_live_estimate(kind, dy_bounds, dx_bounds), wq) >= 8


def row_zone_edges(h: int, n_zones: int):
    """Zone row edges for ``remap_bounded_pallas_zoned``: 8-aligned interior
    boundaries, contiguous cover of [0, h). None when h is too short — the
    single place the zoned-kernel alignment contract is defined (the warp and
    CA zone builders both consume this)."""
    if h < 8 * n_zones:
        return None
    return [0] + [((h * i) // n_zones) & ~7 for i in range(1, n_zones)] + [h]


def col_zone_edges(w: int, n_zones: int):
    """Column edges for ``remap_bounded_pallas_grid``: 128-lane-aligned
    interior boundaries (each strip's output rows pad to full lanes, so
    misaligned strips would waste lanes in every op), contiguous over [0, w).
    None when w is too narrow for n_zones useful strips."""
    if w < _LANE * n_zones:
        return None
    return (
        [0]
        + [((w * i) // n_zones) & ~(_LANE - 1) for i in range(1, n_zones)]
        + [w]
    )


def remap_bounded_pallas_grid(
    img: Array, map_x: Array, map_y: Array,
    col_zones, kind: str = "bilinear",
    tile_h: int = 0, interpret: bool = False,
):
    """Column x row zoned banded remap: one launch per (column strip, row
    zone) rectangle, each with that RECTANGLE's own displacement bounds.

    Radial warps concentrate |dy| at the top/bottom rows AND |dx| at the
    left/right columns (VERDICT r3 item 1's symmetric lever): row zoning
    tightens dy only, so the whole row still pays the row's worst-case |dx|
    span. Splitting columns as well gives every rectangle both tight spans —
    with the round-4 exact bounds the select chains shrink to the local
    displacement + 1 px of f32 margin.

    ``col_zones``: [(c0, c1, row_zones, kinds)] where row_zones is the
    remap_bounded_pallas_zoned format with bounds restricted to the strip and
    kinds the optional per-rectangle kind list. Each strip re-bases map_x by
    the integer window start — exact in f32 at map magnitudes (same argument
    as the row zones' map_y re-base) — so for the EXACT kinds the output is
    BIT-IDENTICAL to the unzoned kernel (gated in tests/test_remap_pallas.py).
    The ``*_sep`` kinds are NOT bit-identical across a strip boundary: the
    vertical-pass phases of a strip's halo columns come from the strip-edge
    map column (edge padding of the sliced maps) instead of the true neighbor
    column — an error of the same Lx*tap_dist class the sep approximation
    already makes, but additive (<= 2x the single-pass bound). Callers gate
    per-rectangle sep kinds against HALF the usual position-error budget
    (warp_grid_zones doubles the estimate).
    """
    squeeze = img.ndim == 2 and map_x.ndim == 2
    img3 = img[None] if img.ndim == 2 else img
    if img3.ndim != 3 or map_x.shape != map_y.shape:
        return None
    w = img3.shape[-1]
    if not col_zones or col_zones[0][0] != 0 or col_zones[-1][1] != w:
        return None
    for (a, b, _, _), (c, d, _, _) in zip(col_zones, col_zones[1:]):
        if b != c:
            return None
    reach = 4 if kind.startswith("lanczos4") else 1

    parts = []
    for c0, c1, zones, kinds in col_zones:
        if not zones:
            return None
        dx_lo = min(int(z[3][0]) for z in zones)
        dx_hi = max(int(z[3][1]) for z in zones)
        x0 = max(0, c0 + dx_lo - reach)
        x1 = min(w, c1 + dx_hi + reach + 1)
        # maps re-based to the window and PADDED to its width (the kernel
        # requires map width == img width): with output in window coordinates
        # the local dxv equals the global dxv, so zone bounds carry unchanged.
        # The pad columns compute clipped garbage and are sliced off below.
        lpad, rpad = c0 - x0, x1 - c1
        pad = [(0, 0)] * (map_x.ndim - 2) + [(0, 0), (lpad, rpad)]
        mx_z = jnp.pad(map_x[..., :, c0:c1], pad, mode="edge") - float(x0)
        my_z = jnp.pad(map_y[..., :, c0:c1], pad, mode="edge")
        part = remap_bounded_pallas_zoned(
            img3[..., x0:x1],
            mx_z,
            my_z,
            zones,
            kind,
            tile_h=tile_h,
            interpret=interpret,
            kinds=kinds,
        )
        if part is None:
            return None
        parts.append(part[..., :, lpad:lpad + (c1 - c0)])
    out = jnp.concatenate(parts, axis=-1)
    return out[0] if squeeze else out


def remap_bounded_pallas_zoned(
    img: Array, map_x: Array, map_y: Array,
    zones, kind: str = "bilinear",
    tile_h: int = 0, interpret: bool = False,
    kinds=None,
):
    """Row-zoned banded remap: one kernel launch per horizontal zone, each with
    that zone's own (tighter) displacement bounds.

    The select-chain cost of ``remap_bounded_pallas`` grows with the bound
    SPAN, but radial warps concentrate vertical displacement at the top/bottom
    rows: per-zone dy bounds are one-sided and roughly half the global span
    (benchmarks/ca_probe.py), so zoning nearly halves the dominant row-select
    cost. ``zones`` is a sequence of (r0, r1, (dy0, dy1), (dx0, dx1)) covering
    [0, H) in order — computed HOST-side by the caller from the warp model
    (warp.rectilinear.displacement_bounds(row_range=...) or
    correct.ca.removal model bounds).

    BIT-EXACT vs the unzoned kernel: each zone re-bases the source window by
    an integer w0 <= map magnitude, and f32 subtraction of an integer multiple
    of the map's ulp is exact, so floor/fraction (and therefore every tap and
    weight) are unchanged (gated in tests/test_remap_pallas.py).

    ``kinds``: optional per-zone kind list (parallel to ``zones``) — radial
    maps have their largest |d map_y/dx| at the outer rows, so central zones
    can ride the cheap separable kinds while outer zones stay exact (callers
    compute the per-zone position-error bound host-side). All kinds must share
    the same kernel reach (bilinear* or lanczos4* together).
    """
    squeeze = img.ndim == 2 and map_x.ndim == 2
    img3 = img[None] if img.ndim == 2 else img
    if img3.ndim != 3 or map_x.shape != map_y.shape:
        return None
    h = img3.shape[-2]
    if not zones or zones[0][0] != 0 or zones[-1][1] != h:
        return None
    for (a, b, _, _), (c, d, _, _) in zip(zones, zones[1:]):
        if b != c:
            return None
    reach = 4 if kind.startswith("lanczos4") else 1
    if kinds is None:
        kinds = [kind] * len(zones)
    if len(kinds) != len(zones) or any(
        (4 if k.startswith("lanczos4") else 1) != reach for k in kinds
    ):
        return None

    parts = []
    for (r0, r1, dyb, dxb), zkind in zip(zones, kinds):
        dy0, dy1 = int(dyb[0]), int(dyb[1])
        w0 = max(0, r0 + dy0 - reach)
        w1 = min(h, r1 + dy1 + reach + 1)
        # the kernel requires map H == img H: pad the zone maps (edge rows
        # compute clipped garbage and are sliced off) up to the window height
        zh, wh = r1 - r0, w1 - w0
        pad = [(0, 0)] * (map_x.ndim - 2) + [(0, wh - zh), (0, 0)]
        mx_z = jnp.pad(map_x[..., r0:r1, :], pad, mode="edge")
        my_z = jnp.pad(map_y[..., r0:r1, :] - float(w0), pad, mode="edge")
        part = remap_bounded_pallas(
            img3[:, w0:w1],
            mx_z,
            my_z,
            (dy0 + r0 - w0, dy1 + r0 - w0),
            (int(dxb[0]), int(dxb[1])),
            zkind,
            tile_h=tile_h,
            interpret=interpret,
        )
        if part is None:
            return None
        parts.append(part[..., :zh, :])
    out = jnp.concatenate(parts, axis=-2)
    return out[0] if squeeze else out


def remap_bounded_pallas(
    img: Array, map_x: Array, map_y: Array,
    dy_bounds, dx_bounds, kind: str = "bilinear",
    tile_h: int = 0, interpret: bool = False,
):
    """Banded Pallas remap for displacement-bounded maps.

    ``img`` is one (H, W) f32 plane or a (C, H, W) channel stack; maps are
    (H, W) (shared across channels — computed and DMA'd once) or (C, H, W).
    Returns None when the shape/bounds don't fit a band (caller falls back to
    the XLA bounded remaps). ``kind`` is "bilinear" or "lanczos4".
    """
    squeeze = img.ndim == 2 and map_x.ndim == 2
    if img.ndim == 2:
        img = img[None]
    if img.ndim != 3 or map_x.ndim not in (2, 3) or map_x.shape != map_y.shape:
        return None
    n_img, h, w = img.shape
    n_map = 1 if map_x.ndim == 2 else map_x.shape[0]
    n_chan = max(n_img, n_map)
    shared_maps = n_map == 1
    shared_img = n_img == 1
    if n_img not in (1, n_chan) or n_map not in (1, n_chan):
        return None
    if map_x.shape[-2:] != (h, w):
        return None
    dy0, dy1 = int(dy_bounds[0]), int(dy_bounds[1])
    dx0, dx1 = int(dx_bounds[0]), int(dx_bounds[1])
    if kind not in ("bilinear", "lanczos4", "bilinear_sep", "lanczos4_sep"):
        return None
    sep = kind.endswith("_sep")
    reach = 4 if kind.startswith("lanczos4") else 1
    s_min, s_max = dy0 - reach + 1, dy1 + reach
    t_min, t_max = dx0 - reach + 1, dx1 + reach
    pad_r = _round_up(max(max(0, -s_min), max(0, s_max), 1), _ALIGN)
    pad_c = max(0, -t_min)

    if sep:
        # linear select cost and far fewer live wires: bigger spans compile
        if pad_r > 128 or dy1 - dy0 > 96 or dx1 - dx0 > 96:
            return None
    elif pad_r > 64 or dy1 - dy0 > 48 or dx1 - dx0 > 48:
        # On-chip sweep (benchmarks/remap_tile_sweep.py) verified spans up to
        # (30, 45) at tiles <= 32; a (87, 127)-span launch spills VMEM even at
        # tile 8. Callers' own caps (warp <= 34, CA <= 24) sit well inside.
        return None
    # Mosaic's register allocator keeps far more of the select-chain wires live
    # than the dict sizes suggest (tile 128 spilled 147 MB on a bilinear +-4
    # launch), so the live estimate is deliberately fat and the tile capped low.
    live = _remap_live_estimate(kind, (dy0, dy1), (dx0, dx1))
    wq = _round_up(w, _LANE)
    wp = _round_up(pad_c + wq + max(t_max, 0), _LANE)
    if tile_h == 0:
        # height needn't divide (rows are padded to a tile multiple below).
        # /3: Mosaic's actual stack allocation ran up to ~2.5x this estimate
        # near the span caps (a (30, 46)-span bilinear at tile 32 hit 103.5M
        # of the 100M scoped limit), so size the tile for a third of VMEM.
        budget_rows = _remap_budget_rows(live, wq)
        if budget_rows < 8:
            # even the minimum 8-row tile would spill: a medium-format-width
            # launch at medium-format spans measured 349.9M of 128M VMEM
            # (BASELINE.md round-5 large-frame ledger). Refuse; the caller's
            # ladder falls to column-rect grid zones, whose rect-local widths
            # and spans fit.
            return None
        tile_h = min(32, budget_rows - budget_rows % 8)
    if tile_h % 8:
        return None
    hp = _round_up(h, tile_h)

    img_p = jnp.pad(
        img.astype(jnp.float32),
        ((0, 0), (pad_r, pad_r + hp - h), (pad_c, wp - pad_c - w)),
        mode="edge",
    )
    maps_p = []
    # sep kinds read the maps over the full halo window (pass 1 needs every
    # window column's vertical phase), so pad them exactly like the image
    wmap = wp if sep else wq
    mpad_l = pad_c if sep else 0
    for m in (map_x, map_y):
        m3 = m[None] if shared_maps else m
        maps_p.append(
            jnp.pad(
                m3.astype(jnp.float32),
                ((0, 0), (0, hp - h), (mpad_l, wmap - mpad_l - w)),
                mode="edge",
            )
        )

    kernel = partial(
        _remap_kernel, tile_h=tile_h, width=w, wq=wq, pad_r=pad_r, pad_c=pad_c,
        dy_bounds=(dy0, dy1), dx_bounds=(dx0, dx1), kind=kind,
        n_chan=n_chan, shared_maps=shared_maps, shared_img=shared_img,
    )
    out = pl.pallas_call(
        kernel,
        grid=(n_chan, hp // tile_h),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)] * 3,
        out_specs=pl.BlockSpec(
            (1, tile_h, w), lambda c, i: (c, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_chan, hp, w), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, tile_h + 2 * pad_r, wp), jnp.float32),
            pltpu.VMEM((2, tile_h, wmap), jnp.float32),
            pltpu.VMEM((2, tile_h, wmap), jnp.float32),
            pltpu.SemaphoreType.DMA((6,)),
        ]
        + ([pltpu.VMEM((tile_h, wp), jnp.float32)] if sep else []),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(img_p, *maps_p)
    if hp != h:
        out = out[:, :h]
    out = out.astype(img.dtype)
    return out[0] if squeeze else out


# --- Richardson-Lucy deconvolution iteration (banded, blurs in VMEM) --------------------
def _rl_iter_kernel(
    est_hbm, img_hbm, out_ref, est_s, img_s, sems, *,
    tile_h: int, width: int, reach: int, halo: int, taps,
):
    """One RL iteration on one row band, both separable blurs in VMEM.

    est/img arrive reflect-padded by 2*reach (rounded to ``halo`` for DMA
    alignment) on every side; the band computes, in exactly the XLA path's op
    order (H-pass then V-pass, ascending taps), blur(est) -> ratio ->
    blur(ratio) -> est*factor. Out-of-frame ratio values are replaced by
    in-band SYMMETRIC mirrors (filter2d pads the *ratio array*, which is not
    the same as evaluating the ratio at reflected coordinates), so the output
    is the XLA iteration's value everywhere including the global borders.
    """
    i = pl.program_id(0)
    n = pl.num_programs(0)
    rows = tile_h + 2 * halo
    r = reach

    def band(src, dst, j, slot, k):
        return pltpu.make_async_copy(
            src.at[pl.ds(j * tile_h, rows), :], dst.at[slot], sems.at[slot * 2 + k]
        )

    @pl.when(i == 0)
    def _():
        band(est_hbm, est_s, 0, 0, 0).start()
        band(img_hbm, img_s, 0, 0, 1).start()

    @pl.when(i + 1 < n)
    def _():
        band(est_hbm, est_s, i + 1, (i + 1) % 2, 0).start()
        band(img_hbm, img_s, i + 1, (i + 1) % 2, 1).start()

    band(est_hbm, est_s, i, i % 2, 0).wait()
    band(img_hbm, img_s, i, i % 2, 1).wait()
    est = est_s[i % 2]
    img = img_s[i % 2]

    # layout: frame row f of this band sits at local row f - r0 + halo,
    # frame col f at local col f + 2*reach (host column pad)
    base = halo

    def hpass(x, ncols):
        # taps ascending, multiply-then-add, like stencil._conv_valid
        acc = None
        for k, wk in enumerate(taps):
            term = x[:, k : k + ncols] * jnp.float32(wk)
            acc = term if acc is None else acc + term
        return acc

    def vpass(x, r0, nrows):
        acc = None
        for k, wk in enumerate(taps):
            term = x[r0 + k : r0 + k + nrows, :] * jnp.float32(wk)
            acc = term if acc is None else acc + term
        return acc

    # blur(est) at frame rows [r0-r, r1+r), cols [-r, W+r)
    h1 = hpass(est[base - 2 * r : base + tile_h + 2 * r], width + 2 * r)
    blur1 = vpass(h1, 0, tile_h + 2 * r)

    ratio = (
        img[base - r : base + tile_h + r, r : r + width + 2 * r]
        / (blur1 + jnp.float32(1e-25))
    )

    # SYMMETRIC mirrors where the ratio extension leaves the frame: global top/
    # bottom rows (edge bands only) and left/right columns (every band).
    # Mosaic has no rev lowering; r is tiny, so flips are reversed-slice concats.
    nr = ratio.shape[0]

    def flip_rows(x, a, b):
        return jnp.concatenate(
            [x[b - 1 - k : b - k] for k in range(b - a)], axis=0
        )

    def flip_cols(x, a, b):
        return jnp.concatenate(
            [x[:, b - 1 - k : b - k] for k in range(b - a)], axis=1
        )

    top = jnp.where(i == 0, flip_rows(ratio, r, 2 * r), ratio[:r])
    bottom = jnp.where(
        i == n - 1, flip_rows(ratio, nr - 2 * r, nr - r), ratio[-r:]
    )
    ratio = jnp.concatenate([top, ratio[r:-r], bottom], axis=0)
    nc = ratio.shape[1]
    left = flip_cols(ratio, r, 2 * r)
    right = flip_cols(ratio, nc - 2 * r, nc - r)
    ratio = jnp.concatenate([left, ratio[:, r:-r], right], axis=1)

    h2 = hpass(ratio, width)
    factor = vpass(h2, 0, tile_h)
    out_ref[:] = (
        est[base : base + tile_h, 2 * r : 2 * r + width] * factor
    )


def rl_deconv_pallas(
    image: Array,
    taps,
    iterations: int,
    tile_h: int = 0,
    interpret: bool = False,
):
    """Richardson-Lucy with a separable symmetric PSF, one banded Pallas launch
    per iteration (filters/sharpen.py's hot path).

    The XLA composition materializes ~6 full-frame arrays per iteration (two
    pad buffers + four conv passes + ratio/mult); here each iteration reads
    est+img and writes est once, with both blurs' taps running in VMEM —
    measured 2.2x at 24 MP (BASELINE.md round-5 RL ledger). Returns None when
    the shape doesn't fit the banding (caller falls back to the XLA loop).
    Values match the XLA path exactly in op order and border semantics (the
    ratio-mirror construction in the kernel); parity gated by
    tests/test_filters.py on interpret mode and CPU goldens.
    """
    if image.ndim != 2 or image.dtype != jnp.float32:
        return None
    h, w = image.shape
    taps = [float(t) for t in np.asarray(taps).reshape(-1)]
    reach = len(taps) // 2
    if len(taps) < 3 or len(taps) % 2 == 0 or reach > 32:
        return None
    halo = _round_up(2 * reach, _ALIGN)
    if h < 2 * reach or w < 2 * reach:
        return None

    # the big VMEM tenants are the four double-buffered band scratches, which
    # scale with the tile like _pick_tile's live wires; the measured sweep
    # (benchmarks/rl_tile_sweep.py: 40 -> 71 ms, 80 -> 61.2, 200 -> 59.5,
    # 400 spills) puts the knee at ~200 rows
    if tile_h == 0:
        tile_h = _pick_tile(h, w, live_values=10, max_tile=200)
    if tile_h == 0 or tile_h < 2 * reach or h % tile_h != 0:
        return None

    wp = _round_up(w + 4 * reach, _LANE)

    def pad_full(x):
        # SYMMETRIC 2*reach pad (what filter2d's reflect border reads), rows
        # rounded to the DMA halo, cols to the lane tile
        p = jnp.pad(x, ((2 * reach, 2 * reach), (2 * reach, 2 * reach)),
                    mode="symmetric")
        return jnp.pad(
            p,
            ((halo - 2 * reach, halo - 2 * reach), (0, wp - p.shape[1])),
        )

    kernel = partial(
        _rl_iter_kernel,
        tile_h=tile_h,
        width=w,
        reach=reach,
        halo=halo,
        taps=taps,
    )

    img_pad = pad_full(image)

    def one_iter(est):
        return pl.pallas_call(
            kernel,
            grid=(h // tile_h,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec(memory_space=pltpu.HBM),
            ],
            out_specs=pl.BlockSpec(
                (tile_h, w), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((h, w), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((2, tile_h + 2 * halo, wp), jnp.float32),
                pltpu.VMEM((2, tile_h + 2 * halo, wp), jnp.float32),
                pltpu.SemaphoreType.DMA((4,)),
            ],
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
            interpret=interpret,
        )(pad_full(est), img_pad)

    return jax.lax.fori_loop(
        0, iterations, lambda _, est: one_iter(est), image
    )
