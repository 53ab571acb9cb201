"""Draft-path HBM probe: current separable upsample vs polyphase form.

VERDICT r1 weak #9: Draft runs 3.4-6 ms at 24 MP vs a ~1.5 ms HBM bound. The
current path materializes a half-upsampled intermediate per channel (rows pass
then cols pass) at full working set. The polyphase candidate computes the four
2x-bilinear output phases as 4-tap stencils at QUARTER resolution, runs the
color tail there (pointwise — commutes with interleave), and assembles the
full-res image once (quad_to_bayer + channel stack).

Run on TPU: python -m benchmarks.draft_probe [H W]
Prints parity (PSNR vs the shipping path) then amortized timings.
"""
from __future__ import annotations

import sys
import time

import numpy as np


def draft_phases_develop(frame, clip_highlights=True, gamma_encode=True):
    import jax.numpy as jnp

    from pysp_tpu.colorimetry.transforms import cam_to_lin_srgb_matrix
    from pysp_tpu.core.bayer import bayer_to_rgbg
    from pysp_tpu.ops.polyphase import quad_to_bayer
    from pysp_tpu.ops.stencil import pad_reflect, pad_replicate
    from pysp_tpu.pipeline.develop import _color_tail_channels

    r, g1, b, g2 = bayer_to_rgbg(frame.bayer)
    wb = frame.wb_reciprocal()
    g = (g1 + g2) * 0.5 * wb[1]
    rp = pad_reflect(r, (0, 1, 0, 1))
    r_c = (0.75 * rp[:-1, :-1] + 0.25 * rp[1:, 1:]) * wb[0]
    bp = pad_reflect(b, (1, 0, 1, 0))
    b_c = (0.75 * bp[1:, 1:] + 0.25 * bp[:-1, :-1]) * wb[2]

    def up_phases(p):
        pp = pad_replicate(p, 1)
        c = pp[1:-1, 1:-1]
        up_ = pp[:-2, 1:-1]
        dn = pp[2:, 1:-1]
        lf = pp[1:-1, :-2]
        rt = pp[1:-1, 2:]
        ul = pp[:-2, :-2]
        ur = pp[:-2, 2:]
        dl = pp[2:, :-2]
        dr = pp[2:, 2:]
        p00 = 0.5625 * c + 0.1875 * up_ + 0.1875 * lf + 0.0625 * ul
        p01 = 0.5625 * c + 0.1875 * up_ + 0.1875 * rt + 0.0625 * ur
        p10 = 0.5625 * c + 0.1875 * dn + 0.1875 * lf + 0.0625 * dl
        p11 = 0.5625 * c + 0.1875 * dn + 0.1875 * rt + 0.0625 * dr
        return ((p00, p01), (p10, p11))

    rq, gq, bq = up_phases(r_c), up_phases(g), up_phases(b_c)
    mat = cam_to_lin_srgb_matrix(frame.cam_mat, frame.cam_white)

    chans = {0: [], 1: [], 2: []}
    for py in (0, 1):
        row = {0: [], 1: [], 2: []}
        for px in (0, 1):
            ir, ig, ib = _color_tail_channels(
                rq[py][px], gq[py][px], bq[py][px], mat,
                clip_highlights, gamma_encode,
            )
            for k, v in ((0, ir), (1, ig), (2, ib)):
                row[k].append(v)
        for k in range(3):
            chans[k].append(tuple(row[k]))
    out = [quad_to_bayer((chans[k][0], chans[k][1])) for k in range(3)]
    return jnp.stack(out, axis=-1).astype(jnp.float32)


def draft_fused_assembly_develop(frame, clip_highlights=True, gamma_encode=True):
    """Variant B: stack RGB per phase, then one two-level interleave of RGB
    phase blocks — 3 full-res RGB materializations vs the per-channel
    quad_to_bayer + final channel stack (~4)."""
    import jax.numpy as jnp

    from pysp_tpu.colorimetry.transforms import cam_to_lin_srgb_matrix
    from pysp_tpu.core.bayer import bayer_to_rgbg
    from pysp_tpu.ops.stencil import pad_reflect, pad_replicate
    from pysp_tpu.pipeline.develop import _color_tail_channels

    r, g1, b, g2 = bayer_to_rgbg(frame.bayer)
    wb = frame.wb_reciprocal()
    g = (g1 + g2) * 0.5 * wb[1]
    rp = pad_reflect(r, (0, 1, 0, 1))
    r_c = (0.75 * rp[:-1, :-1] + 0.25 * rp[1:, 1:]) * wb[0]
    bp = pad_reflect(b, (1, 0, 1, 0))
    b_c = (0.75 * bp[1:, 1:] + 0.25 * bp[:-1, :-1]) * wb[2]

    def up_phases(p):
        pp = pad_replicate(p, 1)
        c = pp[1:-1, 1:-1]
        up_ = pp[:-2, 1:-1]
        dn = pp[2:, 1:-1]
        lf = pp[1:-1, :-2]
        rt = pp[1:-1, 2:]
        ul = pp[:-2, :-2]
        ur = pp[:-2, 2:]
        dl = pp[2:, :-2]
        dr = pp[2:, 2:]
        p00 = 0.5625 * c + 0.1875 * up_ + 0.1875 * lf + 0.0625 * ul
        p01 = 0.5625 * c + 0.1875 * up_ + 0.1875 * rt + 0.0625 * ur
        p10 = 0.5625 * c + 0.1875 * dn + 0.1875 * lf + 0.0625 * dl
        p11 = 0.5625 * c + 0.1875 * dn + 0.1875 * rt + 0.0625 * dr
        return ((p00, p01), (p10, p11))

    rq, gq, bq = up_phases(r_c), up_phases(g), up_phases(b_c)
    mat = cam_to_lin_srgb_matrix(frame.cam_mat, frame.cam_white)

    h2, w2 = r_c.shape
    rgbp = {}
    for py in (0, 1):
        for px in (0, 1):
            ir, ig, ib = _color_tail_channels(
                rq[py][px], gq[py][px], bq[py][px], mat,
                clip_highlights, gamma_encode,
            )
            rgbp[(py, px)] = jnp.stack([ir, ig, ib], axis=-1)
    even = jnp.stack([rgbp[(0, 0)], rgbp[(0, 1)]], axis=-2).reshape(h2, 2 * w2, 3)
    odd = jnp.stack([rgbp[(1, 0)], rgbp[(1, 1)]], axis=-2).reshape(h2, 2 * w2, 3)
    return jnp.stack([even, odd], axis=1).reshape(2 * h2, 2 * w2, 3).astype(
        jnp.float32
    )


def main() -> None:
    import jax

    from benchmarks.cache import enable_compile_cache

    enable_compile_cache()

    from benchmarks.timing import timed_loop
    from pysp_tpu import DevelopConfig, QualityDemosaic, RawFrame
    from pysp_tpu.pipeline.develop import develop

    h = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 6000
    mp = h * w / 1e6
    rng = np.random.default_rng(0)
    frame = jax.device_put(
        RawFrame.synthetic(
            rng.random((h, w), np.float32),
            cam_mat=np.array(
                [[0.9, -0.2, -0.1], [-0.3, 1.1, 0.2], [0.0, -0.4, 1.3]], np.float32
            ),
            wb_neutral=np.array([0.45, 1.0, 0.62], np.float32),
        )
    )
    cfg = DevelopConfig(quality=QualityDemosaic.Draft, postprocess_stages=1)
    print(f"[draft] backend={jax.default_backend()} {h}x{w}", flush=True)

    fn_phase = jax.jit(draft_phases_develop)

    # parity first (small crop to keep it quick)
    small = jax.device_put(
        RawFrame.synthetic(rng.random((256, 384), np.float32))
    )
    a = np.asarray(develop(small, cfg))
    bchan = np.asarray(fn_phase(small))
    mse = np.mean((a.astype(np.float64) - bchan.astype(np.float64)) ** 2)
    psnr = np.inf if mse == 0 else 10 * np.log10(1.0 / mse)
    print(f"[draft] phase-form parity PSNR={psnr:.1f} dB", flush=True)
    assert psnr > 55, psnr

    t0 = time.time()
    dt_a = timed_loop(lambda f: develop(f, cfg), frame, iters=16)
    print(
        f"[draft] current:  {dt_a*1e3:.2f} ms = {mp/dt_a:.0f} MP/s "
        f"[wall {time.time()-t0:.0f}s]",
        flush=True,
    )
    t0 = time.time()
    dt_b = timed_loop(fn_phase, frame, iters=16)
    print(
        f"[draft] phases:   {dt_b*1e3:.2f} ms = {mp/dt_b:.0f} MP/s "
        f"[wall {time.time()-t0:.0f}s]",
        flush=True,
    )
    print(f"[draft] speedup x{dt_a/dt_b:.2f}", flush=True)

    fn_fused = jax.jit(draft_fused_assembly_develop)
    cfused = np.asarray(fn_fused(small))
    eqf = np.array_equal(cfused, bchan)
    print(f"[draft] fused-assembly identical to phases: {eqf}", flush=True)
    t0 = time.time()
    dt_c = timed_loop(fn_fused, frame, iters=16)
    print(
        f"[draft] fused:    {dt_c*1e3:.2f} ms = {mp/dt_c:.0f} MP/s "
        f"[wall {time.time()-t0:.0f}s]",
        flush=True,
    )


if __name__ == "__main__":
    main()
