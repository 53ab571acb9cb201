"""Where do Best's ~17 ms at 24 MP go? Incremental stage decomposition.

Measures (timed_loop, single amortized dispatch each) at 4000x6000:
  A. bayer_to_rgbg phase split alone
  B. _mega_chunked kernel stack alone (12 phase planes out, summed)
  C. B + quad_to_bayer assembly (3 full-res channels, summed)
  D. develop_channels_mega (C + XLA border strips + stitch)
  E. full develop(frame, Best)
Deltas: C-B = assembly interleave, D-C = border strips + stitch, E-D = dispatch
glue/normalization. Run on TPU: python -m benchmarks.best_stage_probe
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.timing import timed_loop
from pysp_tpu.colorimetry.transforms import cam_to_lin_srgb_matrix
from pysp_tpu.core.bayer import bayer_to_rgbg
from pysp_tpu.core.frame import RawFrame
from pysp_tpu.demosaic.ahd_mega import _mega_chunked, develop_channels_mega
from pysp_tpu.ops.polyphase import quad_to_bayer
from pysp_tpu.pipeline.develop import DevelopConfig, develop
from pysp_tpu.const import QualityDemosaic


def main() -> None:
    from benchmarks.cache import enable_compile_cache

    enable_compile_cache()
    rng = np.random.default_rng(0)
    H, W = (int(sys.argv[1]), int(sys.argv[2])) if len(sys.argv) > 2 else (4000, 6000)
    MP = H * W / 1e6
    frame = jax.device_put(
        RawFrame.synthetic(
            rng.random((H, W), np.float32),
            cam_mat=np.array(
                [[0.9, -0.2, -0.1], [-0.3, 1.1, 0.2], [0.0, -0.4, 1.3]], np.float32
            ),
            wb_neutral=np.array([0.45, 1.0, 0.62], np.float32),
        )
    )
    mat = cam_to_lin_srgb_matrix(frame.cam_mat, frame.cam_white)
    wb = frame.wb_reciprocal()
    planes = tuple(jax.device_put(p) for p in bayer_to_rgbg(frame.bayer))
    r0, g1, b0, g2 = planes
    kplanes = (r0, g1, g2, b0)

    def split(b):
        return sum(jnp.sum(p) for p in bayer_to_rgbg(b))

    def mega(ps):
        out = _mega_chunked(ps, mat, wb, False, 1, False, tail=(True, True))
        return sum(jnp.sum(o) for o in out)

    def mega_asm(ps):
        out = _mega_chunked(ps, mat, wb, False, 1, False, tail=(True, True))
        chans = [
            quad_to_bayer(((out[k], out[k + 1]), (out[k + 2], out[k + 3])))
            for k in (0, 4, 8)
        ]
        return sum(jnp.sum(c) for c in chans)

    def full_mega(f):
        out = develop_channels_mega(f, 1, True, True)
        return sum(jnp.sum(c) for c in out)

    cfg = DevelopConfig(quality=QualityDemosaic.Best, postprocess_stages=1)

    def dev(f):
        return develop(f, cfg)

    for name, fn, args, iters in [
        ("A split", split, (frame.bayer,), 32),
        ("B mega", mega, (kplanes,), 8),
        ("C mega+asm", mega_asm, (kplanes,), 8),
        ("D channels_mega", full_mega, (frame,), 8),
        ("E develop", dev, (frame,), 8),
    ]:
        t0 = time.time()
        dt = timed_loop(fn, *args, iters=iters)
        print(
            f"[probe] {name}: {dt*1e3:.2f} ms ({MP/dt:.0f} MP/s) "
            f"[wall {time.time()-t0:.0f}s]",
            file=sys.stderr, flush=True,
        )


if __name__ == "__main__":
    main()
