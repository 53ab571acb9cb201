"""Assembly-stage probe: 12 phase planes -> (H, W, 3) sRGB image, three ways.

The Best megakernel emits 12 (H/2, W/2) phase planes; develop() then runs
3x quad_to_bayer (12 planes -> 3 full-res channels) and a final
jnp.stack(..., axis=-1) -> (H, W, 3). That is ~1.15 GB of HBM traffic in two
relayout passes. Candidates:

  A. current: 3x quad_to_bayer + stack (two passes)
  B. fused:   one expression 12 planes -> (H, W, 3) (phase-interleave with a
              trailing channel axis; XLA should emit a single write pass)
  C. channels-only: 3x quad_to_bayer, no HWC stack (lower bound if the API
              returned channels)

Run on TPU: python -m benchmarks.assembly_probe
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.timing import timed_loop
from pysp_tpu.ops.polyphase import quad_to_bayer


def fused_assembly_hwc(planes):
    """12 planes [r00,r01,r10,r11,g...,b...] -> (H, W, 3) in one expression."""
    h2, w2 = planes[0].shape[-2], planes[0].shape[-1]
    # Per phase, stack channels minor: q[py][px] is (h2, w2, 3)
    q = [[jnp.stack([planes[c * 4 + 2 * py + px] for c in range(3)], axis=-1)
          for px in (0, 1)] for py in (0, 1)]
    even = jnp.stack([q[0][0], q[0][1]], axis=-2).reshape(h2, w2 * 2, 3)
    odd = jnp.stack([q[1][0], q[1][1]], axis=-2).reshape(h2, w2 * 2, 3)
    return jnp.stack([even, odd], axis=-3).reshape(h2 * 2, w2 * 2, 3)


def main() -> None:
    from benchmarks.cache import enable_compile_cache

    enable_compile_cache()
    rng = np.random.default_rng(0)
    H, W = 4000, 6000
    MP = H * W / 1e6
    planes = tuple(
        jax.device_put(rng.random((H // 2, W // 2), np.float32).astype(np.float32))
        for _ in range(12)
    )

    def current(ps):
        chans = [
            quad_to_bayer(((ps[k], ps[k + 1]), (ps[k + 2], ps[k + 3])))
            for k in (0, 4, 8)
        ]
        out = jnp.stack(chans, axis=-1)
        return jnp.sum(out)

    def fused(ps):
        return jnp.sum(fused_assembly_hwc(ps))

    def channels_only(ps):
        chans = [
            quad_to_bayer(((ps[k], ps[k + 1]), (ps[k + 2], ps[k + 3])))
            for k in (0, 4, 8)
        ]
        return sum(jnp.sum(c) for c in chans)

    # parity first (cheap shapes)
    small = tuple(p[:64, :128] for p in planes)
    a = jnp.stack(
        [quad_to_bayer(((small[k], small[k + 1]), (small[k + 2], small[k + 3])))
         for k in (0, 4, 8)], axis=-1)
    b = fused_assembly_hwc(small)
    assert jnp.array_equal(a, b), "fused assembly mismatch"
    print("[probe] parity ok", file=sys.stderr, flush=True)

    for name, fn in [
        ("A current (quadx3+stack)", current),
        ("B fused 12->HWC", fused),
        ("C channels only", channels_only),
    ]:
        t0 = time.time()
        dt = timed_loop(fn, planes, iters=16)
        print(
            f"[probe] {name}: {dt*1e3:.2f} ms ({MP/dt:.0f} MP/s) "
            f"[wall {time.time()-t0:.0f}s]",
            file=sys.stderr, flush=True,
        )


if __name__ == "__main__":
    main()
