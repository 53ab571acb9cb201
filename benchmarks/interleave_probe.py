"""Can Mosaic interleave phases/channels in VMEM — and what does assembly cost XLA?

polyphase.py's header claims "Mosaic cannot (de)interleave CFA phases inside
VMEM" (the reason every kernel emits quarter-res phase planes and XLA pays a
full re-interleave + HWC-stack pass afterwards). This probe tests the claim
directly and prices the alternatives at 24 MP:

  1. XLA quad_to_bayer (12 quarter planes -> 3 channels), materialized
  2. XLA HWC stack (3 channels -> (H, W, 3)), materialized
  3. XLA reshape (H, 3W) -> (H, W, 3), materialized  [is HWC-bitcast free?]
  4. Pallas lane interleave: stack+reshape (th, w, 2) -> (th, 2w) in VMEM
  5. Pallas channel interleave to (th, 3w) rows (HWC bitcast rows)

Run on TPU: python -m benchmarks.interleave_probe
"""
from __future__ import annotations

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.timing import timed_loop
from pysp_tpu.ops.polyphase import quad_to_bayer


def main() -> None:
    from benchmarks.cache import enable_compile_cache

    enable_compile_cache()
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)
    H, W = 4000, 6000
    h2, w2 = H // 2, W // 2
    planes = [jax.device_put(rng.random((h2, w2), np.float32)) for _ in range(12)]
    chans = [jax.device_put(rng.random((H, W), np.float32)) for _ in range(3)]

    def xla_quads(ps):
        outs = [
            quad_to_bayer(((ps[k], ps[k + 1]), (ps[k + 2], ps[k + 3])))
            for k in (0, 4, 8)
        ]
        return sum(jnp.sum(o * 1.0000001) for o in outs)

    def xla_stack(cs):
        out = jnp.stack(cs, axis=-1)
        return jnp.sum(out * 1.0000001)

    flat = jax.device_put(rng.random((H, 3 * W), np.float32))

    def xla_reshape(f):
        out = f.reshape(H, W, 3)
        return jnp.sum(out * 1.0000001)

    for name, fn, args in [
        ("quad_to_bayer x3 (12->3 full-res)", xla_quads, (planes,)),
        ("HWC stack (3ch -> (H,W,3))", xla_stack, (chans,)),
        ("reshape (H,3W)->(H,W,3)", xla_reshape, (flat,)),
    ]:
        t0 = time.time()
        dt = timed_loop(fn, *args, iters=16)
        print(f"[probe] {name}: {dt*1e3:.2f} ms [wall {time.time()-t0:.0f}s]",
              file=sys.stderr, flush=True)

    # --- Pallas in-VMEM interleaves -----------------------------------------
    TH = 64

    def lane_interleave_kernel(a_ref, b_ref, out_ref):
        a = a_ref[...]
        b = b_ref[...]
        out_ref[...] = jnp.stack([a, b], axis=-1).reshape(a.shape[0], 2 * a.shape[1])

    def pallas_lane_interleave(a, b):
        out = pl.pallas_call(
            lane_interleave_kernel,
            grid=(h2 // TH,),
            in_specs=[pl.BlockSpec((TH, w2), lambda i: (i, 0))] * 2,
            out_specs=pl.BlockSpec((TH, 2 * w2), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((h2, 2 * w2), jnp.float32),
        )(a, b)
        return jnp.sum(out * 1.0000001)

    def chan3_interleave_kernel(r_ref, g_ref, b_ref, out_ref):
        r, g, b = r_ref[...], g_ref[...], b_ref[...]
        out_ref[...] = jnp.stack([r, g, b], axis=-1).reshape(r.shape[0], 3 * r.shape[1])

    def pallas_chan3(r, g, b):
        out = pl.pallas_call(
            chan3_interleave_kernel,
            grid=(H // TH,),
            in_specs=[pl.BlockSpec((TH, W), lambda i: (i, 0))] * 3,
            out_specs=pl.BlockSpec((TH, 3 * W), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((H, 3 * W), jnp.float32),
        )(r, g, b)
        return jnp.sum(out * 1.0000001)

    for name, fn, args, check in [
        ("pallas lane interleave 2 (h2 x 2*w2)", pallas_lane_interleave,
         (planes[0], planes[1]), "stack2"),
        ("pallas chan interleave 3 ((H,3W) rows)", pallas_chan3,
         tuple(chans), "stack3"),
    ]:
        try:
            t0 = time.time()
            dt = timed_loop(fn, *args, iters=16)
            print(f"[probe] {name}: {dt*1e3:.2f} ms [wall {time.time()-t0:.0f}s]",
                  file=sys.stderr, flush=True)
        except Exception as e:  # noqa: BLE001 — probe reports, never crashes
            print(f"[probe] {name}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  file=sys.stderr, flush=True)

    # correctness spot-check of the lane interleave (if it compiled)
    try:
        a, b = planes[0], planes[1]
        out = pl.pallas_call(
            lane_interleave_kernel,
            grid=(h2 // TH,),
            in_specs=[pl.BlockSpec((TH, w2), lambda i: (i, 0))] * 2,
            out_specs=pl.BlockSpec((TH, 2 * w2), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((h2, 2 * w2), jnp.float32),
        )(a, b)
        ref = jnp.stack([a, b], axis=-1).reshape(h2, 2 * w2)
        err = float(jnp.max(jnp.abs(out - ref)))
        print(f"[probe] lane interleave max err vs XLA: {err}", file=sys.stderr)
    except Exception as e:  # noqa: BLE001
        print(f"[probe] interleave check FAILED: {str(e)[:200]}", file=sys.stderr)


if __name__ == "__main__":
    main()
