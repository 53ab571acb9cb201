"""Isolate the config-5 TPU worker crash (bench.py:171-199).

The composed per-frame program (CA removal -> Best develop -> OpcodeList3
warp under lax.map) hard-crashes the TPU worker ("worker process crashed or
restarted") reproducibly, while the plain megakernel burst is fine. Run the
combinations one subprocess each so a crash doesn't take later cases down.

Run on TPU: python -m benchmarks.config5_isolate [case]
Cases: ca, warp, ca_dev, dev_warp, full, full_xla
"""
from __future__ import annotations

import subprocess
import sys


def run_case(case: str) -> None:
    import numpy as np
    import jax
    import jax.numpy as jnp

    from benchmarks.cache import enable_compile_cache

    enable_compile_cache()
    from benchmarks.timing import timed_loop
    from pysp_tpu import DevelopConfig, QualityDemosaic, RawFrame
    from pysp_tpu.correct.ca.models import Poly3CorrectionModel
    from pysp_tpu.correct.ca.removal import remove_ca_from_raw
    from pysp_tpu.pipeline.develop import develop as _develop
    from pysp_tpu.warp.opcodes import apply_opcode_3_warp, encode_warp_rectilinear

    burst_n, bh, bw = 16, 1000, 1504
    rng = np.random.default_rng(0)
    burst = jax.device_put(
        jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs),
            *[
                RawFrame.synthetic(rng.random((bh, bw), np.float32), ev=10.0 + i * 0.1)
                for i in range(burst_n)
            ],
        )
    )
    cfg = DevelopConfig(quality=QualityDemosaic.Best, postprocess_stages=1)
    cfg_xla = DevelopConfig(
        quality=QualityDemosaic.Best, postprocess_stages=1, use_pallas=False
    )
    ca_model = Poly3CorrectionModel(0.01)
    warp_block = encode_warp_rectilinear(
        [(1.005, -0.01, 0.002, 0.0, 0.0003, -0.0002)] * 3, (0.5, 0.5)
    )

    def one(f, do_ca, do_dev, do_warp, c=cfg, interp="lanczos4"):
        if do_ca:
            f = remove_ca_from_raw(f, ca_model, ca_model)
        if not do_dev:
            return f.bayer
        img = _develop.__wrapped__(f, c)
        if do_warp:
            img = apply_opcode_3_warp(img, warp_block, interpolation=interp)
        return img

    def warp_only(f):  # no develop in the program at all
        img = jnp.stack([f.bayer, f.bayer, f.bayer], axis=-1)
        return apply_opcode_3_warp(img, warp_block)

    def full_burstca(fs):
        # whole-burst program: burst CA (maps once, burst-wide launches) then
        # the per-frame develop+warp map — used directly below, not via `one`
        fs = remove_ca_from_raw(fs, ca_model, ca_model)
        return jax.lax.map(lambda f: one(f, False, True, True), fs)

    def ca_burst(fs):
        return remove_ca_from_raw(fs, ca_model, ca_model).bayer

    cases = {
        "ca": lambda f: one(f, True, False, False),
        "warp_only": warp_only,
        "ca_dev": lambda f: one(f, True, True, False),
        "dev_warp": lambda f: one(f, False, True, True),
        "dev_warp_bilinear": lambda f: one(f, False, True, True, interp="bilinear"),
        "full": lambda f: one(f, True, True, True),
        "full_xla": lambda f: one(f, True, True, True, cfg_xla),
    }
    if case in ("full_burstca", "ca_burst"):
        step = jax.jit(full_burstca if case == "full_burstca" else ca_burst)
        dt = timed_loop(step, burst, iters=8)
        print(f"[c5i] {case}: {dt*1e3:.1f} ms", flush=True)
        if case == "ca_burst":
            # value check vs the per-frame CA path (same budget class)
            ref = jax.jit(
                lambda fs: jax.lax.map(
                    lambda f: remove_ca_from_raw(f, ca_model, ca_model).bayer, fs
                )
            )(burst)
            d = float(jnp.abs(ca_burst(burst) - ref).max())
            print(f"[c5i] ca_burst vs per-frame maxdiff: {d:.3e}", flush=True)
        return
    fn = cases[case.removeprefix("one_").removeprefix("map2_")]
    if case.startswith("one_"):
        frame0 = jax.tree_util.tree_map(lambda x: x[0], burst)
        step = jax.jit(fn)
        dt = timed_loop(step, frame0, iters=4)
    elif case.startswith("map2_"):
        b2 = jax.tree_util.tree_map(lambda x: x[:2], burst)
        step = jax.jit(lambda fs: jax.lax.map(fn, fs))
        dt = timed_loop(step, b2, iters=4)
    else:
        step = jax.jit(lambda fs: jax.lax.map(fn, fs))
        dt = timed_loop(step, burst, iters=4)
    print(f"[c5i] {case}: {dt*1e3:.1f} ms", flush=True)


def main() -> None:
    if len(sys.argv) > 1:
        run_case(sys.argv[1])
        return
    default = ("one_dev_warp", "map2_dev_warp", "warp_only",
               "dev_warp_bilinear", "full")
    for case in (sys.argv[2:] or default):
        r = subprocess.run(
            [sys.executable, "-m", "benchmarks.config5_isolate", case],
            capture_output=True,
            text=True,
            timeout=2400,
        )
        out = (r.stdout or "").strip().splitlines()
        err = (r.stderr or "").strip().splitlines()
        tail = out[-1] if out else (err[-1] if err else "")
        print(f"[c5i] case={case} rc={r.returncode} {tail}", flush=True)


if __name__ == "__main__":
    main()
