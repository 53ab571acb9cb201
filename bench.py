"""Benchmark: full AHD ("Best") DNG->sRGB develop throughput at 24 MP on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}; secondary config
numbers go to stderr. The headline (Best) is measured FIRST and its JSON printed
immediately, so a driver timeout can never eat the result; Draft/Fast and the
BASELINE configs 3-5 run only with ``--full``. The JAX persistent compilation
cache is enabled (.jax_cache/) so reruns skip the axon compile-queue walls
(observed 600s+ per fresh compile — BASELINE.md "variance warning").

Timing methodology: the axon TPU tunnel adds a large fluctuating per-dispatch RTT
(30ms..1s observed), so each workload runs inside a lax.fori_loop with a data
dependence and is dispatched ONCE (benchmarks/timing.py) — tunnel overhead amortizes
out and the number reflects on-device time.

Baseline: the reference (bullbin/pySP) publishes no numbers (BASELINE.md) and cannot
run here (MSVC-only Cython kernels, missing native deps); the baseline is the measured
throughput of the vectorized NumPy/cv2 transcription of its algorithms
(tests/golden_ref.py) on this machine's CPU at 24 MP — see BASELINE.md "Measured":

    draft 13.9 MP/s | eag 5.5 MP/s | ahd 0.77 MP/s | full AHD develop 0.69 MP/s

vs_baseline compares the same workload: full 24 MP AHD develop
(demosaic + WB + cam->sRGB + gamma).
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINES_MPS = {
    "Draft": 13.9,
    "Fast": 5.5,
    "Best": 0.69,  # full AHD develop incl. color tail
}
MP = 24.0
H, W = 4000, 6000


def main(full: bool = False) -> None:
    import os

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    from benchmarks.timing import timed_loop
    from pysp_tpu import DevelopConfig, QualityDemosaic, RawFrame
    from pysp_tpu.pipeline.develop import develop, develop_burst

    rng = np.random.default_rng(0)
    frame = jax.device_put(
        RawFrame.synthetic(
            rng.random((H, W), np.float32),
            cam_mat=np.array(
                [[0.9, -0.2, -0.1], [-0.3, 1.1, 0.2], [0.0, -0.4, 1.3]], np.float32
            ),
            wb_neutral=np.array([0.45, 1.0, 0.62], np.float32),
        )
    )
    print(f"[bench] backend={jax.default_backend()}", file=sys.stderr)

    results = {}
    qualities = [QualityDemosaic.Best]
    if full:
        qualities += [QualityDemosaic.Draft, QualityDemosaic.Fast]
    for quality in qualities:
        cfg = DevelopConfig(quality=quality, postprocess_stages=1)
        t0 = time.time()
        # Same-process runtime variance spreads single draws by up to +-40%
        # (BASELINE.md "lottery coda"), so the headline is a median of 3
        # repeats of the SAME compiled program with the min/max band recorded.
        reps = 3 if quality is QualityDemosaic.Best else 1
        dts = sorted(
            timed_loop(lambda f, cfg=cfg: develop(f, cfg), frame, iters=8)
            for _ in range(reps)
        )
        dt = dts[len(dts) // 2]
        mps = MP / dt
        results[quality.name] = mps
        band = f" band {dts[0]*1e3:.1f}-{dts[-1]*1e3:.1f} ms" if reps > 1 else ""
        print(
            f"[bench] {quality.name}: {dt*1e3:.1f} ms/frame = {mps:.1f} MP/s "
            f"({mps / BASELINES_MPS[quality.name]:.0f}x CPU baseline) "
            f"[wall {time.time()-t0:.0f}s]{band}",
            file=sys.stderr,
        )
        if quality is QualityDemosaic.Best:
            # Headline JSON goes out the moment it exists — driver-timeout-proof.
            print(
                json.dumps(
                    {
                        "metric": "AHD develop throughput (24MP DNG->sRGB, 1 chip)",
                        "value": round(mps, 2),
                        "unit": "MP/s",
                        "vs_baseline": round(mps / BASELINES_MPS["Best"], 1),
                        "median_of": reps,
                        "band_mps": [
                            round(MP / dts[-1], 2),
                            round(MP / dts[0], 2),
                        ],
                    }
                ),
                flush=True,
            )

    if not full:
        return

    # BASELINE config 3: Best + hot-pixel healing + flat-field, one jit
    from pysp_tpu import PipelineConfig, develop_pipeline

    flat = jax.device_put(
        RawFrame.synthetic(
            np.clip(1.0 - 0.3 * rng.random((H, W)), 0.1, 1).astype(np.float32)
        )
    )
    cfg3 = PipelineConfig(
        develop=DevelopConfig(quality=QualityDemosaic.Best, postprocess_stages=1),
        flat_field=True,
        repair_hot_pixels=True,
    )
    dt3 = timed_loop(
        lambda f: develop_pipeline(f, cfg3, flat=flat), frame, iters=4
    )
    print(
        f"[bench] config3 (Best+heal+flat, 24MP): {dt3*1e3:.1f} ms = "
        f"{MP/dt3:.1f} MP/s",
        file=sys.stderr,
    )

    # BASELINE config 4: 5-frame Bayer-space HDR stack -> AHD -> sRGB, one jit
    hdr5 = jax.device_put(
        jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs),
            *[
                RawFrame.synthetic(
                    rng.random((H, W), np.float32), ev=10.0 + i
                )
                for i in range(5)
            ],
        )
    )
    cfg4 = PipelineConfig(
        develop=DevelopConfig(quality=QualityDemosaic.Best, postprocess_stages=1),
        fuse_hdr=True,
    )
    dt4 = timed_loop(lambda fs: develop_pipeline(fs, cfg4), hdr5, iters=4)
    print(
        f"[bench] config4 (5x24MP HDR stack -> AHD -> sRGB): {dt4*1e3:.1f} ms "
        f"(fuse amortized over 5 frames: {5*MP/dt4:.1f} input-MP/s)",
        file=sys.stderr,
    )

    # BASELINE config 5 flavor: vmapped burst of small frames
    burst_n, bh, bw = 16, 1000, 1504
    burst = jax.device_put(
        jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs),
            *[
                RawFrame.synthetic(rng.random((bh, bw), np.float32), ev=10.0 + i * 0.1)
                for i in range(burst_n)
            ],
        )
    )
    cfg_best = DevelopConfig(quality=QualityDemosaic.Best, postprocess_stages=1)
    dt_burst = timed_loop(
        lambda fs: develop_burst(fs, cfg_best), burst, iters=4
    )
    burst_mps = burst_n * bh * bw / 1e6 / dt_burst
    print(
        f"[bench] burst x{burst_n} ({bh}x{bw} AHD): {dt_burst*1e3:.1f} ms "
        f"= {burst_mps:.1f} MP/s",
        file=sys.stderr,
    )

    # BASELINE config 5 proper: CA correction in the mosaic, Best develop, and
    # the rectilinear warp, per frame across the burst — ONE jitted program
    from pysp_tpu.correct.ca.models import Poly3CorrectionModel
    from pysp_tpu.correct.ca.removal import remove_ca_from_raw
    from pysp_tpu.pipeline.develop import develop as _develop
    from pysp_tpu.warp.opcodes import apply_opcode_3_warp, encode_warp_rectilinear

    ca_model = Poly3CorrectionModel(0.01)
    warp_block = encode_warp_rectilinear(
        [(1.005, -0.01, 0.002, 0.0, 0.0003, -0.0002)] * 3, (0.5, 0.5)
    )

    @jax.jit
    def config5_step(fs):
        def one(f):
            f = remove_ca_from_raw(f, ca_model, ca_model)
            img = _develop.__wrapped__(f, cfg_best)
            return apply_opcode_3_warp(img, warp_block)

        return jax.lax.map(one, fs)

    dt5 = timed_loop(config5_step, burst, iters=4)
    mps5 = burst_n * bh * bw / 1e6 / dt5
    print(
        f"[bench] config5 (x{burst_n} CA + Best + warp): {dt5*1e3:.1f} ms "
        f"= {mps5:.1f} MP/s",
        file=sys.stderr,
    )

if __name__ == "__main__":
    main(full="--full" in sys.argv[1:])
