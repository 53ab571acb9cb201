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

# Probed structural floors for the shipped Best path at 24 MP (BASELINE.md round-3
# stage/assembly probes): the megakernel itself runs ~488 ps/px and the
# planar->HWC assembly + border stitch cost ~3.9 ms is structural (Mosaic cannot
# lane-interleave in VMEM; phase-space stitching measured slower). The headline
# JSON reports efficiency_vs_kernel_floor = floor_ms / measured_ms so the scored
# number tracks distance to the path's own measured ceiling, not just raw MP/s.
KERNEL_FLOOR_PS_PX = 488.0
ASSEMBLY_TAX_MS = 3.9
BEST_FLOOR_MS = MP * 1e6 * KERNEL_FLOOR_PS_PX * 1e-12 * 1e3 + ASSEMBLY_TAX_MS


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
                        "efficiency_vs_kernel_floor": round(
                            BEST_FLOOR_MS / (dt * 1e3), 3
                        ),
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
        # burst CA first: maps are frame-independent, so remove_ca_from_raw's
        # batched path computes them once and runs burst-wide shared-map
        # remap launches (round 4 — BASELINE.md CA-burst ledger)
        fs = remove_ca_from_raw(fs, ca_model, ca_model)

        def one(f):
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

def measure_e2e() -> None:
    """End-to-end latency: file BYTES -> host decode -> device develop -> PNG.

    The scored metric is "p50 DNG->sRGB develop latency" (BASELINE.json) and the
    device-only numbers above deliberately exclude the host side; this measures
    the whole thing (VERDICT r3 item 3). Host decode runs 30-146 MP/s on this
    box (BASELINE.md decode ledger), so the honest p50 is decode/save-dominated —
    which is exactly what pipeline/stream.py's overlap exists to hide; the
    streamed files/sec shows how much of it the overlap recovers. Results go to
    stderr (one `e2e-json` line machine-readable); the stdout contract stays ONE
    headline JSON line.
    """
    import os
    import tempfile
    import time as _time

    import jax
    import numpy as np

    from pysp_tpu import DevelopConfig, QualityDemosaic
    from pysp_tpu.io.cr2 import write_synthetic_cr2
    from pysp_tpu.io.image_out import save_image
    from pysp_tpu.io.raw_loader import load_raw
    from pysp_tpu.io.tiff import write_synthetic_dng
    from pysp_tpu.pipeline.develop import develop
    from pysp_tpu.pipeline.stream import develop_stream

    rng = np.random.default_rng(2)
    yy, xx = np.mgrid[0:H, 0:W]
    scene = (
        0.25
        + 0.3 * np.sin(xx / 97.0) * np.cos(yy / 131.0)
        + 0.2 * ((xx // 256 + yy // 256) % 2)
        + 0.08 * rng.random((H, W))
    )
    u16 = np.clip(scene * 3600 + 260, 0, 4095).astype(np.uint16)

    print("[bench] e2e: encoding 24 MP fixtures ...", file=sys.stderr)
    files = {
        "dng_lj92": write_synthetic_dng(u16, compression=7),
        "cr2": write_synthetic_cr2(u16),
    }
    cfg = DevelopConfig(quality=QualityDemosaic.Best, postprocess_stages=1)
    out: dict = {}
    tmpdir = tempfile.mkdtemp(prefix="pysp_e2e_")

    for name, blob in files.items():
        # warm the XLA program cache once so p50 measures steady-state serving
        dev = develop(jax.device_put(load_raw(blob)), cfg)
        np.asarray(dev)

        lat, t_dec, t_dev, t_save = [], [], [], []
        iters = 5 if name == "dng_lj92" else 3
        for i in range(iters):
            dst = os.path.join(tmpdir, f"{name}_{i}.png")
            t0 = _time.perf_counter()
            frame = load_raw(blob)
            t1 = _time.perf_counter()
            img = np.asarray(develop(jax.device_put(frame), cfg))
            t2 = _time.perf_counter()
            save_image(dst, img)
            t3 = _time.perf_counter()
            lat.append(t3 - t0)
            t_dec.append(t1 - t0)
            t_dev.append(t2 - t1)
            t_save.append(t3 - t2)
        lat.sort()
        p50 = lat[len(lat) // 2]
        p90 = lat[min(len(lat) - 1, int(round(0.9 * (len(lat) - 1))))]
        out[name] = {
            "p50_s": round(p50, 3),
            "p90_s": round(p90, 3),
            "decode_s": round(float(np.median(t_dec)), 3),
            "develop_s": round(float(np.median(t_dev)), 3),
            "save_png_s": round(float(np.median(t_save)), 3),
        }
        print(
            f"[bench] e2e {name} 24 MP single-file: p50 {p50:.2f}s p90 {p90:.2f}s "
            f"(decode {out[name]['decode_s']}s + develop {out[name]['develop_s']}s "
            f"+ PNG {out[name]['save_png_s']}s)",
            file=sys.stderr,
        )

    # streamed path: decode workers + async dispatch overlap the host side
    n_stream = 8
    sources = [files["dng_lj92"]] * n_stream
    from concurrent.futures import ThreadPoolExecutor

    t0 = _time.perf_counter()
    with ThreadPoolExecutor(max_workers=2) as savers:
        futs = []
        for i, (_, img) in enumerate(develop_stream(sources, cfg, decode_workers=4)):
            futs.append(
                savers.submit(
                    save_image, os.path.join(tmpdir, f"s{i}.png"), img
                )
            )
        for f in futs:
            f.result()
    dt_stream = _time.perf_counter() - t0
    out["stream"] = {
        "files": n_stream,
        "files_per_s": round(n_stream / dt_stream, 3),
        "s_per_file": round(dt_stream / n_stream, 3),
    }
    print(
        f"[bench] e2e streamed x{n_stream} (decode||develop||save): "
        f"{dt_stream:.1f}s total = {n_stream/dt_stream:.2f} files/s "
        f"({dt_stream/n_stream:.2f} s/file vs p50 {out['dng_lj92']['p50_s']}s "
        "sequential)",
        file=sys.stderr,
    )
    print(f"[bench] e2e-json {json.dumps(out)}", file=sys.stderr)

    import shutil

    shutil.rmtree(tmpdir, ignore_errors=True)


if __name__ == "__main__":
    main(full="--full" in sys.argv[1:])
    if "--e2e" in sys.argv[1:]:
        measure_e2e()
