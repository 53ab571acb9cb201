"""Real-chip validation: the Pallas megakernel inside shard_map (1-device mesh).

VERDICT r1 item 3: sharded develops used to force use_pallas=False. Halos are
exchanged BEFORE the local develop, so the kernel never spans devices — on a
1-device mesh the sharded program is exactly {reflect-pad 16 rows; megakernel
develop; crop}, which this script parity-gates against the monolithic Pallas
develop and times.

Run on the real TPU (default backend):  python benchmarks/shard_pallas_check.py
Optional args: H W (default 2000 3008).
"""
from __future__ import annotations

import sys
import time

import numpy as np


def main() -> None:
    import jax

    from benchmarks.cache import enable_compile_cache

    enable_compile_cache()

    from benchmarks.timing import timed_loop
    from pysp_tpu import DevelopConfig, QualityDemosaic, RawFrame
    from pysp_tpu.parallel.mesh import make_mesh
    from pysp_tpu.parallel.spatial import develop_spatial
    from pysp_tpu.pipeline.develop import develop

    h = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 3008
    print(f"[check] backend={jax.default_backend()} shape={h}x{w}", flush=True)

    rng = np.random.default_rng(3)
    frame = jax.device_put(
        RawFrame.synthetic(
            rng.random((h, w), np.float32),
            cam_mat=np.array(
                [[0.9, -0.2, -0.1], [-0.3, 1.1, 0.2], [0.0, -0.4, 1.3]], np.float32
            ),
            wb_neutral=np.array([0.45, 1.0, 0.62], np.float32),
        )
    )
    cfg = DevelopConfig(quality=QualityDemosaic.Best, postprocess_stages=1)
    mesh = make_mesh((1, 1), devices=jax.devices()[:1])

    t0 = time.time()
    got = develop_spatial(frame, cfg, mesh, halo=16)
    got = np.asarray(got)
    print(f"[check] sharded develop compiled+ran in {time.time()-t0:.0f}s", flush=True)

    want = np.asarray(develop(frame, cfg))

    # Interior must match to homogeneity-tie-flip noise (the sharded local block
    # is reflect-padded by 16 rows, so its band grid differs from the monolithic
    # launch by the halo offset -> FMA tie flips, same gating as test_ahd_mega).
    gi, wi = got[16:-16], want[16:-16]
    mse = np.mean((gi.astype(np.float64) - wi.astype(np.float64)) ** 2)
    psnr = np.inf if mse == 0 else 10 * np.log10(1.0 / mse)
    frac = np.mean(np.abs(gi - wi) > 1e-4)
    print(f"[check] interior PSNR={psnr:.1f} dB, frac>1e-4={frac:.5f}", flush=True)
    assert psnr > 50, psnr
    assert frac < 0.05, frac

    mp = h * w / 1e6
    dt_mono = timed_loop(lambda f: develop(f, cfg), frame, iters=8)
    dt_shard = timed_loop(
        lambda f: develop_spatial(f, cfg, mesh, halo=16), frame, iters=8
    )
    print(
        f"[check] monolithic {dt_mono*1e3:.1f} ms ({mp/dt_mono:.0f} MP/s) | "
        f"sharded-1dev {dt_shard*1e3:.1f} ms ({mp/dt_shard:.0f} MP/s)",
        flush=True,
    )
    print("PASS", flush=True)


if __name__ == "__main__":
    main()
