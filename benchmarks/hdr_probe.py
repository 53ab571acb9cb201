"""Probe: config-4 HDR fuse cost split at 5x24 MP.

config 4 (5-frame Bayer HDR stack -> AHD -> sRGB, one jit) measured 21.7-21.8 ms
vs ~16-17 ms bare Best — i.e. the fuse "costs" ~5 ms for what is structurally one
fused reduction pass over 480 MB (~0.7 ms at HBM rate) plus a 96 MB dynamic-slice
fallback read. Two suspects:

1. develop_pipeline ran ``lax.map(identity)`` over the burst when no per-frame
   corrections were enabled — a scan whose carry materializes a full copy of the
   480 MB stack (fixed: the map is now skipped when the config enables nothing).
2. The fuse's brightest-frame fallback (``jnp.take(bayer, argmax(ev), axis=0)``)
   forces a second full-stack-adjacent read.

This probe times: fuse alone, fuse without the fallback (lower bound), bare Best,
and config-4 end to end.
"""
from __future__ import annotations

import os
import sys

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
        ),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    from benchmarks.timing import timed_loop
    from pysp_tpu import (
        DevelopConfig,
        PipelineConfig,
        QualityDemosaic,
        RawFrame,
        develop,
        develop_pipeline,
    )
    from pysp_tpu.correct.hdr import fuse_exposures_to_raw

    H, W = 4000, 6000
    MP = H * W / 1e6
    rng = np.random.default_rng(0)
    hdr5 = jax.device_put(
        jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs),
            *[
                RawFrame.synthetic(rng.random((H, W), np.float32), ev=10.0 + i)
                for i in range(5)
            ],
        )
    )
    frame = jax.device_put(RawFrame.synthetic(rng.random((H, W), np.float32)))

    # fuse alone (counts discarded -> DCE'd)
    dt = timed_loop(
        lambda fs: fuse_exposures_to_raw(fs)[0].bayer, hdr5, iters=16
    )
    print(f"fuse alone (5x24 MP): {dt*1e3:.2f} ms", file=sys.stderr)

    # lower bound: weighted average without the zero-weight fallback slice
    def fuse_nofallback(fs):
        evs = fs.ev
        target = jnp.mean(evs)
        off = (2.0 ** (evs - target))[:, None, None]
        weights = (0.5 - jnp.abs(fs.bayer - 0.5)) * 1.6 ** (-0.1 * jnp.abs(off))
        return jnp.sum(fs.bayer * weights * off, axis=0) / (
            jnp.sum(weights, axis=0) + 1e-9
        )

    dt = timed_loop(fuse_nofallback, hdr5, iters=16)
    print(f"fuse lower bound (no fallback slice): {dt*1e3:.2f} ms", file=sys.stderr)

    cfg_best = DevelopConfig(quality=QualityDemosaic.Best, postprocess_stages=1)
    dt_best = timed_loop(lambda f: develop(f, cfg_best), frame, iters=4)
    print(
        f"bare Best (24 MP): {dt_best*1e3:.2f} ms = {MP/dt_best:.0f} MP/s",
        file=sys.stderr,
    )

    cfg4 = PipelineConfig(develop=cfg_best, fuse_hdr=True)
    dt4 = timed_loop(lambda fs: develop_pipeline(fs, cfg4), hdr5, iters=4)
    print(
        f"config4 (fuse + Best): {dt4*1e3:.2f} ms "
        f"(fuse overhead {1e3*(dt4-dt_best):.2f} ms)",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
