"""Sweep the AHD megakernel band height on one ~1024-col chunk at 24MP scale.

The auto-picker in ops.pallas_kernels.ahd_mega_pallas budgets VMEM from a measured
worst-case live-set estimate; after kernel math changes (e.g. the shared-column
medians) the true peak moves, so re-sweep and update the estimate. Run on TPU:

    python benchmarks/sweep_mega_tile.py [tile ...]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.timing import timed_loop
from pysp_tpu.ops.pallas_kernels import ahd_mega_pallas


def main() -> None:
    args = [int(t) for t in sys.argv[1:]]
    if len(args) >= 2 and args[0] < 0:
        # negative first arg: -h2 w2 tiles...
        h2, w2 = -args[0], args[1]
        tiles = args[2:]
    else:
        h2, w2 = 2000, 1016  # one column chunk of a 4000x6000 mosaic (wp -> 1152)
        tiles = args or [88, 112, 136, 160, 184, 208, 232]
    rng = np.random.default_rng(0)
    planes = tuple(
        jax.device_put(jnp.asarray(rng.random((h2, w2), np.float32)))
        for _ in range(4)
    )
    mat = jnp.asarray(np.eye(3), jnp.float32)
    wb = jnp.asarray([2.0, 1.0, 1.5], jnp.float32)

    for tile in tiles:
        t0 = time.time()
        try:
            def run(ps, tile=tile):
                out = ahd_mega_pallas(ps, mat, wb, False, 1, tile_h=tile)
                return out[0] if out is not None else ps[0]

            dt = timed_loop(run, planes, iters=8)
            mp = 4 * h2 * w2 / 1e6
            print(
                f"tile={tile}: {dt*1e3:7.2f} ms/chunk = {mp/dt:7.1f} MP/s "
                f"(wall {time.time()-t0:.0f}s)",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001
            msg = str(e).split("\n", 1)[0][:160]
            print(f"tile={tile}: FAILED {type(e).__name__}: {msg}", flush=True)


if __name__ == "__main__":
    main()
