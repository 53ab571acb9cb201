"""Same-process sweep of AHD megakernel (plane shape x band height) combos,
hunting the VPU-peak regime found at 500x752/tile-168 (0.21 ms = ~peak) vs the
1/3-efficiency 2000x1016/tile-112 default. Tokens: H2xW2xTILE.

    python -m benchmarks.sweep_shapes 500x752x168 2000x1016x112 ...
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.timing import timed_loop
from pysp_tpu.ops.pallas_kernels import ahd_mega_pallas


def main() -> None:
    combos = []
    for tok in sys.argv[1:]:
        h2, w2, tile = (int(v) for v in tok.split("x"))
        combos.append((h2, w2, tile))
    rng = np.random.default_rng(0)
    mat = jnp.asarray(np.eye(3), jnp.float32)
    wb = jnp.asarray([2.0, 1.0, 1.5], jnp.float32)

    plane_cache = {}
    for h2, w2, tile in combos:
        if (h2, w2) not in plane_cache:
            plane_cache[(h2, w2)] = tuple(
                jax.device_put(jnp.asarray(rng.random((h2, w2), np.float32)))
                for _ in range(4)
            )
        planes = plane_cache[(h2, w2)]
        # Small kernels need many iterations: timed_loop's two dispatches carry
        # fluctuating tunnel RTT (+-ms), so total in-loop work must dwarf it.
        iters = max(8, min(256, int(200e6 / (h2 * w2))))
        t0 = time.time()
        try:
            dt = timed_loop(
                lambda ps, t=tile: ahd_mega_pallas(ps, mat, wb, False, 1, tile_h=t)[0],
                planes,
                iters=iters,
            )
            mp = 4 * h2 * w2 / 1e6
            print(
                f"{h2}x{w2} tile={tile}: {dt*1e3:7.2f} ms = {mp/dt:7.1f} MP/s "
                f"({dt/mp*1e6:6.0f} ps/px, wall {time.time()-t0:.0f}s)",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001
            print(f"{h2}x{w2} tile={tile}: FAILED "
                  f"{type(e).__name__}: {str(e).splitlines()[0][:120]}", flush=True)


if __name__ == "__main__":
    main()
