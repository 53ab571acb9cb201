"""Correctness check of the anomalously-fast tile-168 regime at burst shapes:
compare ahd_mega_pallas outputs at tile 168 vs tile 112 (valid interiors must
match bit-for-bit — same formulas, same real halo data).
Run on TPU: python -m benchmarks.tile168_check"""
import jax
import jax.numpy as jnp
import numpy as np

from pysp_tpu.ops.pallas_kernels import ahd_mega_pallas


def main() -> None:
    rng = np.random.default_rng(0)
    h2, w2 = 500, 752
    planes = tuple(
        jax.device_put(jnp.asarray(rng.random((h2, w2), np.float32)))
        for _ in range(4)
    )
    mat = jnp.asarray(np.eye(3), jnp.float32)
    wb = jnp.asarray([2.0, 1.0, 1.5], jnp.float32)

    outs = {}
    for tile in (112, 168):
        o = ahd_mega_pallas(planes, mat, wb, False, 1, tile_h=tile)
        outs[tile] = [np.asarray(x) for x in o]
        print(f"tile {tile}: got {len(o)} planes", flush=True)

    m = 8  # ignore contaminated margins
    worst = 0.0
    n_bad = 0
    for a, b in zip(outs[112], outs[168]):
        d = np.abs(a[m:-m, m:-m] - b[m:-m, m:-m])
        worst = max(worst, float(d.max()))
        n_bad += int((d > 1e-5).sum())
    print(f"interior maxdiff {worst:.3e}, pixels>1e-5: {n_bad}", flush=True)


if __name__ == "__main__":
    main()
