"""Isolate the config-3 healing cost at 24 MP: detect, compaction, fills.

bench r2 measured config3 at 273 ms vs 17 ms bare Best — ~15x the expected
overhead. Suspects: jnp.nonzero's lowering (sort-class, ~160 ms at 24 MP per
BASELINE), the scatter-back, or the detect quantile. Run on TPU:
    python -m benchmarks.heal_probe
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.cache import enable_compile_cache

enable_compile_cache()

from benchmarks.timing import timed_loop  # noqa: E402
from pysp_tpu import RawFrame  # noqa: E402
from pysp_tpu.core.bayer import bayer_to_planes  # noqa: E402
from pysp_tpu.correct.bad_pixels import (  # noqa: E402
    find_erroneous_pixels_median,
    masked_fill_inpaint,
    masked_fill_inpaint_sparse,
    repair_bad_pixels,
)


def t(name, fn, *args, iters=4):
    t0 = time.time()
    dt = timed_loop(fn, *args, iters=iters)
    print(f"{name}: {dt*1e3:8.2f} ms  [wall {time.time()-t0:.0f}s]", flush=True)
    return dt


def main() -> None:
    H, W = 4000, 6000
    rng = np.random.default_rng(0)
    bayer = rng.random((H, W), np.float32)
    frame = jax.device_put(RawFrame.synthetic(bayer))
    planes = bayer_to_planes(frame.bayer)
    mask_np = np.zeros((4, H // 2, W // 2), bool)
    mask_np[rng.random((4, H // 2, W // 2)) < 1e-4] = True
    masks = jax.device_put(jnp.asarray(mask_np))
    print(f"sites={int(mask_np.sum())}", flush=True)

    t("detect (median+quantile)", lambda f: find_erroneous_pixels_median(f), frame)
    t("nonzero size=32768      ",
      lambda m: jnp.nonzero(m.reshape(-1), size=32768, fill_value=m.size)[0],
      masks)
    t("cumsum flat mask        ",
      lambda m: jnp.cumsum(m.reshape(-1).astype(jnp.int32))[-1], masks)
    t("dense fill 4+2          ",
      lambda p, m: masked_fill_inpaint(p, m), planes, masks)
    t("sparse fill 4+2         ",
      lambda p, m: masked_fill_inpaint_sparse(p, m), planes, masks)
    t("repair (cond dispatch)  ",
      lambda f, m: repair_bad_pixels(f, m).bayer, frame, masks)


if __name__ == "__main__":
    main()
