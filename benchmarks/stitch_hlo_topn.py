"""Name the disproportionate allocations: top fusion/copy outputs at 24 vs 102 MP.

Follow-up to stitch_hlo_probe (which measured 36 extra fusions and a temp/
output ratio growing 3.5x -> 4.9x): parse the compiled HLO's fusion/copy
output shapes at both scales and print the largest, so round 6 starts from
the exact producer chain that de-fuses. Compiles are cached from the earlier
probe, so this is cheap.

Run on TPU: python -m benchmarks.stitch_hlo_topn
"""
from __future__ import annotations

import re
from collections import Counter


def main() -> None:
    import jax
    import numpy as np

    from benchmarks.cache import enable_compile_cache

    enable_compile_cache()
    from pysp_tpu.core.frame import RawFrame
    from pysp_tpu.demosaic import ahd_mega as M

    shape_re = re.compile(
        r"=\s+(f32|s32|u32|pred|bf16|u16|s16|u8|s8)\[([\d,]*)\][^ ]*\s+(fusion|copy)\("
    )
    dt_bytes = {"f32": 4, "s32": 4, "u32": 4, "bf16": 2, "u16": 2, "s16": 2,
                "u8": 1, "s8": 1, "pred": 1}

    reports = {}
    for h, w in ((4000, 6000), (8736, 11648)):
        frame = RawFrame.synthetic(np.zeros((h, w), np.float32))

        def dev(bayer):
            fr = frame.replace(bayer=bayer)
            r, g, b = M.develop_channels_mega(fr, 1, True, True)
            return r + g + b

        txt = jax.jit(dev).lower(frame.bayer).compile().as_text()
        sizes = Counter()
        for m in shape_re.finditer(txt):
            dt, dims, kind = m.groups()
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            sizes[(kind, dims)] += n * dt_bytes[dt]
        reports[(h, w)] = sizes
        mp = h * w / 1e6
        total = sum(sizes.values()) / 1e6
        print(f"{mp:5.1f} MP: {total:8.1f} MB across fusion/copy outputs; top 12:",
              flush=True)
        for (kind, dims), b in sizes.most_common(12):
            print(f"    {b/1e6:9.1f} MB  {kind:6s} [{dims}]", flush=True)

    # disproportionate growth: 102 MP bytes / 24 MP bytes per shape family,
    # normalized by the 4.24x pixel ratio (shape keys differ, compare totals
    # by kind)
    for kind in ("fusion", "copy"):
        a = sum(v for (k, _), v in reports[(4000, 6000)].items() if k == kind)
        b = sum(v for (k, _), v in reports[(8736, 11648)].items() if k == kind)
        ratio = (b / max(a, 1)) / ((8736 * 11648) / (4000 * 6000))
        print(f"{kind}: px-normalized byte growth x{ratio:.2f}", flush=True)


if __name__ == "__main__":
    main()
