"""Name the 102 MP composition-gap culprit: optimized-HLO memory analysis.

The masked-stitch candidate was rejected at both scales; to aim round 6's
restructure, compare the COMPILED program's temp-buffer footprint and fusion
count at 24 vs 102 MP (jax AOT lower/compile + memory_analysis — the compiles
are already in the persistent cache from stitch_fuse_probe).

Run on TPU: python -m benchmarks.stitch_hlo_probe
"""
from __future__ import annotations


def main() -> None:
    import jax
    import numpy as np

    from benchmarks.cache import enable_compile_cache

    enable_compile_cache()
    from pysp_tpu.core.frame import RawFrame
    from pysp_tpu.demosaic import ahd_mega as M

    for h, w in ((4000, 6000), (8736, 11648)):
        frame = RawFrame.synthetic(np.zeros((h, w), np.float32))

        def dev(bayer):
            fr = frame.replace(bayer=bayer)
            r, g, b = M.develop_channels_mega(fr, 1, True, True)
            return r + g + b

        lowered = jax.jit(dev).lower(frame.bayer)
        compiled = lowered.compile()
        mem = compiled.memory_analysis()
        mp = h * w / 1e6
        print(f"{mp:5.1f} MP: temp {mem.temp_size_in_bytes/1e6:8.1f} MB, "
              f"output {mem.output_size_in_bytes/1e6:8.1f} MB, "
              f"argument {mem.argument_size_in_bytes/1e6:8.1f} MB", flush=True)
        txt = compiled.as_text()
        n_fusion = txt.count(" fusion(")
        n_copy = txt.count(" copy(")
        n_dus = txt.count("dynamic-update-slice")
        print(f"{mp:5.1f} MP: fusions {n_fusion}, copies {n_copy}, "
              f"dus {n_dus}, hlo {len(txt)/1e6:.1f} MB", flush=True)


if __name__ == "__main__":
    main()
