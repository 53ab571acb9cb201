"""Develop ONE large (medium-format-class) frame with its rows over the mesh.

The round-5 capability end to end (SURVEY §2.10 item 63, closed): a single
frame too big for one chip's comfort runs its WHOLE config-5-shaped stage
chain — hot-pixel repair, blind CA removal, AHD develop, DNG rectilinear
warp — with rows sharded over the mesh's 'spatial' axis:

1. Write one synthetic DNG with a known CA + an embedded WarpRectilinear
   opcode (the "camera with a wide lens").
2. Load it, fit CA models, extract the OpcodeList3 block — all host-side.
3. develop_frame_spatial: one halo exchange whose width is the summed reach
   of every stage (displacement bounds + stencil reach, host-computed), then
   each device runs corrections (global statistics via rank/mean collectives),
   CA + warp on its own window of the full-frame coordinate fields, and the
   develop, shard-locally.
4. Compare interior rows against the monolithic pipeline.

Run (any backend; sized for the virtual CPU mesh — scale h/w up on real
chips):
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=4 \
        python -m examples.large_frame_sharded
"""
from __future__ import annotations

import numpy as np


def main() -> None:
    import jax

    from pysp_tpu.const import QualityDemosaic
    from pysp_tpu.correct.ca.models import Poly3CorrectionModel
    from pysp_tpu.correct.ca.removal import remove_ca_from_raw
    from pysp_tpu.io.raw_loader import load_raw
    from pysp_tpu.io.tiff import write_synthetic_dng
    from pysp_tpu.parallel.mesh import make_mesh
    from pysp_tpu.parallel.spatial_pipeline import develop_frame_spatial
    from pysp_tpu.pipeline.develop import DevelopConfig, develop
    from pysp_tpu.pipeline.pipeline import PipelineConfig
    from pysp_tpu.warp.opcodes import apply_opcode_3_warp, encode_warp_rectilinear

    n_sp = min(4, jax.device_count())
    h, w = 64 * n_sp * 2, 96  # tiny stand-in; the path is shape-generic

    # 1. the "camera": structured scene + a mild barrel warp opcode
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    scene = np.clip(
        2000 + 1400 * np.sin(xx / 7.0) * np.cos(yy / 11.0)
        + rng.normal(0, 30, (h, w)),
        300,
        3900,
    ).astype(np.uint16)
    block = encode_warp_rectilinear(
        [(1.004, -0.008, 0.0015, 0.0, 0.0002, -0.0001)] * 3, (0.5, 0.5)
    )
    dng = write_synthetic_dng(scene, opcode_list_3=block)

    # 2. host side: decode + models + opcode block
    frame = load_raw(dng)
    model = Poly3CorrectionModel(0.008)  # stand-in for a fitted model

    # 3. the sharded single-frame pipeline
    mesh = make_mesh((1, n_sp), devices=jax.devices()[:n_sp])
    cfg = PipelineConfig(
        develop=DevelopConfig(quality=QualityDemosaic.Best),
        repair_hot_pixels=True,
    )
    out = np.asarray(
        develop_frame_spatial(
            frame, mesh, cfg, ca_model_r=model, ca_model_b=model,
            warp_block=block, warp_interpolation="bilinear",
        )
    )
    print(f"sharded develop: {out.shape} over {n_sp} spatial shards")

    # 4. interior parity vs the monolithic composition
    from pysp_tpu.pipeline.pipeline import _correct_one

    f = _correct_one(frame, cfg, None, None, None)
    f = remove_ca_from_raw(f, model, model)
    want = np.asarray(
        apply_opcode_3_warp(
            develop(f, cfg.develop), block, interpolation="bilinear"
        )
    )
    edge = 48
    err = float(np.abs(out[edge:-edge] - want[edge:-edge]).max())
    print(f"interior max abs diff vs monolithic: {err:.2e}")
    assert err <= 3e-5, err
    print("OK")


if __name__ == "__main__":
    main()
