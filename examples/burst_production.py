"""Production burst workflow: fit once, develop everywhere, under the mesh.

The round-4 feature set end to end, the way a serving deployment would compose
it (every piece is additive over the reference, which is single-shot/在-place):

1. Write a synthetic burst of raw DNGs with a known chromatic aberration
   (the "camera").
2. Fit CA models on the FIRST frame only and persist them as a JSON sidecar
   (utils/sidecar.py — SURVEY §5's "persist fitted lens models").
3. Load the whole burst (threaded host decode), apply the sidecar's models
   burst-wide (remove_ca_from_raw's batched path: coordinate maps computed
   once, remaps launched burst-wide), and develop every frame data-parallel
   over the device mesh (develop_pipeline_sharded).
4. Save results through the native fast PNG writer.

Run (any backend; uses a virtual mesh when only one device exists):
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=4 \
        python -m examples.burst_production
"""
from __future__ import annotations

import os
import tempfile

import jax
import numpy as np

from pysp_tpu.const import QualityDemosaic
from pysp_tpu.correct.ca.gradfit import fit_ca_models_gradient
from pysp_tpu.correct.ca.removal import remove_ca_from_raw
from pysp_tpu.io.image_out import save_image
from pysp_tpu.io.raw_loader import load_burst
from pysp_tpu.io.tiff import write_synthetic_dng
from pysp_tpu.parallel.mesh import make_mesh
from pysp_tpu.parallel.pipeline_sharded import develop_pipeline_sharded
from pysp_tpu.pipeline.develop import DevelopConfig
from pysp_tpu.pipeline.pipeline import PipelineConfig
from pysp_tpu.utils.sidecar import load_sidecar, save_sidecar


def make_burst(tmpdir: str, n: int = 4, h: int = 96, w: int = 128):
    """Synthetic raw burst with genuine lateral CA baked in.

    "Removing" CA that isn't there mis-resamples R/B against G with the
    model's radial maps — i.e. it BAKES a real, known lateral aberration into
    the mosaic using the library's own resampling machinery; the gradient fit
    below recovers a correcting model of matching sign and scale.
    """
    from pysp_tpu.correct.ca.models import Poly3CorrectionModel
    from pysp_tpu.core.frame import RawFrame

    rng = np.random.default_rng(0)
    bake = Poly3CorrectionModel(-0.012)
    paths = []
    for i in range(n):
        yy, xx = np.mgrid[0:h, 0:w]
        scene = (
            0.3
            + 0.3 * np.sin(xx / 9.0 + 0.3 * i) * np.cos(yy / 7.0)
            + 0.15 * ((xx // 16) % 2)
            + 0.05 * rng.random((h, w))
        )
        bayer = np.clip(scene, 0.02, 0.98).astype(np.float32)
        aberrated = remove_ca_from_raw(RawFrame.synthetic(bayer), bake, bake)
        u16 = np.clip(
            np.asarray(aberrated.bayer) * 3600 + 260, 0, 4095
        ).astype(np.uint16)
        p = os.path.join(tmpdir, f"burst_{i:02d}.dng")
        with open(p, "wb") as f:
            f.write(write_synthetic_dng(u16))
        paths.append(p)
    return paths


def main() -> None:
    tmpdir = tempfile.mkdtemp(prefix="pysp_burst_")
    paths = make_burst(tmpdir)
    sidecar_path = os.path.join(tmpdir, "burst.json")

    # --- 1. fit on the first frame, persist ---------------------------------
    frames = load_burst(paths)
    first = jax.tree_util.tree_map(lambda leaf: leaf[0], frames)
    model_r, model_b = fit_ca_models_gradient(first, steps=60)
    save_sidecar(sidecar_path, ca_model_r=model_r, ca_model_b=model_b)
    print(f"[burst] fitted CA on frame 0 -> {sidecar_path}")

    # --- 2. replay across the burst, sharded over the mesh ------------------
    params = load_sidecar(sidecar_path)
    n_dev = max(1, min(len(paths), jax.device_count()))
    mesh = make_mesh((n_dev, 1), devices=jax.devices()[:n_dev])
    cfg = PipelineConfig(develop=DevelopConfig(quality=QualityDemosaic.Fast))
    out = np.asarray(
        develop_pipeline_sharded(
            frames,
            mesh,
            cfg,
            ca_model_r=params["ca_model_r"],
            ca_model_b=params["ca_model_b"],
        )
    )
    assert np.isfinite(out).all()
    print(f"[burst] developed {out.shape[0]} frames on a {n_dev}-device mesh")

    # --- 3. save through the fast PNG writer --------------------------------
    for i in range(out.shape[0]):
        save_image(os.path.join(tmpdir, f"out_{i:02d}.png"), out[i])
    print(f"[burst] wrote {out.shape[0]} PNGs under {tmpdir}")


if __name__ == "__main__":
    main()
