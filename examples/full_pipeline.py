"""The maximal develop: every subsystem in one flow.

Builds a synthetic bracketed burst of DNGs (with CA, hot pixels, vignetting and an
embedded WarpRectilinear opcode), then runs the full production pipeline:

  decode -> hot-pixel heal -> flat-field -> HDR fuse -> blind CA fit + removal ->
  AHD develop (HDR branch) -> DNG opcode warp -> Oklab unsharp -> save PNG

Run: python examples/full_pipeline.py [outdir]
"""
from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from pysp_tpu import (
    DevelopConfig,
    Poly3CorrectionModel,
    QualityDemosaic,
    apply_opcode_3_warp,
    compute_ca_lens_models_for_raw,
    develop_to_image,
    encode_warp_rectilinear,
    find_erroneous_pixels_median,
    find_shared_pixels,
    flat_frame_correction,
    fuse_exposures_to_raw,
    get_opcode_3_block,
    lin_srgb_to_srgb,
    remove_ca_from_raw,
    repair_bad_pixels,
)
from pysp_tpu.core.frame import RawFrame
from pysp_tpu.io.image_out import save_image
from pysp_tpu.io.raw_loader import load_raw_dng
from pysp_tpu.io.tiff import write_synthetic_dng
from pysp_tpu.ops.resample import remap_bilinear
from pysp_tpu.utils.testing import mosaic_rggb, ring_chart
from pysp_tpu.utils.tracing import StageTimer


def make_burst(outdir: str, n: int = 3, size: int = 256):
    """Synthesize a bracketed DNG burst with CA + hot pixels + vignetting."""
    img = ring_chart(size, size, radii=(60, 90, 110), amp=0.5, base=0.25)
    rgb = np.dstack([img, img, img]).astype(np.float32)

    # lateral CA on R
    model = Poly3CorrectionModel(0.04)
    coords = np.asarray(model.get_undistorted_coordinates(jnp.zeros((size, size))))
    mx = np.clip(coords[..., 1] + (size - 1) / 2, 0, size - 1).astype(np.float32)
    my = np.clip(coords[..., 0] + (size - 1) / 2, 0, size - 1).astype(np.float32)
    rgb[..., 0] = np.asarray(remap_bilinear(jnp.asarray(rgb[..., 0]), mx, my))

    # vignetting
    yy, xx = np.mgrid[0:size, 0:size]
    r2 = ((yy - size / 2) ** 2 + (xx - size / 2) ** 2) / (size * size / 2)
    vignette = (1.0 - 0.3 * r2).astype(np.float32)

    paths = []
    rng = np.random.default_rng(0)
    for i in range(n):
        gain = 0.5 * (2.0**i) / (2.0 ** (n - 1))
        mosaic = mosaic_rggb(np.clip(rgb * gain * vignette[..., None], 0, 1))
        counts = np.clip(mosaic * 3839 + 256, 0, 4095).astype(np.uint16)
        # hot pixels
        for _ in range(6):
            y, x = rng.integers(4, size - 4, 2)
            counts[y, x] = 4095
        block = encode_warp_rectilinear(
            [(1.01, -0.03, 0.0, 0.0, 0.0, 0.0)] * 3, (0.5, 0.5)
        )
        path = os.path.join(outdir, f"burst_{i}.dng")
        with open(path, "wb") as f:
            f.write(
                write_synthetic_dng(
                    counts,
                    opcode_list_3=block,
                    exposure_time=(1, 100 * 2 ** (n - 1 - i)),
                    compression=1,
                )
            )
        paths.append(path)
    return paths, vignette


def main(outdir: str = "/tmp/pysp_demo") -> str:
    os.makedirs(outdir, exist_ok=True)
    timer = StageTimer()

    with timer("synthesize"):
        paths, vignette = make_burst(outdir)

    with timer("decode"):
        frames = [load_raw_dng(p) for p in paths]

    with timer("hot_pixels"):
        masks = [find_erroneous_pixels_median(f, quantile=0.999) for f in frames]
        shared = find_shared_pixels(masks, min_ratio=0.5)
        frames = [repair_bad_pixels(f, shared) for f in frames]

    with timer("flat_field"):
        flat = RawFrame.synthetic(mosaic_rggb(np.dstack([vignette] * 3)))
        frames = [flat_frame_correction(f, flat) for f in frames]

    with timer("hdr_fuse"):
        batch = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *frames)
        hdr, _counts = fuse_exposures_to_raw(batch)

    with timer("ca_fit"):
        model_r, model_b = compute_ca_lens_models_for_raw(
            hdr,
            init_model_r=Poly3CorrectionModel(),
            init_model_b=None,
            max_distortion_additional_scale=0.06,
        )

    with timer("ca_remove"):
        hdr = remove_ca_from_raw(hdr, model_r, None)

    with timer("develop"):
        cfg = DevelopConfig(quality=QualityDemosaic.Best, postprocess_stages=1)
        dev = develop_to_image(hdr, cfg)
        lin = dev.to_lin_srgb(clip_highlights=False)

    with timer("dng_warp"):
        block = get_opcode_3_block(paths[0])
        lin = apply_opcode_3_warp(lin, block, interpolation="bilinear")

    with timer("sharpen_and_encode"):
        from pysp_tpu import unsharp_mask_lab

        lin = unsharp_mask_lab(jnp.clip(lin, 0, 1), radius=1.0, amount=0.3)
        srgb = np.asarray(lin_srgb_to_srgb(lin))

    out_path = os.path.join(outdir, "developed.png")
    save_image(out_path, srgb)

    print(timer.report())
    print(f"fitted CA k1 = {float(model_r.get_coefficients()[0]):.4f} (true 0.04)")
    print(f"-> {out_path}")
    return out_path


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/pysp_demo")
