"""The develop pipeline: one jitted XLA program from normalized Bayer to sRGB.

This is the fused equivalent of the reference's canonical user flow
(README.md:55-63 / SURVEY.md §3.2):

    image.demosaic(quality) -> .to_lin_srgb() -> lin_srgb_to_srgb(...)

``DevelopConfig`` is a frozen, hashable dataclass used as a static jit argument, so the
compiled program specializes per configuration (the TPU-native analog of the reference's
keyword-argument knobs; SURVEY.md §5 config row).

Batched develops: ``develop_burst`` vmaps over a leading frame axis — per-frame color
matrices and EVs ride along as vmapped pytree leaves.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..colorimetry.transforms import lin_srgb_to_srgb
from ..const import BayerPattern, QualityDemosaic
from ..core.bayer import reversible_transform_rggb
from ..core.frame import DevelopedImage, RawFrame
from ..demosaic import demosaic

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class DevelopConfig:
    """Static develop knobs (hashable — used as a static jit argument)."""

    quality: QualityDemosaic = QualityDemosaic.Best
    postprocess_stages: int = 1
    clip_highlights: bool = True
    gamma_encode: bool = True
    # Pallas stencil kernels (median, homogeneity) on TPU; ignored off-TPU.
    # Off by default: measured on v5e at 24MP, the XLA sorting-network/stencil
    # versions beat the banded manual-DMA kernels (pad copy + halo re-reads).
    use_pallas: bool = False


def develop_to_image(frame: RawFrame, cfg: DevelopConfig) -> DevelopedImage:
    """Demosaic + un-canonicalize to the source pattern orientation (image.py:177-183)."""
    dev = demosaic(frame, cfg.quality, cfg.postprocess_stages, cfg.use_pallas)
    if frame.source_pattern != BayerPattern.Rggb:
        dev = dev.replace(
            image=reversible_transform_rggb(dev.image, frame.source_pattern)
        )
    return dev


@partial(jax.jit, static_argnames=("cfg",))
def develop(frame: RawFrame, cfg: DevelopConfig = DevelopConfig()) -> Array:
    """Full develop: demosaic -> camera->lin-sRGB -> (optional) gamma encode."""
    dev = develop_to_image(frame, cfg)
    lin = dev.to_lin_srgb(clip_highlights=cfg.clip_highlights)
    if cfg.gamma_encode:
        return lin_srgb_to_srgb(lin)
    return lin


@partial(jax.jit, static_argnames=("cfg",))
def develop_burst(frames: RawFrame, cfg: DevelopConfig = DevelopConfig()) -> Array:
    """Develop a burst: every pytree leaf of ``frames`` carries a leading batch axis."""
    cfg = dataclasses.replace(cfg, use_pallas=False)
    return jax.vmap(lambda f: develop.__wrapped__(f, cfg))(frames)


@partial(jax.jit, static_argnames=("cfg",))
def develop_with_stats(frame: RawFrame, cfg: DevelopConfig = DevelopConfig()):
    """Develop + structured per-stage statistics, one fused program.

    The observability the reference lacks (SURVEY.md §5): sensor clip fractions and
    output saturation stats ride along as scalars — negligible extra compute, no
    extra HBM passes.
    """
    from ..utils.tracing import bayer_stats, rgb_stats

    stats = {"sensor": bayer_stats(frame.bayer, frame.lim_sat)}
    out = develop.__wrapped__(frame, cfg)
    stats["output"] = rgb_stats(out)
    return out, stats
