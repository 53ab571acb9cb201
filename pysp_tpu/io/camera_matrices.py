"""Per-camera XYZ->camera color matrices for formats that embed none.

DNGs carry ColorMatrix1/2 in EXIF, but native formats like CR2 do not — the
reference gets them from libraw's embedded per-camera Adobe tables
(image.py:224 via rawpy). This registry plays that role for the built-in
decoders: matrices are keyed by the EXIF Model string and can be registered at
runtime (``register_camera_matrices``) or supplied per-call to the loaders.

When a model is unknown, ``generic_matrices()`` returns an sRGB-primaries
fallback (the sensor is treated as an ideal Rec.709 camera): develops stay
well-behaved but colorimetry is approximate — a documented divergence
(DIVERGENCES.md) rather than a hard failure, since WB still comes from the
file's as-shot metadata.
"""
from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from ..colorimetry.illuminants import StandardIlluminantSeries, xy_to_xyz
from ..colorimetry.spaces import LinRgbColorspace, MatXyzToCamera

# model string (EXIF 0x0110, stripped) -> list of (xyz->cam 3x3, white xy, series)
_REGISTRY: Dict[str, List[MatXyzToCamera]] = {}

_D65_XY = (0.31272, 0.32903)
_STD_A_XY = (0.44758, 0.40745)


def register_camera_matrices(model: str, mats: List[MatXyzToCamera]) -> None:
    """Register calibration matrices for an EXIF model string."""
    _REGISTRY[model.strip()] = list(mats)


def lookup_camera_matrices(model: Optional[str]) -> Optional[List[MatXyzToCamera]]:
    if model is None:
        return None
    return _REGISTRY.get(model.strip())


def generic_matrices() -> List[MatXyzToCamera]:
    """Fallback: treat the sensor as an ideal Rec.709/D65 camera.

    The XYZ->linear-sRGB matrix stands in for the missing per-camera
    calibration; the WB controller still blends per-file as-shot neutrals.
    """
    d65 = xy_to_xyz(_D65_XY)
    mat = np.linalg.inv(LinRgbColorspace.REC709.mat_to_xyz(tuple(d65)))
    return [
        MatXyzToCamera(mat, d65, StandardIlluminantSeries.SERIES_DAYLIGHT),
    ]
