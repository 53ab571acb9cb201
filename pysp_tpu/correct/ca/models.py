"""Radial lens-distortion models for chromatic-aberration correction.

Reference behavior: /root/reference/corr_ca/model/ — abstract model + radial coordinate
field machinery (generic.py), Poly3 (poly3.py: ``Rd = k1 Ru^3 + (1-k1) Ru``, median
fit), Poly5 (poly5.py: ``Rd = Ru + h1 Ru^3 + h2 Ru^5``, least squares), PTLens
(ptlens.py: ``Rd = a Ru^4 + b Ru^3 + c Ru^2 + (1-a-b-c) Ru``, least squares), and the
generic Newton-Raphson inversion (generic.py:161-204).

Split of labor:
- coefficient fitting: host NumPy (a handful of scalar samples, lstsq/median)
- coordinate fields: device jnp. The reference builds the top-left quadrant with a
  mirrored radius table (generic.py:19-39); since that construction equals
  ``|pos - center|`` exactly, the field is computed directly at full resolution here —
  same values, no mirror bookkeeping.
- Newton inversion: fixed ``max_iterations`` lax loop (the reference's data-dependent
  early-exit at epsilon is dropped; iteration count is tiny and fixed-trip keeps it
  jittable — documented divergence).

Also includes the standalone lensfun Poly3 remap (corr_ca_poly3.py:5-72), which the
reference keeps as a separate path.
"""
from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


def radius_field(shape: Tuple[int, int]) -> Array:
    """Normalized radius at every pixel center; 1.0 at the image corner
    (generic.py:19-39 computed directly)."""
    h, w = shape
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    ys = jnp.abs(jnp.arange(h, dtype=jnp.float32) - cy)[:, None]
    xs = jnp.abs(jnp.arange(w, dtype=jnp.float32) - cx)[None, :]
    r = jnp.sqrt(ys * ys + xs * xs)
    r_corner = float(np.hypot(cy, cx))
    return r / r_corner


class CaCorrectionModel(ABC):
    """Abstract radial model (generic.py:41-55)."""

    @abstractmethod
    def compute_coefficients(self, r_distorted_undistorted: np.ndarray) -> bool:
        ...

    @abstractmethod
    def get_coefficients(self) -> np.ndarray:
        ...

    @abstractmethod
    def get_distorted(self, undistorted: Array) -> Array:
        ...

    def get_distorted_coordinates(self, image: Array) -> Array:
        """(H, W, 2) center-relative (dy, dx) offsets mapping undistorted sampling
        points to their distorted locations (generic.py:57-101)."""
        return self._coordinates(image, self.get_distorted)

    def get_distorted_coordinates_window(
        self, n_rows: int, row0, full_shape: Tuple[int, int]
    ) -> Array:
        """Forward offsets for output rows [row0, row0+n_rows) of a FULL frame.

        Same values as ``get_distorted_coordinates(full_image)[row0:row0+n_rows]``
        but computed directly at the absolute rows — the spatial row-sharding
        primitive (each shard builds only its own window of the coordinate
        field; ``row0`` may be a traced scalar such as a shard index)."""
        return self._coordinates_window(
            n_rows, row0, full_shape, self.get_distorted
        )

    def _coordinates_window(
        self, n_rows: int, row0, full_shape: Tuple[int, int], radial_fn
    ) -> Array:
        h, w = full_shape
        cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
        r_corner = float(np.hypot(cy, cx))

        ys = (jnp.arange(n_rows, dtype=jnp.float32) + row0 - cy)[:, None]
        xs = (jnp.arange(w, dtype=jnp.float32) - cx)[None, :]
        r = jnp.sqrt(ys * ys + xs * xs) / r_corner

        scale = radial_fn(r) / r  # never 0/0: min radius is 0.5px for even dims
        dy = jnp.broadcast_to(ys, (n_rows, w)) * scale
        dx = jnp.broadcast_to(xs, (n_rows, w)) * scale
        return jnp.stack([dy, dx], axis=-1)

    def _coordinates(self, image: Array, radial_fn) -> Array:
        h, w = image.shape[-2], image.shape[-1]
        return self._coordinates_window(h, 0, (h, w), radial_fn)


class ReversibleModelMixin(ABC):
    """Any correction whose radial map can be inverted (generic.py:103-159)."""

    @abstractmethod
    def estimate_undistorted(
        self, distorted: Array, max_iterations: int = 8, max_epsilon: float = 1e-5
    ) -> Array:
        ...

    def get_undistorted_coordinates(self, image: Array) -> Array:
        """(H, W, 2) offsets mapping distorted sampling points to undistorted
        locations (generic.py:110-159)."""
        return self._coordinates(image, self.estimate_undistorted)

    def get_undistorted_coordinates_window(
        self, n_rows: int, row0, full_shape: Tuple[int, int]
    ) -> Array:
        """Inverse offsets for output rows [row0, row0+n_rows) of a FULL frame
        (see get_distorted_coordinates_window)."""
        return self._coordinates_window(
            n_rows, row0, full_shape, self.estimate_undistorted
        )


class NewtonRaphsonModel(CaCorrectionModel, ReversibleModelMixin):
    """Polynomial models inverted with Newton-Raphson (generic.py:161-204)."""

    @abstractmethod
    def _undistorted_to_distorted(self, undistorted: Array) -> Array:
        ...

    @abstractmethod
    def _undistorted_to_distorted_prime(self, undistorted: Array) -> Array:
        ...

    def get_distorted(self, undistorted: Array) -> Array:
        return self._undistorted_to_distorted(undistorted)

    def estimate_undistorted(
        self, distorted: Array, max_iterations: int = 8, max_epsilon: float = 1e-5
    ) -> Array:
        distorted = jnp.asarray(distorted)

        def body(_, und):
            return und - (
                (self._undistorted_to_distorted(und) - distorted)
                / self._undistorted_to_distorted_prime(und)
            )

        return jax.lax.fori_loop(0, max_iterations, body, jnp.zeros_like(distorted))


class Poly3CorrectionModel(NewtonRaphsonModel):
    """Rd = k1 Ru^3 + (1 - k1) Ru (poly3.py:7-46). Closed-form median fit.

    Intended-behavior fix (DIVERGENCES.md): the reference constructor clamps
    k1 to [0, 1] (poly3.py:22) while its own ``compute_coefficients`` assigns
    the unclamped median — and real CA fits routinely yield small NEGATIVE k1
    (one of R/B almost always scales below G). The clamp here is the model's
    actual validity domain instead: monotonicity of Rd(Ru) on [0, 1] requires
    Rd'(1) = 1 + 2 k1 > 0, so k1 in (-0.5, 1]. Without this, serializing a
    fitted negative k1 through the constructor (utils/sidecar.py) silently
    zeroed the correction.
    """

    def __init__(self, initial_k1: float = 0.0):
        self._k1 = min(1.0, max(float(initial_k1), -0.499))

    def _undistorted_to_distorted(self, und):
        return self._k1 * und**3 + (1.0 - self._k1) * und

    def _undistorted_to_distorted_prime(self, und):
        return 3.0 * self._k1 * und**2 + (1.0 - self._k1)

    def get_coefficients(self):
        return np.array((self._k1,))

    def compute_coefficients(self, r_distorted_undistorted: np.ndarray) -> bool:
        r_d = np.asarray(r_distorted_undistorted)[:, 0]
        r_ud = np.asarray(r_distorted_undistorted)[:, 1]
        # (Rd/Ru - 1) / (Ru^2 - 1) = k1; samples at Ru == 1 are indeterminate
        with np.errstate(divide="ignore", invalid="ignore"):
            k1 = ((r_d / r_ud) - 1.0) / (r_ud**2 - 1.0)
        self._k1 = float(np.nanmedian(k1))
        return True


class Poly5CorrectionModel(NewtonRaphsonModel):
    """Rd = Ru + h1 Ru^3 + h2 Ru^5 (poly5.py:4-79). Least-squares fit."""

    def __init__(self, h1: float = 0.0, h2: float = 0.0):
        self._h1 = float(h1)
        self._h2 = float(h2)

    def _undistorted_to_distorted(self, und):
        r2 = und * und
        return und * (1.0 + r2 * (self._h1 + r2 * self._h2))

    def _undistorted_to_distorted_prime(self, und):
        r2 = und * und
        return 1.0 + r2 * (3.0 * self._h1 + 5.0 * self._h2 * r2)

    def get_coefficients(self):
        return np.array((self._h1, self._h2))

    def compute_coefficients(self, r_distorted_undistorted: np.ndarray) -> bool:
        r_d = np.asarray(r_distorted_undistorted)[:, 0]
        r_ud = np.asarray(r_distorted_undistorted)[:, 1]
        g = r_d - r_ud
        m = np.stack([r_ud**3, r_ud**5], axis=1)
        try:
            solution, *_ = np.linalg.lstsq(m, g, rcond=None)
            self._h1, self._h2 = (float(v) for v in solution)
            return True
        except np.linalg.LinAlgError:
            return False


class PtLensCorrectionModel(NewtonRaphsonModel):
    """Rd = a Ru^4 + b Ru^3 + c Ru^2 + (1-a-b-c) Ru (ptlens.py:17-92)."""

    def __init__(self, a: float = 0.0, b: float = 0.0, c: float = 0.0):
        self._a = float(a)
        self._b = float(b)
        self._c = float(c)

    def _undistorted_to_distorted(self, und):
        d = 1.0 - self._a - self._b - self._c
        return und * (d + und * (self._c + und * (self._b + und * self._a)))

    def _undistorted_to_distorted_prime(self, und):
        d = 1.0 - self._a - self._b - self._c
        return d + und * (2.0 * self._c + und * (3.0 * self._b + und * 4.0 * self._a))

    def get_coefficients(self):
        return np.array((self._a, self._b, self._c))

    def compute_coefficients(self, r_distorted_undistorted: np.ndarray) -> bool:
        r_d = np.asarray(r_distorted_undistorted)[:, 0]
        r_ud = np.asarray(r_distorted_undistorted)[:, 1]
        g = (r_d / r_ud) - 1.0
        m = np.stack([r_ud**3 - 1.0, r_ud**2 - 1.0, r_ud - 1.0], axis=1)
        try:
            solution, *_ = np.linalg.lstsq(m, g, rcond=None)
            self._a, self._b, self._c = (float(v) for v in solution)
            return True
        except np.linalg.LinAlgError:
            return False


def lensfun_poly3_remap_coords(
    shape: Tuple[int, int],
    poly3_b: float,
    poly3_c: float,
    poly3_v: float,
    max_iterations: int = 8,
) -> Tuple[Array, Array]:
    """Lensfun Poly3 ``Rd = b Ru^3 + c Ru^2 + v Ru`` inverse remap field
    (corr_ca_poly3.py:5-72). Returns (map_x, map_y) for remap_bilinear."""
    h, w = shape
    c_y, c_x = (h - 1) / 2.0, (w - 1) / 2.0
    max_radius = float(np.hypot(c_y, c_x))

    ys = (jnp.arange(h, dtype=jnp.float32) - c_y)[:, None]
    xs = (jnp.arange(w, dtype=jnp.float32) - c_x)[None, :]
    r_dist = jnp.sqrt(
        jnp.broadcast_to(ys * ys, (h, w)) + jnp.broadcast_to(xs * xs, (h, w))
    ) / max_radius

    def f(r):
        return poly3_b * r**3 + poly3_c * r**2 + poly3_v * r

    def f_prime(r):
        return 3.0 * poly3_b * r**2 + 2.0 * poly3_c * r + poly3_v

    def body(_, und):
        return und - (f(und) - r_dist) / f_prime(und)

    r_undist = jax.lax.fori_loop(0, max_iterations, body, jnp.zeros_like(r_dist))

    ratio = r_dist / r_undist
    new_x = jnp.broadcast_to(xs, (h, w)) * ratio + c_x
    new_y = jnp.broadcast_to(ys, (h, w)) * ratio + c_y
    return new_x, new_y
