"""_stitch_edges (DUS border stitch) equals the former concat topology.

Non-slow guard for the megakernel border stitch: the slow interpret-mode
tests exercise it end-to-end; this locks the value-level equivalence of the
dynamic_update_slice formulation against the original two-concatenate one
on every size parity (odd/even interplay of f, s, h, w is where slicing
bugs would live).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest

from pysp_tpu.demosaic.ahd_band import margin_for
from pysp_tpu.demosaic.ahd_mega import _stitch_edges


@pytest.mark.parametrize("stages", [0, 1, 2])
@pytest.mark.parametrize("hw", [(128, 160), (132, 156)])
def test_stitch_edges_matches_concat(stages, hw):
    h, w = hw
    f = 2 * margin_for(stages)
    s = 2 * f + 8
    rng = np.random.default_rng(stages)
    c = jnp.asarray(rng.random((h, w), np.float32))
    t = jnp.asarray(rng.random((s, w), np.float32))
    bo = jnp.asarray(rng.random((s, w), np.float32))
    le = jnp.asarray(rng.random((h, s), np.float32))
    ri = jnp.asarray(rng.random((h, s), np.float32))

    ref = jnp.concatenate([t[:f, :], c[f : h - f, :], bo[s - f :, :]], axis=0)
    ref = jnp.concatenate([le[:, :f], ref[:, f : w - f], ri[:, s - f :]], axis=1)

    got = _stitch_edges(c, t, bo, le, ri, f, s, h, w)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
