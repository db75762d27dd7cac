"""Parity: the experimental Pallas trilinear-gather kernel
(render/kernel_trilerp) must reproduce soft.trilinear — including samples
outside the grid (edge clamp), tiny windows that force fetch-loop rounds,
and non-tile-multiple sample counts."""

import numpy as np

import jax
import jax.numpy as jnp

from vxtpu.render.kernel_trilerp import build_field_morton, trilerp_pallas
from vxtpu.render.soft import trilinear

DIM = 32


def _field_and_points(n=2048, seed=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    field = jax.random.normal(k1, (DIM, DIM, DIM), jnp.float32)
    # spatially-coherent points (ray-like): cluster centers + jitter,
    # with some outside the grid to exercise the clamp
    nc = -(-n // 64)
    centers = jax.random.uniform(k2, (nc, 3), minval=-2.0,
                                 maxval=DIM + 2.0)
    jit = jax.random.normal(jax.random.PRNGKey(seed + 1), (nc, 64, 3))
    p = (centers[:, None, :] + 0.8 * jit).reshape(-1, 3)[:n]
    return field, p


def test_trilerp_matches_reference():
    field, p = _field_and_points()
    want = np.asarray(trilinear(field, p, (DIM, DIM, DIM)))
    tbl = build_field_morton(field)
    got = np.asarray(trilerp_pallas(tbl, p, DIM, window=64, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_trilerp_tiny_window_and_ragged_n():
    field, p = _field_and_points(n=1500, seed=3)
    want = np.asarray(trilinear(field, p, (DIM, DIM, DIM)))
    tbl = build_field_morton(field)
    got = np.asarray(trilerp_pallas(tbl, p, DIM, window=8, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
