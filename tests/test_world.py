"""World: procgen determinism, grid lookups, pyramid build/lookup
(SURVEY.md §5: "pyramid build (maxpool equivalence)")."""

import jax.numpy as jnp
import numpy as np

from vxtpu.world import procgen
from vxtpu.world.grid import occupancy_at, linear_index
from vxtpu.world.pyramid import build_pyramid, pyramid_lookup


def test_terrain_deterministic():
    a = procgen.terrain((32, 32, 32), seed=5).occupancy
    b = procgen.terrain((32, 32, 32), seed=5).occupancy
    assert np.array_equal(np.array(a), np.array(b))
    c = procgen.terrain((32, 32, 32), seed=6).occupancy
    assert not np.array_equal(np.array(a), np.array(c))


def test_terrain_occupancy_sane():
    occ = np.array(procgen.terrain((32, 32, 32), seed=1).occupancy)
    frac = (occ > 0).mean()
    assert 0.15 < frac < 0.9
    assert occ.max() <= 7


def test_solid_box_lookup():
    g = procgen.solid_box((16, 16, 16), (4, 4, 4), (8, 8, 8), material=3)
    flat = g.occupancy.reshape(-1)
    v = jnp.asarray([[5, 5, 5], [3, 5, 5], [8, 8, 8], [-1, 0, 0], [16, 0, 0]])
    got = np.array(occupancy_at(flat, v, (16, 16, 16)))
    assert list(got) == [3, 0, 0, 0, 0]


def test_linear_index_roundtrip():
    dims = (4, 5, 6)
    v = jnp.asarray([[3, 4, 5], [0, 0, 0], [1, 2, 3]])
    idx = np.array(linear_index(v, dims))
    assert list(idx) == [3 * 30 + 4 * 6 + 5, 0, 1 * 30 + 2 * 6 + 3]


def test_pyramid_maxpool_equivalence():
    g = procgen.terrain((32, 32, 32), seed=2)
    pyr = build_pyramid(g.occupancy, 3)
    occ = np.array(g.occupancy) > 0
    for li, lvl in enumerate(pyr.levels):
        k = 2 ** (li + 1)
        want = occ.reshape(32 // k, k, 32 // k, k, 32 // k, k).max(axis=(1, 3, 5))
        assert np.array_equal(np.array(lvl), want), f"level {li}"


def test_pyramid_lookup_matches_cells():
    g = procgen.solid_box((16, 16, 16), (0, 0, 0), (2, 2, 2))
    pyr = build_pyramid(g.occupancy, 2)
    v = jnp.asarray([[1, 1, 1], [3, 3, 3], [5, 1, 1], [15, 15, 15], [-1, 0, 0]])
    # level 0: cell size 2 -> only cell (0,0,0) occupied
    got0 = np.array(pyramid_lookup(pyr, 0, v))
    assert list(got0) == [True, False, False, False, False]
    # level 1: cell size 4 -> cell (0,0,0) covers [0,4)^3; voxel 5 is outside
    got1 = np.array(pyramid_lookup(pyr, 1, v))
    assert list(got1) == [True, True, False, False, False]


def test_pyramid_odd_dims_pad():
    occ = jnp.zeros((5, 6, 7), jnp.uint8).at[4, 5, 6].set(1)
    pyr = build_pyramid(occ, 2)
    assert pyr.levels[0].shape == (3, 3, 4)
    assert bool(pyramid_lookup(pyr, 0, jnp.asarray([4, 5, 6])))
