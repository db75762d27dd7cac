"""DDA invariants: the traversal must visit exactly the cells a trivial
integer line-stepper visits (SURVEY.md §5 "exact cell sequence vs a 20-line
Python int-stepper on tiny grids")."""

import jax.numpy as jnp
import numpy as np
import pytest

from vxtpu.render import dda


def python_dda(o, d, dims, max_steps=200):
    """The obviously-correct scalar reference: list of visited cells."""
    o = np.asarray(o, np.float64)
    d = np.asarray(d, np.float64)
    inv = np.where(np.abs(d) > 1e-12, 1.0 / np.where(d == 0, 1, d), 1e30)
    t0 = (0 - o) * inv
    t1 = (np.asarray(dims) - o) * inv
    tnear, tfar = np.minimum(t0, t1), np.maximum(t0, t1)
    t_enter = max(tnear.max(), 0.0)
    t_exit = tfar.min()
    if t_enter > t_exit:
        return []
    p = o + (t_enter + 1e-4) * d
    v = np.clip(np.floor(p).astype(int), 0, np.asarray(dims) - 1)
    step = np.where(d >= 0, 1, -1)
    nb = np.where(d >= 0, v + 1, v).astype(np.float64)
    t_next = np.where(np.abs(d) > 1e-12, (nb - o) * inv, 3e30)
    t_delta = np.abs(inv)
    cells = [tuple(v)]
    for _ in range(max_steps):
        a = int(np.argmin(t_next))
        v = v.copy()
        v[a] += step[a]
        t_next = t_next.copy()
        t_next[a] += t_delta[a]
        if not ((0 <= v).all() and (v < np.asarray(dims)).all()):
            break
        cells.append(tuple(v))
    return cells


def jax_dda_cells(o, d, dims, n):
    o = jnp.asarray(o, jnp.float32)
    d = jnp.asarray(d, jnp.float32)
    t_enter, t_exit, valid = dda.ray_grid_clip(o, d, dims)
    assert bool(valid)
    v, t_next, t_delta, step = dda.dda_init(o, d, t_enter, dims)
    cells = [tuple(int(x) for x in v)]
    for _ in range(n):
        v, t_next, t_cross, mask = dda.dda_advance(v, t_next, t_delta, step)
        vv = np.array(v)
        if not ((vv >= 0).all() and (vv < np.asarray(dims)).all()):
            break
        cells.append(tuple(vv))
    return cells


RAYS = [
    # axis-aligned
    ((-1.0, 3.5, 3.5), (1.0, 0.0, 0.0)),
    ((3.5, 8.5, 3.5), (0.0, -1.0, 0.0)),
    # diagonals
    ((-0.5, -0.5, -0.5), (1.0, 1.0, 1.0)),
    ((-1.0, 0.3, 7.7), (0.9, 0.3, -0.8)),
    ((8.5, 7.9, 0.1), (-0.7, -0.6, 0.4)),
    # starting inside
    ((3.2, 3.8, 3.1), (0.3, -0.9, 0.2)),
]


@pytest.mark.parametrize("o,d", RAYS)
def test_cell_sequence_matches_int_stepper(o, d):
    dims = (8, 8, 8)
    d = np.asarray(d, np.float64)
    d = tuple(d / np.linalg.norm(d))
    ref = python_dda(o, d, dims)
    got = jax_dda_cells(o, d, dims, 100)
    assert got == ref


def test_clip_miss():
    o = jnp.asarray([-5.0, -5.0, 20.0])
    d = jnp.asarray([0.0, 0.0, 1.0])
    _, _, valid = dda.ray_grid_clip(o, d, (8, 8, 8))
    assert not bool(valid)


def test_clip_inside_starts_at_zero():
    o = jnp.asarray([4.0, 4.0, 4.0])
    d = jnp.asarray([1.0, 0.0, 0.0])
    t_enter, t_exit, valid = dda.ray_grid_clip(o, d, (8, 8, 8))
    assert bool(valid)
    assert float(t_enter) == 0.0
    assert abs(float(t_exit) - 4.0) < 1e-5


def test_entry_face_mask_axis():
    # ray flying in -x direction hits the +x face => mask selects axis 0
    o = jnp.asarray([20.0, 4.0, 4.0])
    d = jnp.asarray([-1.0, 0.0, 0.0])
    m = dda.entry_face_mask(o, d, (8, 8, 8))
    assert np.array_equal(np.array(m), [True, False, False])


def test_face_normal_sign():
    mask = jnp.asarray([False, True, False])
    step = jnp.asarray([1, 1, -1])
    n = dda.face_normal(mask, step)
    assert np.array_equal(np.array(n), [0.0, -1.0, 0.0])
