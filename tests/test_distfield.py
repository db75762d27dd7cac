"""Distance-field acceleration: exact-build check vs brute force, and march
parity vs the per-ray oracle (same tier as the pyramid parity tests)."""

import jax.numpy as jnp
import numpy as np
import pytest

from vxtpu.camera.camera import Camera
from vxtpu.camera.rays import generate_rays
from vxtpu.render.kernel_ref import make_march_ref
from vxtpu.render.kernel_xla import make_march_xla
from vxtpu.render.pipeline import render_image
from vxtpu.render.settings import RenderSettings
from vxtpu.world import distfield, procgen
from vxtpu.world.lights import Lights

DIMS = (32, 32, 32)


def brute_force_chebyshev(occ, cap):
    occ = np.asarray(occ) > 0
    pts = np.argwhere(occ)
    out = np.full(occ.shape, cap, np.int32)
    it = np.ndindex(occ.shape)
    for p in it:
        if occ[p]:
            out[p] = 0
            continue
        d = np.abs(pts - np.asarray(p)).max(axis=1).min() if len(pts) else cap
        out[p] = min(d, cap)
    return out.astype(np.uint8)


def test_build_exact_small():
    occ = np.zeros((9, 9, 9), np.uint8)
    occ[2, 3, 4] = 1
    occ[7, 7, 1] = 2
    cap = 6
    df = distfield.build_distance_field(jnp.asarray(occ), cap=cap)
    np.testing.assert_array_equal(np.asarray(df), brute_force_chebyshev(occ, cap))


def test_build_empty_and_full():
    cap = 5
    empty = distfield.build_distance_field(jnp.zeros((8, 8, 8), jnp.uint8), cap=cap)
    assert (np.asarray(empty) == cap).all()
    full = distfield.build_distance_field(jnp.ones((8, 8, 8), jnp.uint8), cap=cap)
    assert (np.asarray(full) == 0).all()


def scenes():
    return {
        "box": procgen.solid_box(DIMS, (8, 8, 8), (24, 24, 20)),
        "sphere": procgen.shell_sphere(DIMS),
        "terrain": procgen.terrain(DIMS, seed=11),
    }


def cameras():
    return {
        "outside": Camera.make(pos=(-20.0, 16.0, 40.0)).look_at((16.0, 16.0, 12.0)),
        "inside": Camera.make(pos=(16.0, 16.0, 28.0), yaw=2.2, pitch=-0.5),
    }


@pytest.mark.parametrize("scene_name", ["box", "sphere", "terrain"])
@pytest.mark.parametrize("cam_name", ["outside", "inside"])
def test_march_parity_distfield(scene_name, cam_name):
    grid = scenes()[scene_name]
    cam = cameras()[cam_name]
    settings = RenderSettings()
    occ_flat = grid.occupancy.reshape(-1)
    df = distfield.build(grid.occupancy, cap=12)
    ref = make_march_ref(occ_flat, DIMS, settings, None)
    fast = make_march_xla(occ_flat, DIMS, settings, df)
    o, d = generate_rays(cam, 48, 48)
    r, f = ref(o, d), fast(o, d)
    hit_r, hit_f = np.array(r.hit), np.array(f.hit)
    agree = (hit_r == hit_f).mean()
    assert agree > 0.998, f"hit mask agreement {agree}"
    both = hit_r & hit_f
    np.testing.assert_allclose(
        np.array(r.t)[both], np.array(f.t)[both], rtol=1e-4, atol=1e-3
    )
    same_vox = (np.array(r.voxel)[both] == np.array(f.voxel)[both]).all(axis=-1)
    assert same_vox.mean() > 0.998
    nr, nf = np.array(r.normal)[both], np.array(f.normal)[both]
    assert (np.abs(nr - nf) < 1e-6).all(axis=-1).mean() > 0.995


def test_step_count_reduction():
    """The point of the structure: far fewer lockstep iterations than fine DDA
    on a mostly-empty scene."""
    grid = procgen.terrain(DIMS, seed=11)
    cam = cameras()["outside"]
    settings = RenderSettings()
    occ_flat = grid.occupancy.reshape(-1)
    df = distfield.build(grid.occupancy, cap=12)
    plain = make_march_xla(occ_flat, DIMS, settings, None)
    accel = make_march_xla(occ_flat, DIMS, settings, df)
    o, d = generate_rays(cam, 32, 32)
    sp = np.array(plain(o, d).steps, np.float64).mean()
    sa = np.array(accel(o, d).steps, np.float64).mean()
    assert sa < 0.6 * sp, f"accel mean steps {sa} vs plain {sp}"


def test_shadowed_image_parity_distfield():
    grid = procgen.terrain(DIMS, seed=4)
    cam = cameras()["outside"]
    lights = Lights.single((48.0, -10.0, 55.0), intensity=2.5)
    settings = RenderSettings.full(pyramid_levels=0)
    df = distfield.build(grid.occupancy, cap=12)
    img_ref = render_image(make_march_ref, grid, cam, lights, settings, 32, 32, None)
    img_fast = render_image(make_march_xla, grid, cam, lights, settings, 32, 32, df)
    a, b = np.array(img_ref), np.array(img_fast)
    close = np.isclose(a, b, rtol=1e-3, atol=5e-3).all(axis=-1)
    assert close.mean() > 0.99, f"close frac {close.mean()}"


def test_t_max_shadow_semantics_distfield():
    grid = procgen.solid_box(DIMS, (20, 0, 0), (22, 32, 32))
    occ_flat = grid.occupancy.reshape(-1)
    df = distfield.build(grid.occupancy, cap=12)
    s = RenderSettings()
    o = jnp.asarray([[0.5, 16.0, 16.0]] * 2)
    d = jnp.asarray([[1.0, 0.0, 0.0]] * 2)
    t_max = jnp.asarray([10.0, 30.0])
    rec = make_march_xla(occ_flat, DIMS, s, df)(o, d, t_max=t_max)
    assert not bool(rec.hit[0])
    assert bool(rec.hit[1])
