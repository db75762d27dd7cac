"""Oracle parity: kernel_xla (batched, masked, pyramid-accelerated) must
reproduce kernel_ref (per-ray while_loop) — the core test tier (SURVEY.md §5,
BASELINE.json "must match a JAX-reference ... to allclose")."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vxtpu.camera.camera import Camera
from vxtpu.camera.rays import generate_rays
from vxtpu.render.kernel_ref import make_march_ref
from vxtpu.render.kernel_xla import make_march_xla
from vxtpu.render.pipeline import render_image
from vxtpu.render.settings import RenderSettings
from vxtpu.world import procgen
from vxtpu.world.lights import Lights
from vxtpu.world.pyramid import build_pyramid

DIMS = (32, 32, 32)


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
        "axis": Camera.make(pos=(16.0, 16.0, 60.0), pitch=-1.5707,),
    }


def _march_pair(grid, settings, pyramid_levels):
    occ_flat = grid.occupancy.reshape(-1)
    pyr = build_pyramid(grid.occupancy, pyramid_levels) if pyramid_levels else None
    s = settings
    ref = make_march_ref(occ_flat, DIMS, s, None)
    fast = make_march_xla(occ_flat, DIMS, s, pyr)
    return ref, fast


@pytest.mark.parametrize("scene_name", ["box", "sphere", "terrain"])
@pytest.mark.parametrize("cam_name", ["outside", "inside"])
@pytest.mark.parametrize("levels", [0, 2])
def test_march_parity(scene_name, cam_name, levels):
    grid = scenes()[scene_name]
    cam = cameras()[cam_name]
    settings = RenderSettings(pyramid_levels=levels)
    ref, fast = _march_pair(grid, settings, levels)
    o, d = generate_rays(cam, 48, 48)
    r = ref(o, d)
    f = fast(o, d)
    hit_r, hit_f = np.array(r.hit), np.array(f.hit)
    # hit masks must agree essentially everywhere (fp boundary pixels may
    # differ on grazing rays)
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


@pytest.mark.parametrize("levels", [0, 2])
def test_image_parity_terrain(levels):
    grid = procgen.terrain(DIMS, seed=11)
    cam = cameras()["outside"]
    lights = Lights.single((0.0, 16.0, 60.0), intensity=2.0)
    settings = RenderSettings(shading="lambert", pyramid_levels=levels)
    pyr = build_pyramid(grid.occupancy, levels) if levels else None
    img_ref = render_image(make_march_ref, grid, cam, lights, settings, 48, 48, None)
    img_fast = render_image(make_march_xla, grid, cam, lights, settings, 48, 48, pyr)
    a, b = np.array(img_ref), np.array(img_fast)
    # pixelwise: allow a tiny fraction of boundary pixels to differ
    close = np.isclose(a, b, rtol=1e-3, atol=2e-3).all(axis=-1)
    assert close.mean() > 0.995, f"close frac {close.mean()}"


def test_shadowed_image_parity():
    grid = procgen.terrain(DIMS, seed=4)
    cam = cameras()["outside"]
    lights = Lights.single((48.0, -10.0, 55.0), intensity=2.5)
    settings = RenderSettings.full(pyramid_levels=2)
    pyr = build_pyramid(grid.occupancy, 2)
    img_ref = render_image(make_march_ref, grid, cam, lights, settings, 32, 32, None)
    img_fast = render_image(make_march_xla, grid, cam, lights, settings, 32, 32, pyr)
    a, b = np.array(img_ref), np.array(img_fast)
    close = np.isclose(a, b, rtol=1e-3, atol=5e-3).all(axis=-1)
    assert close.mean() > 0.99, f"close frac {close.mean()}"


def test_t_max_shadow_semantics():
    """A shadow ray stopping before the light must not report hits past
    t_max (both kernels)."""
    grid = procgen.solid_box(DIMS, (20, 0, 0), (22, 32, 32))
    occ_flat = grid.occupancy.reshape(-1)
    s = RenderSettings()
    o = jnp.asarray([[0.5, 16.0, 16.0]] * 2)
    d = jnp.asarray([[1.0, 0.0, 0.0]] * 2)
    t_max = jnp.asarray([10.0, 30.0])  # wall at x=20
    for mk in (make_march_ref, make_march_xla):
        rec = mk(occ_flat, DIMS, s, None)(o, d, t_max=t_max)
        assert not bool(rec.hit[0])  # stops before the wall
        assert bool(rec.hit[1])      # reaches the wall
