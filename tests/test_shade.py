"""Shading: analytic single-light cases (SURVEY.md §5 unit tier)."""

import jax.numpy as jnp
import numpy as np

from vxtpu.camera.camera import Camera
from vxtpu.render.kernel_ref import make_march_ref
from vxtpu.render.pipeline import render_image, render_rays
from vxtpu.render.settings import RenderSettings
from vxtpu.render.shade import sky_color
from vxtpu.world import procgen
from vxtpu.world.lights import Lights

DIMS = (16, 16, 16)


def test_sky_gradient():
    s = RenderSettings()
    up = sky_color(jnp.asarray([[0.0, 0.0, 1.0]]), s)
    dn = sky_color(jnp.asarray([[0.0, 0.0, -1.0]]), s)
    assert np.allclose(np.array(up)[0], s.sky_top, atol=1e-6)
    assert np.allclose(np.array(dn)[0], s.sky_horizon, atol=1e-6)


def _render_face(lights, settings):
    """Look straight at the -x face of a box, light placed on the -x side."""
    grid = procgen.solid_box(DIMS, (8, 0, 0), (16, 16, 16), material=4)
    cam = Camera.make(pos=(0.5, 8.0, 8.0), yaw=0.0, pitch=0.0, fov_y_deg=40.0)
    return np.array(render_image(make_march_ref, grid, cam, lights, settings, 9, 9))


def test_lambert_head_on_vs_grazing():
    settings = RenderSettings(shading="lambert", ambient=0.0)
    # head-on light -> bright
    bright = _render_face(Lights.single((2.0, 8.0, 8.0), intensity=1.0), settings)
    # light exactly in the face plane -> n.l = 0 -> black (ambient 0)
    dark = _render_face(Lights.single((8.0001, 8.0, 30.0), intensity=1.0), settings)
    assert bright[4, 4].mean() > 0.1
    assert dark[4, 4].mean() < 1e-3


def test_ambient_floor():
    settings = RenderSettings(shading="lambert", ambient=0.5)
    img = _render_face(Lights.none(), settings)
    # stone albedo ~0.5 * ambient 0.5 = 0.25ish
    assert 0.15 < img[4, 4].mean() < 0.35


def test_shadow_blocks_light():
    """A wall between surface and light zeroes the diffuse term."""
    grid = procgen.solid_box(DIMS, (8, 0, 0), (16, 16, 16), material=4)
    # occluder slab fully covering the light direction
    occ = grid.occupancy.at[4:5, :, :].set(4)
    grid = grid.replace(occupancy=occ)
    cam = Camera.make(pos=(0.5, 8.0, 8.0), yaw=0.0, fov_y_deg=40.0)
    lights = Lights.single((6.0, 8.0, 8.0), intensity=1.0)  # behind the slab
    s_no = RenderSettings(shading="lambert", ambient=0.0, shadows=False)
    s_sh = RenderSettings(shading="lambert", ambient=0.0, shadows=True)
    img_no = np.array(render_image(make_march_ref, grid, cam, lights, s_no, 9, 9))
    img_sh = np.array(render_image(make_march_ref, grid, cam, lights, s_sh, 9, 9))
    # without shadows the camera sees the occluder slab front face (x=4),
    # which the light (at x=6, behind it) cannot light head-on... place
    # assertions on the visible surface: shadowed render must be darker.
    assert img_sh[4, 4].mean() <= img_no[4, 4].mean() + 1e-6
    assert img_sh[4, 4].mean() < 1e-3


def test_fog_fades_to_sky():
    settings = RenderSettings(shading="lambert", fog=True, fog_density=10.0)
    grid = procgen.solid_box(DIMS, (8, 0, 0), (16, 16, 16), material=4)
    cam = Camera.make(pos=(0.5, 8.0, 8.0), yaw=0.0, fov_y_deg=40.0)
    img = np.array(render_image(make_march_ref, grid, cam, Lights.none(), settings, 9, 9))
    sky = np.array(sky_color(jnp.asarray([[1.0, 0.0, 0.0]]), settings))[0]
    assert np.allclose(img[4, 4], sky, atol=0.02)


def test_flat_shading_distinguishes_faces():
    grid = procgen.solid_box(DIMS, (4, 4, 4), (12, 12, 12), material=3)
    cam = Camera.make(pos=(-6.0, -4.0, 20.0)).look_at((8.0, 8.0, 8.0))
    img = np.array(
        render_image(make_march_ref, grid, cam, Lights.none(), RenderSettings.flat(), 32, 32)
    )
    vals = {round(float(v), 3) for v in np.unique(img[..., 0].round(3))}
    assert len(vals) >= 3  # sky + at least two face brightnesses
