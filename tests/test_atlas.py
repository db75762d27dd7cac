"""Texture atlas (world/atlas.py, SURVEY.md §3 C17): face-textured hit
shading — UV anchoring, palette modulation, and pipeline integration."""

import jax.numpy as jnp
import numpy as np

from vxtpu.camera.camera import Camera
from vxtpu.render.kernel_xla import make_march_xla
from vxtpu.render.pipeline import render_image
from vxtpu.render.settings import RenderSettings
from vxtpu.world import procgen
from vxtpu.world.atlas import build_procedural_atlas, sample_atlas
from vxtpu.world.grid import MATERIAL_RGB
from vxtpu.world.lights import Lights

DIMS = (32, 32, 32)


def test_sample_atlas_uv_anchoring():
    T = 8
    atlas = build_procedural_atlas(tex_size=T, seed=1)
    # +z face of voxel (4,7,2): tangents (x,y); p frac (0.25, 0.5)
    p = jnp.array([[4.25, 7.5, 3.0]])
    n = jnp.array([[0.0, 0.0, 1.0]])
    mid = jnp.array([3], jnp.uint8)  # grass
    c = sample_atlas(atlas, mid, p, n)
    tu, tv = int(0.25 * T), int(0.5 * T)
    idx = (3 * T + tu) * T + tv
    expect = jnp.stack([atlas.channels[k][idx] for k in range(3)])
    np.testing.assert_allclose(np.asarray(c[0]), np.asarray(expect), rtol=1e-6)
    # texel is the palette color modulated within the generator's band
    ratio = np.asarray(c[0]) / np.asarray(MATERIAL_RGB[3])
    assert (ratio > 0.5).all() and (ratio < 1.6).all()


def test_textured_render_differs_on_hits_only():
    grid = procgen.terrain(DIMS, seed=11)
    cam = Camera.make(pos=(-20.0, 16.0, 40.0)).look_at((16.0, 16.0, 12.0))
    lights = Lights.single((0.0, 16.0, 60.0), intensity=2.0)
    s = RenderSettings(shading="lambert")
    atlas = build_procedural_atlas(tex_size=8, seed=2)

    plain = np.asarray(render_image(make_march_xla, grid, cam, lights, s,
                                    48, 48))
    tex = np.asarray(render_image(make_march_xla, grid, cam, lights, s,
                                  48, 48, atlas=atlas))
    assert tex.shape == plain.shape and np.isfinite(tex).all()
    diff = np.abs(tex - plain).sum(axis=-1)
    assert (diff > 1e-4).any(), "textures changed nothing"
    # sky pixels (no hit) must be identical
    sky = plain[0, :, :]  # top rows look above the horizon in this framing
    np.testing.assert_allclose(tex[0, :, :], sky, atol=1e-6)
