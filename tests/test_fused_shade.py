"""Parity: the fused IN-KERNEL shading epilogue (march_pallas_v2 with a
ShadeSpec / shade_pallas_v2) must reproduce the XLA shading pipeline
(render/pipeline.render_rays over the same kernel's HitRecord) to fp
tolerance — flat, lambert, full+fog, and the shadowed multi-pass
composition. The reference shades inside its kernel (SURVEY.md §4.3);
this locks our in-kernel shade to the shared shade.py semantics."""

import numpy as np
import pytest

import jax.numpy as jnp

from vxtpu.camera.camera import Camera
from vxtpu.camera.rays import generate_rays
from vxtpu.render.fused import render_rays_fused
from vxtpu.render.kernel_pallas_v2 import make_march_pallas_v2
from vxtpu.render.pipeline import render_rays
from vxtpu.render.settings import MarchTuning, RenderSettings
from vxtpu.world import procgen
from vxtpu.world.lights import Lights
from vxtpu.world.packed import build_material_morton, build_packed_morton

DIMS = (32, 32, 32)
H = W = 32


def _scene():
    grid = procgen.terrain(DIMS, seed=11)
    accel = build_packed_morton(grid.occupancy)
    mats = build_material_morton(grid.occupancy)
    return grid, accel, mats


def _xla_reference_rgb(grid, accel, o, d, lights, settings):
    """Same kernel, shade via the shared XLA pipeline."""
    occ_flat = grid.occupancy.reshape(-1)
    march = make_march_pallas_v2(occ_flat, DIMS, settings, accel=accel,
                                 image_shape=(H, W), interpret=True)
    rgb, rec = render_rays(march, o, d, grid.albedo(), DIMS, lights,
                           settings)
    return rgb, rec


CASES = {
    "flat": (RenderSettings(shading="flat"), 0),
    "lambert": (RenderSettings(shading="lambert"), 1),
    "full_fog": (RenderSettings(shading="full", fog=True), 2),
    "lambert_nolights": (RenderSettings(shading="lambert"), 0),
}


@pytest.mark.parametrize("case", sorted(CASES))
def test_fused_shade_matches_xla_pipeline(case):
    settings, n_lights = CASES[case]
    grid, accel, mats = _scene()
    if n_lights == 0:
        lights = Lights.none()
    elif n_lights == 1:
        lights = Lights.single((25.0, -10.0, 60.0), intensity=2.0)
    else:
        lights = Lights.make(
            [(25.0, -10.0, 60.0), (40.0, 48.0, 50.0)],
            [(1.0, 0.9, 0.8), (0.4, 0.5, 1.0)],
            [2.0, 1.2])
    cam = Camera.make(pos=(-20.0, 16.0, 40.0)).look_at((16.0, 16.0, 12.0))
    o, d = generate_rays(cam, H, W)
    want, _ = _xla_reference_rgb(grid, accel, o, d, lights, settings)
    got, rec = render_rays_fused(o, d, accel, mats, DIMS, lights, settings,
                                 image_shape=(H, W), interpret=True)
    assert bool(rec.hit.any())
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_fused_shade_shadowed_matches_xla_pipeline():
    """Shadows force the 3-pass composition (march -> shadow march ->
    fused shade kernel with vis channels)."""
    settings = RenderSettings(shading="full", shadows=True, fog=True)
    grid, accel, mats = _scene()
    lights = Lights.single((25.0, -10.0, 60.0), intensity=2.0)
    cam = Camera.make(pos=(-20.0, 16.0, 40.0)).look_at((16.0, 16.0, 12.0))
    o, d = generate_rays(cam, H, W)
    want, _ = _xla_reference_rgb(grid, accel, o, d, lights, settings)
    got, rec = render_rays_fused(o, d, accel, mats, DIMS, lights, settings,
                                 image_shape=(H, W), interpret=True)
    assert bool(rec.hit.any())
    # the shadow marches are separate kernels with identical semantics to
    # the pipeline's march closure -> same vis -> same image
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_fused_shade_tiny_mat_window():
    """The material-fetch mini-loop must converge (and agree) even when
    the window is far smaller than the tile's hit-cell spread."""
    settings = RenderSettings(
        shading="lambert", tuning=MarchTuning(window=2, split_window=False))
    grid, accel, mats = _scene()
    lights = Lights.single((25.0, -10.0, 60.0), intensity=2.0)
    cam = Camera.make(pos=(-20.0, 16.0, 40.0)).look_at((16.0, 16.0, 12.0))
    o, d = generate_rays(cam, H, W)
    want, _ = _xla_reference_rgb(grid, accel, o, d, lights, settings)
    got, _ = render_rays_fused(o, d, accel, mats, DIMS, lights, settings,
                               image_shape=(H, W), interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_material_table_roundtrip():
    """Every coarse cell's packed material word reproduces the 8 child
    ids (3 bits per child, same child indexing as the occupancy table)."""
    grid, _, mats = _scene()
    occ = np.asarray(grid.occupancy)
    from vxtpu.world.packed import morton3

    flat = np.asarray(mats).reshape(-1)
    for (x, y, z) in [(0, 0, 0), (3, 7, 11), (15, 15, 15), (8, 1, 14)]:
        mi = int(morton3(jnp.int32(x), jnp.int32(y), jnp.int32(z)))
        w = int(flat[mi])
        for a in range(2):
            for b in range(2):
                for c in range(2):
                    ci = (a << 2) | (b << 1) | c
                    want = min(int(occ[2 * x + a, 2 * y + b, 2 * z + c]), 7)
                    assert (w >> (3 * ci)) & 7 == want


def test_inkernel_shadows_match_composed():
    """The in-kernel shadow pass (second DDA loop inside the march kernel,
    the reference's one-dispatch shape — SURVEY.md §4.3) must equal the
    3-dispatch composition exactly: same marches, same shade math."""
    import jax.numpy as jnp

    from vxtpu.camera.camera import Camera
    from vxtpu.camera.rays import generate_rays
    from vxtpu.render.fused import render_rays_fused
    from vxtpu.render.settings import MarchTuning, RenderSettings
    from vxtpu.world import procgen
    from vxtpu.world.lights import Lights
    from vxtpu.world.packed import (build_material_morton,
                                    build_packed_morton)

    D = 32
    g = procgen.terrain((D, D, D), seed=3)
    accel = build_packed_morton(g.occupancy)
    mats = build_material_morton(g.occupancy)
    cam = Camera.make(pos=(-20.0, 16.0, 36.0),
                      fov_y_deg=55.0).look_at((16.0, 16.0, 8.0))
    lights = Lights.make([(5.0, -10.0, 45.0), (40.0, 30.0, 50.0)],
                         [(1.0, 0.9, 0.8), (0.4, 0.5, 1.0)], [2.0, 1.0])
    settings = RenderSettings(shading="full", shadows=True, fog=True,
                              tuning=MarchTuning(window=64))
    o, d = generate_rays(cam, 32, 64)
    rgb_a, _ = render_rays_fused(o, d, accel, mats, (D, D, D), lights,
                                 settings, image_shape=(32, 64),
                                 inkernel_shadows=True, interpret=True)
    rgb_b, _ = render_rays_fused(o, d, accel, mats, (D, D, D), lights,
                                 settings, image_shape=(32, 64),
                                 inkernel_shadows=False, interpret=True)
    assert jnp.max(jnp.abs(rgb_a - rgb_b)) < 1e-5


def test_fused_rgb8_matches_xla_pervoxel_shade():
    """Per-voxel RGB on the flagship fused path (rgb8 fine-Morton table,
    config 2's defining attribute) vs the XLA pipeline shade with f32
    albedo — tolerance is quantization-scale (8 bits/channel)."""
    import jax.numpy as jnp

    from vxtpu.camera.camera import Camera
    from vxtpu.render.fused import render_frame_fused
    from vxtpu.render.kernel_xla import make_march_xla
    from vxtpu.render.pipeline import render_image
    from vxtpu.render.settings import MarchTuning, RenderSettings
    from vxtpu.world import procgen
    from vxtpu.world.lights import Lights
    from vxtpu.world.packed import build_packed_morton, build_rgb8_morton

    D = 32
    g = procgen.terrain((D, D, D), seed=3, with_rgb=True)
    accel = build_packed_morton(g.occupancy)
    rgbtab = build_rgb8_morton(g)
    cam = Camera.make(pos=(-20.0, 16.0, 36.0),
                      fov_y_deg=55.0).look_at((16.0, 16.0, 8.0))
    lights = Lights.single((5.0, -10.0, 45.0), intensity=2.0)
    settings = RenderSettings(shading="lambert",
                              tuning=MarchTuning(window=64))
    a = render_frame_fused(accel, rgbtab, (D, D, D), cam, lights, settings,
                           32, 64, rgb8=True, interpret=True)
    b = render_image(make_march_xla, g, cam, lights, settings, 32, 64)
    assert jnp.max(jnp.abs(a - b)) < 8e-3
