"""Parity: the Pallas march kernel (render/kernel_pallas, interpret mode on
CPU) must reproduce the per-ray oracle (render/kernel_ref) — the same
contract the batched XLA march is held to (SURVEY.md §5; BASELINE.json
"must match a JAX-reference ... to allclose")."""

import jax.numpy as jnp
import numpy as np
import pytest

from vxtpu.camera.camera import Camera
from vxtpu.camera.rays import generate_rays
from vxtpu.render.kernel_pallas import make_march_pallas, march_pallas
from vxtpu.render.kernel_ref import make_march_ref
from vxtpu.render.settings import RenderSettings
from vxtpu.world import procgen
from vxtpu.world.packed import build_packed

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
    }


def _pair(grid, settings):
    occ_flat = grid.occupancy.reshape(-1)
    ref = make_march_ref(occ_flat, DIMS, settings, None)
    fast = make_march_pallas(occ_flat, DIMS, settings, interpret=True)
    return ref, fast


@pytest.mark.parametrize("scene_name", ["box", "sphere", "terrain"])
@pytest.mark.parametrize("cam_name", ["outside", "inside"])
def test_pallas_march_parity(scene_name, cam_name):
    grid = scenes()[scene_name]
    cam = cameras()[cam_name]
    settings = RenderSettings()
    ref, fast = _pair(grid, settings)
    o, d = generate_rays(cam, 32, 32)
    r = ref(o, d)
    f = fast(o, d)
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


def test_pallas_tmax_shadow_semantics():
    """t_max must clip marches exactly like the oracle (shadow rays)."""
    grid = scenes()["terrain"]
    occ_flat = grid.occupancy.reshape(-1)
    settings = RenderSettings()
    accel = build_packed(grid.occupancy)
    cam = cameras()["outside"]
    o, d = generate_rays(cam, 16, 16)
    tm = jnp.full((o.shape[0],), 18.0, jnp.float32)
    ref = make_march_ref(occ_flat, DIMS, settings, None)
    r = ref(o, d, t_max=tm)
    f = march_pallas(o, d, accel, DIMS, settings.resolve_max_steps(DIMS),
                     t_max=tm, interpret=True)
    assert (np.array(r.hit) == np.array(f.hit)).mean() > 0.99


def test_pallas_ray_padding():
    """N not a multiple of the 1024-ray tile is padded and unpadded."""
    grid = scenes()["box"]
    accel = build_packed(grid.occupancy)
    cam = cameras()["outside"]
    o, d = generate_rays(cam, 9, 13)  # 117 rays
    rec = march_pallas(o, d, accel, DIMS, 128, interpret=True)
    assert rec.hit.shape == (117,)
    assert bool(rec.hit.any())
