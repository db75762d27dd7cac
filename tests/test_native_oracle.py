"""Native C++ DDA oracle (native/dda_oracle.cpp via ctypes) vs the JAX
oracle (render/kernel_ref): the SURVEY.md §5 "deeper oracle" tier — the
forward march must match an independent, algorithm-faithful reimplementation
of the reference's traversal (reference kernels/ray_caster_kernel.cl [K]),
not just two JAX programs agreeing with each other."""

import numpy as np
import pytest

from vxtpu.camera.camera import Camera
from vxtpu.camera.rays import generate_rays
from vxtpu.native import march_native, native_available
from vxtpu.render.kernel_ref import march_ref
from vxtpu.world import procgen

pytestmark = pytest.mark.skipif(
    not native_available(), reason="no C++ compiler / native build failed")

DIMS = (32, 32, 32)
MAX_STEPS = 32 * 3 + 2


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
def test_native_matches_jax_oracle(scene_name, cam_name):
    grid = scenes()[scene_name]
    cam = cameras()[cam_name]
    o, d = generate_rays(cam, 32, 32)
    occ_flat = grid.occupancy.reshape(-1)

    r = march_ref(o, d, occ_flat, DIMS, MAX_STEPS)
    f = march_native(o, d, grid.occupancy, DIMS, MAX_STEPS)

    hit_r = np.array(r.hit)
    agree = (hit_r == f["hit"]).mean()
    assert agree > 0.998, f"hit agreement {agree}"
    both = hit_r & f["hit"]
    np.testing.assert_allclose(np.array(r.t)[both], f["t"][both],
                               rtol=1e-5, atol=1e-4)
    assert (np.array(r.voxel)[both] == f["voxel"][both]).all()
    np.testing.assert_allclose(np.array(r.normal)[both], f["normal"][both],
                               atol=1e-6)


def test_native_t_max_shadow_semantics():
    grid = scenes()["box"]
    cam = cameras()["outside"]
    o, d = generate_rays(cam, 16, 16)
    occ_flat = grid.occupancy.reshape(-1)
    t_max = np.full((o.shape[0],), 18.0, np.float32)

    r = march_ref(o, d, occ_flat, DIMS, MAX_STEPS, t_max=t_max)
    f = march_native(o, d, grid.occupancy, DIMS, MAX_STEPS, t_max=t_max)
    assert (np.array(r.hit) == f["hit"]).mean() > 0.99
