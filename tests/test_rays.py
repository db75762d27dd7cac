"""Ray generation: known camera -> known directions (SURVEY.md §5 unit tier)."""

import jax.numpy as jnp
import numpy as np

from vxtpu.camera.camera import Camera
from vxtpu.camera.rays import generate_rays


def test_center_ray_is_forward():
    cam = Camera.make(pos=(0, 0, 0), yaw=0.0, pitch=0.0, fov_y_deg=90.0)
    o, d = generate_rays(cam, 101, 101)  # odd => a true center pixel
    dc = np.array(d.reshape(101, 101, 3)[50, 50])
    assert np.allclose(dc, [1, 0, 0], atol=1e-3)


def test_directions_unit_norm():
    cam = Camera.make(pos=(1, 2, 3), yaw=0.7, pitch=-0.3)
    _, d = generate_rays(cam, 16, 32)
    assert np.allclose(np.linalg.norm(np.array(d), axis=-1), 1.0, atol=1e-6)


def test_image_orientation():
    """Row 0 looks up (+z), last row looks down; col 0 left, last col right."""
    cam = Camera.make(pos=(0, 0, 0), yaw=0.0, pitch=0.0, fov_y_deg=90.0)
    _, d = generate_rays(cam, 64, 64)
    dimg = np.array(d.reshape(64, 64, 3))
    assert dimg[0, 32, 2] > 0      # top row points up
    assert dimg[-1, 32, 2] < 0     # bottom row points down
    # with x forward & z up, +image-x (right of image) is -y world
    assert dimg[32, -1, 1] < 0
    assert dimg[32, 0, 1] > 0


def test_look_at():
    cam = Camera.make(pos=(10.0, 10.0, 10.0)).look_at((10.0, 20.0, 10.0))
    f, _, _ = cam.basis()
    assert np.allclose(np.array(f), [0, 1, 0], atol=1e-6)


def test_pose_gradients_flow():
    """Camera pose is differentiable through ray-gen (BASELINE: camera-pose
    gradient descent)."""
    import jax

    def loss(yaw):
        cam = Camera.make(pos=(0, 0, 0), yaw=yaw)
        _, d = generate_rays(cam, 8, 8)
        return jnp.sum(d[:, 1])

    g = jax.grad(loss)(jnp.float32(0.1))
    assert np.isfinite(float(g)) and abs(float(g)) > 0
