"""Differentiable soft renderer: analytic compositing cases + gradient
checks (SURVEY.md §5 "Gradient" tier; BASELINE.json config 4)."""

import jax
import jax.numpy as jnp
import numpy as np

from vxtpu.camera.camera import Camera
from vxtpu.render.settings import RenderSettings
from vxtpu.render.soft import SoftGrid, render_soft_image, render_soft_rays, trilinear
from vxtpu.world import procgen

DIMS = (8, 8, 8)
S = RenderSettings()


def test_trilinear_constant_field():
    vals = jnp.full(DIMS, 3.25)
    p = jnp.asarray([[1.1, 2.7, 3.3], [4.0, 4.0, 4.0], [0.1, 0.1, 7.9]])
    out = np.array(trilinear(vals, p, DIMS))
    assert np.allclose(out, 3.25, atol=1e-6)


def test_trilinear_linear_field():
    """Trilinear interp reproduces a linear ramp exactly (away from edges)."""
    x = jnp.arange(8, dtype=jnp.float32) + 0.5
    vals = jnp.broadcast_to(x[:, None, None], DIMS)  # f(p) = p_x
    p = jnp.asarray([[2.3, 4.0, 4.0], [5.75, 2.2, 6.6]])
    out = np.array(trilinear(vals, p, DIMS))
    assert np.allclose(out, [2.3, 5.75], atol=1e-5)


def test_opaque_ray_opacity():
    """Ray through a dense region -> opacity ~1; through empty -> ~0."""
    grid = procgen.solid_box(DIMS, (2, 0, 0), (6, 8, 4), material=3)
    soft = SoftGrid.from_hard(grid, sigma_solid=50.0)
    o = jnp.asarray([[-1.0, 4.0, 2.0], [-1.0, 4.0, 6.5]])
    d = jnp.asarray([[1.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
    _, aux = render_soft_rays(soft, o, d, S, num_samples=64)
    op = np.array(aux["opacity"])
    assert op[0] > 0.99
    assert op[1] < 0.05


def test_miss_is_sky():
    soft = SoftGrid.zeros(DIMS)
    cam = Camera.make(pos=(4.0, 4.0, 30.0), pitch=1.4)  # looking up, away
    img = np.array(render_soft_image(soft, cam, S, 8, 8, num_samples=16))
    from vxtpu.render.shade import sky_color
    # every pixel ~ sky for its direction: just check it's in sky-range & finite
    assert np.isfinite(img).all()
    assert img.min() > 0.3


def test_gradcheck_sigma_rgb():
    """Numerical vs autodiff gradients on a tiny scene."""
    from jax.test_util import check_grads

    grid = procgen.solid_box(DIMS, (3, 3, 3), (6, 6, 6), material=4)
    soft = SoftGrid.from_hard(grid, sigma_solid=8.0)
    o = jnp.asarray([[-1.0, 4.1, 4.2], [-1.0, 3.4, 4.9]])
    d = jnp.asarray([[1.0, 0.02, 0.01], [1.0, -0.03, 0.02]])
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    def f(sigma_raw, rgb_raw):
        s = SoftGrid(sigma_raw=sigma_raw, rgb_raw=rgb_raw)
        rgb, _ = render_soft_rays(s, o, d, S, num_samples=32)
        return jnp.sum(rgb ** 2)

    check_grads(f, (soft.sigma_raw, soft.rgb_raw), order=1, modes=["rev"],
                atol=2e-2, rtol=2e-2)


def test_camera_pose_gradient_flows():
    grid = procgen.shell_sphere(DIMS)
    soft = SoftGrid.from_hard(grid, sigma_solid=10.0)
    target = jnp.zeros((8, 8, 3))

    def loss(yaw, pos):
        cam = Camera.make(pos=(0, 0, 0)).replace(
            yaw=yaw, pos=pos, pitch=jnp.float32(0.0)
        )
        img = render_soft_image(soft, cam, S, 8, 8, num_samples=24)
        return jnp.mean((img - target) ** 2)

    g_yaw, g_pos = jax.grad(loss, argnums=(0, 1))(
        jnp.float32(0.3), jnp.asarray([-2.0, 4.0, 4.0])
    )
    assert np.isfinite(float(g_yaw)) and abs(float(g_yaw)) > 0
    assert np.isfinite(np.array(g_pos)).all() and np.abs(np.array(g_pos)).max() > 0


def test_soft_matches_hard_silhouette():
    """High-density soft render ~ hard render: same hit/miss silhouette."""
    from vxtpu.render.kernel_ref import make_march_ref
    from vxtpu.render.pipeline import render_image
    from vxtpu.world.lights import Lights

    grid = procgen.solid_box(DIMS, (2, 2, 2), (6, 6, 6), material=3)
    soft = SoftGrid.from_hard(grid, sigma_solid=60.0)
    cam = Camera.make(pos=(-6.0, 4.0, 4.0)).look_at((4.0, 4.0, 4.0))
    soft_img = np.array(render_soft_image(soft, cam, S, 24, 24, num_samples=96))
    hard_img = np.array(
        render_image(make_march_ref, grid, cam, Lights.none(), RenderSettings.flat(), 24, 24)
    )
    # silhouette: pixel differs from sky
    from vxtpu.camera.rays import generate_rays
    from vxtpu.render.shade import sky_color
    _, d = generate_rays(cam, 24, 24)
    sky = np.array(sky_color(d, S)).reshape(24, 24, 3)
    sil_soft = (np.abs(soft_img - sky).max(-1) > 0.05)
    sil_hard = (np.abs(hard_img - sky).max(-1) > 0.05)
    # the soft surface is inherently ~half a voxel fatter (trilinear support),
    # so only compare outside a 1-pixel band around the hard silhouette edge
    import scipy.ndimage as ndi  # scipy ships with the jax stack

    edge = ndi.binary_dilation(sil_hard, iterations=2) & ~ndi.binary_erosion(
        sil_hard, iterations=2
    )
    core = ~edge
    assert (sil_soft == sil_hard)[core].mean() > 0.99
    # and the soft interior renders the box color, not black
    assert soft_img[12, 12].mean() > 0.15
