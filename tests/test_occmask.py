"""Occupancy-mask sample skipping (render/occmask.py — the SURVEY §8 /
PAPERS P:5,P:9 occupancy-grid pattern): the masked soft model's fast path
must (a) collapse to the unmasked renderer under an all-ones mask, (b)
match the bounded reference renderer exactly (same quadrature), with
gradients allclose vs autodiff, and (c) its restricted sample band must
reproduce the full-segment masked integral at far fewer samples — the
train-step speedup mechanism."""

import numpy as np

import jax
import jax.numpy as jnp

from vxtpu.camera.camera import Camera
from vxtpu.camera.rays import generate_rays
from vxtpu.render.occmask import (mask_all_ones, mask_at,
                                  mask_segment_bounds,
                                  occupancy_mask_from_soft)
from vxtpu.render.settings import RenderSettings
from vxtpu.render.soft import SoftGrid, render_soft_rays
from vxtpu.render.vjp import render_soft_rays_fast
from vxtpu.world import procgen
from vxtpu.world.lights import Lights

DIMS = (32, 32, 32)
G = 4


def _scene():
    grid = procgen.terrain(DIMS, seed=7, with_rgb=True)
    soft = SoftGrid.from_hard(grid, sigma_solid=25.0)
    cam = Camera.make(pos=(-22.0, 16.0, 36.0)).look_at((16.0, 16.0, 9.0))
    o, d = generate_rays(cam, 24, 24)
    return soft, o, d


def test_mask_all_ones_is_identity():
    soft, o, d = _scene()
    settings = RenderSettings()
    m = mask_all_ones(DIMS, G)
    a, _ = render_soft_rays(soft, o, d, settings, 32)
    b, _ = render_soft_rays(soft, o, d, settings, 32, mask=m, mask_scale=G)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_mask_from_soft_covers_density():
    """Every voxel with softplus(sigma) > tau lies inside an occupied mask
    cell (the mask is conservative)."""
    soft, _, _ = _scene()
    m = occupancy_mask_from_soft(soft, G, tau=0.01, dilate=0)
    dens = np.asarray(jax.nn.softplus(soft.sigma_raw)) > 0.01
    mm = np.asarray(m).repeat(G, 0).repeat(G, 1).repeat(G, 2) > 0
    assert (dens <= mm).all()


def test_segment_bounds_cover_occupied_cells():
    """All mask-occupied sample positions of the full segment fall within
    [t0, t1] (the bounds never cut off real density)."""
    soft, o, d = _scene()
    m = occupancy_mask_from_soft(soft, G, tau=0.01, dilate=1)
    t0, t1 = mask_segment_bounds(m, G, o, d)
    from vxtpu.render import dda

    te, tx, valid = dda.ray_grid_clip(o, d, DIMS)
    S = 256
    ts = te[:, None] + (tx - te)[:, None] * (
        (jnp.arange(S) + 0.5) / S)[None, :]
    p = o[:, None, :] + ts[..., None] * d[:, None, :]
    occ = np.asarray(mask_at(m, G, p)) > 0
    ts = np.asarray(ts)
    inside = (ts >= np.asarray(t0)[:, None] - 1e-3) & (
        ts <= np.asarray(t1)[:, None] + 1e-3)
    violations = occ & ~inside & np.asarray(valid)[:, None]
    assert violations.sum() == 0, violations.sum()


def test_masked_fast_matches_bounded_reference_and_grads():
    """Same mask + same bounds: fast forward == reference forward; fast
    grads == autodiff through the reference (the §5 custom-VJP tier for
    the masked model)."""
    soft, o, d = _scene()
    settings = RenderSettings(shading="lambert")
    lights = Lights.single((25.0, -10.0, 60.0), intensity=2.0)
    m = occupancy_mask_from_soft(soft, G, tau=0.01, dilate=1)
    bounds = mask_segment_bounds(m, G, o, d)
    S = 24
    tgt = jnp.zeros((o.shape[0], 3), jnp.float32)

    def loss_ref(soft_, o_, d_, lights_):
        rgb, _ = render_soft_rays(soft_, o_, d_, settings, S,
                                  lights=lights_, mask=m, mask_scale=G,
                                  seg_bounds=bounds)
        return jnp.mean((rgb - tgt) ** 2)

    def loss_fast(soft_, o_, d_, lights_):
        rgb = render_soft_rays_fast(soft_, o_, d_, settings, S, lights_,
                                    m, G, bounds)
        return jnp.mean((rgb - tgt) ** 2)

    la, ga = jax.value_and_grad(loss_ref, argnums=(0, 1, 2, 3))(
        soft, o, d, lights)
    lb, gb = jax.value_and_grad(loss_fast, argnums=(0, 1, 2, 3))(
        soft, o, d, lights)
    np.testing.assert_allclose(float(la), float(lb), rtol=1e-5)
    for xa, xb in zip(jax.tree_util.tree_leaves(ga),
                      jax.tree_util.tree_leaves(gb)):
        # atol 1e-4: at fully-saturated samples (alpha == 1.0f) both
        # formulations divide an fp-rounding-scale suffix by the 1e-10
        # eps floor, so the two (equally valid) gradients can differ by
        # ~1e-4 absolute on a handful of cells; everything else is exact.
        np.testing.assert_allclose(np.asarray(xa), np.asarray(xb),
                                   rtol=2e-4, atol=1.5e-4)


def test_bounded_few_samples_matches_full_many_samples():
    """The speedup claim: S samples inside [t0,t1] reproduce the masked
    full-segment integral computed with many more samples (same in-band
    sample spacing -> same image to quadrature tolerance)."""
    soft, o, d = _scene()
    settings = RenderSettings()
    m = occupancy_mask_from_soft(soft, G, tau=0.01, dilate=1)
    bounds = mask_segment_bounds(m, G, o, d)
    full, _ = render_soft_rays(soft, o, d, settings, 256, mask=m,
                               mask_scale=G)
    few, _ = render_soft_rays(soft, o, d, settings, 64, mask=m,
                              mask_scale=G, seg_bounds=bounds)
    err = float(jnp.abs(full - few).mean())
    assert err < 0.015, err


def test_masked_sharded_train_step_runs_and_descends():
    """The masked train path through the sharded step (mask + bounds per
    microbatch, custom VJP): loss must descend and the updated grid must
    stay finite, on a multi-device mesh."""
    from vxtpu.engine.sharding import (camera_frame_rays, make_mesh,
                                      make_sharded_train_step,
                                      render_soft_image_sharded)

    dims = (32, 32, 32)
    H = W = 32
    settings = RenderSettings(shading="lambert")
    lights = Lights.single((25.0, -10.0, 60.0), intensity=2.0)
    mesh = make_mesh(4)
    truth = SoftGrid.from_hard(
        procgen.terrain(dims, seed=7, with_rgb=True), sigma_solid=25.0)
    cam = Camera.make(pos=(-22.0, 16.0, 36.0)).look_at((16.0, 16.0, 9.0))
    target = render_soft_image_sharded(truth, cam, settings, H, W, 32,
                                       mesh, lights=lights).reshape(-1, 3)
    o_c, d_c = camera_frame_rays(cam, H, W)
    init_fn, step_fn = make_sharded_train_step(
        settings, 16, mesh, optimize_camera=False, lights=lights,
        use_custom_vjp=True, use_mask=True, mask_scale=G)
    # warm-start soft so the mask has something to cover; then refresh
    soft = SoftGrid.from_hard(
        procgen.terrain(dims, seed=8, with_rgb=True), sigma_solid=10.0)
    opt_state = init_fn(soft, cam)
    from vxtpu.engine.sharding import compute_mask_bounds
    from vxtpu.render.occmask import mask_distance_field

    m = occupancy_mask_from_soft(soft, G, tau=0.01, dilate=1)
    mdf = mask_distance_field(m)
    losses = []
    for i in range(6):
        t0, t1 = compute_mask_bounds(m, mdf, cam, o_c, d_c, G)
        soft, cam2, opt_state, loss = step_fn(soft, cam, opt_state, o_c,
                                              d_c, target, m, t0, t1)
        losses.append(float(loss))
        if i == 2:
            m = occupancy_mask_from_soft(soft, G, tau=0.01, dilate=1)
            mdf = mask_distance_field(m)
    assert losses[-1] < losses[0], losses
    assert np.isfinite(np.asarray(soft.sigma_raw)).all()


def test_fit_soft_with_occ_mask_converges():
    """End-to-end: the train loop's occ_mask mode (all-ones mask ->
    periodic refresh from current densities) reduces loss like the dense
    path at a quarter of the samples."""
    from vxtpu.train.loop import TrainConfig, fit_soft

    dims = (32, 32, 32)
    truth = SoftGrid.from_hard(
        procgen.terrain(dims, seed=7, with_rgb=True), sigma_solid=25.0)
    cam = Camera.make(pos=(-22.0, 16.0, 36.0)).look_at((16.0, 16.0, 9.0))
    settings = RenderSettings()
    from vxtpu.render.soft import render_soft_image

    target = render_soft_image(truth, cam, settings, 32, 32, 64)
    cfg = TrainConfig(steps=30, num_samples=16, use_custom_vjp=True,
                      occ_mask=True, mask_scale=G, mask_refresh=10,
                      nan_check_every=10)
    soft, _, losses, _ = fit_soft(SoftGrid.zeros(dims), cam, target,
                                  settings, cfg)
    assert losses[-1] < 0.5 * losses[0], (losses[0], losses[-1])
