"""Round-5 device probe: the Pallas field-sampling train path
(render/kernel_sample.py + soft_pallas.py) at the judged shapes.

  device_exact       on-device sample_fields_fwd vs XLA trilinear (the
                     3-split bf16 fetch's real-silicon error)
  train_field_w{32,64,128}  full sharded train step (128^3, 256^2 rays,
                     S=64, lit, camera-opt) via make_sharded_train_step
                     (field_kernel=True) — vs r4's train_step_b1 4113 ms
  train_field_512    512^3, S=32 — VERDICT r4 target: under ~4 s

Writes tools/probe_r5_train_out.json incrementally.
Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_r5_train.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vxtpu.engine.platform import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from vxtpu.camera.camera import Camera
from vxtpu.engine.sharding import (camera_frame_rays, make_mesh,
                                   make_sharded_train_step,
                                   render_soft_image_sharded)
from vxtpu.render.kernel_sample import build_field_morton, sample_fields_fwd
from vxtpu.render.settings import RenderSettings
from vxtpu.render.soft import SoftGrid, trilinear
from vxtpu.render.soft_pallas import MortonSoftGrid
from vxtpu.world import procgen
from vxtpu.world.lights import Lights

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "probe_r5_train_out.json")
RES = {}
if os.path.exists(OUT):
    with open(OUT) as f:
        RES = json.load(f)


def save(name, entry):
    RES[name] = entry
    with open(OUT, "w") as f:
        json.dump(RES, f, indent=1)
    print(name, entry, flush=True)


def device_exact():
    if "device_exact" in RES:
        return
    D = 64
    fields = [jax.random.normal(jax.random.PRNGKey(i), (D, D, D))
              for i in range(4)]
    tabs = tuple(build_field_morton(f) for f in fields)
    n, S = 2048, 8
    o = jax.random.uniform(jax.random.PRNGKey(10), (n, 3)) * D * 0.5
    d = jax.random.normal(jax.random.PRNGKey(11), (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    t0 = jax.random.uniform(jax.random.PRNGKey(12), (n,)) * 4
    dt = jax.random.uniform(jax.random.PRNGKey(13), (n,)) * 2

    out = sample_fields_fwd(tabs, o, d, t0, dt, S, D, lit=True, window=64)
    s_idx = jnp.arange(S) + 0.5
    t_s = t0[None, :] + dt[None, :] * s_idx[:, None]
    p = o[None, :, :] + t_s[..., None] * d[None, :, :]
    errs = {}
    for c in range(4):
        ref = trilinear(fields[c], p, (D, D, D))
        errs[f"chan{c}"] = float(jnp.max(jnp.abs(out[c] - ref)))
    save("device_exact", dict(**errs, n_samples=n * S))


def train_shape(name, dims, samples, window, steps_timed=2):
    if name in RES:
        return
    H = W = 256
    settings = RenderSettings(shading="lambert")
    lights = Lights.single((dims[0] * 0.2, -dims[1] * 0.3, dims[2] * 1.4),
                           intensity=2.0)
    mesh = make_mesh(1)
    cam = Camera.make(
        pos=(-dims[0] * 0.7, dims[1] * 0.5, dims[2] * 1.1),
        fov_y_deg=55.0).look_at(
        (dims[0] * 0.5, dims[1] * 0.5, dims[2] * 0.27))
    if dims[0] <= 128:
        truth = SoftGrid.from_hard(
            procgen.terrain(dims, seed=7, with_rgb=True), sigma_solid=25.0)
        target = render_soft_image_sharded(truth, cam, settings, H, W,
                                           samples, mesh,
                                           lights=lights).reshape(-1, 3)
        del truth
    else:
        # 512^3: params + adam moments + grads already hold ~8.6 GB; a
        # truth SoftGrid (+2.1 GB) and its render OOM the 16 GB chip, and
        # step TIME does not depend on target values — use a constant
        # target for the timing entry (convergence is the 128^3 entries'
        # and tools/probe_r5_c4's job)
        target = jnp.full((H * W, 3), 0.3, jnp.float32)
    o_c, d_c = camera_frame_rays(cam, H, W)
    msoft = MortonSoftGrid.from_soft(SoftGrid.zeros(dims))

    init_fn, step_fn = make_sharded_train_step(
        settings, samples, mesh, optimize_camera=True, grad_buckets=1,
        lights=lights, field_kernel=True, field_window=window,
        field_image_shape=(H, W))
    opt_state = init_fn(msoft, cam)
    c = cam
    t0 = time.perf_counter()
    # TWO warm calls: the first output's device-committed/strong-typed
    # arrays change the arg signature once, forcing a second trace
    # (measured: per_call [73s, 72s, 1.0s, 1.0s] —
    # tools/probe_r5_step_out.json); steady state starts at call 3
    s2, c, opt_state, loss = step_fn(msoft, c, opt_state, o_c, d_c, target)
    jax.block_until_ready(s2)
    l0 = float(loss)
    s2, c, opt_state, loss = step_fn(s2, c, opt_state, o_c, d_c, target)
    jax.block_until_ready(s2)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(steps_timed):
        s2, c, opt_state, loss = step_fn(s2, c, opt_state, o_c, d_c, target)
        jax.block_until_ready(s2)
    lf = float(loss)
    dt = (time.perf_counter() - t0) / steps_timed
    save(name, dict(ms=round(dt * 1e3, 1), compile_s=round(compile_s, 1),
                    dims=list(dims), rays=H * W, samples=samples,
                    window=window, lit=True, loss0=l0, loss=lf))


def masked_shape(name, dims, samples, window, steps_timed=2):
    """Masked field-kernel step: S samples concentrated in each ray's
    occupied band (occmask seg_bounds) — the honest mask comparison is
    equal in-band spacing, not equal sample count
    (tools/analysis_masked512.md)."""
    if name in RES:
        return
    from vxtpu.engine.sharding import compute_mask_bounds
    from vxtpu.render.occmask import (mask_distance_field,
                                      occupancy_mask_from_soft)

    H = W = 256
    G = 4
    settings = RenderSettings(shading="lambert")
    lights = Lights.single((dims[0] * 0.2, -dims[1] * 0.3, dims[2] * 1.4),
                           intensity=2.0)
    mesh = make_mesh(1)
    cam = Camera.make(
        pos=(-dims[0] * 0.7, dims[1] * 0.5, dims[2] * 1.1),
        fov_y_deg=55.0).look_at(
        (dims[0] * 0.5, dims[1] * 0.5, dims[2] * 0.27))
    target = jnp.full((H * W, 3), 0.3, jnp.float32)
    o_c, d_c = camera_frame_rays(cam, H, W)
    # the mask comes from the HARD terrain occupancy directly (the soft
    # warm-state detour would add a 2.1 GB SoftGrid at 512^3); the grid
    # being trained starts at zeros — the mask/bounds cost is what is
    # being measured
    occ = procgen.terrain(dims, seed=7).occupancy
    mask = (jax.lax.reduce_window(
        (occ > 0).astype(jnp.float32), 0.0, jax.lax.max,
        (G, G, G), (G, G, G), "VALID") > 0).astype(jnp.uint8)
    del occ
    mdf = mask_distance_field(mask)
    frac = round(float(jnp.mean(mask.astype(jnp.float32))), 4)
    msoft = MortonSoftGrid.from_soft(SoftGrid.zeros(dims))

    init_fn, step_fn = make_sharded_train_step(
        settings, samples, mesh, optimize_camera=True, grad_buckets=1,
        lights=lights, field_kernel=True, field_window=window,
        field_image_shape=(H, W), use_mask=True, mask_scale=G)
    opt_state = init_fn(msoft, cam)
    c = cam
    b0, b1 = compute_mask_bounds(mask, mdf, c, o_c, d_c, G)
    s2, c, opt_state, loss = step_fn(msoft, c, opt_state, o_c, d_c,
                                     target, mask, b0, b1)
    jax.block_until_ready(s2)
    l0 = float(loss)
    s2, c, opt_state, loss = step_fn(s2, c, opt_state, o_c, d_c, target,
                                     mask, b0, b1)
    jax.block_until_ready(s2)
    t0 = time.perf_counter()
    for _ in range(steps_timed):
        b0, b1 = compute_mask_bounds(mask, mdf, c, o_c, d_c, G)
        s2, c, opt_state, loss = step_fn(s2, c, opt_state, o_c, d_c,
                                         target, mask, b0, b1)
        jax.block_until_ready(s2)
    lf = float(loss)
    dt = (time.perf_counter() - t0) / steps_timed
    save(name, dict(ms=round(dt * 1e3, 1), dims=list(dims), rays=H * W,
                    samples=samples, window=window, lit=True, masked=True,
                    mask_occupied_frac=frac, loss0=l0, loss=lf))


def grad_allclose(name, dims, samples):
    """Device grads: field-kernel path vs the r1-r4 custom-VJP scan
    (render/vjp.py) on the same rays/scene — the 'allclose at 128^3 AND
    512^3' criterion (VERDICT r4 next-#2)."""
    if name in RES:
        return
    from vxtpu.camera.rays import generate_rays
    from vxtpu.render.kernel_sample import field_from_morton
    from vxtpu.render.soft_pallas import render_soft_rays_pallas
    from vxtpu.render.vjp import render_soft_rays_fast

    n = 4096
    settings = RenderSettings(shading="lambert")
    lights = Lights.single((dims[0] * 0.2, -dims[1] * 0.3, dims[2] * 1.4),
                           intensity=2.0)
    cam = Camera.make(
        pos=(-dims[0] * 0.7, dims[1] * 0.5, dims[2] * 1.1),
        fov_y_deg=55.0).look_at(
        (dims[0] * 0.5, dims[1] * 0.5, dims[2] * 0.27))
    o, d = generate_rays(cam, 64, 64)
    soft = SoftGrid.from_hard(procgen.terrain(dims, seed=7),
                              sigma_solid=12.0)
    msoft = MortonSoftGrid.from_soft(soft)

    def loss_ref(s_):
        c = render_soft_rays_fast(s_, o, d, settings, samples, lights)
        return jnp.sum(c * c)

    def loss_pal(m_):
        c = render_soft_rays_pallas(m_, o, d, settings, samples,
                                    lights=lights, window=64)
        return jnp.sum(c * c)

    gr = jax.jit(jax.grad(loss_ref))(soft)
    gp = jax.jit(jax.grad(loss_pal))(msoft)
    gs = field_from_morton(gp.sigma_tab, dims[0])

    def relerr(a, b):
        return float(jnp.max(jnp.abs(a - b))
                     / (jnp.max(jnp.abs(b)) + 1e-12))

    rs = relerr(gs, gr.sigma_raw)
    rr = max(relerr(field_from_morton(gp.rgb_tab[c], dims[0]),
                    gr.rgb_raw[c]) for c in range(3))
    save(name, dict(rays=n, samples=samples, sigma_rel=round(rs, 6),
                    rgb_rel=round(rr, 6),
                    ok=bool(rs < 2e-3 and rr < 2e-3)))


def main():
    device_exact()
    grad_allclose("grads_128", (128, 128, 128), 32)
    train_shape("train_field_blk_w64", (128, 128, 128), 64, 64)
    train_shape("train_field_blk_w128", (128, 128, 128), 64, 128)
    train_shape("train_field_blk_512", (512, 512, 512), 32, 64)
    masked_shape("train_field_masked_512", (512, 512, 512), 8, 64)
    grad_allclose("grads_512", (512, 512, 512), 16)


if __name__ == "__main__":
    main()
