"""Parity + gradient tests for the Pallas trilinear field-sampling kernel
pair (render/kernel_sample.py) and the soft-render path built on it
(render/soft_pallas.py) — the contract's "custom VJP backward kernel"
tier (SURVEY.md §2 L0, §4.5). All kernels run in interpret mode on the
CPU test platform; the XLA soft renderer is the semantics oracle."""

import jax
import jax.numpy as jnp
import pytest

from vxtpu.render.kernel_sample import (build_field_morton,
                                        field_from_morton,
                                        sample_fields_bwd,
                                        sample_fields_fwd)
from vxtpu.render.settings import RenderSettings
from vxtpu.render.soft import (SoftGrid, render_soft_rays, trilinear,
                               trilinear_grad)
from vxtpu.render.soft_pallas import (MortonSoftGrid,
                                      render_soft_rays_pallas)
from vxtpu.world import procgen
from vxtpu.world.lights import Lights

D = 16


@pytest.fixture(scope="module")
def fields():
    return [jax.random.normal(jax.random.PRNGKey(i), (D, D, D))
            for i in range(4)]


@pytest.fixture(scope="module")
def rays():
    n = 256
    o = jax.random.uniform(jax.random.PRNGKey(10), (n, 3)) * 4 - 2
    d = jax.random.normal(jax.random.PRNGKey(11), (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    t0 = jax.random.uniform(jax.random.PRNGKey(12), (n,)) * 2
    dt = jax.random.uniform(jax.random.PRNGKey(13), (n,)) * 1.5
    return o, d, t0, dt


def _ref_samples(fields, o, d, t0, dt, S):
    s_idx = jnp.arange(S) + 0.5
    t_s = t0[None, :] + dt[None, :] * s_idx[:, None]
    p = o[None, :, :] + t_s[..., None] * d[None, :, :]
    return p


def test_field_morton_roundtrip(fields):
    tab = build_field_morton(fields[0])
    back = field_from_morton(tab, D)
    assert jnp.array_equal(back, fields[0])


def test_fwd_matches_trilinear(fields, rays):
    o, d, t0, dt = rays
    S = 8
    tabs = tuple(build_field_morton(f) for f in fields)
    out = sample_fields_fwd(tabs, o, d, t0, dt, S, D, lit=True, window=32,
                            interpret=True)
    p = _ref_samples(fields, o, d, t0, dt, S)
    for c in range(4):
        ref = trilinear(fields[c], p, (D, D, D))
        assert jnp.max(jnp.abs(out[c] - ref)) < 5e-5
    gref = trilinear_grad(fields[0], p, (D, D, D))
    for a in range(3):
        assert jnp.max(jnp.abs(out[4 + a] - gref[..., a])) < 5e-5


def test_fwd_tiny_window_still_exact(fields, rays):
    """A window far smaller than the sample spread forces many mini-loop
    refetches per sample — results must be identical."""
    o, d, t0, dt = rays
    S = 4
    tabs = tuple(build_field_morton(f) for f in fields)
    a = sample_fields_fwd(tabs, o, d, t0, dt, S, D, window=32,
                          interpret=True)
    b = sample_fields_fwd(tabs, o, d, t0, dt, S, D, window=8,
                          interpret=True)
    for x, y in zip(a, b):
        assert jnp.max(jnp.abs(x - y)) < 1e-6


def test_bwd_matches_autodiff(fields, rays):
    o, d, t0, dt = rays
    S = 4
    tabs = tuple(build_field_morton(f) for f in fields)
    cots = tuple(jax.random.normal(jax.random.PRNGKey(20 + i), (S, 256))
                 for i in range(7))
    gtabs, go, gd, gt0, gdt = sample_fields_bwd(
        tabs, o, d, t0, dt, cots, D, lit=True, window=32, interpret=True)

    def ref_fn(f0, f1, f2, f3, o_, d_, t0_, dt_):
        p = _ref_samples(None, o_, d_, t0_, dt_, S)
        outs = [trilinear(ff, p, (D, D, D)) for ff in (f0, f1, f2, f3)]
        gr = trilinear_grad(f0, p, (D, D, D))
        outs += [gr[..., 0], gr[..., 1], gr[..., 2]]
        return sum(jnp.sum(outs[i] * cots[i]) for i in range(7))

    grads = jax.grad(ref_fn, argnums=tuple(range(8)))(*fields, o, d, t0, dt)
    for c in range(4):
        gk = field_from_morton(gtabs[c], D)
        scale = jnp.max(jnp.abs(grads[c])) + 1e-12
        assert jnp.max(jnp.abs(gk - grads[c])) / scale < 1e-4
    for a, b in ((go, grads[4]), (gd, grads[5]), (gt0, grads[6]),
                 (gdt, grads[7])):
        scale = jnp.max(jnp.abs(b)) + 1e-12
        assert jnp.max(jnp.abs(a - b)) / scale < 1e-4


def test_bwd_deterministic(fields, rays):
    """Same inputs -> bitwise-same voxel grads (the scatter is sequential
    window accumulation, no atomics — SURVEY.md §6 race detection)."""
    o, d, t0, dt = rays
    S = 2
    tabs = tuple(build_field_morton(f) for f in fields)
    cots = tuple(jax.random.normal(jax.random.PRNGKey(30 + i), (S, 256))
                 for i in range(4))
    r1 = sample_fields_bwd(tabs, o, d, t0, dt, cots, D, lit=False,
                           window=32, interpret=True)
    r2 = sample_fields_bwd(tabs, o, d, t0, dt, cots, D, lit=False,
                           window=32, interpret=True)
    for a, b in zip(jax.tree_util.tree_leaves(r1),
                    jax.tree_util.tree_leaves(r2)):
        assert jnp.array_equal(a, b)


@pytest.fixture(scope="module")
def scene():
    grid = procgen.terrain((D, D, D), seed=3)
    soft = SoftGrid.from_hard(grid)
    return soft, MortonSoftGrid.from_soft(soft)


def _scene_rays(n=300):
    o = jnp.stack([jax.random.uniform(jax.random.PRNGKey(6), (n,)) * D,
                   jax.random.uniform(jax.random.PRNGKey(7), (n,)) * D,
                   jnp.full((n,), D * 1.5)], axis=-1)
    d = jax.random.normal(jax.random.PRNGKey(8), (n, 3)) - jnp.array(
        [0.0, 0.0, 2.0])
    return o, d / jnp.linalg.norm(d, axis=-1, keepdims=True)


def test_morton_soft_roundtrip(scene):
    soft, msoft = scene
    rt = msoft.to_soft()
    assert jnp.array_equal(rt.sigma_raw, soft.sigma_raw)
    assert jnp.array_equal(rt.rgb_raw, soft.rgb_raw)


@pytest.mark.parametrize("lit", [False, True])
def test_render_soft_pallas_matches_oracle(scene, lit):
    soft, msoft = scene
    o, d = _scene_rays()
    S = 12
    lights = Lights.single((D / 2, D / 2, D * 2.0), intensity=1.2) if lit \
        else None
    settings = RenderSettings(shading="full" if lit else "flat")
    ref, _ = render_soft_rays(soft, o, d, settings, S, lights=lights)
    out = render_soft_rays_pallas(msoft, o, d, settings, S, lights=lights,
                                  window=32, interpret=True)
    assert jnp.max(jnp.abs(out - ref)) < 1e-4


@pytest.mark.parametrize("lit", [False, True])
def test_render_soft_pallas_grads_match_autodiff(scene, lit):
    soft, msoft = scene
    o, d = _scene_rays()
    S = 12
    lights = Lights.single((D / 2, D / 2, D * 2.0), intensity=1.2) if lit \
        else None
    settings = RenderSettings(shading="full" if lit else "flat")

    def loss_ref(sg, oo, dd):
        c, _ = render_soft_rays(sg, oo, dd, settings, S, lights=lights)
        return jnp.sum(c * c)

    def loss_pal(ms, oo, dd):
        c = render_soft_rays_pallas(ms, oo, dd, settings, S, lights=lights,
                                    window=32, interpret=True)
        return jnp.sum(c * c)

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(soft, o, d)
    gp = jax.grad(loss_pal, argnums=(0, 1, 2))(msoft, o, d)
    gsig = field_from_morton(gp[0].sigma_tab, D)
    grgb = jnp.stack([field_from_morton(gp[0].rgb_tab[c], D)
                      for c in range(3)])

    def relerr(a, b):
        return jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(b)) + 1e-12)

    assert relerr(gsig, gr[0].sigma_raw) < 2e-3
    assert relerr(grgb, gr[0].rgb_raw) < 2e-3
    assert relerr(gp[1], gr[1]) < 2e-3
    assert relerr(gp[2], gr[2]) < 2e-3


def test_render_soft_pallas_masked(scene):
    """Masked model + seg_bounds (occmask) through the pallas path."""
    from vxtpu.render.occmask import (mask_distance_field,
                                      mask_segment_bounds,
                                      occupancy_mask_from_soft)

    soft, msoft = scene
    o, d = _scene_rays(128)
    S = 8
    settings = RenderSettings(shading="flat")
    mask = occupancy_mask_from_soft(soft, 4, tau=0.01, dilate=1)
    df = mask_distance_field(mask)
    t0b, t1b = mask_segment_bounds(mask, o=o, d=d, df_flat=df, scale=4)
    ref, _ = render_soft_rays(soft, o, d, settings, S, mask=mask,
                              mask_scale=4, seg_bounds=(t0b, t1b))
    out = render_soft_rays_pallas(msoft, o, d, settings, S, mask=mask,
                                  mask_scale=4, seg_bounds=(t0b, t1b),
                                  window=32, interpret=True)
    assert jnp.max(jnp.abs(out - ref)) < 1e-4


def test_fwd_scattered_rays_exact(fields):
    """Spatially-SCATTERED rays in one tile (the regression that exposed
    the round-5 mini-loop cap bug: a 64-iteration cap silently dropped
    corners for tiles whose corner rows span many window placements).
    Random rays over the whole grid, flat tiles, tiny window."""
    n, S = 256, 4
    o = jax.random.uniform(jax.random.PRNGKey(40), (n, 3)) * D
    d = jax.random.normal(jax.random.PRNGKey(41), (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    t0 = jnp.zeros((n,))
    dt = jax.random.uniform(jax.random.PRNGKey(42), (n,)) * 2
    tabs = tuple(build_field_morton(f) for f in fields)
    out = sample_fields_fwd(tabs, o, d, t0, dt, S, D, lit=False, window=8,
                            interpret=True)
    s_idx = jnp.arange(S) + 0.5
    t_s = t0[None, :] + dt[None, :] * s_idx[:, None]
    p = o[None, :, :] + t_s[..., None] * d[None, :, :]
    for c in range(4):
        ref = trilinear(fields[c], p, (D, D, D))
        assert jnp.max(jnp.abs(out[c] - ref)) < 5e-5
