"""Device-gated tests: run the real-hardware paths (Mosaic-compiled Pallas
kernel, wavefront march, custom-VJP training step) on the actual TPU chip.

Skipped unless VXTPU_TEST_PLATFORM names a non-CPU backend, e.g.

    VXTPU_TEST_PLATFORM=axon python -m pytest tests/test_device.py -q

Rationale (VERDICT r1 "what's weak" #2): interpret-mode CPU parity alone
leaves Mosaic-compile health untested — one toolchain bump and the contract
kernel silently breaks. This module makes device health a test, not
folklore. Parity oracle: the batched XLA march / pure-jnp soft renderer,
themselves parity-locked to kernel_ref on CPU (tests/test_parity.py).
"""

import os

import numpy as np
import pytest

_plat = os.environ.get("VXTPU_TEST_PLATFORM", "cpu")
pytestmark = pytest.mark.skipif(
    _plat == "cpu",
    reason="device tests need VXTPU_TEST_PLATFORM=<tpu backend> (e.g. axon)",
)

DIMS = (32, 32, 32)


@pytest.fixture(scope="module")
def scene():
    import jax

    from vxtpu.camera.camera import Camera
    from vxtpu.camera.rays import generate_rays
    from vxtpu.world import procgen

    assert jax.default_backend() != "cpu", jax.default_backend()
    grid = procgen.terrain(DIMS, seed=11)
    cam = Camera.make(pos=(-20.0, 16.0, 40.0)).look_at((16.0, 16.0, 12.0))
    o, d = generate_rays(cam, 32, 32)
    return grid, o, d


def _assert_hitrec_close(r, f, min_agree=0.998):
    # The 0.998 bound is deliberately conservative; measured reality on the
    # bench device is EXACT agreement (hit 1.0, voxel 1.0, t within 4e-5 —
    # tools/probe_device_agreement_out.json). The slack only exists so a
    # future toolchain's fma-contraction change on boundary rays fails
    # loudly in parity detail, not flakily here.
    hit_r, hit_f = np.array(r.hit), np.array(f.hit)
    agree = (hit_r == hit_f).mean()
    assert agree > min_agree, f"hit mask agreement {agree}"
    both = hit_r & hit_f
    np.testing.assert_allclose(
        np.array(r.t)[both], np.array(f.t)[both], rtol=1e-4, atol=1e-3
    )


def test_pallas_mosaic_compiles_and_matches_xla(scene):
    """The contract Pallas kernel must Mosaic-compile AND agree with the
    XLA march on the real chip (not just in interpret mode)."""
    import jax

    from vxtpu.render.kernel_pallas import make_march_pallas
    from vxtpu.render.kernel_xla import make_march_xla
    from vxtpu.render.settings import RenderSettings

    grid, o, d = scene
    settings = RenderSettings()
    occ_flat = grid.occupancy.reshape(-1)
    ref = jax.jit(make_march_xla(occ_flat, DIMS, settings, None))
    fast = jax.jit(make_march_pallas(occ_flat, DIMS, settings))
    r = jax.block_until_ready(ref(o, d))
    f = jax.block_until_ready(fast(o, d))
    _assert_hitrec_close(r, f)


def test_wavefront_matches_xla_on_device(scene):
    import jax

    from vxtpu.render.kernel_wavefront import make_march_wavefront
    from vxtpu.render.kernel_xla import make_march_xla
    from vxtpu.render.settings import RenderSettings
    from vxtpu.world import distfield

    grid, o, d = scene
    settings = RenderSettings()
    occ_flat = grid.occupancy.reshape(-1)
    accel = distfield.build(grid.occupancy, cap=24)
    ref = jax.jit(make_march_xla(occ_flat, DIMS, settings, accel))
    fast = jax.jit(make_march_wavefront(occ_flat, DIMS, settings, accel))
    r = jax.block_until_ready(ref(o, d))
    f = jax.block_until_ready(fast(o, d))
    _assert_hitrec_close(r, f)
    both = np.array(r.hit) & np.array(f.hit)
    assert (np.array(r.voxel)[both] == np.array(f.voxel)[both]).all()


def test_custom_vjp_grads_on_device(scene):
    """Custom-VJP backward compiles and matches autodiff on hardware."""
    import jax
    import jax.numpy as jnp

    from vxtpu.render.settings import RenderSettings
    from vxtpu.render.soft import SoftGrid, render_soft_rays
    from vxtpu.render.vjp import render_soft_rays_fast

    grid, o, d = scene
    settings = RenderSettings()
    soft = SoftGrid.from_hard(grid, sigma_solid=10.0)

    def loss_ref(s):
        pred, _ = render_soft_rays(s, o, d, settings, 24)
        return jnp.mean(pred**2)

    def loss_fast(s):
        return jnp.mean(render_soft_rays_fast(s, o, d, settings, 24) ** 2)

    g_ref = jax.block_until_ready(jax.jit(jax.grad(loss_ref))(soft))
    g_fast = jax.block_until_ready(jax.jit(jax.grad(loss_fast))(soft))
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_fast)):
        np.testing.assert_allclose(np.array(a), np.array(b),
                                   rtol=5e-3, atol=1e-6)


def test_pallas_v2_mosaic_compiles_and_matches_xla(scene):
    """The windowed (v2) Pallas kernel must Mosaic-compile — including the
    scalar min-reduce feeding pl.ds — and agree with the XLA march on the
    real chip."""
    import jax

    from vxtpu.render.kernel_pallas_v2 import make_march_pallas_v2
    from vxtpu.render.kernel_xla import make_march_xla
    from vxtpu.render.settings import RenderSettings

    grid, o, d = scene
    settings = RenderSettings()
    occ_flat = grid.occupancy.reshape(-1)
    ref = jax.jit(make_march_xla(occ_flat, DIMS, settings, None))
    fast = jax.jit(make_march_pallas_v2(occ_flat, DIMS, settings,
                                        image_shape=(32, 32)))
    r = jax.block_until_ready(ref(o, d))
    f = jax.block_until_ready(fast(o, d))
    _assert_hitrec_close(r, f)


def test_pallas_v2_128cube_on_device():
    """v2 at a table size v1 could never reach (128^3 -> 2048 rows): the
    VMEM-resident windowed fetch must compile and match the wavefront
    march."""
    import jax

    from vxtpu.camera.camera import Camera
    from vxtpu.camera.rays import generate_rays
    from vxtpu.render.kernel_pallas_v2 import make_march_pallas_v2
    from vxtpu.render.kernel_wavefront import make_march_wavefront
    from vxtpu.render.settings import RenderSettings
    from vxtpu.world import procgen

    dims = (128, 128, 128)
    grid = procgen.terrain(dims, seed=7)
    cam = Camera.make(pos=(-80.0, 64.0, 150.0)).look_at((64.0, 64.0, 40.0))
    o, d = generate_rays(cam, 32, 64)
    settings = RenderSettings()
    occ_flat = grid.occupancy.reshape(-1)
    ref = jax.jit(make_march_wavefront(occ_flat, dims, settings))
    fast = jax.jit(make_march_pallas_v2(occ_flat, dims, settings,
                                        image_shape=(32, 64)))
    r = jax.block_until_ready(ref(o, d))
    f = jax.block_until_ready(fast(o, d))
    _assert_hitrec_close(r, f)


def test_fused_shade_matches_xla_on_device(scene):
    """The fused in-kernel shade (material one-hot fetch at HIGHEST matmul
    precision + VPU lighting) must agree with the XLA shading pipeline ON
    REAL HARDWARE — interpret-mode CPU parity cannot catch the default-
    matmul-precision trap that silently bf16-rounds the 24-bit material
    words (found in r4: tools/probe_r4_matfetch_out.json; exact after the
    Precision.HIGHEST fix, tools/probe_r4_parity_out.json)."""
    import jax

    from vxtpu.render.fused import render_rays_fused
    from vxtpu.render.kernel_pallas_v2 import make_march_pallas_v2
    from vxtpu.render.pipeline import render_rays
    from vxtpu.render.settings import RenderSettings
    from vxtpu.world.lights import Lights
    from vxtpu.world.packed import (build_material_morton,
                                    build_packed_morton, PackedMorton)

    grid, o, d = scene
    accel = build_packed_morton(grid.occupancy)
    mats = build_material_morton(grid.occupancy)
    lights = Lights.single((25.0, -10.0, 60.0), intensity=2.0)
    for st in (RenderSettings(shading="lambert"),
               RenderSettings(shading="full", shadows=True, fog=True)):
        @jax.jit
        def frgb(words, mw, oo, dd, st=st):
            rgb, _ = render_rays_fused(oo, dd, PackedMorton(words=words),
                                       mw, DIMS, lights, st,
                                       image_shape=(32, 32))
            return rgb

        @jax.jit
        def xrgb(occ, oo, dd, st=st):
            march = make_march_pallas_v2(occ, DIMS, st, accel=accel,
                                         image_shape=(32, 32))
            rgb, _ = render_rays(march, oo, dd, grid.albedo(), DIMS,
                                 lights, st)
            return rgb

        a = np.asarray(frgb(accel.words, mats, o, d))
        b = np.asarray(xrgb(grid.occupancy.reshape(-1), o, d))
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4)


def test_sample_kernel_fwd_exact_on_device():
    """Round-5 field-sampling kernel: the 3-way bf16-split one-hot fetch
    must be f32-EXACT on real silicon across the FULL grid span (the
    mini-loop-cap bug this locks against dropped corners only for
    spread-out tiles — random rays over the whole grid)."""
    import jax
    import jax.numpy as jnp

    from vxtpu.render.kernel_sample import (build_field_morton,
                                            sample_fields_fwd)
    from vxtpu.render.soft import trilinear

    D = 64
    idx = jnp.arange(D * D * D, dtype=jnp.uint32).reshape(D, D, D)
    f0 = ((idx * jnp.uint32(2654435761)) >> 8).astype(jnp.float32) / 1e7
    tabs = tuple(build_field_morton(f0 * (c + 1)) for c in range(4))
    n, S = 1024, 4
    o = jax.random.uniform(jax.random.PRNGKey(0), (n, 3)) * D
    d = jax.random.normal(jax.random.PRNGKey(1), (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    t0 = jnp.zeros((n,))
    dt = jax.random.uniform(jax.random.PRNGKey(2), (n,)) * 2
    out = sample_fields_fwd(tabs, o, d, t0, dt, S, D, lit=True, window=32)
    s_idx = jnp.arange(S) + 0.5
    t_s = t0[None, :] + dt[None, :] * s_idx[:, None]
    p = o[None, :, :] + t_s[..., None] * d[None, :, :]
    for c in range(4):
        ref = trilinear(f0 * (c + 1), p, (D, D, D))
        assert float(jnp.max(jnp.abs(out[c] - ref))) == 0.0


def test_sample_kernel_grads_match_scan_vjp_on_device():
    """Field-kernel gradients == the custom-VJP scan oracle on device
    (the contract's backward-allclose criterion at hardware precision)."""
    import jax
    import jax.numpy as jnp

    from vxtpu.camera.camera import Camera
    from vxtpu.camera.rays import generate_rays
    from vxtpu.render.kernel_sample import field_from_morton
    from vxtpu.render.settings import RenderSettings
    from vxtpu.render.soft import SoftGrid
    from vxtpu.render.soft_pallas import (MortonSoftGrid,
                                          render_soft_rays_pallas)
    from vxtpu.render.vjp import render_soft_rays_fast
    from vxtpu.world import procgen
    from vxtpu.world.lights import Lights

    D = 64
    S = 16
    settings = RenderSettings(shading="lambert")
    lights = Lights.single((12.0, -20.0, 90.0), intensity=2.0)
    cam = Camera.make(pos=(-45.0, 32.0, 70.0),
                      fov_y_deg=55.0).look_at((32.0, 32.0, 18.0))
    o, d = generate_rays(cam, 32, 32)
    soft = SoftGrid.from_hard(procgen.terrain((D, D, D), seed=7),
                              sigma_solid=12.0)
    msoft = MortonSoftGrid.from_soft(soft)

    gr = jax.jit(jax.grad(lambda s: jnp.sum(render_soft_rays_fast(
        s, o, d, settings, S, lights) ** 2)))(soft)
    gp = jax.jit(jax.grad(lambda m: jnp.sum(render_soft_rays_pallas(
        m, o, d, settings, S, lights=lights, window=64) ** 2)))(msoft)
    gs = field_from_morton(gp.sigma_tab, D)
    rel = float(jnp.max(jnp.abs(gs - gr.sigma_raw))
                / (jnp.max(jnp.abs(gr.sigma_raw)) + 1e-12))
    assert rel < 1e-3
