"""Parity: the windowed Pallas march kernel v2 (render/kernel_pallas_v2,
interpret mode on CPU) must reproduce the per-ray oracle — including tiny
windows that force heavy stalling, image-patch tiling, and t_max shadow
semantics. Same contract as v1 (tests/test_pallas.py, SURVEY.md §5)."""

import jax.numpy as jnp
import numpy as np
import pytest

from vxtpu.camera.camera import Camera
from vxtpu.camera.rays import generate_rays
from vxtpu.render.kernel_pallas_v2 import march_pallas_v2, make_march_pallas_v2
from vxtpu.render.kernel_ref import make_march_ref
from vxtpu.render.settings import RenderSettings
from vxtpu.world import procgen
from vxtpu.world.packed import build_packed_morton, morton3

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


def test_morton_is_bijection():
    S = 16
    ii, jj, kk = jnp.meshgrid(jnp.arange(S), jnp.arange(S), jnp.arange(S),
                              indexing="ij")
    m = np.asarray(morton3(ii, jj, kk)).reshape(-1)
    assert sorted(m.tolist()) == list(range(S ** 3))


def test_morton_table_roundtrip():
    """Every cell's packed word lands at its morton index, in the signed
    bf16 encoding (+child_bits for occupied cells, -D for empty ones)."""
    grid = scenes()["terrain"]
    from vxtpu.world.packed import _packed_words

    acc_m = build_packed_morton(grid.occupancy)
    assert acc_m.words.dtype == jnp.float32  # storage f32; kernel casts window to bf16
    words_rm = np.asarray(_packed_words(grid.occupancy, 64)).astype(np.int32)
    flat_m = np.asarray(acc_m.words.astype(jnp.float32)).reshape(-1)
    for (x, y, z) in [(0, 0, 0), (3, 7, 11), (15, 15, 15), (8, 1, 14)]:
        mi = int(morton3(jnp.int32(x), jnp.int32(y), jnp.int32(z)))
        w = words_rm[x, y, z]
        cb, dist = w & 255, w >> 8
        expect = cb if cb > 0 else -dist
        assert flat_m[mi] == expect, (flat_m[mi], cb, dist)


def _check(r, f, min_agree=1.0):
    hit_r, hit_f = np.array(r.hit), np.array(f.hit)
    agree = (hit_r == hit_f).mean()
    assert agree >= min_agree, f"hit mask agreement {agree}"
    both = hit_r & hit_f
    np.testing.assert_allclose(
        np.array(r.t)[both], np.array(f.t)[both], rtol=1e-4, atol=1e-3
    )
    same_vox = (np.array(r.voxel)[both] == np.array(f.voxel)[both]).all(axis=-1)
    assert same_vox.mean() > 0.998
    nr, nf = np.array(r.normal)[both], np.array(f.normal)[both]
    assert (np.abs(nr - nf) < 1e-6).all(axis=-1).mean() > 0.995


@pytest.mark.parametrize("scene_name", ["box", "sphere", "terrain"])
@pytest.mark.parametrize("cam_name", ["outside", "inside"])
def test_pallas_v2_march_parity(scene_name, cam_name):
    grid = scenes()[scene_name]
    cam = cameras()[cam_name]
    settings = RenderSettings()
    occ_flat = grid.occupancy.reshape(-1)
    ref = make_march_ref(occ_flat, DIMS, settings, None)
    fast = make_march_pallas_v2(occ_flat, DIMS, settings,
                                image_shape=(32, 32), interpret=True)
    o, d = generate_rays(cam, 32, 32)
    _check(ref(o, d), fast(o, d), min_agree=0.998)


@pytest.mark.parametrize("window", [2, 4, 64])
def test_pallas_v2_window_invariance(window):
    """The window size is a performance knob, never a semantics knob: a
    2-row window forces heavy stalling yet must produce identical results
    to a window covering the whole table."""
    grid = scenes()["terrain"]
    settings = RenderSettings()
    accel = build_packed_morton(grid.occupancy)
    cam = cameras()["outside"]
    o, d = generate_rays(cam, 16, 16)
    ms = settings.resolve_max_steps(DIMS)
    a = march_pallas_v2(o, d, accel, DIMS, ms, image_shape=(16, 16),
                        window=window, interpret=True)
    b = march_pallas_v2(o, d, accel, DIMS, ms, image_shape=(16, 16),
                        window=accel.rows, interpret=True)
    assert (np.array(a.hit) == np.array(b.hit)).all()
    h = np.array(a.hit)
    np.testing.assert_allclose(np.array(a.t)[h], np.array(b.t)[h], rtol=1e-6)
    assert (np.array(a.voxel)[h] == np.array(b.voxel)[h]).all()


def test_pallas_v2_tmax_shadow_semantics():
    grid = scenes()["terrain"]
    occ_flat = grid.occupancy.reshape(-1)
    settings = RenderSettings()
    accel = build_packed_morton(grid.occupancy)
    cam = cameras()["outside"]
    o, d = generate_rays(cam, 16, 16)
    tm = jnp.full((o.shape[0],), 18.0, jnp.float32)
    ref = make_march_ref(occ_flat, DIMS, settings, None)
    r = ref(o, d, t_max=tm)
    f = march_pallas_v2(o, d, accel, DIMS, settings.resolve_max_steps(DIMS),
                        t_max=tm, image_shape=(16, 16), interpret=True)
    assert (np.array(r.hit) == np.array(f.hit)).mean() > 0.99


def test_pallas_v2_flat_fallback_and_padding():
    """No image_shape (scanline tiles) and N not a tile multiple."""
    grid = scenes()["box"]
    accel = build_packed_morton(grid.occupancy)
    cam = cameras()["outside"]
    o, d = generate_rays(cam, 9, 13)  # 117 rays
    rec = march_pallas_v2(o, d, accel, DIMS, 128, interpret=True)
    assert rec.hit.shape == (117,)
    assert bool(rec.hit.any())
    # non-tile-multiple image shape exercises 2D padding
    rec2 = march_pallas_v2(o, d, accel, DIMS, 128, image_shape=(9, 13),
                           interpret=True)
    assert (np.array(rec.hit) == np.array(rec2.hit)).all()


def test_pallas_v2_block_permutation_invariance():
    """block_shape is a layout knob, never a semantics knob: 32x32 image
    blocks must produce bitwise-identical hits to the 8x128 strip tiling
    (the permutation + inverse round-trips every ray)."""
    grid = scenes()["terrain"]
    accel = build_packed_morton(grid.occupancy)
    cam = cameras()["outside"]
    H, W = 40, 40  # non-multiple of 32: exercises block padding
    o, d = generate_rays(cam, H, W)
    ms = 128
    a = march_pallas_v2(o, d, accel, DIMS, ms, image_shape=(H, W),
                        window=16, interpret=True)
    b = march_pallas_v2(o, d, accel, DIMS, ms, image_shape=(H, W),
                        window=16, block_shape=(32, 32), interpret=True)
    assert (np.array(a.hit) == np.array(b.hit)).all()
    h = np.array(a.hit)
    np.testing.assert_allclose(np.array(a.t)[h], np.array(b.t)[h], rtol=1e-6)
    assert (np.array(a.voxel)[h] == np.array(b.voxel)[h]).all()
    assert (np.array(a.normal)[h] == np.array(b.normal)[h]).all()


def test_pallas_v2_sublane_windows_invariance():
    """sublane_windows (8 per-sub-row windows) is a performance knob, never
    a semantics knob: results must match the shared-window path exactly."""
    grid = scenes()["terrain"]
    accel = build_packed_morton(grid.occupancy)
    cam = cameras()["outside"]
    o, d = generate_rays(cam, 64, 64)
    ms = 128
    a = march_pallas_v2(o, d, accel, DIMS, ms, image_shape=(64, 64),
                        window=8, block_shape=(32, 32), interpret=True)
    b = march_pallas_v2(o, d, accel, DIMS, ms, image_shape=(64, 64),
                        window=8, block_shape=(32, 32),
                        sublane_windows=True, interpret=True)
    assert (np.array(a.hit) == np.array(b.hit)).all()
    h = np.array(a.hit)
    np.testing.assert_allclose(np.array(a.t)[h], np.array(b.t)[h], rtol=1e-6)
    assert (np.array(a.voxel)[h] == np.array(b.voxel)[h]).all()


def test_pallas_v2_sorted_multiround_parity():
    """march_pallas_v2_sorted (capped round-0 -> Morton-sorted resume ->
    while-drain) must match the single-round kernel exactly, including
    when tiny budgets/buffers force real resumes and drain trips."""
    from vxtpu.render.kernel_pallas_v2 import march_pallas_v2_sorted

    grid = scenes()["terrain"]
    accel = build_packed_morton(grid.occupancy)
    for cam in cameras().values():
        o, d = generate_rays(cam, 64, 64)
        a = march_pallas_v2(o, d, accel, DIMS, 128, image_shape=(64, 64),
                            window=16, block_shape=(32, 32), interpret=True)
        b = march_pallas_v2_sorted(
            o, d, accel, DIMS, 128, image_shape=(64, 64), window=16,
            block_shape=(32, 32), round0_iters=6, survivor_frac=8,
            resume_window=8, interpret=True)
        assert (np.array(a.hit) == np.array(b.hit)).all()
        h = np.array(a.hit)
        np.testing.assert_allclose(np.array(a.t)[h], np.array(b.t)[h],
                                   rtol=1e-6)
        assert (np.array(a.voxel)[h] == np.array(b.voxel)[h]).all()
        assert (np.array(a.normal)[h] == np.array(b.normal)[h]).all()


def test_pallas_v2_resume_fresh_sentinel():
    """A resume with every ray marked -2 (entry fetch pending) must equal a
    from-scratch march: the fresh path re-fetches the given entry voxel."""
    import jax.numpy as jnp

    from vxtpu.render import dda

    grid = scenes()["box"]
    accel = build_packed_morton(grid.occupancy)
    cam = cameras()["outside"]
    o, d = generate_rays(cam, 32, 32)
    a = march_pallas_v2(o, d, accel, DIMS, 128, image_shape=(32, 32),
                        window=accel.rows, interpret=True)
    t_enter, _, _ = dda.ray_grid_clip(o, d, DIMS)
    v0, _, _, _ = dda.dda_init(o, d, t_enter, DIMS)
    b = march_pallas_v2(o, d, accel, DIMS, 128, image_shape=(32, 32),
                        window=accel.rows,
                        resume_state=(v0, jnp.full((o.shape[0],), -2,
                                                   jnp.int32)),
                        interpret=True)
    assert (np.array(a.hit) == np.array(b.hit)).all()
    h = np.array(a.hit)
    np.testing.assert_allclose(np.array(a.t)[h], np.array(b.t)[h], rtol=1e-6)


def _bimodal_scene():
    """Two solid boxes in OPPOSITE top-level octants of a 32^3 grid: their
    coarse cells differ in the highest Morton bits, so a ray tile spanning
    both is bimodal in table-row space — the exact case split_window's two
    half-segments exist for (one contiguous window cannot cover both)."""
    import jax.numpy as jnp

    occ = jnp.zeros((32, 32, 32), jnp.uint8)
    occ = occ.at[2:10, 2:10, 2:10].set(3)
    occ = occ.at[22:30, 22:30, 22:30].set(4)
    from vxtpu.world.grid import VoxelGrid

    return VoxelGrid(occupancy=occ)


@pytest.mark.parametrize("window", [2, 4, 8, 64])
def test_pallas_v2_split_window_invariance(window):
    """split_window is a performance knob, never a semantics knob — even at
    tiny windows that force heavy stalling, and on a Morton-bimodal scene
    where the two half-segments genuinely land in different octants."""
    grid = _bimodal_scene()
    accel = build_packed_morton(grid.occupancy)
    cam = Camera.make(pos=(-14.0, -10.0, 40.0)).look_at((16.0, 16.0, 16.0))
    o, d = generate_rays(cam, 32, 32)
    ms = 128
    a = march_pallas_v2(o, d, accel, DIMS, ms, image_shape=(32, 32),
                        window=window, split_window=True, interpret=True)
    b = march_pallas_v2(o, d, accel, DIMS, ms, image_shape=(32, 32),
                        window=accel.rows, split_window=False,
                        interpret=True)
    assert bool(b.hit.any())
    assert (np.array(a.hit) == np.array(b.hit)).all()
    h = np.array(a.hit)
    np.testing.assert_allclose(np.array(a.t)[h], np.array(b.t)[h], rtol=1e-6)
    assert (np.array(a.voxel)[h] == np.array(b.voxel)[h]).all()
    assert (np.array(a.steps) == np.array(b.steps)).all()


def test_pallas_v2_split_window_odd_degrades():
    """An odd effective window degrades split to the contiguous path
    (identical results) instead of building a mis-sized segment pair."""
    grid = scenes()["terrain"]
    accel = build_packed_morton(grid.occupancy)
    cam = cameras()["outside"]
    o, d = generate_rays(cam, 16, 16)
    a = march_pallas_v2(o, d, accel, DIMS, 128, image_shape=(16, 16),
                        window=3, split_window=True, interpret=True)
    b = march_pallas_v2(o, d, accel, DIMS, 128, image_shape=(16, 16),
                        window=3, split_window=False, interpret=True)
    assert (np.array(a.hit) == np.array(b.hit)).all()
    h = np.array(a.hit)
    np.testing.assert_allclose(np.array(a.t)[h], np.array(b.t)[h], rtol=1e-6)


def test_pallas_v2_sorted_steps_continuity():
    """Resumed rays thread their prior-round step counts through
    resume_state, so rec.steps from the multi-round driver equals the
    single-round kernel's counts EXACTLY (not just per-round budgets)."""
    from vxtpu.render.kernel_pallas_v2 import march_pallas_v2_sorted

    grid = scenes()["terrain"]
    accel = build_packed_morton(grid.occupancy)
    cam = cameras()["outside"]
    o, d = generate_rays(cam, 64, 64)
    a = march_pallas_v2(o, d, accel, DIMS, 128, image_shape=(64, 64),
                        window=16, block_shape=(32, 32), interpret=True)
    b = march_pallas_v2_sorted(
        o, d, accel, DIMS, 128, image_shape=(64, 64), window=16,
        block_shape=(32, 32), round0_iters=6, survivor_frac=8,
        resume_window=8, interpret=True)
    assert (np.array(a.steps) == np.array(b.steps)).all()


@pytest.mark.parametrize("scene_name", ["terrain"])
def test_pallas_v2_local_advance_invariance(scene_name):
    """local_advance (same-coarse-cell steps resolved from the cb carry,
    no fetch, no window constraint) is a performance knob, never a
    semantics knob — including under tiny windows where it changes which
    rays constrain the window base."""
    grid = scenes()[scene_name]
    accel = build_packed_morton(grid.occupancy)
    for cam in cameras().values():
        o, d = generate_rays(cam, 32, 32)
        for window in (4, 32):
            a = march_pallas_v2(o, d, accel, DIMS, 128,
                                image_shape=(32, 32), window=window,
                                local_advance=False, interpret=True)
            b = march_pallas_v2(o, d, accel, DIMS, 128,
                                image_shape=(32, 32), window=window,
                                local_advance=True, interpret=True)
            assert (np.array(a.hit) == np.array(b.hit)).all()
            h = np.array(a.hit)
            np.testing.assert_allclose(np.array(a.t)[h], np.array(b.t)[h],
                                       rtol=1e-6)
            assert (np.array(a.voxel)[h] == np.array(b.voxel)[h]).all()
            assert (np.array(a.normal)[h] == np.array(b.normal)[h]).all()
            assert (np.array(a.steps) == np.array(b.steps)).all()


def test_pallas_v2_local_advance_resume_parity():
    """A resumed ray's cb carry is unknown until its first fetch (cbok=0):
    the multi-round driver must stay exact with local_advance on."""
    from vxtpu.render.kernel_pallas_v2 import march_pallas_v2_sorted

    grid = scenes()["terrain"]
    accel = build_packed_morton(grid.occupancy)
    cam = cameras()["inside"]
    o, d = generate_rays(cam, 64, 64)
    a = march_pallas_v2(o, d, accel, DIMS, 128, image_shape=(64, 64),
                        window=16, block_shape=(32, 32), interpret=True)
    b = march_pallas_v2_sorted(
        o, d, accel, DIMS, 128, image_shape=(64, 64), window=16,
        block_shape=(32, 32), round0_iters=4, survivor_frac=4,
        resume_window=8, interpret=True)
    assert (np.array(a.hit) == np.array(b.hit)).all()
    h = np.array(a.hit)
    np.testing.assert_allclose(np.array(a.t)[h], np.array(b.t)[h],
                               rtol=1e-6)


@pytest.mark.parametrize("window", [2, 8, 64])
def test_pallas_v2_split_matmul2_invariance(window):
    """split_matmul2 (two per-segment MXU products instead of the window
    concat) is bit-identical to the concat split path."""
    grid = _bimodal_scene()
    accel = build_packed_morton(grid.occupancy)
    cam = Camera.make(pos=(-14.0, -10.0, 40.0)).look_at((16.0, 16.0, 16.0))
    o, d = generate_rays(cam, 32, 32)
    a = march_pallas_v2(o, d, accel, DIMS, 128, image_shape=(32, 32),
                        window=window, split_window=True,
                        split_matmul2=False, interpret=True)
    b = march_pallas_v2(o, d, accel, DIMS, 128, image_shape=(32, 32),
                        window=window, split_window=True,
                        split_matmul2=True, interpret=True)
    assert (np.array(a.hit) == np.array(b.hit)).all()
    h = np.array(a.hit)
    np.testing.assert_allclose(np.array(a.t)[h], np.array(b.t)[h],
                               rtol=1e-6)
    assert (np.array(a.voxel)[h] == np.array(b.voxel)[h]).all()
    assert (np.array(a.steps) == np.array(b.steps)).all()
