"""Parity of the wavefront (compaction) march against the per-ray oracle
and the batched distance-field march — including schedules that force many
compaction rounds and the safety drain loop, so the round machinery itself
is exercised, not just the happy path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vxtpu.camera.camera import Camera
from vxtpu.camera.rays import generate_rays
from vxtpu.render.kernel_wavefront import march_wavefront, make_march_wavefront
from vxtpu.render.kernel_xla import march_xla_df
from vxtpu.render.pipeline import render_image
from vxtpu.render.settings import RenderSettings
from vxtpu.world import distfield, procgen
from vxtpu.world.lights import Lights

DIMS = (32, 32, 32)


@pytest.fixture(scope="module")
def scene():
    grid = procgen.terrain(DIMS, seed=5, with_rgb=True)
    df = distfield.build(grid.occupancy, cap=24)
    cam = Camera.make(pos=(-22.0, 16.0, 36.0), fov_y_deg=55.0).look_at(
        (16.0, 16.0, 9.0))
    o, d = generate_rays(cam, 24, 24)
    return grid, df, o, d


def _assert_same(a, b, what):
    np.testing.assert_array_equal(np.asarray(a.hit), np.asarray(b.hit),
                                  err_msg=f"{what}: hit")
    h = np.asarray(a.hit)
    np.testing.assert_allclose(np.asarray(a.t)[h], np.asarray(b.t)[h],
                               rtol=1e-5, atol=1e-4, err_msg=f"{what}: t")
    np.testing.assert_array_equal(np.asarray(a.voxel)[h],
                                  np.asarray(b.voxel)[h],
                                  err_msg=f"{what}: voxel")
    np.testing.assert_array_equal(np.asarray(a.normal)[h],
                                  np.asarray(b.normal)[h],
                                  err_msg=f"{what}: normal")


def test_wavefront_matches_df_march(scene):
    grid, df, o, d = scene
    ms = sum(DIMS) + 2
    ref = march_xla_df(o, d, df.field.reshape(-1), DIMS, ms)
    wf = march_wavefront(o, d, df.field.reshape(-1), DIMS, ms)
    _assert_same(wf, ref, "default schedule")


def test_wavefront_multi_round_schedules(scene):
    """Tiny buffers / tiny step counts force many rounds + the drain loop."""
    grid, df, o, d = scene
    ms = sum(DIMS) + 2
    ref = march_xla_df(o, d, df.field.reshape(-1), DIMS, ms)
    for schedule, drain in [
        (((64, 2),), 64),              # everything lands in the drain loop
        (((128, 3), (64, 5)), 32),     # several explicit rounds
        ((), 96),                      # no schedule at all: pure drain
    ]:
        wf = march_wavefront(o, d, df.field.reshape(-1), DIMS, ms,
                             schedule=schedule, drain_buf=drain,
                             drain_steps=4)
        _assert_same(wf, ref, f"schedule={schedule}")


def test_wavefront_t_max_shadow_semantics(scene):
    grid, df, o, d = scene
    ms = sum(DIMS) + 2
    t_max = jnp.full((o.shape[0],), 18.0, jnp.float32)
    ref = march_xla_df(o, d, df.field.reshape(-1), DIMS, ms, t_max=t_max)
    wf = march_wavefront(o, d, df.field.reshape(-1), DIMS, ms, t_max=t_max,
                         schedule=((96, 4),), drain_buf=48, drain_steps=6)
    _assert_same(wf, ref, "t_max")


def test_wavefront_full_image_pipeline(scene):
    """Full shaded frame (incl. shadow marches through the same kernel)
    pixel-identical to the df-march pipeline."""
    grid, df, o, d = scene
    from vxtpu.render.kernel_xla import make_march_xla

    settings = RenderSettings(shading="full", shadows=True, fog=True)
    lights = Lights.single((5.0, -10.0, 45.0), intensity=2.0)
    img_ref = render_image(make_march_xla, grid,
                           Camera.make(pos=(-22.0, 16.0, 36.0),
                                       fov_y_deg=55.0).look_at((16., 16., 9.)),
                           lights, settings, 24, 24, df)
    img_wf = render_image(make_march_wavefront, grid,
                          Camera.make(pos=(-22.0, 16.0, 36.0),
                                      fov_y_deg=55.0).look_at((16., 16., 9.)),
                          lights, settings, 24, 24, df)
    np.testing.assert_allclose(np.asarray(img_wf), np.asarray(img_ref),
                               rtol=1e-5, atol=1e-5)


def test_wavefront_jit_and_empty_grid():
    grid = procgen.terrain((16, 16, 16), seed=1)
    empty = jnp.zeros((16, 16, 16), jnp.uint8)
    df = distfield.build(empty, cap=8)
    cam = Camera.make(pos=(-10.0, 8.0, 8.0)).look_at((8.0, 8.0, 8.0))
    o, d = generate_rays(cam, 8, 8)
    fn = jax.jit(lambda o, d, f: march_wavefront(o, d, f, (16, 16, 16), 50))
    rec = fn(o, d, df.field.reshape(-1))
    assert not bool(jnp.any(rec.hit))


def test_adaptive_schedule_inside_camera(scene):
    """A camera INSIDE the grid makes 100% of rays AABB-valid — the r2
    hardcoded 9/16 round-1 buffer would overflow into drain rounds. The
    valid_count-adaptive default must size round 1 to hold every valid ray
    and still match the reference exactly."""
    from vxtpu.render.kernel_wavefront import (_default_schedule,
                                               count_valid_rays)

    grid, df, _, _ = scene
    cam = Camera.make(pos=(16.0, 16.0, 20.0), fov_y_deg=70.0).look_at(
        (30.0, 16.0, 8.0))
    o, d = generate_rays(cam, 24, 24)
    ms = sum(DIMS) + 2
    vc = count_valid_rays(o, d, DIMS)
    assert vc == o.shape[0], "inside camera: every ray is valid"
    sched = _default_schedule(o.shape[0], ms, vc)
    assert sched[0][0] >= vc, "round 1 must fit every valid ray"

    ref = march_xla_df(o, d, df.field.reshape(-1), DIMS, ms)
    wf = march_wavefront(o, d, df.field.reshape(-1), DIMS, ms,
                         valid_count=vc)
    _assert_same(wf, ref, "adaptive schedule, inside camera")


def test_wavefront_stats_accounting(scene):
    """stats=True execution counters are self-consistent: counts bounded by
    buffers, gathered lanes == sum(B*steps), and results identical to the
    stats=False path."""
    grid, df, o, d = scene
    ms = sum(DIMS) + 2
    schedule = ((256, 4), (128, 8))
    rec_plain = march_wavefront(o, d, df.field.reshape(-1), DIMS, ms,
                                schedule=schedule, drain_buf=64,
                                drain_steps=6)
    rec, st = march_wavefront(o, d, df.field.reshape(-1), DIMS, ms,
                              schedule=schedule, drain_buf=64,
                              drain_steps=6, stats=True)
    _assert_same(rec, rec_plain, "stats path")
    assert int(st["valid"]) == int(
        jnp.sum(jnp.asarray(count_valid_rays_helper(o, d))))
    lanes = sum(B * int(s) for (B, _), s in zip(schedule, st["round_steps"]))
    lanes += 64 * int(st["drain_steps_total"])
    assert int(st["gathered_lanes"]) == lanes
    for (B, _), cnt in zip(schedule, st["round_counts"]):
        assert 0 <= int(cnt) <= B


def count_valid_rays_helper(o, d):
    from vxtpu.render import dda

    _, _, valid = dda.ray_grid_clip(o, d, DIMS)
    return valid.astype(jnp.int32)
