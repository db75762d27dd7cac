"""Config 5 driver on the 8-virtual-device CPU mesh: animated scene, rays
sharded, camera-pose + voxel gradient descent per frame, checkpoint/resume
(BASELINE.json configs[4] — the end-to-end wiring VERDICT r1 flagged)."""

import os

import jax
import numpy as np
import pytest

from vxtpu.engine.sharding import make_mesh
from vxtpu.render.settings import RenderSettings
from vxtpu.train.config5 import Config5, run_config5

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices")


CFG = Config5(dims=(16, 16, 16), height=8, width=8, num_samples=24,
              frames=3, steps_per_frame=2, fps=24.0, lr=1e-1, cam_lr=1e-2,
              pose_error=0.05, ckpt_every=2, seed=3)


def test_config5_runs_and_descends(tmp_path):
    mesh = make_mesh(8)
    out = run_config5(CFG, RenderSettings(), mesh=mesh, out_dir=str(tmp_path))
    assert len(out["losses"]) == 3
    assert all(np.isfinite(out["losses"]))
    # camera pose error must shrink from the deliberate mis-init
    assert abs(out["yaw_err"]) < CFG.pose_error
    # checkpoint written (frame 2 hits ckpt_every=2, frame 3 is final)
    assert os.path.exists(tmp_path / "ckpt.npz")


def test_config5_resume(tmp_path):
    mesh = make_mesh(8)
    cfg2 = Config5(**{**CFG.__dict__, "frames": 2, "ckpt_every": 2})
    run_config5(cfg2, RenderSettings(), mesh=mesh, out_dir=str(tmp_path))
    ck = str(tmp_path / "ckpt.npz")
    assert os.path.exists(ck)

    cfg3 = Config5(**{**CFG.__dict__, "frames": 3})
    out = run_config5(cfg3, RenderSettings(), mesh=mesh,
                      out_dir=str(tmp_path), resume=ck)
    # resumed at frame 2 -> exactly one more frame
    assert len(out["losses"]) == 1
    assert np.isfinite(out["losses"][0])


def test_config5_sharded_equals_single_device(tmp_path):
    """The whole per-frame step is sharding-invariant: 8-way mesh and 1-way
    mesh produce the same loss trajectory (allclose)."""
    m8 = make_mesh(8)
    m1 = make_mesh(1)
    o8 = run_config5(CFG, RenderSettings(), mesh=m8)
    o1 = run_config5(CFG, RenderSettings(), mesh=m1)
    np.testing.assert_allclose(o8["losses"], o1["losses"], rtol=2e-4,
                               atol=1e-6)
    np.testing.assert_allclose(o8["psnrs"], o1["psnrs"], rtol=2e-3)
