"""Config-4 convergence artifact at the CONTRACT dims: a multi-view
MASKED inverse-rendering fit of a 512^3 scene (BASELINE.json:10), made
feasible on this endpoint by the round-5 Pallas field-sampling train path
(~1 s/step at 65k rays x 64 samples vs 4.1 s on the r4 XLA path).

Writes:
  tools/c4_512/curve.json        loss curve + PSNR milestones + config
  tools/c4_512/target_v0.png     view-0 target
  tools/c4_512/fit_v0.png        view-0 render of the fitted grid
  tools/c4_512/ckpt.npz          checkpoint of the fitted scene (train/
                                 checkpoint format)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_r5_c4.py
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
import numpy as np

from vxtpu.camera.camera import Camera
from vxtpu.render.settings import RenderSettings
from vxtpu.render.soft import SoftGrid, render_soft_rays
from vxtpu.train.loop import TrainConfig, fit_soft_views
from vxtpu.train.loss import psnr
from vxtpu.world import procgen

OUTDIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "c4_512")
DIMS = (512, 512, 512)
V = 6
H = W = 192
S_TARGET = 48
# 192 steps: the first full run of this driver (preserved at git d82583b/
# ec82d7f) showed loss at 1e-4 by step ~140 and flat after ~180; its 6.4 GB
# checkpoint was lost to an environment reset at 144/240 steps, so the
# committed artifact is this clean 192-step rerun
STEPS = 192


def _save_png(path, img):
    from PIL import Image

    arr = (np.clip(np.asarray(img), 0.0, 1.0) * 255).astype(np.uint8)
    Image.fromarray(arr).save(path)


def orbit_cams():
    cams = []
    cx, cz = 256.0, 140.0
    for i in range(V):
        a = 2.0 * np.pi * i / V
        pos = (cx + 420.0 * np.cos(a), cx + 420.0 * np.sin(a), 500.0)
        cams.append(Camera.make(pos=pos, fov_y_deg=55.0)
                    .look_at((cx, cx, cz)))
    return cams


def render_views(soft, cams, settings, S, batch=4096):
    """Memory-lean target renders: per-view ray chunks through the XLA
    soft renderer (the semantics oracle renders the targets; the FIT uses
    the Pallas kernels — so the artifact also cross-checks the two)."""
    from vxtpu.camera.rays import generate_rays

    # soft is a jit ARGUMENT, not a closure constant: a closed-over 2.1 GB
    # grid would be inlined into the MLIR payload (the axon remote
    # compiler rejects >~100 MB bodies — r1 note in bench.py)
    f = jax.jit(lambda s_, o_, d_: render_soft_rays(
        s_, o_, d_, settings, S)[0])
    imgs = []
    for cam in cams:
        o, d = generate_rays(cam, H, W)
        rows = []
        for i in range(0, o.shape[0], batch):
            rows.append(jax.device_get(
                f(soft, o[i:i + batch], d[i:i + batch])))
        imgs.append(np.concatenate(rows, axis=0).reshape(H, W, 3))
    return np.stack(imgs)


SEG = 48  # steps per process segment


def segment():
    """One resume segment. The endpoint deterministically faults a
    ~46th execution of this train program in one process (RESOURCE_
    EXHAUSTED regardless of queue depth or per-step sync — the same
    program-execution-fault family as the r4 bounds-march kill), so the
    fit runs as SEG-step segments across fresh processes resumed from
    the checkpoint — which doubles as the contract's checkpoint/resume
    demonstration at full 512^3 scale."""
    from vxtpu.train.checkpoint import (load_checkpoint, load_opt_state,
                                        save_checkpoint)
    from vxtpu.train.loop import make_optimizer

    os.makedirs(OUTDIR, exist_ok=True)
    settings = RenderSettings(shading="flat")
    cams = orbit_cams()
    tgt_path = os.path.join(OUTDIR, "targets.npy")
    if os.path.exists(tgt_path):
        targets = np.load(tgt_path)
    else:
        truth = SoftGrid.from_hard(procgen.terrain(DIMS, seed=7),
                                   sigma_solid=25.0)
        t0 = time.perf_counter()
        targets = render_views(truth, cams, settings, S_TARGET)
        del truth
        print(f"targets rendered in {time.perf_counter() - t0:.0f}s",
              flush=True)
        np.save(tgt_path, targets)
        _save_png(os.path.join(OUTDIR, "target_v0.png"), targets[0])

    ckpt = os.path.join(OUTDIR, "ckpt.npz")
    curve_path = os.path.join(OUTDIR, "curve.json")
    curve = dict(dims=list(DIMS), views=V, hw=[H, W], samples_fit=16,
                 masked=True, mask_scale=8, steps_total=STEPS,
                 segments=[], losses=[],
                 path="field_kernel(Pallas sample fwd/bwd) + occ_mask, "
                      "checkpoint/resume every %d steps" % SEG)
    if os.path.exists(curve_path):
        with open(curve_path) as f:
            curve = json.load(f)
    start = len(curve["losses"])
    if start and not os.path.exists(ckpt):
        # the checkpoint is gitignored (6.4 GB); losing it (e.g. an
        # environment reset between sessions) makes the recorded curve
        # unresumable — fail LOUDLY instead of silently restarting from
        # zeros and appending discontinuous losses to the artifact
        raise SystemExit(
            f"curve.json records {start} steps but {ckpt} is missing; "
            "archive/delete curve.json to restart the fit from scratch")
    if start >= STEPS:
        print("fit complete", flush=True)
        return finalize(cams, targets, settings, ckpt, curve, curve_path)

    cfg = TrainConfig(
        lr=5e-2, steps=min(SEG, STEPS - start), num_samples=16,
        tv_sigma=1e-5, tv_rgb=1e-6,
        field_kernel=True, field_window=64,
        occ_mask=True, mask_scale=8, mask_refresh=60, mask_tau=0.01,
        nan_check_every=8)
    soft = SoftGrid.zeros(DIMS)
    opt_state = None
    if start and os.path.exists(ckpt):
        from vxtpu.render.soft_pallas import MortonSoftGrid

        soft, _, _, _ = load_checkpoint(ckpt)
        # the field-kernel path optimizes the MORTON-layout tables, so
        # the optimizer-state template must be Morton-shaped too
        opt_state = load_opt_state(
            ckpt, make_optimizer(cfg).init(MortonSoftGrid.from_soft(soft)))

    t0 = time.perf_counter()
    soft, losses, opt_state = fit_soft_views(
        soft, cams, jnp.asarray(targets), settings, cfg,
        log_fn=lambda i, l: print(f"step {start + i}: loss {l:.5f}",
                                  flush=True),
        opt_state=opt_state)
    seg_s = time.perf_counter() - t0
    save_checkpoint(ckpt, soft, cams[0], start + len(losses), None,
                    opt_state=opt_state, compress=False)
    curve["losses"].extend([round(float(l), 6) for l in losses])
    curve["segments"].append(dict(start=start, steps=len(losses),
                                  seconds=round(seg_s, 1)))
    with open(curve_path, "w") as f:
        json.dump(curve, f, indent=1)
    done = len(curve["losses"])
    print(f"segment done: steps {start}..{done} "
          f"({seg_s / max(len(losses), 1):.2f} s/step)", flush=True)
    if done >= STEPS:
        return finalize(cams, targets, settings, ckpt, curve, curve_path)
    return 1  # more segments needed


def finalize(cams, targets, settings, ckpt, curve, curve_path):
    from vxtpu.train.checkpoint import load_checkpoint

    soft, _, _, _ = load_checkpoint(ckpt)
    fits = render_views(soft, cams[:1], settings, S_TARGET)
    _save_png(os.path.join(OUTDIR, "fit_v0.png"), fits[0])
    p = float(psnr(jnp.asarray(fits[0]), jnp.asarray(targets[0])))
    curve["psnr_v0"] = round(p, 2)
    curve["loss_first"] = curve["losses"][0]
    curve["loss_last"] = curve["losses"][-1]
    with open(curve_path, "w") as f:
        json.dump(curve, f, indent=1)
    print(f"PSNR v0: {p:.2f}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(segment())
