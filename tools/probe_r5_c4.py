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
# 144 steps: the first full run of this driver (preserved at git d82583b/
# ec82d7f) showed loss at 1e-4 (PSNR ~40 dB) by step ~140 and essentially
# flat after; its 6.4 GB checkpoint was lost to an environment reset at
# 144/240 steps, so the committed artifact is this clean 144-step rerun
# (3 checkpoint/resume segments)
STEPS = 144


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
    """Render the fitted field and score PSNR.

    The fit trains the MASKED model (render/occmask.py): sampling is
    restricted to the occupied band, so voxels outside it are never
    supervised and retain the init density (softplus(-2) ~ 0.13/cell) —
    an UNMASKED render of the raw field therefore integrates haze that
    the training loss never saw (first finalize attempt measured 14.6 dB
    that way). Two honest renders instead:

      1. the TRAINING operator (masked, S=16 — what the loss optimized);
      2. the field with the mask BAKED IN (density outside the coarse
         mask clamped to ~0), rendered unmasked at S=48 — the exported
         artifact usable by any renderer.
    """
    import functools

    from vxtpu.render.occmask import (mask_distance_field,
                                      mask_segment_bounds,
                                      occupancy_mask_from_soft)
    from vxtpu.train.checkpoint import load_checkpoint

    soft, _, _, _ = load_checkpoint(ckpt)
    mask = occupancy_mask_from_soft(soft, 8, tau=0.01, dilate=1)
    df = mask_distance_field(mask)
    bounds_fn = jax.jit(functools.partial(mask_segment_bounds, scale=8))

    from vxtpu.camera.rays import generate_rays

    o, d = generate_rays(cams[0], H, W)
    t0b, t1b = bounds_fn(mask, o=o, d=d, df_flat=df)
    f_masked = jax.jit(lambda s_, o_, d_, b0, b1: render_soft_rays(
        s_, o_, d_, settings, 16, mask=mask, mask_scale=8,
        seg_bounds=(b0, b1))[0])
    rows = []
    for i in range(0, o.shape[0], 4096):
        rows.append(jax.device_get(f_masked(
            soft, o[i:i + 4096], d[i:i + 4096],
            t0b[i:i + 4096], t1b[i:i + 4096])))
    fit_m = np.concatenate(rows, axis=0).reshape(H, W, 3)
    p_masked = float(psnr(jnp.asarray(fit_m), jnp.asarray(targets[0])))
    _save_png(os.path.join(OUTDIR, "fit_v0.png"), fit_m)

    # ---- bake: clamp density outside the coarse mask, render unmasked
    @jax.jit
    def bake(s_, m_):
        fine = jnp.repeat(jnp.repeat(jnp.repeat(
            m_, 8, axis=0), 8, axis=1), 8, axis=2)
        return s_.replace(sigma_raw=jnp.where(fine, s_.sigma_raw, -10.0))

    baked = bake(soft, mask)
    fits = render_views(baked, cams[:1], settings, S_TARGET)
    _save_png(os.path.join(OUTDIR, "fit_v0_baked.png"), fits[0])
    p_baked = float(psnr(jnp.asarray(fits[0]), jnp.asarray(targets[0])))

    curve["psnr_v0"] = round(p_masked, 2)
    curve["psnr_v0_baked_unmasked_s48"] = round(p_baked, 2)
    curve["psnr_note"] = (
        "psnr_v0: training operator (masked, S=16) vs the S=48 target; "
        "baked: density outside the coarse occupancy mask clamped to ~0, "
        "rendered unmasked at S=48 (the exportable field)")
    curve["loss_first"] = curve["losses"][0]
    curve["loss_last"] = curve["losses"][-1]
    with open(curve_path, "w") as f:
        json.dump(curve, f, indent=1)
    print(f"PSNR v0 masked-S16: {p_masked:.2f}  baked-S48: {p_baked:.2f}",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(segment())
