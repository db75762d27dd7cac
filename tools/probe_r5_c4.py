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
STEPS = 240


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


def main():
    os.makedirs(OUTDIR, exist_ok=True)
    settings = RenderSettings(shading="flat")
    truth = SoftGrid.from_hard(procgen.terrain(DIMS, seed=7),
                               sigma_solid=25.0)
    cams = orbit_cams()
    t0 = time.perf_counter()
    targets = render_views(truth, cams, settings, S_TARGET)
    del truth
    t_targets = time.perf_counter() - t0
    print(f"targets rendered in {t_targets:.0f}s", flush=True)
    for v in (0,):
        _save_png(os.path.join(OUTDIR, f"target_v{v}.png"), targets[v])

    cfg = TrainConfig(
        lr=5e-2, steps=STEPS, num_samples=16, tv_sigma=1e-5, tv_rgb=1e-6,
        field_kernel=True, field_window=64,
        occ_mask=True, mask_scale=8, mask_refresh=60, mask_tau=0.01,
        # hard-sync EVERY step: at 512^3 a ~20-deep async step queue
        # reserves transient workspace per queued step and trips the
        # endpoint's RESOURCE_EXHAUSTED fault (died at step ~46 with
        # nan_check_every=20); the NaN guard's float() is the sync
        nan_check_every=1)
    log = []

    def log_fn(i, loss):
        log.append((i, loss))
        print(f"step {i}: loss {loss:.5f}", flush=True)

    t0 = time.perf_counter()
    soft, losses, _ = fit_soft_views(
        SoftGrid.zeros(DIMS), cams, jnp.asarray(targets), settings, cfg,
        log_fn=log_fn)
    t_fit = time.perf_counter() - t0
    print(f"fit: {STEPS} steps in {t_fit:.0f}s "
          f"({t_fit / STEPS * 1e3:.0f} ms/step)", flush=True)

    fits = render_views(soft, cams[:1], settings, S_TARGET)
    _save_png(os.path.join(OUTDIR, "fit_v0.png"), fits[0])
    p = float(psnr(jnp.asarray(fits[0]), jnp.asarray(targets[0])))

    from vxtpu.train.checkpoint import save_checkpoint

    save_checkpoint(os.path.join(OUTDIR, "ckpt.npz"), soft, cams[0],
                    STEPS, None)

    with open(os.path.join(OUTDIR, "curve.json"), "w") as f:
        json.dump(dict(
            dims=list(DIMS), views=V, hw=[H, W],
            samples_fit=cfg.num_samples, masked=True,
            mask_scale=cfg.mask_scale, steps=STEPS,
            loss_first=losses[0], loss_last=losses[-1],
            loss_curve_every20=[(i, l) for i, l in log],
            psnr_v0=round(p, 2),
            fit_seconds=round(t_fit, 1),
            ms_per_step=round(t_fit / STEPS * 1e3, 1),
            path="field_kernel(Pallas sample fwd/bwd) + occ_mask"), f,
            indent=1)
    print(f"PSNR v0: {p:.2f}", flush=True)


if __name__ == "__main__":
    main()
