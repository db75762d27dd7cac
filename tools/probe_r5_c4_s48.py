"""Additive S=48 refine of the c4 512^3 artifact.

The 144-step fit converged under its S=16 training operator (42.7 dB) but
transfers poorly to S=48 rendering (14.6 dB — the field compensates for
the coarse quadrature, curve.json psnr_note). This refines the SAME
checkpoint for a few steps under the S=48 operator (the one the targets
were rendered with), writing results to separate keys/files so the
original artifact is untouched:

  tools/c4_512/curve.json   += "s48_refine": {losses, psnr_v0_s48, steps}
  tools/c4_512/fit_v0_s48.png

Resumable the same way as probe_r5_c4 (segments across processes); the
refined checkpoint lives in ckpt_s48.npz.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_r5_c4_s48.py
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
from vxtpu.train.loop import TrainConfig, fit_soft_views, make_optimizer
from vxtpu.train.loss import psnr
from vxtpu.train.checkpoint import (load_checkpoint, load_opt_state,
                                    save_checkpoint)

OUTDIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "c4_512")
DIMS = (512, 512, 512)
V = 6
H = W = 192
SEG = 12
STEPS = 12


def orbit_cams():
    cams = []
    cx, cz = 256.0, 140.0
    for i in range(V):
        a = 2.0 * np.pi * i / V
        pos = (cx + 420.0 * np.cos(a), cx + 420.0 * np.sin(a), 500.0)
        cams.append(Camera.make(pos=pos, fov_y_deg=55.0)
                    .look_at((cx, cx, cz)))
    return cams


def main():
    settings = RenderSettings(shading="flat")
    cams = orbit_cams()
    targets = np.load(os.path.join(OUTDIR, "targets.npy"))
    curve_path = os.path.join(OUTDIR, "curve.json")
    with open(curve_path) as f:
        curve = json.load(f)
    ref = curve.setdefault("s48_refine", dict(losses=[], samples=48))
    start = len(ref["losses"])
    ck0 = os.path.join(OUTDIR, "ckpt.npz")
    ck1 = os.path.join(OUTDIR, "ckpt_s48.npz")

    # full-batch S=48 at 512^3 OOMs the 16 GB chip (per-sample [S,N]
    # residuals scale with rays x samples) — 64k-ray minibatches instead
    cfg = TrainConfig(lr=2e-2, steps=min(SEG, STEPS - start),
                      num_samples=48, tv_sigma=1e-5, tv_rgb=1e-6,
                      field_kernel=True, field_window=64, ray_batch=32768,
                      occ_mask=False, nan_check_every=4)
    src = ck1 if (start and os.path.exists(ck1)) else ck0
    if start and not os.path.exists(ck1):
        raise SystemExit("refine curve has steps but ckpt_s48.npz missing")
    soft, _, _, _ = load_checkpoint(src)
    opt_state = None
    if start:
        from vxtpu.render.soft_pallas import MortonSoftGrid

        opt_state = load_opt_state(
            ck1, make_optimizer(cfg).init(MortonSoftGrid.from_soft(soft)))

    if start < STEPS:
        t0 = time.perf_counter()
        soft, losses, opt_state = fit_soft_views(
            soft, cams, jnp.asarray(targets), settings, cfg,
            log_fn=lambda i, l: print(f"s48 step {start + i}: {l:.5f}",
                                      flush=True),
            opt_state=opt_state)
        print(f"seg: {(time.perf_counter() - t0) / len(losses):.1f} s/step",
              flush=True)
        save_checkpoint(ck1, soft, cams[0], start + len(losses), None,
                        opt_state=opt_state, compress=False)
        ref["losses"].extend(round(float(l), 6) for l in losses)
        with open(curve_path, "w") as f:
            json.dump(curve, f, indent=1)
    if len(ref["losses"]) < STEPS:
        return 3  # more segments (distinct from a crash exit)

    # finalize: unmasked S=48 render of view 0
    from PIL import Image

    from vxtpu.camera.rays import generate_rays
    from vxtpu.render.soft import render_soft_rays

    o, d = generate_rays(cams[0], H, W)
    f = jax.jit(lambda s_, o_, d_: render_soft_rays(
        s_, o_, d_, settings, 48)[0])
    rows = []
    for i in range(0, o.shape[0], 4096):
        rows.append(jax.device_get(f(soft, o[i:i + 4096], d[i:i + 4096])))
    img = np.concatenate(rows, axis=0).reshape(H, W, 3)
    Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(
        os.path.join(OUTDIR, "fit_v0_s48.png"))
    p = float(psnr(jnp.asarray(img), jnp.asarray(targets[0])))
    ref["psnr_v0_s48"] = round(p, 2)
    ref["note"] = ("continuation of the 144-step S=16 fit under the S=48 "
                   "operator (unmasked): quadrature transfer recovered by "
                   "brief refinement rather than refitting from scratch")
    with open(curve_path, "w") as f:
        json.dump(curve, f, indent=1)
    print(f"s48 refine PSNR v0: {p:.2f}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
