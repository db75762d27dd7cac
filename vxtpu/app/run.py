"""CLI driver — the TPU-native analog of the reference's ``main.cpp`` /
``Application`` wiring (SURVEY.md §3 C13): build world -> build accel ->
wire camera/lights -> render / animate / train / bench.

Subcommands:
  render   one frame of a named config -> PNG
  animate  N frames along a scripted camera path -> PNGs (+ fps metric)
  train    inverse-rendering fit of a soft grid to rendered targets
  bench    Mrays/s/chip + fps metrics as JSON lines
  info     platform report + HBM fit validation

Examples:
  python -m vxtpu render  --config c2_128_lit --out /tmp/frame.png
  python -m vxtpu animate --config c1_64_flat --frames 24 --out /tmp/anim
  python -m vxtpu train   --dims 48 --steps 60 --out /tmp/fit
  python -m vxtpu bench   --config c3_256_shadows
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def _build_scene(cfg, dims=None, accel_kind="distfield"):
    """World + accel + camera + lights for a SceneConfig."""
    import jax.numpy as jnp

    from vxtpu.camera.camera import Camera
    from vxtpu.world import distfield, procgen
    from vxtpu.world.lights import Lights
    from vxtpu.world.pyramid import build_pyramid

    dims = dims or cfg.dims
    grid = procgen.terrain(dims, seed=cfg.seed, with_rgb=cfg.with_rgb)
    if accel_kind == "distfield":
        accel = distfield.build(grid.occupancy, cap=24)
    elif accel_kind == "pyramid":
        accel = build_pyramid(grid.occupancy, max(cfg.settings.pyramid_levels, 2))
    elif accel_kind == "packed":
        from vxtpu.world.packed import build_packed

        accel = build_packed(grid.occupancy)
    else:
        accel = None
    X, Y, Z = dims
    cam = Camera.make(
        pos=(-0.7 * X, 0.5 * Y, 1.1 * Z), fov_y_deg=55.0
    ).look_at((0.5 * X, 0.5 * Y, 0.27 * Z))
    if cfg.lights > 0:
        lights = Lights.single((0.2 * X, -0.3 * Y, 1.4 * Z), intensity=2.0)
    else:
        lights = Lights.none()
    return grid, accel, cam, lights


def _save_png(path: str, img) -> None:
    from PIL import Image

    arr = (np.clip(np.asarray(img), 0.0, 1.0) * 255).astype(np.uint8)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray(arr).save(path)


def _kernel_factory(name: str):
    if name == "ref":
        from vxtpu.render.kernel_ref import make_march_ref

        return make_march_ref
    if name == "pallas":
        from vxtpu.render.kernel_pallas import make_march_pallas

        return make_march_pallas
    if name == "pallas-interpret":
        import functools

        from vxtpu.render.kernel_pallas import make_march_pallas

        return functools.partial(make_march_pallas, interpret=True)
    from vxtpu.render.kernel_xla import make_march_xla

    return make_march_xla


def cmd_render(args) -> int:
    import jax

    from vxtpu.app.configs import CONFIGS
    from vxtpu.render.pipeline import render_image

    cfg = CONFIGS[args.config]
    dims = (args.dims,) * 3 if args.dims else None
    h = args.height or cfg.height
    w = args.width or cfg.width
    grid, accel, cam, lights = _build_scene(cfg, dims, args.accel)
    factory = _kernel_factory(args.kernel)

    # world arrays are jit arguments (closure constants would be inlined
    # into the compile payload — fatal at 512^3 on the axon tunnel)
    fn = jax.jit(
        lambda g, a: render_image(factory, g, cam, lights, cfg.settings, h, w, a)
    )
    img = jax.block_until_ready(fn(grid, accel))
    _save_png(args.out, img)
    print(f"wrote {args.out} [{h}x{w}] config={cfg.name}")
    return 0


def cmd_animate(args) -> int:
    import jax

    from vxtpu.app.configs import CONFIGS
    from vxtpu.camera import paths
    from vxtpu.render.pipeline import render_image

    cfg = CONFIGS[args.config]
    dims = (args.dims,) * 3 if args.dims else cfg.dims
    h = args.height or cfg.height
    w = args.width or cfg.width
    grid, accel, _, lights = _build_scene(cfg, dims, args.accel)
    X, Y, Z = dims
    cam_at = paths.orbit(
        center=(0.5 * X, 0.5 * Y, 0.3 * Z),
        radius=0.9 * X,
        height=1.1 * Z,
        period=args.frames / 24.0,
    )
    factory = _kernel_factory(args.kernel)

    @jax.jit
    def frame(g, a, t):
        return render_image(
            factory, g, cam_at(t), lights, cfg.settings, h, w, a
        )

    os.makedirs(args.out, exist_ok=True)
    t_render = 0.0
    for i in range(args.frames):
        t0 = time.perf_counter()
        img = jax.block_until_ready(frame(grid, accel, i / 24.0))
        if i > 0:  # skip compile frame
            t_render += time.perf_counter() - t0
        _save_png(os.path.join(args.out, f"frame_{i:04d}.png"), img)
    steady = args.frames - 1
    if steady > 0 and t_render > 0:
        fps = steady / t_render
        print(json.dumps({"metric": "fps", "value": round(fps, 2),
                          "frames": args.frames, "res": [h, w]}))
    print(f"wrote {args.frames} frames to {args.out}/")
    return 0


def cmd_train(args) -> int:
    import jax

    from vxtpu.camera.camera import Camera
    from vxtpu.render.settings import RenderSettings
    from vxtpu.render.soft import SoftGrid, render_soft_image
    from vxtpu.train.checkpoint import save_checkpoint
    from vxtpu.train.loop import TrainConfig, fit_soft
    from vxtpu.world import procgen

    dims = (args.dims,) * 3
    X, Y, Z = dims
    settings = RenderSettings()
    target_grid = procgen.terrain(dims, seed=args.seed, with_rgb=True)
    cam = Camera.make(pos=(-0.7 * X, 0.5 * Y, 1.1 * Z)).look_at(
        (0.5 * X, 0.5 * Y, 0.27 * Z)
    )
    target = render_soft_image(
        SoftGrid.from_hard(target_grid), cam, settings,
        args.height, args.width, args.samples,
    )

    soft = SoftGrid.zeros(dims)
    tc = TrainConfig(steps=args.steps, num_samples=args.samples,
                     ray_batch=args.ray_batch, seed=args.seed)
    soft, cam_out, losses = fit_soft(
        soft, cam, target, settings, tc,
        log_fn=lambda i, l: print(f"step {i:5d}  loss {l:.6f}"),
    )
    os.makedirs(args.out, exist_ok=True)
    save_checkpoint(os.path.join(args.out, "ckpt.npz"), soft, cam_out,
                    step=args.steps, extra={"losses": np.asarray(losses)})
    final = render_soft_image(soft, cam_out, settings, args.height,
                              args.width, args.samples)
    _save_png(os.path.join(args.out, "target.png"), target)
    _save_png(os.path.join(args.out, "fit.png"), final)
    print(json.dumps({"metric": "final_loss", "value": losses[-1],
                      "steps": args.steps}))
    return 0


def cmd_bench(args) -> int:
    import jax
    import jax.numpy as jnp

    from vxtpu.app.configs import CONFIGS
    from vxtpu.render.pipeline import render_image

    cfg = CONFIGS[args.config]
    dims = (args.dims,) * 3 if args.dims else cfg.dims
    h = args.height or cfg.height
    w = args.width or cfg.width
    grid, accel, cam, lights = _build_scene(cfg, dims, args.accel)
    factory = _kernel_factory(args.kernel)

    @jax.jit
    def frame(g, a, eps):
        c = cam.replace(yaw=cam.yaw + eps * 1e-6)
        img = render_image(factory, g, c, lights, cfg.settings, h, w, a)
        return img, jnp.mean(img)

    img, dep = frame(grid, accel, jnp.float32(0.0))
    jax.block_until_ready(img)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        img, dep = frame(grid, accel, dep)  # dependency chain forces sequential frames
    jax.block_until_ready(img)
    dt = (time.perf_counter() - t0) / args.iters
    mrays = h * w / dt / 1e6
    print(json.dumps({
        "metric": f"Mrays/s/chip @ {cfg.name} {dims[0]}^3 {h}x{w}",
        "value": round(mrays, 3), "unit": "Mrays/s",
        "fps": round(1.0 / dt, 2),
    }))
    return 0


def cmd_info(args) -> int:
    from vxtpu.engine.platform import platform_report

    print(json.dumps(platform_report(), indent=2, default=str))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="vxtpu", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp, config=True):
        if config:
            sp.add_argument("--config", default="c1_64_flat")
        sp.add_argument("--dims", type=int, default=0,
                        help="override grid side length (cube)")
        sp.add_argument("--height", type=int, default=0)
        sp.add_argument("--width", type=int, default=0)
        sp.add_argument("--accel",
                        choices=["distfield", "pyramid", "packed", "none"],
                        default="distfield")
        sp.add_argument("--kernel",
                        choices=["xla", "ref", "pallas", "pallas-interpret"],
                        default="xla")

    sp = sub.add_parser("render", help="render one frame to PNG")
    common(sp)
    sp.add_argument("--out", default="/tmp/vxtpu_frame.png")
    sp.set_defaults(fn=cmd_render)

    sp = sub.add_parser("animate", help="render an orbit animation")
    common(sp)
    sp.add_argument("--frames", type=int, default=24)
    sp.add_argument("--out", default="/tmp/vxtpu_anim")
    sp.set_defaults(fn=cmd_animate)

    sp = sub.add_parser("train", help="inverse-rendering fit (config 4)")
    sp.add_argument("--dims", type=int, default=48)
    sp.add_argument("--height", type=int, default=96)
    sp.add_argument("--width", type=int, default=96)
    sp.add_argument("--steps", type=int, default=100)
    sp.add_argument("--samples", type=int, default=96)
    sp.add_argument("--ray-batch", type=int, default=0)
    sp.add_argument("--seed", type=int, default=7)
    sp.add_argument("--out", default="/tmp/vxtpu_fit")
    sp.set_defaults(fn=cmd_train)

    sp = sub.add_parser("bench", help="throughput benchmark")
    common(sp)
    sp.add_argument("--iters", type=int, default=4)
    sp.set_defaults(fn=cmd_bench)

    sp = sub.add_parser("info", help="platform report")
    sp.set_defaults(fn=cmd_info)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
