"""Weak-scaling artifact on the virtual CPU mesh (VERDICT r3 next-#6).

Fixed rays PER DEVICE; mesh grows 1 -> 2 -> 4 -> 8 virtual devices. Two
measurements per size:

  * wall-clock per step — meaningful only up to the host's physical core
    count (this endpoint has TWO cores: `nproc` = 2, so 4- and 8-device
    walls measure oversubscription, as tools/scaling_out.json's strong-
    scaling curve already documented);
  * total PROCESS CPU time per ray — core-count independent: if shard_map
    sharding added per-shard overhead (padding, collectives, dispatch),
    cpu-us-per-ray would grow with the device count. Flat cpu/ray == the
    sharded program does no more work than the single-device one, which is
    the thing a virtual mesh CAN honestly bound. (Real-ICI scaling needs
    real chips — BASELINE's 1-chip/1-host/2-host tiers, out of reach here;
    rendering has zero cross-device traffic so the expectation is linear.)

Run:  python tools/scaling_weak.py         (forces cpu + 8 virtual devices)
Writes tools/scaling_weak_out.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from vxtpu.camera.camera import Camera
from vxtpu.engine.sharding import make_mesh, render_image_sharded
from vxtpu.render.kernel_xla import make_march_xla
from vxtpu.render.settings import RenderSettings
from vxtpu.world import distfield, procgen
from vxtpu.world.lights import Lights

RAYS_PER_DEVICE = 128 * 128   # fixed work per device (weak scaling)


def main():
    dims = (128, 128, 128)
    grid = procgen.terrain(dims, seed=7, with_rgb=True)
    accel = distfield.build(grid.occupancy, cap=24)
    settings = RenderSettings(shading="lambert")
    lights = Lights.single((25.0, -38.0, 180.0), intensity=2.0)
    cam = Camera.make(pos=(-90.0, 64.0, 140.0),
                      fov_y_deg=55.0).look_at((64.0, 64.0, 35.0))

    curve = []
    base_wall = base_cpu = None
    for n_dev in (1, 2, 4, 8):
        mesh = make_mesh(n_dev)
        H = 128
        W = (RAYS_PER_DEVICE * n_dev) // H

        def frame():
            img = render_image_sharded(make_march_xla, grid, cam, lights,
                                       settings, H, W, mesh, accel)
            return float(jnp.mean(img))

        frame()  # compile + warm
        iters = 3
        w0 = time.perf_counter()
        c0 = time.process_time()
        for _ in range(iters):
            frame()
        wall = (time.perf_counter() - w0) / iters
        cpu = (time.process_time() - c0) / iters
        rays = H * W
        entry = dict(
            devices=n_dev, rays_total=rays,
            rays_per_device=RAYS_PER_DEVICE,
            wall_ms=round(wall * 1e3, 1),
            cpu_ms=round(cpu * 1e3, 1),
            wall_us_per_ray_per_device=round(wall * 1e6 / RAYS_PER_DEVICE, 3),
            cpu_us_per_ray=round(cpu * 1e6 / rays, 3),
        )
        if n_dev == 1:
            base_wall = entry["wall_us_per_ray_per_device"]
            base_cpu = entry["cpu_us_per_ray"]
        entry["weak_eff_wall"] = round(base_wall / entry[
            "wall_us_per_ray_per_device"], 3)
        entry["overhead_cpu_vs_1dev"] = round(
            entry["cpu_us_per_ray"] / base_cpu, 3)
        curve.append(entry)
        print(entry, flush=True)

    ncores = os.cpu_count()
    out = dict(
        cmd="python tools/scaling_weak.py",
        date=time.strftime("%Y-%m-%d"),
        tier=(f"dryrun weak-scaling: fixed {RAYS_PER_DEVICE} rays/device, "
              f"8 VIRTUAL cpu devices on a {ncores}-core host"),
        note=("wall efficiency is only meaningful up to the physical core "
              f"count ({ncores}); cpu_us_per_ray is core-count independent "
              "and bounds the shard_map sharding overhead itself: flat == "
              "the sharded program performs no extra per-ray work. Real "
              "ICI scaling (BASELINE 1-chip/1-host/2-hosts) needs real "
              "multi-chip hardware, unavailable on this endpoint."),
        rays_per_device=RAYS_PER_DEVICE,
        physical_cores=ncores,
        curve=curve,
    )
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "scaling_weak_out.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
