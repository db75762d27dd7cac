"""Driver benchmark: prints ONE JSON line with the headline metric.

Headline (BASELINE.json): Mrays/s/chip at 512³ grid, 1080p forward render.
vs_baseline is measured against the 124 Mrays/s sustained target
(1920×1080 @ 60 fps ≈ 124 M primary rays/s on one v5e chip).

Runs on whatever jax.devices() provides (the axon-tunneled TPU chip under
the driver). Timing note: on the axon platform block_until_ready can return
at enqueue, so we time a dependency-CHAINED sequence of frames (each frame's
camera derives from a scalar of the previous frame's output), which forces
real sequential execution.
"""

from __future__ import annotations

import json
import time

TARGET_MRAYS = 124.0


def main():
    from vxtpu.engine.platform import enable_compilation_cache

    enable_compilation_cache()

    import functools

    import jax
    import jax.numpy as jnp

    from vxtpu.camera.camera import Camera
    from vxtpu.render.kernel_wavefront import make_march_wavefront
    from vxtpu.render.pipeline import render_image
    from vxtpu.render.settings import RenderSettings
    from vxtpu.world import distfield, procgen
    from vxtpu.world.lights import Lights

    dims = (512, 512, 512)
    H, W = 1080, 1920
    grid = procgen.terrain(dims, seed=7)
    # cap=96: one-time build cost (outside the timed loop) buys ~4x larger
    # empty-space jumps than cap=24, directly cutting march loop length.
    accel = distfield.build(grid.occupancy, cap=96)
    # step_chunk=8: the march's all-done early-exit check runs every 8 steps,
    # so the loop stops within 8 steps of the last ray finishing instead of 32.
    settings = RenderSettings(shading="lambert", step_chunk=8)
    lights = Lights.single((100.0, -150.0, 700.0), intensity=2.0)
    base_cam = Camera.make(pos=(-360.0, 256.0, 560.0), fov_y_deg=55.0).look_at(
        (256.0, 256.0, 140.0)
    )

    # Flagship path: wavefront-compaction march (render/kernel_wavefront.py)
    # — active-ray compaction between rounds so dead lanes never gather
    # (5.3x over the masked XLA march on this endpoint, tools/
    # bench_wavefront_out.json). Schedule tuned for the 1080p primary-ray
    # step distribution (p50-valid~8, p99=24, tail<=90).
    factory = functools.partial(
        make_march_wavefront,
        schedule=((1152 * 1024, 8), (192 * 1024, 16), (48 * 1024, 40)),
    )

    # NOTE: world arrays are jit *arguments*, never closure constants — a
    # closed-over 134 MB occupancy would be inlined into the MLIR payload
    # (axon remote-compile rejects >~100 MB bodies with HTTP 413).
    @jax.jit
    def frame(g, acc, eps):
        cam = base_cam.replace(yaw=base_cam.yaw + eps * 1e-6)
        img = render_image(factory, g, cam, lights, settings, H, W, acc)
        return img, jnp.mean(img)

    # warmup/compile
    img, dep = frame(grid, accel, jnp.float32(0.0))
    jax.block_until_ready(img)

    n = 4
    t0 = time.perf_counter()
    for _ in range(n):
        img, dep = frame(grid, accel, dep)  # dependency chain forces sequential frames
    jax.block_until_ready(img)
    dt = (time.perf_counter() - t0) / n

    mrays = H * W / dt / 1e6
    print(json.dumps({
        "metric": "Mrays/s/chip @ 512^3 grid, 1080p forward",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / TARGET_MRAYS, 4),
        "kernel": "wavefront",
    }))


if __name__ == "__main__":
    main()
