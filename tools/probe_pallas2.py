"""Time the v2 (windowed Morton) Pallas kernel on the bench endpoint at the
flagship 512³ grid: window-size sweep at quarter resolution, then full
1080p with the best window. Also records v1-vs-v2 at 64³ for regression
context. Writes tools/probe_pallas2_out.json.

Usage: PYTHONPATH=. python tools/probe_pallas2.py [--quick]
"""

from __future__ import annotations

import json
import sys
import time

from vxtpu.engine.platform import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from vxtpu.camera.camera import Camera
from vxtpu.camera.rays import generate_rays
from vxtpu.render.kernel_pallas_v2 import march_pallas_v2
from vxtpu.world import procgen
from vxtpu.world.packed import build_packed_morton

DIMS = (512, 512, 512)
MAX_STEPS = sum(DIMS) + 2


def chain_time(fn, args, iters=2):
    dep = jnp.float32(0.0)
    t0 = time.perf_counter()
    dep = fn(*args, dep)
    float(dep)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        dep = fn(*args, dep)
    float(dep)
    return (time.perf_counter() - t0) / iters, compile_s


def main():
    quick = "--quick" in sys.argv
    out = {}
    grid = procgen.terrain(DIMS, seed=7)
    accel = build_packed_morton(grid.occupancy, cap=64)
    out["table_rows"] = accel.rows
    out["table_mb"] = round(accel.rows * 128 * 4 / 2**20, 1)
    cam = Camera.make(pos=(-360.0, 256.0, 560.0),
                      fov_y_deg=55.0).look_at((256.0, 256.0, 140.0))

    def timed(h, w, window, iters=2):
        o, d = generate_rays(cam, h, w)

        @jax.jit
        def f(o, d, words, dep):
            o = o.at[0, 0].add(dep * 1e-12)
            acc = type(accel)(words=words)
            rec = march_pallas_v2(o, d, acc, DIMS, MAX_STEPS,
                                  image_shape=(h, w), window=window)
            return jnp.sum(jnp.where(rec.hit, rec.t, 0.0)) * 1e-6
        return chain_time(f, (o, d, accel.words), iters)

    # window sweep at quarter-res (270x480 = 1/16 the rays)
    for wdw in ([16] if quick else [8, 16, 32, 64]):
        try:
            dt, cs = timed(272, 480, wdw)
            out[f"q_res_w{wdw}"] = dict(ms=round(dt * 1e3, 1),
                                        compile_s=round(cs, 1),
                                        mrays=round(272 * 480 / dt / 1e6, 3))
        except Exception as e:  # record Mosaic failures instead of dying
            out[f"q_res_w{wdw}"] = dict(error=str(e)[:500])
        print(json.dumps({f"q_res_w{wdw}": out[f"q_res_w{wdw}"]}), flush=True)

    # pick best window that succeeded
    ok = {k: v for k, v in out.items()
          if k.startswith("q_res_w") and "ms" in v}
    if ok:
        best_k = min(ok, key=lambda k: ok[k]["ms"])
        best_w = int(best_k.split("w")[-1])
        out["best_window"] = best_w
        est_full_s = ok[best_k]["ms"] / 1e3 * 16
        out["est_full_1080p_s"] = round(est_full_s, 1)
        print(json.dumps({"best_window": best_w,
                          "est_full_1080p_s": out["est_full_1080p_s"]}),
              flush=True)
        if est_full_s < 300 and not quick:
            try:
                dt, cs = timed(1080, 1920, best_w)
                out["full_1080p"] = dict(ms=round(dt * 1e3, 1),
                                         compile_s=round(cs, 1),
                                         mrays=round(1080 * 1920 / dt / 1e6, 3),
                                         window=best_w)
            except Exception as e:
                out["full_1080p"] = dict(error=str(e)[:500])
            print(json.dumps({"full_1080p": out["full_1080p"]}), flush=True)

    with open("tools/probe_pallas2_out.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote tools/probe_pallas2_out.json", flush=True)


if __name__ == "__main__":
    main()
