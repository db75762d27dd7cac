"""Bisect the round-5 march-only regression: probe_r5_march measured the
flagship march (w512 split u2 local_advance) at 46.5 ms @ 512^3/1080p at
commit 60968df; the stall probe and the last full bench at HEAD measure
~96 ms for the SAME configuration, while the fused march+shade frame is
unchanged (~53 ms). Candidates: 9599500 (run_march closure + in-kernel
shadow machinery), e50c209 (RGB8 albedo tables), ec82d7f (base_every).

Runs the march-only timing against the kernel module of a given source
tree (pass the tree root as argv[1]; defaults to the repo) so the same
probe body can be pointed at git worktrees of the candidate commits.
Appends to tools/probe_r5_regress_out.json keyed by argv[2] (label).

Usage:
  PYTHONPATH=<tree>:/root/.axon_site python tools/probe_r5_regress.py \
      <tree> <label>
"""

import json
import os
import sys
import time

TREE = sys.argv[1] if len(sys.argv) > 1 else "/root/repo"
LABEL = sys.argv[2] if len(sys.argv) > 2 else "head"
sys.path.insert(0, TREE)

from vxtpu.engine.platform import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vxtpu.camera.camera import Camera  # noqa: E402
from vxtpu.camera.rays import generate_rays  # noqa: E402
from vxtpu.render.kernel_pallas_v2 import (  # noqa: E402
    PackedMorton, march_pallas_v2)
from vxtpu.world import procgen  # noqa: E402
from vxtpu.world.packed import build_packed_morton  # noqa: E402

DIMS = (512, 512, 512)
H, W_IMG = 1080, 1920
OUT = "/root/repo/tools/probe_r5_regress_out.json"


def main():
    grid = procgen.terrain(DIMS, seed=7)
    accel = build_packed_morton(grid.occupancy, cap=64)
    cam = Camera.make(pos=(-360.0, 256.0, 560.0),
                      fov_y_deg=55.0).look_at((256.0, 256.0, 140.0))
    o, d = generate_rays(cam, H, W_IMG)
    max_steps = sum(DIMS) + 2

    @jax.jit
    def f(words, oo, dd, dep):
        oo = oo.at[0, 0].add(dep * 1e-12)
        rec = march_pallas_v2(oo, dd, PackedMorton(words=words), DIMS,
                              max_steps, image_shape=(H, W_IMG),
                              window=512, block_shape=(32, 32),
                              split_window=True, local_advance=True,
                              unroll=2)
        return jnp.sum(jnp.where(rec.hit, rec.t, 0.0)) * 1e-6

    dep = jnp.float32(0.0)
    t0 = time.perf_counter()
    dep = f(accel.words, o, d, dep)
    float(dep)
    cs = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(3):
        dep = f(accel.words, o, d, dep)
    float(dep)
    dt = (time.perf_counter() - t0) / 3

    res = {}
    if os.path.exists(OUT):
        with open(OUT) as fh:
            res = json.load(fh)
    res[LABEL] = dict(ms=round(dt * 1e3, 1), compile_s=round(cs, 1),
                      mrays=round(H * W_IMG / dt / 1e6, 3), tree=TREE)
    with open(OUT, "w") as fh:
        json.dump(res, fh, indent=1)
    print(LABEL, res[LABEL], flush=True)


if __name__ == "__main__":
    main()
