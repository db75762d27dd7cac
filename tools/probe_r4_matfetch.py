"""Minimal on-device repro for the fused-shade material-fetch failure:
a [rows,128] f32 table of known values (value = flat index), fetched for
1024 known (row, lane) pairs through each candidate mechanism:

  A  direct VMEM table + pl.ds slice + f32 one-hot matmul (r3-style)
  B  ANY-space table + DMA window into scratch + f32 one-hot matmul
     (the shipped epilogue path)
  C  like B but bf16 one-hot with values < 256 (exactness control)
  D  like B but the DMA inside a while_loop iteration (exact epilogue
     structure)

Each reports the number of mismatched lookups on the real chip."""

import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vxtpu.engine.platform import enable_compilation_cache
from vxtpu.render.kernel_pallas_v2 import _lookup_window


def _lookup_window_mode(win, row, lane, W, dtype):
    if dtype == "highest":
        return _lookup_window(win, row, lane, W, dtype=jnp.float32)
    return _lookup_window(win, row, lane, W, dtype=dtype)

ROWS = 256
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "probe_r4_matfetch_out.json")
RES = {}
if os.path.exists(OUT):
    with open(OUT) as f:
        RES = json.load(f)


def save(name, entry):
    RES[name] = entry
    with open(OUT, "w") as f:
        json.dump(RES, f, indent=1)
    print(name, entry, flush=True)


def make_inputs(value_cap):
    key = jax.random.PRNGKey(0)
    tbl = (jnp.arange(ROWS * 128, dtype=jnp.float32) % value_cap).reshape(
        ROWS, 128)
    row = jax.random.randint(key, (8, 128), 0, ROWS, dtype=jnp.int32)
    lane = jax.random.randint(jax.random.PRNGKey(1), (8, 128), 0, 128,
                              dtype=jnp.int32)
    want = np.asarray(tbl)[np.asarray(row), np.asarray(lane)]
    return tbl, row, lane, want


def kern_direct(tbl_ref, row_ref, lane_ref, out_ref, *, W, dtype):
    win = tbl_ref[pl.ds(0, W), :]
    out_ref[:] = _lookup_window_mode(win, row_ref[:], lane_ref[:], W,
                                     dtype)


def kern_dma(tbl_ref, row_ref, lane_ref, out_ref, mwin, msem, *, W, dtype,
             in_loop):
    def fetch(_):
        cp = pltpu.make_async_copy(tbl_ref.at[pl.ds(0, W), :], mwin, msem)
        cp.start()
        cp.wait()
        return _lookup_window_mode(mwin[:], row_ref[:], lane_ref[:], W,
                                   dtype)

    if in_loop:
        def body(s):
            it, _ = s
            return it + 1, fetch(None)

        _, wv = jax.lax.while_loop(lambda s: s[0] < 1, body,
                                   (jnp.int32(0),
                                    jnp.zeros((8, 128), jnp.float32)))
    else:
        wv = fetch(None)
    out_ref[:] = wv


def run(name, value_cap, mode, dtype, in_loop=False):
    tbl, row, lane, want = make_inputs(value_cap)
    W = ROWS
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    if mode == "direct":
        f = pl.pallas_call(
            functools.partial(kern_direct, W=W, dtype=dtype),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[vspec, vspec, vspec],
            out_specs=vspec)
    else:
        f = pl.pallas_call(
            functools.partial(kern_dma, W=W, dtype=dtype, in_loop=in_loop),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY), vspec, vspec],
            out_specs=vspec,
            scratch_shapes=[pltpu.VMEM((W, 128), jnp.float32),
                            pltpu.SemaphoreType.DMA(())])
    got = np.asarray(jax.jit(f)(tbl, row, lane))
    bad = int((got != want).sum())
    ex = {}
    if bad:
        i = np.argwhere(got != want)[0]
        ex = dict(at=[int(x) for x in i], got=float(got[tuple(i)]),
                  want=float(want[tuple(i)]))
    save(name, dict(bad=bad, total=1024, **ex))


def main():
    enable_compilation_cache()
    if "A_direct_f32_cap2e24" not in RES:
        run("A_direct_f32_cap2e24", 1 << 24, "direct", jnp.float32)
        run("B_dma_f32_cap2e24", 1 << 24, "dma", jnp.float32)
        run("C_dma_bf16_cap256", 256, "dma", jnp.bfloat16)
        run("D_dma_loop_f32_cap2e24", 1 << 24, "dma", jnp.float32,
            in_loop=True)
        run("E_direct_f32_cap256", 256, "direct", jnp.float32)
    run("F_dma_f32_highest_cap2e24", 1 << 24, "dma", "highest")


if __name__ == "__main__":
    main()
