"""Pin the bench endpoint's per-call floor and per-primitive costs at the
flagship shapes (chained-dependency timing, same as bench.py).

Interprets probe_r1.py's finding that round-1 cost is nearly independent of
step count: if a trivial chained call already costs ~X ms, the kernel's real
compute is (measured - X) and optimization effort must target whichever
primitive below actually moves the total.
"""

from __future__ import annotations

import json
import time

from vxtpu.engine.platform import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

N = 2073600          # 1080p rays
B = 1152 * 1024      # round-1 buffer


def chain_time(fn, args, n=5):
    dep = jnp.float32(0.0)
    dep = fn(*args, dep)
    float(dep)
    t0 = time.perf_counter()
    for _ in range(n):
        dep = fn(*args, dep)
    float(dep)
    return (time.perf_counter() - t0) / n


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (N,), jnp.float32)
    idx_small = jax.random.randint(key, (B,), 0, N)
    tbl_big = jnp.zeros((512 * 512 * 512,), jnp.uint8)
    idx_big = jax.random.randint(key, (B,), 0, tbl_big.shape[0])
    out = {}

    @jax.jit
    def trivial(eps):
        return eps + 1.0

    out["trivial_ms"] = round(chain_time(trivial, ()) * 1e3, 1)
    print(json.dumps(out), flush=True)

    @jax.jit
    def elem(x, eps):
        return jnp.sum(jnp.sin(x + eps))

    out["elem1_ms"] = round(chain_time(elem, (x,)) * 1e3, 1)
    print(json.dumps(out), flush=True)

    @jax.jit
    def elem20(x, eps):
        y = x + eps
        for _ in range(20):
            y = y * 1.0001 + 0.1
        return jnp.sum(y)

    out["elem20_ms"] = round(chain_time(elem20, (x,)) * 1e3, 1)
    print(json.dumps(out), flush=True)

    @jax.jit
    def cum(x, eps):
        return jnp.sum(jnp.cumsum((x + eps > 0).astype(jnp.int32))[-1:])

    out["cumsum_ms"] = round(chain_time(cum, (x,)) * 1e3, 1)
    print(json.dumps(out), flush=True)

    @jax.jit
    def gth_small(x, i, eps):
        return jnp.sum(jnp.take(x + eps, i, axis=0))

    out["gather_8MB_1.15M_ms"] = round(
        chain_time(gth_small, (x, idx_small)) * 1e3, 1)
    print(json.dumps(out), flush=True)

    @jax.jit
    def gth_big(t, i, eps):
        j = jnp.clip(i + eps.astype(jnp.int32), 0, t.shape[0] - 1)
        return jnp.sum(jnp.take(t, j, axis=0).astype(jnp.int32))

    out["gather_134MB_1.15M_ms"] = round(
        chain_time(gth_big, (tbl_big, idx_big)) * 1e3, 1)
    print(json.dumps(out), flush=True)

    @jax.jit
    def scat(x, i, eps):
        y = jnp.zeros((N,), jnp.float32).at[i].set(x[: B] + eps, mode="drop")
        return jnp.sum(y)

    out["scatter_1.15M_ms"] = round(chain_time(scat, (x, idx_small)) * 1e3, 1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
