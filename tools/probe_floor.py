"""Pin the bench endpoint's per-primitive costs AT THE FLAGSHIP SHAPES.

v2 method (r3): each primitive is repeated K times INSIDE one jit via a
dependency-threaded fori_loop, and timed against a K=1 variant of the same
program; per_op = (t_K - t_1) / (K - 1). This isolates the op cost from the
axon tunnel's per-call dispatch (10-400 ms RTT) and from host noise —
standalone one-op timings on this endpoint are unreliable (r3 measured a
standalone 2M cumsum at 1.4 s while a full wavefront frame containing four
of them ran in 0.58 s).

Writes tools/probe_floor_out.json — the roofline-accounting input for
bench.py (bytes-moved model + endpoint floor).
"""

from __future__ import annotations

import json
import sys
import time

from vxtpu.engine.platform import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

N = 2073600          # 1080p rays
B1 = 1152 * 1024     # round-1 buffer
B2 = 192 * 1024
B3 = 48 * 1024
K = 8                # in-jit repetitions


def chain_time(fn, args, iters=3):
    """Dependency-chained wall timing (axon block_until_ready can return at
    enqueue; the scalar float() of a chained dep forces real execution)."""
    dep = jnp.float32(0.0)
    dep = fn(*args, dep)
    float(dep)                       # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        dep = fn(*args, dep)
    float(dep)
    return (time.perf_counter() - t0) / iters


def reps(body, k):
    """k dependency-chained repetitions of body(dep_scalar) -> dep_scalar."""
    def run(*args):
        *xs, dep = args
        def it(i, c):
            return body(*xs, c + 0.0 * i)
        return jax.lax.fori_loop(0, k, it, dep)
    return jax.jit(run)


def per_op(body, args, name, out, k=K):
    t1 = chain_time(reps(body, 1), args)
    tk = chain_time(reps(body, k), args)
    out[name] = dict(ms=round((tk - t1) / (k - 1) * 1e3, 2),
                     t1_ms=round(t1 * 1e3, 1), tk_ms=round(tk * 1e3, 1))
    print(json.dumps({name: out[name]}), flush=True)


def main():
    key = jax.random.PRNGKey(0)
    out = {"method": "in-jit K-fold repetition, per_op=(tK-t1)/(K-1)",
           "K": K, "shapes": dict(N=N, B1=B1, B2=B2, B3=B3)}

    act = jax.random.bernoulli(key, 0.5, (N,))
    tbl_u8 = jnp.zeros((512 * 512 * 512,), jnp.uint8)       # 134 MB (distfield)
    tbl_u16 = jnp.zeros((256 * 256 * 256,), jnp.uint16)     # 33 MB (packed coarse)
    tbl_f32 = jnp.zeros((256 * 256 * 256,), jnp.float32)    # 67 MB
    idx1 = jax.random.randint(key, (B1,), 0, tbl_u8.shape[0])
    idx1s = jax.random.randint(key, (B1,), 0, tbl_u16.shape[0])
    idx2 = jax.random.randint(key, (B2,), 0, tbl_u8.shape[0])
    idx3 = jax.random.randint(key, (B3,), 0, tbl_u8.shape[0])
    x1 = jax.random.normal(key, (B1,), jnp.float32)

    # --- compaction building blocks at full width
    # (dep > 1e30) is always 0 at runtime but opaque to the compiler, so the
    # cumsum cannot be hoisted out of the repetition loop
    per_op(lambda a, dep: jnp.cumsum(
        a.astype(jnp.int32) + (dep > 1e30).astype(jnp.int32)
    )[-1].astype(jnp.float32) * 1e-9 + dep,
        (act,), "cumsum_2M", out)

    def scat(a, dep):
        ids = jnp.arange(B1, dtype=jnp.int32)
        y = jnp.zeros((N,), jnp.float32).at[ids].set(dep + 1.0, mode="drop")
        return y[0] * 1e-9 + dep
    per_op(scat, (act,), "scatter_1.15M_to_2M", out)

    # --- table gathers at round buffer widths (dependency-rotated indices)
    def g(tbl, idx, dep):
        j = (idx + dep.astype(jnp.int32)) % tbl.shape[0]
        return jnp.sum(jnp.take(tbl, j, axis=0).astype(jnp.float32)) * 1e-9 + dep

    per_op(g, (tbl_u8, idx1), "gather_134MBu8_1.15M", out)
    per_op(g, (tbl_u8, idx2), "gather_134MBu8_192k", out)
    per_op(g, (tbl_u8, idx3), "gather_134MBu8_48k", out)
    per_op(g, (tbl_u16, idx1s), "gather_33MBu16_1.15M", out)
    per_op(g, (tbl_f32, idx1s), "gather_67MBf32_1.15M", out)

    # --- fused elementwise block ~ one wavefront one_step body (60 ops)
    def elem(x, dep):
        y = x + dep
        for _ in range(60):
            y = y * 1.000001 + 0.5
        return y[0] * 1e-9 + dep
    per_op(elem, (x1,), "elemwise60_1.15M", out)

    with open("tools/probe_floor_out.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote tools/probe_floor_out.json", flush=True)


if __name__ == "__main__":
    main()
