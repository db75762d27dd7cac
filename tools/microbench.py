"""Device microbenchmarks that drive the march-kernel redesign.

Measures, on whatever `jax.devices()` provides (the axon-tunneled TPU under
the driver), the primitives the round-1 cost model (SURVEY.md §7.1) was
built from — plus the NEW candidate structures for the v2 march:

  1. gather cost vs (table size, index count)
  2. fused-elementwise cost vs array size
  3. scan-over-tiles with per-tile while_loop early exit
  4. per-tile gather loops (the tiled-march skeleton)

Timing discipline (axon tunnel): block_until_ready can return at ENQUEUE,
so (a) every timed fn takes a scalar `dep` derived from the previous call's
output — calls serialize, (b) timing ends with float(...) which forces a
host read, (c) a no-op RTT baseline is measured and subtracted per call.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

RTT = None  # per-call dispatch floor, measured first


def timeit(fn, *args, n=3, warmup=1):
    """fn(*args, dep) -> (result_scalar). Chained + host-synced timing."""
    dep = jnp.float32(0.0)
    for _ in range(warmup):
        dep = fn(*args, dep)
    float(dep)
    t0 = time.perf_counter()
    for _ in range(n):
        dep = fn(*args, dep)
    float(dep)  # host read: the only trustworthy sync on axon
    per_call = (time.perf_counter() - t0) / n
    if RTT is not None:
        per_call = max(per_call - RTT, 0.0)
    return per_call


def bench_rtt():
    @jax.jit
    def nop(dep):
        return dep + 1.0

    dep = jnp.float32(0.0)
    for _ in range(3):
        dep = nop(dep)
    float(dep)
    t0 = time.perf_counter()
    N = 20
    for _ in range(N):
        dep = nop(dep)
    float(dep)
    return (time.perf_counter() - t0) / N


def bench_gather(results):
    REP = 16
    for tbl_elems, tbl_name in [
        (1 << 18, "256Ku8"), (1 << 21, "2Mu8"), (1 << 24, "16Mu8"),
        (1 << 27, "128Mu8"),
    ]:
        tbl = (jnp.arange(tbl_elems, dtype=jnp.uint32) % 251).astype(jnp.uint8)
        for nidx in [2048, 65536, 2 * 1024 * 1024]:
            idx = jax.random.randint(jax.random.PRNGKey(0), (nidx,), 0,
                                     tbl_elems, jnp.int32)

            @jax.jit
            def run(tbl, idx, dep):
                def body(i, carry):
                    s, idx2 = carry
                    v = jnp.take(tbl, idx2, axis=0)
                    s2 = s + jnp.sum(v.astype(jnp.int32))
                    idx3 = (idx2 + (s2 & 1)) % tbl.shape[0]
                    return (s2, idx3)
                s, _ = jax.lax.fori_loop(
                    0, REP, body, (dep.astype(jnp.int32), idx))
                return s.astype(jnp.float32) * 1e-9

            dt = timeit(run, tbl, idx) / REP
            results.append(dict(bench="gather", table=tbl_name, nidx=nidx,
                                ms=round(dt * 1e3, 4),
                                ns_per_idx=round(dt / nidx * 1e9, 3)))
            print(results[-1], flush=True)


def bench_elementwise(results):
    REP = 64
    for n in [2048, 16384, 131072, 1048576, 2 * 1048576]:
        x = jnp.linspace(0.0, 1.0, n, dtype=jnp.float32)

        @jax.jit
        def run(x, dep):
            def body(i, v):
                a = v * 1.0001 + 0.1
                b = jnp.where(a > 0.5, a * 2.0, a * 0.5)
                c = jnp.minimum(jnp.maximum(a, b), 3.0)
                d = jnp.floor(c * 7.0).astype(jnp.int32)
                e = (d & 7).astype(jnp.float32) * 0.125
                f = b + c + e
                g = jnp.where(f > 1.0, f - 1.0, f)
                return g
            out = jax.lax.fori_loop(0, REP, body, x + dep * 1e-30)
            return jnp.sum(out) * 1e-9

        dt = timeit(run, x) / REP
        results.append(dict(bench="elemwise30", n=n, us=round(dt * 1e6, 2)))
        print(results[-1], flush=True)


def bench_tiled_while(results):
    for tile, ntiles, long_frac in [(2048, 1024, 0.05), (8192, 256, 0.05),
                                    (2048, 1024, 0.5)]:
        trips = np.full((ntiles,), 2, np.int32)
        trips[: max(1, int(ntiles * long_frac))] = 96
        np.random.default_rng(0).shuffle(trips)
        trips = jnp.asarray(trips)
        x = jnp.ones((ntiles, tile), jnp.float32)

        @jax.jit
        def run(x, trips, dep):
            def per_tile(carry, inp):
                xt, lim = inp
                def cond(c):
                    v, it = c
                    return it < lim
                def body(c):
                    v, it = c
                    a = v * 1.0001 + 0.1
                    b = jnp.where(a > 0.5, a * 2.0, a * 0.5)
                    return (jnp.minimum(b, 3.0), it + 1)
                v, _ = jax.lax.while_loop(cond, body, (xt, jnp.int32(0)))
                return carry + jnp.sum(v), None
            s, _ = jax.lax.scan(per_tile, dep * 1e-30, (x, trips))
            return s * 1e-9

        dt = timeit(run, x, trips)
        tot = int(np.sum(np.asarray(trips)) * tile)
        results.append(dict(bench="tiled_while", tile=tile, ntiles=ntiles,
                            long_frac=long_frac, ms=round(dt * 1e3, 3),
                            ns_per_ray_step=round(dt / tot * 1e9, 2)))
        print(results[-1], flush=True)


def bench_tile_gather_loop(results):
    for tbl_elems, tbl_name in [(1 << 18, "256Ku8"), (1 << 21, "2Mu8"),
                                (1 << 27, "128Mu8")]:
        tbl = (jnp.arange(tbl_elems, dtype=jnp.uint32) % 7).astype(jnp.uint8)
        for tile, ntiles in [(2048, 1024), (8192, 256)]:
            trips = np.full((ntiles,), 2, np.int32)
            trips[: max(1, ntiles // 20)] = 96
            np.random.default_rng(0).shuffle(trips)
            trips = jnp.asarray(trips)
            idx0 = jax.random.randint(jax.random.PRNGKey(1), (ntiles, tile),
                                      0, tbl_elems, jnp.int32)

            @jax.jit
            def run(tbl, idx0, trips, dep):
                def per_tile(carry, inp):
                    idxt, lim = inp
                    def cond(c):
                        _, it, _ = c
                        return it < lim
                    def body(c):
                        idx, it, acc = c
                        v = jnp.take(tbl, idx, axis=0).astype(jnp.int32)
                        idx2 = (idx + v + 1) % tbl.shape[0]
                        return (idx2, it + 1, acc + jnp.sum(v))
                    _, _, acc = jax.lax.while_loop(
                        cond, body, (idxt, jnp.int32(0), jnp.int32(0)))
                    return carry + acc, None
                s, _ = jax.lax.scan(
                    per_tile, dep.astype(jnp.int32), (idx0, trips))
                return s.astype(jnp.float32) * 1e-9

            dt = timeit(run, tbl, idx0, trips)
            tot_idx = int(np.sum(np.asarray(trips)) * tile)
            results.append(dict(
                bench="tile_gather", table=tbl_name, tile=tile, ntiles=ntiles,
                ms=round(dt * 1e3, 3),
                ns_per_gathered_idx=round(dt / tot_idx * 1e9, 2)))
            print(results[-1], flush=True)


def bench_fullbatch_gather_march(results):
    """Skeleton of the CURRENT flagship loop: full 2M-ray batch, chunked
    while_loop, one gather per step from the 128MB table — to reproduce the
    round-1 0.67 Mrays/s number structurally."""
    tbl = (jnp.arange(1 << 27, dtype=jnp.uint32) % 7).astype(jnp.uint8)
    n = 2 * 1024 * 1024
    idx0 = jax.random.randint(jax.random.PRNGKey(1), (n,), 0, tbl.shape[0],
                              jnp.int32)
    STEPS = 96

    @jax.jit
    def run(tbl, idx0, dep):
        def body(i, carry):
            idx, acc = carry
            v = jnp.take(tbl, idx, axis=0).astype(jnp.int32)
            return ((idx + v + 1) % tbl.shape[0], acc + jnp.sum(v))
        _, acc = jax.lax.fori_loop(
            0, STEPS, body, (idx0, dep.astype(jnp.int32)))
        return acc.astype(jnp.float32) * 1e-9

    dt = timeit(run, tbl, idx0)
    results.append(dict(bench="fullbatch_march", steps=STEPS, nray=n,
                        ms=round(dt * 1e3, 2),
                        ns_per_idx=round(dt / (n * STEPS) * 1e9, 2)))
    print(results[-1], flush=True)


def main():
    global RTT
    print(jax.devices(), flush=True)
    RTT = bench_rtt()
    print({"bench": "rtt", "ms": round(RTT * 1e3, 3)}, flush=True)
    results = [dict(bench="rtt", ms=round(RTT * 1e3, 4))]
    bench_elementwise(results)
    bench_gather(results)
    bench_fullbatch_gather_march(results)
    bench_tiled_while(results)
    bench_tile_gather_loop(results)
    with open("tools/microbench_out.json", "w") as f:
        json.dump(results, f, indent=1)
    print("WROTE tools/microbench_out.json", flush=True)


if __name__ == "__main__":
    main()
