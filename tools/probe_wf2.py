"""Bisect the wavefront round's cost at flagship width: slot LOAD (state
gathers incl. [N,3] ray arrays), MARCH steps (the one_step op mix on a
resident buffer), and SCATTER-back — each isolated with in-jit K-fold
repetition. Also measures [N,3]-take vs 6x1D-take to test the lane-padding
hypothesis. Writes tools/probe_wf2_out.json."""

from __future__ import annotations

import json
import time

from vxtpu.engine.platform import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from vxtpu.render import dda
from vxtpu.utils import safe_inverse
from vxtpu.world.distfield import distfield_fetch
from vxtpu.world.grid import in_bounds

N = 2073600
B = 1152 * 1024
DIMS = (512, 512, 512)
BIG = 3.0e30
K = 8


def chain_time(fn, args, iters=2):
    dep = jnp.float32(0.0)
    dep = fn(*args, dep)
    float(dep)
    t0 = time.perf_counter()
    for _ in range(iters):
        dep = fn(*args, dep)
    float(dep)
    return (time.perf_counter() - t0) / iters


def reps(body, k):
    def run(*args):
        *xs, dep = args

        def it(i, c):
            return body(*xs, c + 0.0 * i)

        return jax.lax.fori_loop(0, k, it, dep)
    return jax.jit(run)


def per_op(body, args, name, out, k=K):
    t1 = chain_time(reps(body, 1), args)
    tk = chain_time(reps(body, k), args)
    out[name] = round(max((tk - t1) / (k - 1) * 1e3, 0.0), 2)
    print(json.dumps({name: out[name], "t1_ms": round(t1 * 1e3, 1)}),
          flush=True)


def main():
    key = jax.random.PRNGKey(0)
    out = {}
    o3 = jax.random.uniform(key, (N, 3), jnp.float32, -100.0, 600.0)
    d3 = jax.random.normal(key, (N, 3), jnp.float32)
    d3 = d3 / jnp.linalg.norm(d3, axis=-1, keepdims=True)
    pack1 = jnp.zeros((N,), jnp.int32)
    pack2 = jax.random.randint(key, (N,), 0, 1 << 30)
    t_cur = jnp.zeros((N,), jnp.float32)
    teb = jnp.full((N,), 1e9, jnp.float32)
    idx = jax.random.randint(key, (B,), 0, N)
    df_flat = jnp.zeros((512 ** 3,), jnp.uint8) + 24

    # --- A: slot load as written today (o/d via [N,3] takes)
    def load3(o3, d3, pack1, pack2, t_cur, teb, idx, dep):
        j = (idx + dep.astype(jnp.int32)) % N
        acc = (jnp.take(pack1, j).sum() + jnp.take(pack2, j).sum()).astype(jnp.float32)
        acc += jnp.take(t_cur, j).sum() + jnp.take(teb, j).sum()
        acc += jnp.take(o3, j, axis=0).sum() + jnp.take(d3, j, axis=0).sum()
        return acc * 1e-12 + dep
    per_op(load3, (o3, d3, pack1, pack2, t_cur, teb, idx), "loadA_Nx3_ms", out)

    # --- B: slot load with 6 separate 1D channels
    chans = [o3[:, i] for i in range(3)] + [d3[:, i] for i in range(3)]

    def load1(c0, c1, c2, c3, c4, c5, pack1, pack2, t_cur, teb, idx, dep):
        j = (idx + dep.astype(jnp.int32)) % N
        acc = (jnp.take(pack1, j).sum() + jnp.take(pack2, j).sum()).astype(jnp.float32)
        acc += jnp.take(t_cur, j).sum() + jnp.take(teb, j).sum()
        for c in (c0, c1, c2, c3, c4, c5):
            acc += jnp.take(c, j).sum()
        return acc * 1e-12 + dep
    per_op(load1, (*chans, pack1, pack2, t_cur, teb, idx), "loadB_6x1D_ms", out)

    # --- C: 4 march steps on a RESIDENT buffer (the one_step op mix:
    # DDA advance + distfield jump + fetch + repack), no compaction
    ob = o3[:B]
    db = d3[:B]
    tebB = teb[:B]

    def march4(ob, db, tebB, df_flat, dep):
        inv_d = safe_inverse(db)
        t_delta = jnp.abs(inv_d)
        step3 = jnp.where(db >= 0, 1, -1).astype(jnp.int32)
        v = jnp.clip((ob + dep).astype(jnp.int32) % 512, 0, 511)
        tn = (v.astype(jnp.float32) + 1.0 - ob) * inv_d
        st = dict(p1=jnp.zeros((B,), jnp.int32), v=v, t_next=tn,
                  t=jnp.zeros((B,), jnp.float32))

        def one(i, st):
            p1, v, t_next, t = st["p1"], st["v"], st["t_next"], st["t"]
            act = (p1 & 2) == 0
            dist = (p1 >> 6) & 0xFF
            v_f, t_next_f, t_cross_f, mask_f = dda.dda_advance(
                v, t_next, t_delta, step3)
            r = (dist - 1).astype(jnp.float32)[..., None]
            vf32 = v.astype(jnp.float32)
            bound = jnp.where(db >= 0, vf32 + r + 1.0, vf32 - r)
            t_ax = (bound - ob) * inv_d
            t_ax = jnp.where(jnp.abs(db) < 1e-12, jnp.full_like(t_ax, BIG),
                             t_ax)
            t_jump = jnp.min(t_ax, axis=-1)
            mask_j = dda.dda_step_mask(t_ax)
            v_j, t_next_j, _, _ = dda.dda_init(ob, db, t_jump, DIMS)
            do_jump = (dist > 1) & ~jnp.all(v_j == v, axis=-1)
            v_new = jnp.where(do_jump[..., None], v_j, v_f)
            t_next_new = jnp.where(do_jump[..., None], t_next_j, t_next_f)
            t_cross = jnp.where(do_jump, t_jump, t_cross_f)
            inside = in_bounds(v_new, DIMS)
            dfv = distfield_fetch(df_flat, v_new, DIMS).astype(jnp.int32)
            new_hit = act & inside & (dfv == 0)
            steps = (p1 >> 14) + 1
            p1n = (jnp.where(new_hit, 4, 0)
                   | (jnp.clip(dfv, 0, 255) << 6) | (steps << 14))
            return dict(p1=jnp.where(act, p1n, p1),
                        v=jnp.where(act[..., None], v_new, v),
                        t_next=jnp.where(act[..., None], t_next_new, t_next),
                        t=jnp.where(act, t_cross, t))

        st = jax.lax.fori_loop(0, 4, one, st)
        return (st["t"].sum() + st["p1"].sum().astype(jnp.float32)) * 1e-12 + dep
    per_op(march4, (ob, db, tebB, df_flat), "march4_steps_B_ms", out)
    out["march_per_step_B_ms"] = round(out["march4_steps_B_ms"] / 4, 2)

    # --- D: scatter-back (3 channels at B -> N)
    def scat(pack1, idx, dep):
        j = (idx + dep.astype(jnp.int32)) % N
        vals = jnp.arange(B, dtype=jnp.int32)
        a = pack1.at[j].set(vals, mode="drop")
        b = pack1.at[j].set(vals + 1, mode="drop")
        c = t_cur.at[j].set(dep + 1.0, mode="drop")
        return (a[0] + b[0]).astype(jnp.float32) * 1e-12 + c[0] + dep
    per_op(scat, (pack1, idx), "scatter3_B_ms", out)

    # --- E: full-width cumsum+select (compaction bookkeeping)
    act = jax.random.bernoulli(key, 0.5, (N,))

    def comp(act, dep):
        a = act & (dep < 1e30)
        pos = jnp.cumsum(a.astype(jnp.int32)) - 1
        sel = a & (pos < B)
        ids = jnp.arange(N, dtype=jnp.int32)
        slot = jnp.zeros((B,), jnp.int32).at[
            jnp.where(sel, pos, B)].set(ids, mode="drop")
        return slot[0].astype(jnp.float32) * 1e-9 + dep
    per_op(comp, (act,), "compaction_bookkeeping_ms", out)

    with open("tools/probe_wf2_out.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote tools/probe_wf2_out.json", flush=True)


if __name__ == "__main__":
    main()
