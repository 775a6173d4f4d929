#!/usr/bin/env python3
"""Benchmark: aggregate env-steps/s of the vectorized simulator.

Default = the metric of record: the 30x30 grid (BASELINE.md), gen-2 ring
layout, f32, vmapped batch, on the default jax device (TPU when present).
Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the reference C++ engine measured on this host (1 thread,
tools/oracle/README.md): 4x4 grid = 182 steps/s, 16x16 ~ 100, 30x30 = 67.
The driver's bar is 8-thread C++; we scale the 1-thread number by 8
(optimistic for the reference — it scales sub-linearly).
"""

import argparse
import json
import os
import sys
import time

REF_1T = {"4x4": 182.0, "16x16": 100.0, "30x30": 67.0, "example": 670.0}

# benchmark roadnets are generator output (gitignored); rebuild on demand
_GEN_GRID = {"roadnet_16_16.json": 16, "roadnet_30_30.json": 30}


def _ensure_roadnet(cfg_path):
    with open(cfg_path) as f:
        cfgj = json.load(f)
    rn = cfgj.get("roadnetFile", "")
    # mirror compile_scenario's resolution: a relative 'dir' is relative
    # to the config file, not the CWD (cityflow_tpu/compiler/net.py)
    base = cfgj.get("dir", "")
    if not os.path.isabs(base):
        base = os.path.join(os.path.dirname(os.path.abspath(cfg_path)), base)
    path = os.path.join(base, rn)
    if os.path.exists(path) or rn not in _GEN_GRID:
        return
    import tempfile
    from cityflow_tpu.tools import gridgen
    n = _GEN_GRID[rn]
    # keep the tempdir on the same filesystem as the destination so the
    # final os.replace is an atomic rename (no EXDEV on tmpfs /tmp)
    with tempfile.TemporaryDirectory(
            dir=os.path.dirname(path) or ".") as td:
        gridgen.main([str(n), str(n), "--dir", td + "/",
                      "--roadnetFile", rn, "--flowFile", "flow_tmp.json"])
        os.replace(os.path.join(td, rn), path)
    print(f"regenerated {path}", file=sys.stderr)


def run_ring(args, net, batch):
    import jax
    import jax.numpy as jnp
    from cityflow_tpu import ring_sim
    from cityflow_tpu.core.ring import (
        batch_ring_state, ring_step_batched, ring_step_p1_batched,
        ring_step_p2_batched)

    t0 = time.time()
    # the spawn horizon (and so the q-table shapes) is prebuilt to the
    # step budget; with --window the budget is one window (the timed
    # region loops that window), else the full --steps
    budget = args.window if args.window else args.steps
    sim = ring_sim.build_sim(net, horizon=args.warmup + budget + 8,
                             sl=args.lane_slots)
    build_s = time.time() - t0
    B = batch
    # TRAILING batch layout (core/ring.py batch_ring_state): the env axis
    # rides minor so reshape views stay bitcasts; B multiple of 128 fills
    # the vector tiles
    bstate = batch_ring_state(sim.state, B)
    if net.num_links > 16000 or (sim.cfg.lane_change
                                 and net.num_links > 4000):
        # split compilation: the monolithic 30x30 program exceeds
        # practical XLA compile budgets on the tunneled backend, and so
        # does the 16x16 with lane change (~2x the program); tables
        # ride as jit arguments (constants bloat compile + cache load)
        def step_b(s):
            s, m = ring_step_p1_batched(sim.tables, sim.cfg, s, sim.q)
            return ring_step_p2_batched(sim.tables, sim.cfg, s, m)
    else:
        def step_b(s):
            return ring_step_batched(sim.tables, sim.cfg, s, sim.q)
    # TIMING DISCIPLINE: on the axon-tunneled TPU, jax.block_until_ready
    # returns BEFORE the device executes (measured 2026-08-20: a 28-TFLOP
    # matmul chain "blocked" in 3 ms; the ring step "ran" at 0.37 ms
    # enqueue vs 226 ms real). Every fence below is therefore a VALUE
    # READBACK (time-to-value), never block_until_ready. Rounds 1-4
    # recorded enqueue rates; numbers from this file are now honest.
    def fence(tree):
        leaf = tree.overflow if hasattr(tree, "overflow") else tree
        return float(jnp.max(leaf))

    print(f"[stage] build_s={build_s:.1f}", file=sys.stderr, flush=True)
    t0 = time.time()
    bstate = step_b(bstate)
    fence(bstate)
    compile_s = time.time() - t0
    print(f"[stage] compile_s={compile_s:.1f}", file=sys.stderr, flush=True)
    t0 = time.time()
    for _ in range(max(args.warmup - 1, 1)):
        bstate = step_b(bstate)
    fence(bstate)
    est = (time.time() - t0) / max(args.warmup - 1, 1)
    # timed region: at least --min-seconds of wall clock (VERDICT r04
    # weak 3: a 24 ms window is not a measurement). With --window W the
    # region LOOPS the scenario's first W post-warmup steps, resetting
    # the state to the warm snapshot between repeats (the on-device copy
    # is ~1 ms, timed in): the measurement runs at the benchmark's real
    # density for as long as needed instead of simulating thousands of
    # consecutive steps into an unphysical jam (r04's 5005-step run
    # tripped OV_REMOVE at 36k veh/env). W=0 runs consecutively.
    if args.window and est * args.window < args.min_seconds:
        # only worth the snapshot double-buffering when one window pass
        # is shorter than the measurement minimum; at 30x30 B=128 the
        # extra live state copy OOMs the chip and a single 300-step
        # window is already a 1-2 minute measurement
        snap = jax.tree_util.tree_map(
            lambda x: jnp.copy(x) if hasattr(x, "shape") else x, bstate)
        fence(snap)
        # drop the warmup state: one chip holds only snap + live state
        bstate = None
        print("[stage] snapshot done", file=sys.stderr, flush=True)
        W = int(args.window)
        steps = 0
        s = None
        t0 = time.time()
        while True:
            s = None        # free last window's state before the copy
            s = jax.tree_util.tree_map(
                lambda x: jnp.copy(x) if hasattr(x, "shape") else x, snap)
            for _ in range(W):
                s = step_b(s)
            fence(s)        # readback fence: forces real execution
            steps += W
            print(f"[stage] window done steps={steps} "
                  f"elapsed={time.time() - t0:.1f}s",
                  file=sys.stderr, flush=True)
            if time.time() - t0 >= args.min_seconds or steps >= args.steps:
                break
        dt = time.time() - t0
    elif args.window:
        # one consecutive pass over the scenario's first W post-warmup
        # steps IS the >= min-seconds measurement at benchmark density
        W = int(args.window)
        s = bstate
        bstate = None
        t0 = time.time()
        for _ in range(W):
            s = step_b(s)
        fence(s)
        dt = time.time() - t0
        steps = W
        print(f"[stage] window done steps={steps} elapsed={dt:.1f}s",
              file=sys.stderr, flush=True)
    else:
        steps = int(args.steps)
        if args.min_seconds:
            steps = min(steps,
                        max(64, int(args.min_seconds / max(est, 1e-7))))
        t0 = time.time()
        s = bstate
        for _ in range(steps):
            s = step_b(s)
        fence(s)
        dt = time.time() - t0
    ov = int(jnp.max(s.overflow))
    veh = int(jnp.sum(s.n_l[:, 0]) + jnp.sum(s.n_k[:, 0]))
    return dt, ov, veh, build_s, compile_s, steps


def _is_oom(e) -> bool:
    return "RESOURCE_EXHAUSTED" in str(e) or "Out of memory" in str(e)


def run_ring_ladder(args, net, batch=None):
    """Try the ring layout at `batch` (default args.batch), halving the
    batch on device OOM until it fits (floor 1). Returns
    (result_tuple, batch_used)."""
    import gc
    import jax
    batch = args.batch if batch is None else batch
    while True:
        try:
            return run_ring(args, net, batch), batch
        except jax.errors.JaxRuntimeError as e:
            print(f"ring error at batch={batch}: {str(e)[:300]}",
                  file=sys.stderr, flush=True)
            if not _is_oom(e) or batch <= 1:
                raise
            print(f"ring OOM at batch={batch}, retrying batch={batch // 2}",
                  file=sys.stderr, flush=True)
            gc.collect()
            batch //= 2


def run_gen1(args, net, batch):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from cityflow_tpu.compiler.spawn import SpawnGenerator
    from cityflow_tpu.core.state import StepConfig, init_state
    from cityflow_tpu.engine import _net_device_arrays
    from cityflow_tpu.parallel.batch import init_batch_state
    from cityflow_tpu.core import step as step_mod

    cfgj = net.host.config
    interval = float(cfgj["interval"])
    gen = SpawnGenerator(net, int(cfgj["seed"]), interval)
    budget = args.window if args.window else args.steps
    horizon = args.warmup + budget + 8
    gen.extend(horizon)
    t = gen.arrays()
    pad = max(gen.max_per_step, 1)
    spawn_dev = {k: jnp.asarray(np.concatenate(
        [t[k], np.full(pad, -1 if k == "step" else 0, t[k].dtype)]))
        for k in ("step", "flow", "priority", "first_drv", "route")}
    L = net.num_lanes
    ll_len = net.drv_len[L:] if net.num_links else np.zeros(1)
    k_link = int(min(16, np.ceil(ll_len.max() / 7.0) + 2)) if net.num_links else 4
    cfg = StepConfig(
        interval=interval, num_lanes=net.num_lanes,
        num_drivables=net.num_lanes + net.num_links,
        max_vehicles=args.max_vehicles,
        max_spawn_per_step=gen.max_per_step,
        k_link=k_link, k_scan=6, k_hop=4,
        k_out=max(net.host.ko, 1), k_cross=max(net.host.kc, 1),
        rl_traffic_light=bool(cfgj["rlTrafficLight"]),
        lane_change=bool(cfgj.get("laneChange", False)),
        exact=False)
    net_dev = _net_device_arrays(net, np.float32)
    st0 = init_state(cfg, net.num_inters, net.phase_time, net.n_phases,
                     net.phase_offset)
    state = init_batch_state(cfg, st0, batch)
    split = net.num_links > 2000
    # net/spawn tables ride as jit arguments (closure constants are
    # re-staged per dispatch by the axon runtime — see docs/design.md)
    if split:
        p1 = jax.jit(jax.vmap(
            lambda n, s, sp: step_mod.step_part1.__wrapped__(n, cfg, s, sp),
            in_axes=(None, 0, None)))
        p2a = jax.jit(jax.vmap(
            lambda n, s, arr, fa, ia: step_mod.step_part2a.__wrapped__(
                n, cfg, s, arr, fa, ia), in_axes=(None, 0, 0, 0, 0)))
        p2b = jax.jit(jax.vmap(
            lambda n, s, arr, la, vn, nf: step_mod.step_part2b.__wrapped__(
                n, cfg, s, arr, la, vn, nf), in_axes=(None, 0, 0, 0, 0, 0)))
        p3 = jax.jit(jax.vmap(
            lambda n, s, arr, buf, ov: step_mod.step_part3.__wrapped__(
                n, cfg, s, arr, buf, ov), in_axes=(None, 0, 0, 0, 0)))

        def step_b(s):
            s, arr, fa, ia = p1(net_dev, s, spawn_dev)
            la, vn, nf = p2a(net_dev, s, arr, fa, ia)
            buf, ovh = p2b(net_dev, s, arr, la, vn, nf)
            return p3(net_dev, s, arr, buf, ovh)
    else:
        stepj = jax.jit(jax.vmap(
            lambda n, s, sp: step_mod.step.__wrapped__(n, cfg, s, sp),
            in_axes=(None, 0, None)))

        def step_b(s):
            return stepj(net_dev, s, spawn_dev)
    def fence(tree):
        # readback fence — see run_ring: block_until_ready is a no-op on
        # the axon tunnel; only a value transfer proves execution
        return float(jnp.max(tree.overflow))

    t0 = time.time()
    state = step_b(state)
    fence(state)
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(max(args.warmup - 1, 1)):
        state = step_b(state)
    fence(state)
    est = (time.time() - t0) / max(args.warmup - 1, 1)
    if args.window:
        # windowed measurement — see run_ring
        snap = jax.tree_util.tree_map(
            lambda x: jnp.copy(x) if hasattr(x, "shape") else x, state)
        fence(snap)
        W = int(args.window)
        steps = 0
        t0 = time.time()
        while True:
            state = jax.tree_util.tree_map(
                lambda x: jnp.copy(x) if hasattr(x, "shape") else x, snap)
            for _ in range(W):
                state = step_b(state)
            fence(state)
            steps += W
            if time.time() - t0 >= args.min_seconds or steps >= args.steps:
                break
        dt = time.time() - t0
    else:
        steps = int(args.steps)
        if args.min_seconds:
            steps = min(steps,
                        max(64, int(args.min_seconds / max(est, 1e-7))))
        t0 = time.time()
        for _ in range(steps):
            state = step_b(state)
        fence(state)
        dt = time.time() - t0
    ov = int(jnp.max(state.overflow))
    veh = int(jnp.sum(state.active[0]))
    return dt, ov, veh, 0.0, compile_s, steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="benchmarks/config_30x30.json")
    ap.add_argument("--layout", choices=["ring", "gen1", "auto"],
                    default="auto",
                    help="gen-2 ring (fast path) or gen-1 slot pool")
    ap.add_argument("--batch", type=int, default=128,
                    help="env batch; the ring state is trailing-batch, "
                         "so multiples of 128 fill the vector tiles "
                         "(64 occupies the same HBM as 128)")
    ap.add_argument("--steps", type=int, default=6144,
                    help="step BUDGET for the timed window (the spawn "
                         "horizon is prebuilt to cover it); the window "
                         "sizes itself to --min-seconds within this")
    ap.add_argument("--window", type=int, default=300,
                    help="timed region loops the scenario's first "
                         "WINDOW post-warmup steps (reset to the warm "
                         "snapshot between repeats) until --min-seconds "
                         "elapse: a long measurement at the benchmark's "
                         "real density, matching the reference's "
                         "300-step measurement. 0 = run --steps "
                         "consecutive steps instead")
    ap.add_argument("--min-seconds", type=float, default=2.0,
                    help="minimum timed-window wall clock; 0 = run "
                         "exactly --steps")
    ap.add_argument("--warmup", type=int, default=8)
    ap.add_argument("--lane-slots", type=int, default=40,
                    help="ring lane capacity; 40 = jam capacity, the "
                         "setting validated ring==gen-1 for 600 steps on "
                         "16x16/30x30 (artifacts/ring_fid_*.json)")
    ap.add_argument("--max-vehicles", type=int, default=4096)
    ap.add_argument("--ref-steps-per-s", type=float, default=None)
    ap.add_argument("--sweep", default=None,
                    help="comma list of batch sizes (e.g. 64,256,1024,"
                         "4096): run each through the OOM ladder, write "
                         "the table to --sweep-out, print the headline "
                         "line for the best batch")
    ap.add_argument("--sweep-out", default="SCALING_BATCH.json")
    args = ap.parse_args()

    import jax
    from cityflow_tpu.compiler.net import compile_scenario
    from cityflow_tpu.engine import _enable_compilation_cache

    _enable_compilation_cache()
    cfg_path = args.config
    if not os.path.isabs(cfg_path) and not os.path.exists(cfg_path):
        # source-tree fallback: resolve against the repo root (3 levels
        # up from this module) so `python bench.py` works from anywhere
        root = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        cand = os.path.join(root, args.config)
        if os.path.exists(cand):
            cfg_path = cand
    _ensure_roadnet(cfg_path)
    net = compile_scenario(cfg_path)

    scen = "other"
    for k in REF_1T:
        if k in args.config:
            scen = k
            break
    ref = args.ref_steps_per_s or REF_1T.get(scen, 67.0)

    baseline = ref * 8  # 8-thread reference proxy

    def run_once(batch):
        layout = args.layout
        batch_used = batch
        if layout in ("ring", "auto"):
            try:
                (dt, ov, veh, build_s, compile_s, steps), batch_used = \
                    run_ring_ladder(args, net, batch)
                layout = "ring"
            except (ValueError, jax.errors.JaxRuntimeError):
                # ValueError: ring layout can't express this scenario;
                # JaxRuntimeError: OOM even at the smallest ladder batch.
                if args.layout == "ring":
                    raise
                layout = "gen1"
        if layout == "gen1":
            dt, ov, veh, build_s, compile_s, steps = run_gen1(
                args, net, batch_used)
        rate = batch_used * steps / dt
        return {
            "metric": f"env_steps_per_sec_{scen}",
            "value": round(rate, 1),
            "unit": "env-steps/s",
            "vs_baseline": round(rate / baseline, 2),
            "layout": layout,
            "batch": batch_used, "steps": steps,
            "ms_per_batched_step": round(dt * 1000 / steps, 2),
            "compile_s": round(compile_s, 1),
            "device": str(jax.devices()[0]).split(":")[0],
            "overflow_flags": ov,
            "vehicles_per_env": veh,
            "seconds": round(dt, 3),
            "window": args.window,
        }

    if args.sweep:
        rows, attempted = [], []
        for b in [int(x) for x in args.sweep.split(",")]:
            if rows and b <= rows[-1]["batch"]:
                # the ladder already walked down through this size
                continue
            attempted.append(b)
            r = run_once(b)
            r["batch_requested"] = b
            rows.append(r)
            print(json.dumps(r), file=sys.stderr, flush=True)
        best = max(rows, key=lambda r: r["value"])
        knee = None
        for prev, cur in zip(rows, rows[1:]):
            if cur["value"] < prev["value"] * 1.1:
                knee = prev["batch"]
                break
        doc = {"kind": "batch_scaling_sweep", "config": args.config,
               "device": best["device"],
               "batches_attempted": attempted,
               "rows": rows, "best_batch": best["batch"],
               "saturation_knee_batch": knee if knee is not None
               else best["batch"],
               "note": ("env-steps/s per batch size; each row's timed "
                        "window is >= --min-seconds of wall clock; a "
                        "requested batch that OOMs reports the largest "
                        "halved batch that fits (batch vs "
                        "batch_requested)")}
        with open(args.sweep_out, "w") as f:
            json.dump(doc, f, indent=1)
        print(json.dumps(best))
        return

    print(json.dumps(run_once(args.batch)))


if __name__ == "__main__":
    main()
