#!/usr/bin/env python3
"""Profile the ring step on the real chip and aggregate device-op time.

Runs the same split p1/p2 program as bench.py on the 30x30 config,
captures a jax.profiler trace over a few steps, and writes a per-op-
category aggregation (total us, count, example op names) to --out.

Timing discipline: block_until_ready is a no-op on the axon tunnel;
every fence below is a value readback (CLAUDE.md / docs/design.md).
"""

import argparse
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict


def aggregate_xplane(trace_dir):
    """Aggregate device-side op durations from the captured trace.

    Parses the plain trace.json.gz the profiler writes next to the
    xplane (the tensorboard_plugin_profile converter is protobuf-version
    broken in this image). Returns {name: [us, count, long_name]}."""
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        return None
    with gzip.open(max(paths, key=os.path.getmtime), "rt") as fh:
        tr = json.load(fh)
    pid_device = set()
    for ev in tr.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            nm = ev.get("args", {}).get("name", "")
            if "TPU" in nm:
                pid_device.add(ev["pid"])
    by_name = defaultdict(lambda: [0.0, 0, ""])
    for ev in tr.get("traceEvents", []):
        if ev.get("ph") != "X" or ev.get("pid") not in pid_device:
            continue
        nm = ev.get("name", "?")
        by_name[nm][0] += ev.get("dur", 0)
        by_name[nm][1] += 1
        ln = ev.get("args", {}).get("long_name", "")
        if ln:
            by_name[nm][2] = ln[:240]
    return by_name


def categorize(name):
    n = name.lower()
    for k in ("copy", "fusion", "dot", "convolution", "transpose", "scatter",
              "gather", "dynamic-slice", "dynamic-update-slice", "reduce",
              "select", "broadcast", "iota", "convert", "bitcast", "concat",
              "slice", "pad", "reshape", "rng", "sort", "while", "all-reduce"):
        if k in n:
            return k
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="benchmarks/config_30x30.json")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--lane-slots", type=int, default=40)
    ap.add_argument("--steps", type=int, default=3, help="profiled steps")
    ap.add_argument("--warmup", type=int, default=4)
    ap.add_argument("--out", default="/tmp/ring_profile.json")
    ap.add_argument("--trace-dir", default="/tmp/ring_trace")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from cityflow_tpu import ring_sim
    from cityflow_tpu.compiler.net import compile_scenario
    from cityflow_tpu.core.ring import (
        batch_ring_state, ring_step_batched, ring_step_p1_batched,
        ring_step_p2_batched)
    from cityflow_tpu.engine import _enable_compilation_cache
    from cityflow_tpu.tools.bench import _ensure_roadnet

    _enable_compilation_cache()
    _ensure_roadnet(args.config)
    net = compile_scenario(args.config)
    sim = ring_sim.build_sim(net, horizon=args.warmup + args.steps + 64,
                             sl=args.lane_slots)
    B = args.batch
    bstate = batch_ring_state(sim.state, B)   # trailing batch
    if net.num_links > 16000 or (sim.cfg.lane_change
                                 and net.num_links > 4000):
        def step_b(s):
            s, m = ring_step_p1_batched(sim.tables, sim.cfg, s, sim.q)
            return ring_step_p2_batched(sim.tables, sim.cfg, s, m)
    else:
        def step_b(s):
            return ring_step_batched(sim.tables, sim.cfg, s, sim.q)

    def fence(tree):
        return float(jnp.max(tree.overflow))

    t0 = time.time()
    bstate = step_b(bstate)
    fence(bstate)
    print(f"[stage] compile_s={time.time() - t0:.1f}", flush=True)
    t0 = time.time()
    for _ in range(args.warmup):
        bstate = step_b(bstate)
    fence(bstate)
    warm = (time.time() - t0) / args.warmup
    print(f"[stage] warm ms/step={warm * 1000:.1f}", flush=True)

    os.makedirs(args.trace_dir, exist_ok=True)
    with jax.profiler.trace(args.trace_dir):
        for _ in range(args.steps):
            bstate = step_b(bstate)
        fence(bstate)

    by_name = aggregate_xplane(args.trace_dir)
    doc = {"config": args.config, "batch": B, "lane_slots": args.lane_slots,
           "steps": args.steps, "warm_ms_per_step": round(warm * 1000, 1)}
    if by_name:
        cats = defaultdict(lambda: [0.0, 0])
        rows = []
        for nm, (us, cnt, ln) in by_name.items():
            c = categorize(nm)
            cats[c][0] += us
            cats[c][1] += cnt
            rows.append((us, cnt, nm, ln))
        rows.sort(reverse=True)
        doc["by_category_us"] = {k: {"us": round(v[0], 1), "count": v[1]}
                                 for k, v in sorted(cats.items(),
                                                    key=lambda i: -i[1][0])}
        doc["top_ops"] = [{"us": round(us, 1), "count": cnt,
                           "name": nm[:160], "sig": ln}
                          for us, cnt, nm, ln in rows[:60]]
        doc["total_device_us"] = round(sum(v[0] for v in by_name.values()),
                                       1)
    else:
        doc["error"] = "no xplane captured"
    with open(args.out, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps({"warm_ms_per_step": doc["warm_ms_per_step"],
                      "out": args.out}), flush=True)


if __name__ == "__main__":
    main()
