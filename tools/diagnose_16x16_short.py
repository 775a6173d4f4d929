#!/usr/bin/env python3
"""Root-cause probe for the r04 `ok: false` oracle run (VERDICT r04 weak
4 / next-round 3): `ring_aggregate_16x16_short_finished` drifted by 60
active vehicles at t=304 (cnt 2292 vs oracle 2352) with exact final
count and travel time.

Two candidate mechanisms for a one-step active-count dip:
  (a) an ADMISSION wave lands one step late in the ring (Lane::available
      tail-gap test flips on an f32-epsilon position difference): our
      cnt dips, but our cnt+waiting (cntw) stays EQUAL to the oracle's;
  (b) a FINISH wave lands one step early (f32 position reaching route
      end a step sooner): cnt and cntw both dip, finished_cnt jumps.

The oracle golden must be dumped with the cntw field
(tools/oracle/dump_golden.cpp --agg-only; cntw = active + waiting).
This script steps the ring engine on the same config, derives
(active, waiting, finished) per step from the device state and spawn
queues, and prints the window around the drift.

Usage:
  /tmp/oracle/dump_golden benchmarks/config_16x16_short.json 320 \
      --agg-only > /tmp/oracle_16x16_short_cntw.jsonl
  python tools/diagnose_16x16_short.py \
      --golden /tmp/oracle_16x16_short_cntw.jsonl --steps 320
"""

import argparse
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="benchmarks/config_16x16_short.json")
    ap.add_argument("--golden", required=True)
    ap.add_argument("--steps", type=int, default=320)
    ap.add_argument("--lo", type=int, default=295)
    ap.add_argument("--hi", type=int, default=315)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import numpy as np
    import jax
    from cityflow_tpu.engine import _enable_compilation_cache
    _enable_compilation_cache()
    from cityflow_tpu.compiler.net import compile_scenario
    from cityflow_tpu import ring_sim

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfgp = args.config if os.path.isabs(args.config) \
        else os.path.join(here, args.config)
    net = compile_scenario(cfgp)
    sim = ring_sim.build_sim(net, horizon=args.steps + 8)

    qstep = np.asarray(jax.device_get(sim.q["step"]))     # (EL, QCAP)

    op = gzip.open if args.golden.endswith(".gz") else open
    gold = {}
    with op(args.golden, "rt") as f:
        for line in f:
            rec = json.loads(line.replace(":inf", ":Infinity"))
            if rec.get("type") == "step":
                gold[rec["t"]] = rec

    rows = []
    for t in range(1, args.steps + 1):
        ring_sim.step(sim)
        st = sim.state
        active = int(jax.device_get(st.n_l.sum() + st.n_k.sum()))
        cursor = np.asarray(jax.device_get(st.el_cursor))
        # rows eligible by now: q.step in [0, t-1]; admitted = cursor
        eligible = int(((qstep >= 0) & (qstep <= t - 1)).sum())
        waiting = eligible - int(cursor.sum())
        fin = int(jax.device_get(st.finished_cnt))
        g = gold.get(t, {})
        rows.append(dict(
            t=t, cnt=active, cntw=active + waiting, fin=fin,
            g_cnt=g.get("cnt"), g_cntw=g.get("cntw"),
            d_cnt=None if "cnt" not in g else active - g["cnt"],
            d_cntw=None if "cntw" not in g
            else active + waiting - g["cntw"]))

    drift = [r for r in rows if r["d_cnt"]]
    print(f"steps with cnt drift: {len(drift)}")
    window = [r for r in rows if args.lo <= r["t"] <= args.hi]
    for r in window:
        print(json.dumps(r))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(dict(kind="drift_diagnosis",
                           config=args.config, golden=args.golden,
                           drift_steps=[r for r in rows if r["d_cnt"]],
                           window=window), f, indent=1)


if __name__ == "__main__":
    main()
