#!/usr/bin/env python3
"""Prime the persistent XLA cache for a bench.py configuration, one
program per invocation if needed.

Usage: python tools/prime_bench.py [p1|p2|both|mono]
           [--config benchmarks/config_30x30.json] [--sl 40] [--batch 64]

Mirrors bench.py run_ring() exactly (same shapes/dtypes => same cache
keys). `mono` primes the monolithic ring_step_batched (what bench.py
uses for nets <= 16k links, e.g. 16x16); p1/p2 prime the split halves of
the 30x30-class program in separate processes so each compile stays
inside the 10-minute tool budget; bench.py then loads both warm."""

import argparse
import os
import sys
import time

here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, here)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("which", nargs="?", default="both",
                    choices=["p1", "p2", "both", "mono"])
    ap.add_argument("--config", default="benchmarks/config_30x30.json")
    ap.add_argument("--sl", type=int, default=40)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--steps", type=int, default=6144,
                    help="bench.py --steps budget to mirror (the spawn "
                         "horizon sets the q-table shapes => cache key)")
    ap.add_argument("--warmup", type=int, default=8)
    args = ap.parse_args()
    import jax
    import jax.numpy as jnp
    from cityflow_tpu.compiler.net import compile_scenario
    from cityflow_tpu.engine import _enable_compilation_cache
    from cityflow_tpu import ring_sim
    from cityflow_tpu.core.ring import (
        batch_ring_state, ring_step_batched, ring_step_p1_batched,
        ring_step_p2_batched)

    _enable_compilation_cache()
    cfg_path = args.config if os.path.isabs(args.config) \
        else os.path.join(here, args.config)
    net = compile_scenario(cfg_path)
    t0 = time.time()
    sim = ring_sim.build_sim(net, horizon=args.warmup + args.steps + 8,
                             sl=args.sl)
    print(f"build {time.time()-t0:.1f}s lc={sim.cfg.lane_change}",
          flush=True)
    B = args.batch
    bstate = batch_ring_state(sim.state, B)   # trailing batch, like bench

    def fence(x):
        # value readback: block_until_ready is a no-op on the axon tunnel
        return float(jnp.max(x.overflow))

    if args.which == "mono":
        t0 = time.time()
        out = ring_step_batched(sim.tables, sim.cfg, bstate, sim.q)
        fence(out)
        print(f"mono ready {time.time()-t0:.1f}s", flush=True)
    else:
        t0 = time.time()
        s, mid = ring_step_p1_batched(sim.tables, sim.cfg, bstate, sim.q)
        fence(s)
        print(f"p1 ready {time.time()-t0:.1f}s", flush=True)
        if args.which in ("p2", "both"):
            t0 = time.time()
            out = ring_step_p2_batched(sim.tables, sim.cfg, s, mid)
            fence(out)
            print(f"p2 ready {time.time()-t0:.1f}s", flush=True)
    print("PRIMED", args.which, flush=True)


if __name__ == "__main__":
    main()
