#!/usr/bin/env python3
"""Benchmark/debug CLI — equivalent of the reference's tools/debug/simple_run
(reference: tools/debug/simple_run.cpp: `--configFile -s steps -t threads`,
$DATADIR prefix, wall-time report)."""

import argparse
import os
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configFile", default="examples/config.json")
    ap.add_argument("-s", "--steps", type=int, default=1000)
    ap.add_argument("-t", "--threads", type=int, default=1,
                    help="accepted for CLI parity; results are thread-count-"
                         "independent by construction")
    ap.add_argument("--exact", action="store_true", default=True)
    ap.add_argument("--fast", dest="exact", action="store_false")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (exact mode default)")
    args = ap.parse_args()

    config = os.environ.get("DATADIR", "") + args.configFile
    if args.cpu or args.exact:
        import jax
        jax.config.update("jax_platforms", "cpu")
        from cityflow_tpu.engine import ensure_exact_cpu_flags
        ensure_exact_cpu_flags()

    from cityflow_tpu.engine import Engine
    eng = Engine(config, thread_num=args.threads, exact=args.exact)
    t0 = time.time()
    for _ in range(args.steps):
        eng.next_step()
    dt = time.time() - t0
    print(f"Total Step: {args.steps}")
    print(f"Total Time: {dt:.4f}")
    print(f"steps/s: {args.steps / dt:.1f}  "
          f"vehicles: {eng.get_vehicle_count()}  "
          f"avg travel time: {eng.get_average_travel_time():.2f}")


if __name__ == "__main__":
    main()
