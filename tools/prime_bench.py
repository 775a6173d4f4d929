#!/usr/bin/env python3
"""Prime the persistent XLA cache for bench.py's default (30x30 ring split)
configuration, one program per invocation if needed.

Usage: python tools/prime_bench.py [p1|p2|both]

Mirrors bench.py run_ring() exactly (same shapes/dtypes => same cache keys).
Compiling each split half in its own process call keeps every step inside
the 10-minute tool budget; bench.py then loads both warm.
"""

import os
import sys
import time

here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, here)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    import jax
    import jax.numpy as jnp
    from cityflow_tpu.compiler.net import compile_scenario
    from cityflow_tpu.engine import _enable_compilation_cache
    from cityflow_tpu import ring_sim
    from cityflow_tpu.core.ring import ring_step_p1_batched, ring_step_p2_batched

    _enable_compilation_cache()
    net = compile_scenario(os.path.join(here, "benchmarks/config_30x30.json"))
    t0 = time.time()
    sim = ring_sim.build_sim(net, horizon=8 + 64 + 8, sl=24)
    print(f"build {time.time()-t0:.1f}s", flush=True)
    B = 64
    bstate = jax.tree_util.tree_map(
        lambda x: jnp.zeros((B,) + x.shape, x.dtype) + x[None]
        if hasattr(x, "shape") else x, sim.state)
    t0 = time.time()
    s, mid = ring_step_p1_batched(sim.tables, sim.cfg, bstate, sim.q)
    s = jax.block_until_ready(s)
    print(f"p1 ready {time.time()-t0:.1f}s", flush=True)
    if which in ("p2", "both"):
        t0 = time.time()
        out = ring_step_p2_batched(sim.tables, sim.cfg, s, mid)
        out = jax.block_until_ready(out)
        print(f"p2 ready {time.time()-t0:.1f}s", flush=True)
    print("PRIMED", which, flush=True)


if __name__ == "__main__":
    main()
