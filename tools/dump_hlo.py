#!/usr/bin/env python3
"""Dump the optimized HLO of the 30x30 ring step (p1/p2) for layout and
fusion analysis. Cache-warm compile; writes /tmp/p1.hlo and /tmp/p2.hlo."""

import sys
import time

import jax
import jax.numpy as jnp

from cityflow_tpu import ring_sim
from cityflow_tpu.compiler.net import compile_scenario
from cityflow_tpu.core.ring import (
    batch_ring_state, ring_step_p1_batched, ring_step_p2_batched)
from cityflow_tpu.engine import _enable_compilation_cache
from cityflow_tpu.tools.bench import _ensure_roadnet

cfgp = sys.argv[1] if len(sys.argv) > 1 else "benchmarks/config_30x30.json"
B = int(sys.argv[2]) if len(sys.argv) > 2 else 64
sl = int(sys.argv[3]) if len(sys.argv) > 3 else 40

_enable_compilation_cache()
_ensure_roadnet(cfgp)
net = compile_scenario(cfgp)
sim = ring_sim.build_sim(net, horizon=64, sl=sl)
bstate = batch_ring_state(sim.state, B)
t0 = time.time()
lowered1 = jax.jit(lambda s: ring_step_p1_batched(
    sim.tables, sim.cfg, s, sim.q)).lower(bstate)
c1 = lowered1.compile()
print(f"p1 compile {time.time() - t0:.1f}s", flush=True)
with open("/tmp/p1.hlo", "w") as f:
    f.write(c1.as_text())
mid_shape = jax.eval_shape(lambda s: ring_step_p1_batched(
    sim.tables, sim.cfg, s, sim.q), bstate)
s1, m1 = jax.tree_util.tree_map(
    lambda sh: jnp.zeros(sh.shape, sh.dtype), mid_shape)
t0 = time.time()
c2 = jax.jit(lambda s, m: ring_step_p2_batched(
    sim.tables, sim.cfg, s, m)).lower(s1, m1).compile()
print(f"p2 compile {time.time() - t0:.1f}s", flush=True)
with open("/tmp/p2.hlo", "w") as f:
    f.write(c2.as_text())
print("dims:", {k: getattr(sim.cfg, k) for k in
                ("SL", "SK", "LNp", "LKp", "G", "LPI", "KC", "IL", "OL",
                 "KIN", "KOUT", "AP", "XK", "TI", "I")})
print("mem p1:", c1.memory_analysis())
EOF = None
