#!/usr/bin/env python3
"""A/B experiment: leading-batch vs trailing-batch vmap of the ring step.

Hypothesis: trailing batch (in_axes=-1) keeps every reshape a bitcast and
every one-hot einsum row-major, killing the layout-flip copies that cost
~20+ ms/step at 30x30 (docs/design.md cost model, corrected round 5).

Timing is fenced by value readback (block_until_ready is a no-op on the
axon tunnel)."""

import argparse
import sys
import time

import jax
import jax.numpy as jnp

from cityflow_tpu import ring_sim
from cityflow_tpu.compiler.net import compile_scenario
from cityflow_tpu.core.ring import _notify_phase, _commit_phase
from cityflow_tpu.engine import _enable_compilation_cache
from cityflow_tpu.tools.bench import _ensure_roadnet


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="benchmarks/config_16x16.json")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--lane-slots", type=int, default=40)
    ap.add_argument("--mode", choices=["lead", "trail", "both"],
                    default="both")
    args = ap.parse_args()

    _enable_compilation_cache()
    _ensure_roadnet(args.config)
    net = compile_scenario(args.config)
    sim = ring_sim.build_sim(net, horizon=args.steps + 16,
                             sl=args.lane_slots)
    B = args.batch

    def one(s):
        rs2, mid, _ = _notify_phase(sim.tables, sim.cfg, s, sim.q, False)
        new_rs, _ = _commit_phase(sim.tables, sim.cfg, rs2, mid)
        return new_rs

    def bench(axis):
        if axis == 0:
            bstate = jax.tree_util.tree_map(
                lambda x: jnp.zeros((B,) + x.shape, x.dtype) + x[None]
                if hasattr(x, "shape") else x, sim.state)
        else:
            bstate = jax.tree_util.tree_map(
                lambda x: jnp.zeros(x.shape + (B,), x.dtype) + x[..., None]
                if hasattr(x, "shape") else x, sim.state)
        step = jax.jit(jax.vmap(one, in_axes=axis, out_axes=axis),
                       donate_argnums=(0,))
        t0 = time.time()
        bstate = step(bstate)
        _ = float(jnp.max(bstate.overflow))
        compile_s = time.time() - t0
        for _ in range(3):
            bstate = step(bstate)
        _ = float(jnp.max(bstate.overflow))
        t0 = time.time()
        for _ in range(args.steps):
            bstate = step(bstate)
        _ = float(jnp.max(bstate.overflow))
        dt = (time.time() - t0) / args.steps
        veh = int(jnp.sum(bstate.n_l if axis == -1 else bstate.n_l))
        return compile_s, dt * 1000, veh

    if args.mode in ("lead", "both"):
        c, ms, veh = bench(0)
        print(f"LEAD  batch={B}: compile={c:.1f}s  {ms:.2f} ms/step  "
              f"veh_total={veh}", flush=True)
    if args.mode in ("trail", "both"):
        c, ms, veh = bench(-1)
        print(f"TRAIL batch={B}: compile={c:.1f}s  {ms:.2f} ms/step  "
              f"veh_total={veh}", flush=True)


if __name__ == "__main__":
    main()
