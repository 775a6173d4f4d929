#!/usr/bin/env python3
"""Benchmark: aggregate env-steps/s of the vectorized simulator.

Runs the fast path (f32, unordered reductions) on the default jax device
(TPU when available), vmapped over a batch of env instances, stepping fully
on device via lax.scan. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the reference C++ engine measured on this host (single thread,
tools/oracle README): 4x4 grid = 182 steps/s, 30x30 = 67 steps/s. The
driver's bar is 8-thread C++; we scale the 1-thread number by 8 (optimistic
for the reference — linear scaling).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="tests/fixtures/config_4x4.json")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--warmup", type=int, default=8)
    ap.add_argument("--max-vehicles", type=int, default=4096)
    ap.add_argument("--ref-steps-per-s", type=float, default=182.0,
                    help="reference C++ 1-thread steps/s on this scenario")
    ap.add_argument("--k-scan", type=int, default=6)
    ap.add_argument("--k-hop", type=int, default=4)
    ap.add_argument("--split-phases", action="store_true", default=None,
                    help="three separately-jitted sub-programs; default: "
                         "auto (on for nets with >2000 lanelinks, where the "
                         "monolithic program schedules poorly)")
    ap.add_argument("--no-split-phases", dest="split_phases",
                    action="store_false")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from cityflow_tpu.compiler.net import compile_scenario
    from cityflow_tpu.compiler.spawn import SpawnGenerator
    from cityflow_tpu.core.state import StepConfig, init_state
    from cityflow_tpu.engine import _net_device_arrays, _enable_compilation_cache
    from cityflow_tpu.parallel.batch import init_batch_state
    import numpy as np

    _enable_compilation_cache()
    here = os.path.dirname(os.path.abspath(__file__))
    cfg_path = os.path.join(here, args.config) \
        if not os.path.isabs(args.config) else args.config
    net = compile_scenario(cfg_path)
    cfgj = net.host.config
    interval = float(cfgj["interval"])

    gen = SpawnGenerator(net, int(cfgj["seed"]), interval)
    horizon = args.warmup + args.steps + 8
    gen.extend(horizon)
    t = gen.arrays()
    pad = max(gen.max_per_step, 1)
    spawn_dev = {k: jnp.asarray(np.concatenate(
        [t[k], np.full(pad, -1 if k == "step" else 0, t[k].dtype)]))
        for k in ("step", "flow", "priority", "first_drv", "route")}

    # per-lanelink slot table sized by physical capacity (len/(minLen+minGap))
    L = net.num_lanes
    ll_len = net.drv_len[L:] if net.num_links else np.zeros(1)
    k_link = int(min(16, np.ceil(ll_len.max() / 7.0) + 2)) if net.num_links else 4
    cfg = StepConfig(
        interval=interval, num_lanes=net.num_lanes,
        num_drivables=net.num_lanes + net.num_links,
        max_vehicles=args.max_vehicles,
        max_spawn_per_step=gen.max_per_step,
        k_link=k_link, k_scan=args.k_scan, k_hop=args.k_hop,
        k_out=max(net.host.ko, 1), k_cross=max(net.host.kc, 1),
        rl_traffic_light=bool(cfgj["rlTrafficLight"]),
        exact=False)

    net_dev = _net_device_arrays(net, np.float32)
    st0 = init_state(cfg, net.num_inters, net.phase_time, net.n_phases,
                     net.phase_offset)
    state = init_batch_state(cfg, st0, args.batch)

    # dispatch-loop stepping: async dispatch per step, block once at the end
    # (measured ~8x faster than a lax.scan rollout on the axon TPU runtime)
    from cityflow_tpu.core import step as step_mod
    if args.split_phases is None:
        args.split_phases = net.num_links > 2000
    if args.split_phases:
        def one(s):
            s, arr, fa, ia = step_mod.step_part1.__wrapped__(
                net_dev, cfg, s, spawn_dev)
            buf, ov = step_mod.step_part2.__wrapped__(
                net_dev, cfg, s, arr, fa, ia)
            return step_mod.step_part3.__wrapped__(net_dev, cfg, s, arr,
                                                   buf, ov)
        p1 = jax.jit(jax.vmap(lambda s: step_mod.step_part1.__wrapped__(
            net_dev, cfg, s, spawn_dev)))
        p2a = jax.jit(jax.vmap(lambda s, arr, fa, ia:
                               step_mod.step_part2a.__wrapped__(
                                   net_dev, cfg, s, arr, fa, ia)))
        p2b = jax.jit(jax.vmap(lambda s, arr, la, vn, nf:
                               step_mod.step_part2b.__wrapped__(
                                   net_dev, cfg, s, arr, la, vn, nf)))
        p3 = jax.jit(jax.vmap(lambda s, arr, buf, ov:
                              step_mod.step_part3.__wrapped__(
                                  net_dev, cfg, s, arr, buf, ov)))

        def step_b(s):
            s, arr, fa, ia = p1(s)
            la, vn, nf = p2a(s, arr, fa, ia)
            buf, ov = p2b(s, arr, la, vn, nf)
            return p3(s, arr, buf, ov)
    else:
        step_b = jax.jit(jax.vmap(
            lambda s: step_mod.step.__wrapped__(net_dev, cfg, s, spawn_dev)))
    for _ in range(args.warmup):
        state = step_b(state)
    state = jax.block_until_ready(state)
    t0 = time.time()
    for _ in range(args.steps):
        state = step_b(state)
    state = jax.block_until_ready(state)
    dt = time.time() - t0

    ov = int(jnp.max(state.overflow))
    env_steps = args.batch * args.steps
    rate = env_steps / dt
    baseline = args.ref_steps_per_s * 8  # 8-thread reference proxy
    print(json.dumps({
        "metric": "env_steps_per_sec_4x4" if "4x4" in args.config
                  else "env_steps_per_sec",
        "value": round(rate, 1),
        "unit": "env-steps/s",
        "vs_baseline": round(rate / baseline, 2),
        "batch": args.batch, "steps": args.steps,
        "device": str(jax.devices()[0]).split(":")[0],
        "overflow_flags": ov,
        "seconds": round(dt, 3),
    }))


if __name__ == "__main__":
    main()
