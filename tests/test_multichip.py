"""Multi-chip sharding evidence on the virtual 8-device CPU mesh
(conftest sets --xla_force_host_platform_device_count=8).

The env-batch axis is embarrassingly parallel, so sharding must not change
results: per-env trajectories under an 8-device NamedSharding must be
BITWISE identical to the single-device run of the same batch (VERDICT r1
weak item 6a). The scaling-efficiency table lives in tools/scaling_study.py
(virtual devices share host cores, so only overhead — not speedup — is
measurable here; real-chip scaling uses the same code path)."""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

HERE = os.path.dirname(os.path.abspath(__file__))
CONFIG = os.path.join(HERE, "fixtures", "config_4x4.json")


def _build(max_vehicles=512, horizon=48):
    from cityflow_tpu.compiler.net import compile_scenario
    from cityflow_tpu.compiler.spawn import SpawnGenerator
    from cityflow_tpu.core.state import StepConfig, init_state
    from cityflow_tpu.engine import _net_device_arrays

    net = compile_scenario(CONFIG)
    cfgj = net.host.config
    interval = float(cfgj["interval"])
    gen = SpawnGenerator(net, int(cfgj["seed"]), interval)
    gen.extend(horizon)
    t = gen.arrays()
    pad = max(gen.max_per_step, 1)
    spawn_dev = {k: jnp.asarray(np.concatenate(
        [t[k], np.full(pad, -1 if k == "step" else 0, t[k].dtype)]))
        for k in ("step", "flow", "priority", "first_drv", "route")}
    cfg = StepConfig(
        interval=interval, num_lanes=net.num_lanes,
        num_drivables=net.num_lanes + net.num_links,
        max_vehicles=max_vehicles, max_spawn_per_step=gen.max_per_step,
        k_out=max(net.host.ko, 1), k_cross=max(net.host.kc, 1),
        rl_traffic_light=False, exact=False)
    net_dev = _net_device_arrays(net, np.float32)
    st0 = init_state(cfg, net.num_inters, net.phase_time, net.n_phases,
                     net.phase_offset)
    return net, net_dev, cfg, st0, spawn_dev


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_eight_devices_bitwise_equals_one():
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from cityflow_tpu.parallel.batch import init_batch_state
    from cityflow_tpu.core import step as step_mod

    net, net_dev, cfg, st0, spawn_dev = _build()
    B = 16
    state0 = init_batch_state(cfg, st0, B)

    def run(n_dev, steps=30):
        mesh = Mesh(np.array(jax.devices()[:n_dev]), axis_names=("env",))
        shard = NamedSharding(mesh, P("env"))
        repl = NamedSharding(mesh, P())
        st = jax.device_put(state0, shard)
        sp = jax.device_put(spawn_dev, repl)
        step_b = jax.jit(
            jax.vmap(lambda s, t: step_mod.step.__wrapped__(net_dev, cfg, s, t),
                     in_axes=(0, None)),
            in_shardings=(shard, repl), out_shardings=shard)
        for _ in range(steps):
            st = step_b(st, sp)
        return jax.device_get((st.dis, st.speed, st.drv, st.active))

    a = run(1)
    b = run(8)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_ring_sharded_eight_devices_bitwise_equals_one():
    """Same property for the gen-2 ring layout."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from cityflow_tpu.compiler.net import compile_scenario
    from cityflow_tpu import ring_sim
    from cityflow_tpu.core.ring import ring_step

    net = compile_scenario(CONFIG)
    sim = ring_sim.build_sim(net, horizon=48)
    B = 16
    bstate = jax.tree_util.tree_map(
        lambda x: jnp.zeros((B,) + x.shape, x.dtype) + x[None]
        if hasattr(x, "shape") else x, sim.state)

    def run(n_dev, steps=25):
        mesh = Mesh(np.array(jax.devices()[:n_dev]), axis_names=("env",))
        shard = NamedSharding(mesh, P("env"))
        st = jax.device_put(bstate, shard)
        step_b = jax.jit(
            jax.vmap(lambda s: ring_step.__wrapped__(
                sim.tables, sim.cfg, s, sim.q)),
            in_shardings=(shard,), out_shardings=shard)
        for _ in range(steps):
            st = step_b(st)
        return jax.device_get((st.l_dis, st.l_speed, st.n_l, st.n_k,
                               st.k_dis))

    a = run(1)
    b = run(8)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
