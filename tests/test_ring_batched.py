"""Trailing-batch ring wrappers (core/ring.py ring_step_*_batched):
batched-trailing state must be bitwise equal to per-env ring_step, both
for the monolithic and the split (p1/p2) programs, and under an 8-device
trailing-axis sharding. Pins the round-5 batch-axis layout change."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cityflow_tpu.compiler.net import compile_scenario
from cityflow_tpu import ring_sim
from cityflow_tpu.core.ring import (
    batch_ring_state, ring_step, ring_step_batched,
    ring_step_p1_batched, ring_step_p2_batched)

HERE = os.path.dirname(os.path.abspath(__file__))
CONFIG = os.path.join(HERE, "fixtures", "config_4x4.json")
STEPS = 40
B = 4


def _single_run(sim, steps):
    st = sim.state
    for _ in range(steps):
        st = ring_step(sim.tables, sim.cfg, st, sim.q)
    return st


def _check(bst, ref):
    for name in ("l_dis", "l_speed", "n_l", "n_k", "k_dis", "k_speed",
                 "finished_cnt", "cum_travel", "step"):
        got = getattr(bst, name)
        want = getattr(ref, name)
        for b in range(B):
            np.testing.assert_array_equal(
                np.asarray(got[..., b]), np.asarray(want),
                err_msg=f"{name} env {b}")


def test_trailing_batched_monolithic_matches_single():
    net = compile_scenario(CONFIG)
    sim = ring_sim.build_sim(net, horizon=STEPS + 8)
    ref = _single_run(sim, STEPS)
    bst = batch_ring_state(sim.state, B)
    for _ in range(STEPS):
        bst = ring_step_batched(sim.tables, sim.cfg, bst, sim.q)
    _check(bst, ref)


def test_trailing_batched_split_matches_single():
    net = compile_scenario(CONFIG)
    sim = ring_sim.build_sim(net, horizon=STEPS + 8)
    ref = _single_run(sim, STEPS)
    bst = batch_ring_state(sim.state, B)
    for _ in range(STEPS):
        bst, mid = ring_step_p1_batched(sim.tables, sim.cfg, bst, sim.q)
        bst = ring_step_p2_batched(sim.tables, sim.cfg, bst, mid)
    _check(bst, ref)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_trailing_batched_sharded_matches_single():
    """Trailing-axis env sharding over 8 devices == single device."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    net = compile_scenario(CONFIG)
    sim = ring_sim.build_sim(net, horizon=STEPS + 8)
    ref = _single_run(sim, 25)
    mesh = Mesh(np.array(jax.devices()[:8]), axis_names=("env",))
    BS = 8
    bst = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(
            mesh, P(*([None] * (x.ndim - 1) + ["env"]))))
        if hasattr(x, "ndim") and x.ndim else x,
        batch_ring_state(sim.state, BS))
    for _ in range(25):
        bst, mid = ring_step_p1_batched(sim.tables, sim.cfg, bst, sim.q)
        bst = ring_step_p2_batched(sim.tables, sim.cfg, bst, mid)
    for name in ("l_dis", "l_speed", "n_l", "k_dis"):
        got = np.asarray(jax.device_get(getattr(bst, name)))
        want = np.asarray(getattr(ref, name))
        for b in range(BS):
            np.testing.assert_array_equal(got[..., b], want,
                                          err_msg=f"{name} env {b}")
