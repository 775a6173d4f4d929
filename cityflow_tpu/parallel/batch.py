"""Batched + sharded simulation: thousands of env instances in lockstep.

The reference parallelizes ONE simulation with a pthread barrier pool
(engine.cpp:13-34; SURVEY.md 2.3). The TPU-native scaling axis is the env
batch: `vmap` the pure step over B env instances, then shard the batch axis
over a `jax.sharding.Mesh` (ICI within a slice, DCN across hosts). Static
scenario tables and the spawn table are replicated; per-env state is sharded.
No host Python in the step loop: `rollout()` lax.scans many steps on device.
"""

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cityflow_tpu.core import step as step_mod
from cityflow_tpu.core import observe
from cityflow_tpu.core.state import SimState, StepConfig


def init_batch_state(cfg: StepConfig, base_state: SimState, batch: int) -> SimState:
    """Replicate a fresh single-env state across the batch axis."""
    return jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (batch,) + x.shape), base_state)


def _step_env(net, cfg, st, spawn_tbl, phases):
    if phases is not None:
        st = st.replace_fields(phase=phases)
    return step_mod.step.__wrapped__(net, cfg, st, spawn_tbl)


def make_batched_step(net, cfg: StepConfig, with_obs: bool = True,
                      rl_actions: bool = False):
    """Returns step_b(state_B, spawn_tbl[, phases_B]) -> (state_B[, obs_B]),
    jitted, vmapped over the leading env axis."""

    # net tables enter the jit as ARGUMENTS (closure constants get re-staged
    # to the device on every dispatch by the axon runtime — ~400x slower).
    def one(net_a, st, spawn_tbl, phases):
        st = _step_env(net_a, cfg, st, spawn_tbl, phases)
        if with_obs:
            return st, observe.observations(net_a, cfg, st)
        return st, None

    in_axes = (None, 0, None, 0 if rl_actions else None)
    jitted = jax.jit(jax.vmap(one, in_axes=in_axes))

    def step_b(state, spawn_tbl, phases=None):
        return jitted(net, state, spawn_tbl, phases)

    return step_b


def batch_shardings(mesh: Mesh, axis: str = "env"):
    """(state_sharding, replicated) NamedShardings for the env batch."""
    return (NamedSharding(mesh, P(axis)), NamedSharding(mesh, P()))


def make_sharded_step(net, cfg: StepConfig, mesh: Mesh, axis: str = "env",
                      with_obs: bool = True, rl_actions: bool = False):
    """Shard the env batch over `mesh`; XLA partitions the whole step —
    every array op is batch-parallel, so no collectives appear in the step
    (the learner's gradient psum is where ICI traffic lives)."""
    shard, repl = batch_shardings(mesh, axis)

    def one(net_a, st, spawn_tbl, phases):
        st = _step_env(net_a, cfg, st, spawn_tbl, phases)
        obs = observe.observations(net_a, cfg, st) if with_obs else None
        return st, obs

    batched = jax.vmap(one, in_axes=(None, 0, None,
                                     0 if rl_actions else None))

    jitted = jax.jit(
        batched,
        in_shardings=(None, shard, repl, shard if rl_actions else None),
        out_shardings=(shard, shard if with_obs else None))

    def step_b(state, spawn_tbl, phases=None):
        return jitted(net, state, spawn_tbl, phases)

    return step_b


def make_rollout(net, cfg: StepConfig, n_steps: int):
    """rollout(state_B, spawn_tbl) -> state_B after n_steps, fully on device
    via lax.scan (the bench and training inner loop — zero host round-trips)."""

    @partial(jax.jit, donate_argnums=(1,))
    def _rollout(net_a, state, spawn_tbl):
        def body(st, _):
            st2 = jax.vmap(
                lambda s: step_mod.step.__wrapped__(net_a, cfg, s, spawn_tbl)
            )(st)
            return st2, None
        out, _ = jax.lax.scan(body, state, None, length=n_steps)
        return out

    def rollout(state, spawn_tbl):
        return _rollout(net, state, spawn_tbl)

    return rollout
