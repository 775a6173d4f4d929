"""On-device DQN signal-control learner on the gen-2 RING layout.

Same learner as rl/dqn.py (parameter-tied per-intersection Q-MLP,
Double-DQN TD(0), one jitted call per iteration) but the env inside the
training step is the ring `ring_step` and the observations come from the
ring kernels (`core/ring_observe.phase_features`) — so BASELINE config
#5's learner runs at ring speed, not gen-1 speed (VERDICT r03 weak 6).

Actions are (B, G) phase indices over the RING's real intersections
(ring order, real intersections lead — core/ring_observe
max_pressure_phases_ring); the state's phase vector is (I,) with the
trailing virtual intersections pinned to phase 0.

Two build paths:
  make_ring_dqn_train_step  — the whole iteration (obs + eps-greedy +
      sim_steps_per_action ring steps + TD update) as ONE jitted program;
      right for nets whose monolithic ring step compiles (<= 16k links).
  make_ring_dqn_split_step  — the 30x30-class variant: the monolithic
      step exceeds practical XLA compile budgets there (bench.py splits
      the env step into p1/p2 for the same reason), and the env is not
      differentiated, so the iteration decomposes into three jitted
      programs (act / env p1+p2 x sim_steps / TD update) with identical
      learner math.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cityflow_tpu.core import ring_observe
from cityflow_tpu.core.ring import (
    ring_step, ring_step_p1_batched, ring_step_p2_batched)
from cityflow_tpu.rl.dqn import QParams, init_params, q_values


def build_ring_intersection_obs(cfg, max_phases: int):
    """obs_fn(tables, rs) -> ((G, 3P) features, (G,) upstream waiting)."""
    def obs_fn(tables, rs):
        fw, fp, w_up = ring_observe.phase_features(tables, cfg, rs,
                                                   max_phases)
        phase_1h = jax.nn.one_hot(rs.phase[:cfg.G], max_phases)
        return jnp.concatenate([fw / 10.0, fp / 10.0, phase_1h],
                               axis=-1), w_up
    return obs_fn, 3 * max_phases


def _masked_q(p, obs, n_ph):
    """Q-values with per-intersection invalid-phase actions masked."""
    q = q_values(p, obs)                                     # (G, A)
    a_ids = jnp.arange(q.shape[-1])
    mask = a_ids[None, :] < jnp.maximum(n_ph, 1)[:, None]
    return jnp.where(mask, q, -jnp.inf)


def _td_loss(p, target, obs, actions, rewards, obs_next, n_ph, gamma):
    """Double-DQN huber TD(0) over a (B, G, obs) batch."""
    q = q_values(p, obs)                                     # (B, G, A)
    qa = jnp.take_along_axis(q, actions[..., None], axis=-1)[..., 0]
    a_next = jnp.argmax(
        jax.vmap(lambda o: _masked_q(p, o, n_ph))(obs_next), axis=-1)
    q_next_t = jax.vmap(lambda o: q_values(target, o))(obs_next)
    q_next = jax.lax.stop_gradient(jnp.take_along_axis(
        q_next_t, a_next[..., None], axis=-1)[..., 0])
    target_v = rewards + gamma * q_next
    return jnp.mean(optax.huber_loss(qa, target_v))


def _eps_greedy(tables_a, params, obs, key, eps):
    """(B, G) eps-greedy actions from masked Q-values."""
    n_ph = tables_a["g_n_phases"]
    qv = jax.vmap(lambda o: _masked_q(params, o, n_ph))(obs)
    key, k1 = jax.random.split(key)
    greedy = jnp.argmax(qv, axis=-1)
    rand = jax.random.randint(k1, greedy.shape, 0, 1 << 30) \
        % jnp.maximum(n_ph, 1)[None, :]
    key, k2 = jax.random.split(key)
    explore = jax.random.uniform(k2, greedy.shape) < eps
    return jnp.where(explore, rand, greedy).astype(jnp.int32), key


def make_ring_dqn_train_step(tables, cfg, max_phases: int,
                             hidden: int = 64, lr: float = 1e-3,
                             gamma: float = 0.9,
                             sim_steps_per_action: int = 5):
    """Returns (init_fn, train_step) mirroring dqn.make_dqn_train_step:
    train_step: (tables, params, target, opt_state, state_B, q, key, eps)
      -> (params, opt_state, state_B, key, metrics).
    `q` is the ring spawn-queue dict (ring_sim.RingSim.q); tables/q ride
    as jit ARGUMENTS (closure constants are re-staged per dispatch by the
    axon runtime)."""
    obs_fn, obs_dim = build_ring_intersection_obs(cfg, max_phases)
    tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adam(lr))
    G, I = cfg.G, cfg.I

    def env_rollforward(tables_a, st, actions, q):
        phases = jnp.concatenate(
            [actions, jnp.zeros(I - G, jnp.int32)]).astype(jnp.int32)
        st = st.replace_fields(phase=phases)
        for _ in range(sim_steps_per_action):
            st = ring_step.__wrapped__(tables_a, cfg, st, q)
        return st

    def train_step(tables_a, params, target, opt_state, state, q, key,
                   eps):
        obs, _ = jax.vmap(obs_fn, in_axes=(None, 0))(tables_a, state)
        actions, key = _eps_greedy(tables_a, params, obs, key, eps)

        new_state = jax.vmap(env_rollforward, in_axes=(None, 0, 0, None))(
            tables_a, state, actions, q)
        obs_next, w_up_next = jax.vmap(obs_fn, in_axes=(None, 0))(
            tables_a, new_state)
        rewards = -w_up_next / 10.0                          # (B, G)

        loss, grads = jax.value_and_grad(_td_loss)(
            params, target, obs, actions, rewards, obs_next,
            tables_a["g_n_phases"], gamma)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = dict(loss=loss, mean_reward=jnp.mean(rewards))
        return params, opt_state, new_state, key, metrics

    def init_fn(key, max_actions: int):
        p = init_params(key, obs_dim, hidden, max_actions)
        return p, tx.init(p)

    return init_fn, train_step


def make_ring_dqn_split_step(tables, cfg, max_phases: int,
                             hidden: int = 64, lr: float = 1e-3,
                             gamma: float = 0.9,
                             sim_steps_per_action: int = 5):
    """Split-compilation variant (30x30-class nets, > 16k links): same
    learner math as make_ring_dqn_train_step, but the iteration runs as
    three jitted programs — act (obs + eps-greedy + phase write), the
    already-split batched env steps (ring_step_p1/p2_batched, donated
    state), and the TD update — so no single XLA program contains the
    whole net.

    Returns (init_fn, train_iter) where train_iter has the SAME signature
    and return as train_step above; it is a host-side composition, so do
    NOT wrap it in jax.jit (its pieces already are)."""
    obs_fn, obs_dim = build_ring_intersection_obs(cfg, max_phases)
    tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adam(lr))
    G, I = cfg.G, cfg.I

    # the split path runs on the TRAILING-batch env state (core/ring.py
    # batch_ring_state); learner tensors (obs/actions/Q) stay
    # leading-batch for the dense layers — the obs vmap is the pivot
    @jax.jit
    def act_program(tables_a, params, state, key, eps):
        obs, _ = jax.vmap(obs_fn, in_axes=(None, -1),
                          out_axes=0)(tables_a, state)
        actions, key = _eps_greedy(tables_a, params, obs, key, eps)
        B = actions.shape[0]
        phases = jnp.concatenate(
            [actions, jnp.zeros((B, I - G), jnp.int32)], axis=1)
        state = state.replace_fields(phase=phases.T)      # (I, B)
        return obs, actions, key, state

    @jax.jit
    def update_program(tables_a, params, target, opt_state, obs, actions,
                       new_state):
        obs_next, w_up_next = jax.vmap(obs_fn, in_axes=(None, -1),
                                       out_axes=0)(tables_a, new_state)
        rewards = -w_up_next / 10.0                          # (B, G)
        loss, grads = jax.value_and_grad(_td_loss)(
            params, target, obs, actions, rewards, obs_next,
            tables_a["g_n_phases"], gamma)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = dict(loss=loss, mean_reward=jnp.mean(rewards))
        return params, opt_state, metrics

    def train_iter(tables_a, params, target, opt_state, state, q, key,
                   eps):
        obs, actions, key, state = act_program(tables_a, params, state,
                                               key, eps)
        for _ in range(sim_steps_per_action):
            state, mid = ring_step_p1_batched(tables_a, cfg, state, q)
            state = ring_step_p2_batched(tables_a, cfg, state, mid)
        params, opt_state, metrics = update_program(
            tables_a, params, target, opt_state, obs, actions, state)
        return params, opt_state, state, key, metrics

    def init_fn(key, max_actions: int):
        p = init_params(key, obs_dim, hidden, max_actions)
        return p, tx.init(p)

    return init_fn, train_iter
