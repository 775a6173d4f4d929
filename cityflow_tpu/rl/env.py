"""Vectorized signal-control RL environment.

The reference is used through per-call getters + set_tl_phase from Python
RL loops (SURVEY.md 3.3). Here the whole env batch lives on device: one
jitted call steps B envs, applies per-env phase actions, and returns the
observation bundle — no host Python in the inner loop. Shards over a
`jax.sharding.Mesh` for multi-chip / multi-host scale-out.
"""

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from cityflow_tpu.compiler.net import compile_scenario
from cityflow_tpu.compiler.spawn import SpawnGenerator
from cityflow_tpu.core.state import StepConfig, init_state
from cityflow_tpu.core import step as step_mod
from cityflow_tpu.core import observe
from cityflow_tpu.engine import _net_device_arrays, _enable_compilation_cache
from cityflow_tpu.parallel.batch import init_batch_state


class CityFlowVecEnv:
    """Gym-style vectorized env: actions = (B, I) phase indices,
    observations = dict of (B, ...) arrays, reward = negative waiting."""

    def __init__(self, config_path: str, batch: int = 64,
                 max_vehicles: int = 4096, horizon: int = 4096,
                 mesh: Optional["jax.sharding.Mesh"] = None,
                 action_interval: int = 1):
        _enable_compilation_cache()
        self.net = compile_scenario(config_path)
        cfgj = self.net.host.config
        self.interval = float(cfgj["interval"])
        self.batch = batch
        self.action_interval = action_interval

        gen = SpawnGenerator(self.net, int(cfgj["seed"]), self.interval)
        gen.extend(horizon)
        t = gen.arrays()
        pad = max(gen.max_per_step, 1)
        self._spawn = {k: jnp.asarray(np.concatenate(
            [t[k], np.full(pad, -1 if k == "step" else 0, t[k].dtype)]))
            for k in ("step", "flow", "priority", "first_drv", "route")}

        L = self.net.num_lanes
        ll_len = self.net.drv_len[L:] if self.net.num_links else np.zeros(1)
        k_link = int(min(16, np.ceil(ll_len.max() / 7.0) + 2)) \
            if self.net.num_links else 4
        self.cfg = StepConfig(
            interval=self.interval, num_lanes=L,
            num_drivables=L + self.net.num_links,
            max_vehicles=max_vehicles, max_spawn_per_step=gen.max_per_step,
            k_link=k_link, k_out=max(self.net.host.ko, 1),
            k_cross=max(self.net.host.kc, 1),
            rl_traffic_light=True, exact=False)
        self._net_dev = _net_device_arrays(self.net, np.float32)
        self._st0 = init_state(self.cfg, self.net.num_inters,
                               self.net.phase_time, self.net.n_phases,
                               self.net.phase_offset)
        self.num_intersections = self.net.num_inters
        self.num_phases = self.net.n_phases  # (I,) per intersection
        self.state = None

        cfg = self.cfg
        n_sub = self.action_interval

        # net/spawn tables ride as jit ARGUMENTS (stay device-resident);
        # closing over them would embed them as constants in the HLO, which
        # the axon runtime re-stages on every dispatch (~150 ms/step).
        def one(net_dev, spawn, st, phases):
            st = st.replace_fields(phase=phases)
            for _ in range(n_sub):
                st = step_mod.step.__wrapped__(net_dev, cfg, st, spawn)
            obs = observe.observations(net_dev, cfg, st)
            reward = -jnp.sum(obs["lane_waiting"].astype(jnp.float32))
            return st, (obs, reward)

        batched = jax.vmap(one, in_axes=(None, None, 0, 0))
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            shard = NamedSharding(mesh, P(mesh.axis_names[0]))
            self._step = jax.jit(batched,
                                 in_shardings=(None, None, shard, shard),
                                 out_shardings=(shard, (shard, shard)))
            self._shard = shard
        else:
            self._step = jax.jit(batched)
            self._shard = None

    def reset(self):
        self.state = init_batch_state(self.cfg, self._st0, self.batch)
        if self._shard is not None:
            self.state = jax.device_put(self.state, self._shard)
        obs = jax.vmap(
            lambda s: observe.observations(self._net_dev, self.cfg, s)
        )(self.state)
        return obs

    def step(self, phases):
        """phases: (B, I) int32 -> (obs dict, reward (B,), state)."""
        self.state, (obs, reward) = self._step(
            self._net_dev, self._spawn, self.state, phases)
        return obs, reward

    def max_pressure_actions(self):
        """On-device MaxPressure controller actions for the current state."""
        from cityflow_tpu.rl.policies import max_pressure_phases
        mp = int(self.net.n_phases.max()) if self.net.n_phases.size else 1
        return jax.jit(jax.vmap(
            max_pressure_phases, in_axes=(None, None, 0, None),
            ), static_argnums=(1, 3))(self._net_dev, self.cfg, self.state, mp)


class RingVecEnv:
    """Vectorized env on the gen-2 ring layout (core/ring.py): the same
    action/observation contract as CityFlowVecEnv but 15-18x faster on
    grid nets. Actions are (B, I) phase indices in ORIGINAL intersection
    order; lane-indexed observations come back in original lane order.
    Scope follows the ring layout (grid-like nets; lane change and mixed
    vehicle templates both supported, see compiler/ring_net.py)."""

    def __init__(self, config_path: str, batch: int = 64,
                 horizon: int = 4096, lane_slots=None,
                 mesh: Optional["jax.sharding.Mesh"] = None):
        import dataclasses
        from cityflow_tpu import ring_sim
        from cityflow_tpu.core.ring import ring_step
        from cityflow_tpu.core import ring_observe

        _enable_compilation_cache()
        self.net = compile_scenario(config_path)
        sim = ring_sim.build_sim(self.net, horizon=horizon, sl=lane_slots)
        sim.cfg = dataclasses.replace(sim.cfg, rl_traffic_light=True)
        self.sim = sim
        self.batch = batch
        self.num_intersections = self.net.num_inters
        self.num_phases = self.net.n_phases
        mp = int(self.net.n_phases.max()) if self.net.n_phases.size else 1
        self._max_phases = mp
        # original intersection order -> ring order
        import numpy as _np
        inv = _np.zeros(sim.meta.I, _np.int32)
        inv[sim.meta.new2old_inter] = _np.arange(sim.meta.I)
        self._i_orig2ring = jnp.asarray(inv)          # ring pos of orig i
        self._i_ring2orig = jnp.asarray(
            sim.meta.new2old_inter.astype(_np.int32))
        cfg = sim.cfg
        i_ring2orig, i_orig2ring = self._i_ring2orig, self._i_orig2ring

        # tables/q ride as jit ARGUMENTS, not closure constants (constants
        # are re-staged per dispatch by the axon runtime: ~400x slower).
        def one(tables, q, st, phases_orig):
            ring_phase = jnp.take(phases_orig, i_ring2orig)
            st = st.replace_fields(phase=ring_phase.astype(jnp.int32))
            st = ring_step.__wrapped__(tables, cfg, st, q)
            obs = ring_observe.observations_ring(tables, cfg, st)
            perm = tables["lane_perm"]
            obs["lane_count"] = jnp.take(obs["lane_count"], perm)
            obs["lane_waiting"] = jnp.take(obs["lane_waiting"], perm)
            reward = -jnp.sum(obs["lane_waiting"].astype(jnp.float32))
            return st, (obs, reward)

        batched = jax.vmap(one, in_axes=(None, None, 0, 0))
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            shard = NamedSharding(mesh, P(mesh.axis_names[0]))
            self._step = jax.jit(batched,
                                 in_shardings=(None, None, shard, shard),
                                 out_shardings=(shard, (shard, shard)))
            self._shard = shard
        else:
            self._step = jax.jit(batched)
            self._shard = None

        def mp_actions(tables, st):
            ring = ring_observe.max_pressure_phases_ring(tables, cfg, st, mp)
            return jnp.take(ring, i_orig2ring)
        self._mp = jax.jit(jax.vmap(mp_actions, in_axes=(None, 0)))

    def reset(self):
        st0 = self.sim.state
        self.state = jax.tree_util.tree_map(
            lambda x: jnp.zeros((self.batch,) + x.shape, x.dtype) + x[None]
            if hasattr(x, "shape") else x, st0)
        if self._shard is not None:
            self.state = jax.device_put(self.state, self._shard)
        return None

    def step(self, phases):
        self.state, (obs, reward) = self._step(
            self.sim.tables, self.sim.q, self.state, phases)
        return obs, reward

    def max_pressure_actions(self):
        return self._mp(self.sim.tables, self.state)
