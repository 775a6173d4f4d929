"""On-device DQN signal-control learner.

The whole training loop — env batch stepping, per-intersection Q-network, epsilon-
greedy actions, TD(0) updates — runs as ONE jitted function per iteration;
under a sharded mesh the env batch splits across devices and the gradient
reduction is the only cross-device collective (psum inserted by XLA from the
sharded-batch mean), matching the scaling recipe in BASELINE.md.

Network: a small MLP over per-intersection local observations
(incoming/outgoing lane waiting + counts + one-hot current phase), shared
across intersections (parameter tying, the standard PressLight/MPLight
setup). Pure jax (no flax dependency) so it composes with shard_map freely.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cityflow_tpu.core import observe
from cityflow_tpu.core import step as step_mod


class QParams(NamedTuple):
    w1: jnp.ndarray
    b1: jnp.ndarray
    w2: jnp.ndarray
    b2: jnp.ndarray


def init_params(key, obs_dim: int, hidden: int, n_actions: int) -> QParams:
    k1, k2 = jax.random.split(key)
    s1 = 1.0 / np.sqrt(obs_dim)
    s2 = 1.0 / np.sqrt(hidden)
    return QParams(
        w1=jax.random.uniform(k1, (obs_dim, hidden), jnp.float32, -s1, s1),
        b1=jnp.zeros(hidden, jnp.float32),
        w2=jax.random.uniform(k2, (hidden, n_actions), jnp.float32, -s2, s2),
        b2=jnp.zeros(n_actions, jnp.float32))


def q_values(p: QParams, obs):
    h = jax.nn.relu(obs @ p.w1 + p.b1)
    return h @ p.w2 + p.b2


def build_intersection_obs(net_dev, cfg, max_phases: int):
    """Per-intersection observation builder: for every phase p — total
    waiting on the phase's enabled upstream lanes and the phase's pressure
    (upstream minus downstream waiting) — plus the current-phase one-hot.

    Per-PHASE features are what make a useful greedy policy representable:
    a linear Q over them recovers MaxPressure. (An aggregate per-inter
    scalar can't tell which phase serves the queue — the round-2 learner's
    core defect.) Returns (obs_fn, obs_dim)."""
    I = net_dev["phase_offset"].shape[0]

    # net tables arrive as an ARGUMENT (closure constants get re-staged per
    # dispatch by the axon runtime — see docs/design.md).
    def obs_fn(net_a, st):
        w = observe.lane_waiting_vehicle_count(cfg, st).astype(jnp.float32)
        win = w[net_a["ll_start"]]                           # (LL,)
        press = win - w[net_a["ll_end"]]
        inter = net_a["ll_inter"]
        n_ph = net_a["n_phases"][inter]
        MRL = net_a["phase_rl_avail"].shape[1]
        base = net_a["phase_offset"][inter]
        flat_avail = net_a["phase_rl_avail"].reshape(-1)
        fw = jnp.zeros((I, max_phases), jnp.float32)
        fp = jnp.zeros((I, max_phases), jnp.float32)
        for p in range(max_phases):
            ok = p < n_ph
            avail = jnp.take(
                flat_avail,
                jnp.clip((base + p) * MRL + net_a["ll_rl_local"],
                         0, flat_avail.shape[0] - 1))
            m = ok & avail
            fw = fw.at[inter, p].add(jnp.where(m, win, 0.0))
            fp = fp.at[inter, p].add(jnp.where(m, press, 0.0))
        phase_1h = jax.nn.one_hot(st.phase, max_phases)
        return jnp.concatenate([fw / 10.0, fp / 10.0, phase_1h], axis=-1)

    return obs_fn, 3 * max_phases


def make_dqn_train_step(net_dev, cfg, max_phases: int, hidden: int = 64,
                        lr: float = 1e-3, gamma: float = 0.9,
                        sim_steps_per_action: int = 5):
    """Returns (init_fn, train_step) where train_step advances every env by
    one action interval and applies one Double-DQN TD(0) update (Adam +
    global-norm clip + Huber) to the shared Q-MLP against a TARGET network
    (bootstrap targets stay fixed between syncs — without it the loss
    tracks the growing vehicle count instead of converging).
    init_fn: key -> (params, opt_state)
    train_step: (net_a, params, target, opt_state, state_B, spawn_tbl,
                 key, eps) -> (params, opt_state, state_B, key, metrics);
    the caller syncs target <- params every K iterations."""
    obs_fn, obs_dim = build_intersection_obs(net_dev, cfg, max_phases)
    n_phases = net_dev["n_phases"]
    tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adam(lr))

    def masked_q(p, obs):
        q = q_values(p, obs)                                 # (I, A)
        a_ids = jnp.arange(q.shape[-1])
        mask = a_ids[None, :] < jnp.maximum(n_phases, 1)[:, None]
        return jnp.where(mask, q, -jnp.inf)

    def env_rollforward(net_a, st, phases, spawn_tbl):
        st = st.replace_fields(phase=phases)
        for _ in range(sim_steps_per_action):
            st = step_mod.step.__wrapped__(net_a, cfg, st, spawn_tbl)
        return st

    def td_loss(p, target, obs, actions, rewards, obs_next):
        q = q_values(p, obs)                                 # (B, I, A)
        qa = jnp.take_along_axis(q, actions[..., None], axis=-1)[..., 0]
        # Double DQN: online net picks the next action, target net rates it
        a_next = jnp.argmax(jax.vmap(lambda o: masked_q(p, o))(obs_next),
                            axis=-1)
        q_next_t = jax.vmap(lambda o: q_values(target, o))(obs_next)
        q_next = jax.lax.stop_gradient(jnp.take_along_axis(
            q_next_t, a_next[..., None], axis=-1)[..., 0])
        target_v = rewards + gamma * q_next
        return jnp.mean(optax.huber_loss(qa, target_v))

    def train_step(net_a, params, target, opt_state, state, spawn_tbl,
                   key, eps):
        obs = jax.vmap(obs_fn, in_axes=(None, 0))(net_a, state)  # (B, I, F)
        q = jax.vmap(lambda o: masked_q(params, o))(obs)
        key, k1 = jax.random.split(key)
        greedy = jnp.argmax(q, axis=-1)
        rand = jax.random.randint(k1, greedy.shape, 0, 1 << 30) \
            % jnp.maximum(n_phases, 1)[None, :]
        key, k2 = jax.random.split(key)
        explore = jax.random.uniform(k2, greedy.shape) < eps
        actions = jnp.where(explore, rand, greedy).astype(jnp.int32)

        new_state = jax.vmap(env_rollforward, in_axes=(None, 0, 0, None))(
            net_a, state, actions, spawn_tbl)
        obs_next = jax.vmap(obs_fn, in_axes=(None, 0))(net_a, new_state)
        w_next = jax.vmap(lambda s: observe.lane_waiting_vehicle_count(
            cfg, s).astype(jnp.float32))(new_state)
        # reward: negative intersection pressure proxy (waiting upstream)
        I = net_a["phase_offset"].shape[0]
        inter = net_a["ll_inter"]
        rewards = -jax.vmap(
            lambda w: jnp.zeros(I, jnp.float32).at[inter].add(
                w[net_a["ll_start"]]))(w_next) / 10.0

        loss, grads = jax.value_and_grad(td_loss)(
            params, target, obs, actions, rewards, obs_next)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = dict(loss=loss, mean_reward=jnp.mean(rewards))
        return params, opt_state, new_state, key, metrics

    def init_fn(key):
        p = init_params(key, obs_dim, hidden,
                        int(jnp.max(jnp.maximum(n_phases, 1))))
        return p, tx.init(p)

    return init_fn, train_step


def train(config_path: str, batch: int = 16, iters: int = 20,
          max_vehicles: int = 2048, mesh=None, seed: int = 0):
    """Convenience driver: returns the metric history (loss, mean reward)."""
    from cityflow_tpu.compiler.net import compile_scenario
    from cityflow_tpu.compiler.spawn import SpawnGenerator
    from cityflow_tpu.core.state import StepConfig, init_state
    from cityflow_tpu.engine import _net_device_arrays, _enable_compilation_cache
    from cityflow_tpu.parallel.batch import init_batch_state

    _enable_compilation_cache()
    net = compile_scenario(config_path)
    cfgj = net.host.config
    gen = SpawnGenerator(net, int(cfgj["seed"]), float(cfgj["interval"]))
    gen.extend(iters * 8 + 16)
    t = gen.arrays()
    pad = max(gen.max_per_step, 1)
    spawn = {k: jnp.asarray(np.concatenate(
        [t[k], np.full(pad, -1 if k == "step" else 0, t[k].dtype)]))
        for k in ("step", "flow", "priority", "first_drv", "route")}
    cfg = StepConfig(
        interval=float(cfgj["interval"]), num_lanes=net.num_lanes,
        num_drivables=net.num_lanes + net.num_links,
        max_vehicles=max_vehicles, max_spawn_per_step=gen.max_per_step,
        k_out=max(net.host.ko, 1), k_cross=max(net.host.kc, 1),
        rl_traffic_light=True, exact=False)
    net_dev = _net_device_arrays(net, np.float32)
    max_phases = int(net.n_phases.max()) if net.n_phases.size else 1

    init_fn, train_step = make_dqn_train_step(net_dev, cfg, max_phases)
    key = jax.random.PRNGKey(seed)
    params, opt_state = init_fn(key)
    target = params
    st0 = init_state(cfg, net.num_inters, net.phase_time, net.n_phases,
                     net.phase_offset)
    state = init_batch_state(cfg, st0, batch)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        shard = NamedSharding(mesh, P(mesh.axis_names[0]))
        repl = NamedSharding(mesh, P())
        state = jax.device_put(state, shard)
        params = jax.device_put(params, repl)
        target = jax.device_put(target, repl)
        opt_state = jax.device_put(opt_state, repl)
        step_fn = jax.jit(
            train_step,
            in_shardings=(None, repl, repl, repl, shard, repl, repl, None),
            out_shardings=(repl, repl, shard, repl, repl))
    else:
        step_fn = jax.jit(train_step)

    history = []
    eps = 0.5
    target_sync = 10
    for i in range(iters):
        if i % target_sync == 0:
            target = params
        params, opt_state, state, key, m = step_fn(
            net_dev, params, target, opt_state, state, spawn, key,
            max(eps * (0.95 ** i), 0.05))
        history.append({k: float(v) for k, v in m.items()})
    return history
