#!/usr/bin/env python3
"""Sharded-step scaling study + DQN learning trend.

Runs the sharded train step (MaxPressure or DQN observation/step pipeline)
on n = 1, 2, 4, 8 mesh devices with a FIXED per-device env batch (weak
scaling) and records aggregate env-steps/s. On the virtual CPU mesh
(--xla_force_host_platform_device_count=8) the devices share host cores,
so the table measures *sharding overhead*, not speedup — on a real
multi-chip slice the same code path shards over ICI. Also trains the DQN
controller and records the reward trend vs the fixed-time baseline
(VERDICT r1 item 6).

Writes the JSON report to --out (default: scaling_study.json).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="tests/fixtures/config_4x4.json")
    ap.add_argument("--per-device", type=int, default=8)
    ap.add_argument("--steps", type=int, default=24)
    ap.add_argument("--dqn-iters", type=int, default=192,
                    help="training iterations THIS invocation")
    ap.add_argument("--dqn-total", type=int, default=None,
                    help="planned total iterations (epsilon schedule); "
                         "defaults to --dqn-iters")
    ap.add_argument("--dqn-state", default=None,
                    help="npz checkpoint: resume if it exists, save on exit "
                         "(chunked CPU training under the 10-min call cap)")
    ap.add_argument("--phase", choices=["all", "scaling", "dqn-train",
                                        "dqn-eval"], default="all")
    ap.add_argument("--eval-part", choices=["all", "trend", "final"],
                    default="all",
                    help="split the eval phase across two invocations "
                         "(snapshot trend vs final-vs-fixed-time rollouts)")
    ap.add_argument("--out", default="scaling_study.json")
    ap.add_argument("--cpu-mesh", action="store_true", default=None)
    args = ap.parse_args()

    if args.cpu_mesh or args.cpu_mesh is None:
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8").strip()
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from cityflow_tpu.engine import _enable_compilation_cache
    _enable_compilation_cache()   # CPU compiles take minutes; reruns must hit
    from cityflow_tpu.compiler.net import compile_scenario
    from cityflow_tpu.compiler.spawn import SpawnGenerator
    from cityflow_tpu.core.state import StepConfig, init_state
    from cityflow_tpu.engine import _net_device_arrays
    from cityflow_tpu.parallel.batch import init_batch_state
    from cityflow_tpu.core import step as step_mod
    from cityflow_tpu.core import observe
    from cityflow_tpu.rl.policies import max_pressure_phases

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg_path = os.path.join(here, args.config) \
        if not os.path.isabs(args.config) else args.config
    net = compile_scenario(cfg_path)
    cfgj = net.host.config
    interval = float(cfgj["interval"])
    gen = SpawnGenerator(net, int(cfgj["seed"]), interval)
    horizon = max(args.steps * 4 + 64, 640)   # evals roll out to 600 steps
    gen.extend(horizon)
    t = gen.arrays()
    pad = max(gen.max_per_step, 1)
    spawn_dev = {k: jnp.asarray(np.concatenate(
        [t[k], np.full(pad, -1 if k == "step" else 0, t[k].dtype)]))
        for k in ("step", "flow", "priority", "first_drv", "route")}
    cfg = StepConfig(
        interval=interval, num_lanes=net.num_lanes,
        num_drivables=net.num_lanes + net.num_links,
        max_vehicles=1024, max_spawn_per_step=gen.max_per_step,
        k_out=max(net.host.ko, 1), k_cross=max(net.host.kc, 1),
        rl_traffic_light=True, exact=False)
    net_dev = _net_device_arrays(net, np.float32)
    st0 = init_state(cfg, net.num_inters, net.phase_time, net.n_phases,
                     net.phase_offset)
    max_phases = int(net.n_phases.max()) if net.n_phases.size else 1

    def train_env(st, spawn_tbl):
        phases = max_pressure_phases(net_dev, cfg, st, max_phases)
        st = st.replace_fields(phase=phases)
        st = step_mod.step.__wrapped__(net_dev, cfg, st, spawn_tbl)
        obs = observe.observations(net_dev, cfg, st)
        return st, -jnp.sum(obs["lane_waiting"].astype(jnp.float32))

    rows = []
    for n_dev in ((1, 2, 4, 8) if args.phase in ("all", "scaling") else ()):
        if n_dev > len(jax.devices()):
            break
        B = args.per_device * n_dev
        mesh = Mesh(np.array(jax.devices()[:n_dev]), axis_names=("env",))
        shard = NamedSharding(mesh, P("env"))
        repl = NamedSharding(mesh, P())
        state = jax.device_put(init_batch_state(cfg, st0, B), shard)
        sp = jax.device_put(spawn_dev, repl)
        step_b = jax.jit(
            jax.vmap(train_env, in_axes=(0, None)),
            in_shardings=(shard, repl), out_shardings=(shard, repl))
        state, _ = step_b(state, sp)
        state = jax.block_until_ready(state)
        t0 = time.time()
        for _ in range(args.steps):
            state, rew = step_b(state, sp)
        state = jax.block_until_ready(state)
        dt = time.time() - t0
        rate = B * args.steps / dt
        rows.append(dict(devices=n_dev, batch=B,
                         env_steps_per_s=round(rate, 1)))
        print(f"n={n_dev} B={B}: {rate:.1f} env-steps/s", flush=True)
    if rows:
        base = rows[0]["env_steps_per_s"] / rows[0]["devices"]
        for r in rows:
            r["efficiency_vs_1dev"] = round(
                r["env_steps_per_s"] / (base * r["devices"]), 3)
    if args.phase == "scaling":
        _merge_out(args.out, args, rows, None)
        print(json.dumps(dict(weak_scaling=rows)))
        return

    # ---- DQN learner vs fixed-time: same-horizon evaluation -------------
    # The raw training reward declines as the net fills (episode
    # progression), so the meaningful comparison is a rollout over the SAME
    # horizon from the same empty state: greedy DQN phases vs the tlPlan.
    from cityflow_tpu.rl import dqn as dqn_mod
    from cityflow_tpu.core import observe as obs_mod
    init_fn, train_step = dqn_mod.make_dqn_train_step(net_dev, cfg,
                                                      max_phases)
    params, opt_state = init_fn(jax.random.PRNGKey(0))
    treedef = jax.tree_util.tree_structure((params, opt_state))
    target = params
    key = jax.random.PRNGKey(0)
    losses, rewards_tr, snaps, snap_iters = [], [], [], []
    it0 = 0
    total = args.dqn_total or args.dqn_iters
    episode_len = 64                      # reset envs so the learner sees
    target_sync = 10                      # the empty->saturated transient
    ckpt_every = max(total // 6, 1)       # snapshots -> eval trend

    if args.dqn_state and os.path.exists(args.dqn_state):
        z = np.load(args.dqn_state)
        flat = [z[f"t{i}"] for i in range(int(z["n_flat"]))]
        params, opt_state = jax.tree_util.tree_unflatten(treedef, flat)
        it0 = int(z["iter"])
        losses = list(z["losses"])
        rewards_tr = list(z["rewards"])
        snap_iters = list(z["snap_iters"])
        snaps = [dqn_mod.QParams(*(z[f"s{j}_{i}"] for i in range(4)))
                 for j in range(len(snap_iters))]
        if "key" in z:
            key = jnp.asarray(z["key"])
        print(f"resumed {args.dqn_state} at iter {it0}", flush=True)

    if args.phase in ("all", "dqn-train"):
        print("training DQN...", flush=True)
        st_tr = init_batch_state(cfg, st0, 8)
        step_tr = jax.jit(train_step)
        for i in range(it0, min(it0 + args.dqn_iters, total)):
            if i % target_sync == 0:
                target = params
            if i % ckpt_every == 0:
                snaps.append(jax.device_get(params))
                snap_iters.append(i)
            if i and i % episode_len == 0:
                st_tr = init_batch_state(cfg, st0, 8)
            params, opt_state, st_tr, key, m = step_tr(
                net_dev, params, target, opt_state, st_tr, spawn_dev, key,
                max(0.5 * (0.98 ** i), 0.05))
            losses.append(float(m["loss"]))
            rewards_tr.append(float(m["mean_reward"]))
        it0 = min(it0 + args.dqn_iters, total)
        if args.dqn_state:
            flat = jax.tree_util.tree_leaves(
                jax.device_get((params, opt_state)))
            save = {f"t{i}": a for i, a in enumerate(flat)}
            save.update(n_flat=len(flat), iter=it0,
                        key=jax.device_get(key),
                        losses=np.asarray(losses),
                        rewards=np.asarray(rewards_tr),
                        snap_iters=np.asarray(snap_iters))
            for j, s in enumerate(snaps):
                for i, a in enumerate(s):
                    save[f"s{j}_{i}"] = np.asarray(a)
            np.savez(args.dqn_state, **save)
            print(f"saved {args.dqn_state} at iter {it0}", flush=True)
        if args.phase == "dqn-train":
            print(json.dumps(dict(trained_to=it0, total=total)))
            return

    snaps.append(jax.device_get(params))
    snap_iters.append(it0)

    obs_fn = dqn_mod.build_intersection_obs(net_dev, cfg, max_phases)
    if isinstance(obs_fn, tuple):
        obs_fn = obs_fn[0]
    n_phases_dev = jnp.asarray(np.asarray(net.n_phases), jnp.int32)

    cfg_ft = StepConfig(
        interval=interval, num_lanes=net.num_lanes,
        num_drivables=net.num_lanes + net.num_links,
        max_vehicles=1024, max_spawn_per_step=gen.max_per_step,
        k_out=max(net.host.ko, 1), k_cross=max(net.host.kc, 1),
        rl_traffic_light=False, exact=False)

    from functools import partial

    # jitted once each (re-creating them per eval forces a re-trace and a
    # disk cache round-trip per call); net/spawn tables ride as arguments
    @partial(jax.jit, static_argnums=(4,))
    def one_dqn(net_a, spawn_a, st, p, act):
        if act:
            obs = jax.vmap(obs_fn, in_axes=(None, 0))(net_a, st)
            q = jax.vmap(lambda o: dqn_mod.q_values(p, o))(obs)
            mask = (jnp.arange(q.shape[-1])[None, :]
                    < jnp.maximum(n_phases_dev, 1)[:, None])
            q = jnp.where(mask[None], q, -jnp.inf)
            acts = jnp.argmax(q, axis=-1).astype(jnp.int32)
            st = st.replace_fields(phase=acts)
        st2 = jax.vmap(lambda s: step_mod.step.__wrapped__(
            net_a, cfg, s, spawn_a))(st)
        w = jax.vmap(lambda s: obs_mod.lane_waiting_vehicle_count(
            cfg, s).astype(jnp.float32))(st2)
        return st2, jnp.sum(w)

    @jax.jit
    def one_ft(net_a, spawn_a, st):
        st2 = jax.vmap(lambda s: step_mod.step.__wrapped__(
            net_a, cfg_ft, s, spawn_a))(st)
        w = jax.vmap(lambda s: obs_mod.lane_waiting_vehicle_count(
            cfg_ft, s).astype(jnp.float32))(st2)
        return st2, jnp.sum(w)

    def eval_policy(p, horizon):
        use_dqn = p is not None
        cfg_e = cfg if use_dqn else cfg_ft
        st = init_batch_state(cfg_e, init_state(
            cfg_e, net.num_inters, net.phase_time, net.n_phases,
            net.phase_offset), 8)
        tot = 0.0
        for i in range(horizon):
            # hold each greedy action for the training action interval
            if use_dqn:
                st, w = one_dqn(net_dev, spawn_dev, st, p, i % 5 == 0)
            else:
                st, w = one_ft(net_dev, spawn_dev, st)
            tot += float(w)
        att = float(jnp.mean(st.cum_travel
                             / jnp.maximum(st.finished_cnt, 1)))
        return tot / horizon, att, int(jnp.sum(st.finished_cnt))

    # eval trend across training snapshots: the monotone-ish curve the
    # VERDICT asked for (waiting should fall / finished rise with training)
    trend = []
    if args.eval_part in ("all", "trend"):
        for it, sp in zip(snap_iters, snaps):
            w, att, fin = eval_policy(sp, 300)
            trend.append(dict(iter=int(it), mean_waiting=round(w, 2),
                              avg_travel_time=round(att, 2), finished=fin))
            print(f"trend iter={it}: wait={w:.1f} att={att:.1f} fin={fin}",
                  flush=True)

    evals = []
    if args.eval_part in ("all", "final"):
        final = snaps[-1]
        for H in (300, 600):
            dqn_wait, dqn_att, dqn_fin = eval_policy(final, H)
            ft_wait, ft_att, ft_fin = eval_policy(None, H)
            evals.append(dict(
                horizon=H,
                dqn=dict(mean_waiting=round(dqn_wait, 2),
                         avg_travel_time=round(dqn_att, 2),
                         finished=dqn_fin),
                fixed_time=dict(mean_waiting=round(ft_wait, 2),
                                avg_travel_time=round(ft_att, 2),
                                finished=ft_fin),
                beats=dict(waiting=bool(dqn_wait < ft_wait),
                           travel_time=bool(dqn_att < ft_att),
                           finished=bool(dqn_fin >= ft_fin))))
            print(json.dumps(evals[-1]), flush=True)

    def sub(xs, k=12):
        stride = max(1, len(xs) // k)
        return [round(x, 4) for x in xs[::stride]]

    half = len(losses) // 2
    dqn_part = dict(
        iters=it0,
        target_sync=target_sync, episode_len=episode_len,
        optimizer="adam+clip5, double-DQN, huber",
        obs="per-phase [waiting, pressure] + phase one-hot",
        loss_curve=sub(losses), reward_curve=sub(rewards_tr),
        loss_first_half_mean=round(sum(losses[:half]) / max(half, 1), 4),
        loss_second_half_mean=round(
            sum(losses[half:]) / max(len(losses) - half, 1), 4))
    if trend:
        dqn_part["eval_trend"] = trend
    if evals:
        dqn_part.update(
            evals=evals,
            # honest verdict: ALL of waiting/travel-time/finished,
            # both horizons
            beats_fixed_time=bool(all(
                e["beats"]["waiting"] and e["beats"]["travel_time"]
                and e["beats"]["finished"] for e in evals)),
            beats_on_waiting_only=bool(all(e["beats"]["waiting"]
                                           for e in evals)))

    _merge_out(args.out, args, rows, dqn_part)
    print(json.dumps(dict(weak_scaling=rows,
                          dqn=dqn_part.get("beats_fixed_time"))))


def _merge_out(out_path, args, rows, dqn_part):
    """Write/update the report, keeping whichever section the other phase
    produced earlier."""
    doc = dict(kind="scaling_study",
               config=args.config,
               mesh="virtual-cpu" if args.cpu_mesh is not False else "real",
               note=("virtual CPU devices share host cores: table measures "
                     "sharding overhead (efficiency ~1.0 / n expected on "
                     "shared cores is NOT the metric; per-device rate "
                     "stability is). Real ICI scaling uses this exact "
                     "code path."))
    old = {}
    if os.path.exists(out_path):
        try:
            with open(out_path) as f:
                old = json.load(f)
        except (OSError, ValueError):
            old = {}
    doc["weak_scaling"] = rows or old.get("weak_scaling", [])
    old_dqn = old.get("dqn") or {}
    if dqn_part and old_dqn:
        # trend and final eval parts run in separate invocations: union
        doc["dqn"] = {**old_dqn, **dqn_part}
    else:
        doc["dqn"] = dqn_part or old_dqn or None
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)


if __name__ == "__main__":
    main()
