#!/usr/bin/env python3
"""Ring-layout DQN scaling study (VERDICT r03 weak 6 / r04 next-round 1).

Same shape as tools/scaling_study.py but the env inside every phase is
the gen-2 RING step (core/ring.py) and the observations are the ring
kernels (core/ring_observe.phase_features) — so BASELINE config #5's
learner runs at ring speed. Phases:

  scaling   — weak-scaling table of the ring TRAIN step (obs + eps-greedy
              + rollforward + TD update) over 1/2/4/8 mesh devices,
              fixed per-device batch; reports aggregate env-steps/s.
  dqn-train — train the ring DQN (chunkable via --dqn-state); times the
              post-compile iterations and records train env-steps/s.
  dqn-eval  — eval trend across training snapshots + final greedy policy
              vs the ring fixed-time baseline at horizons 300/600 on all
              three metrics (mean waiting, avg travel time, finished).

Nets whose monolithic ring step exceeds XLA compile budgets (> 16k
links: the 30x30 metric-of-record config) automatically use the
split-compilation learner (rl/ring_dqn.make_ring_dqn_split_step) and the
split batched env steps — same math, three jitted programs. The train
batch walks down on device OOM (halving, floor 1) like bench.py.

On the virtual CPU mesh the scaling table measures HOST-CORE CONTENTION
(all virtual devices share this host's core(s)), not sharding overhead —
see the `note` field written into the artifact. The same code path
shards over ICI on a real slice. Writes/merges the JSON report at --out.
"""

import argparse
import dataclasses
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
    ap.add_argument("--dqn-iters", type=int, default=192)
    ap.add_argument("--dqn-total", type=int, default=None)
    ap.add_argument("--dqn-state", default=None)
    ap.add_argument("--phase", choices=["all", "scaling", "dqn-train",
                                        "dqn-eval"], default="all")
    ap.add_argument("--eval-part", choices=["all", "trend", "final"],
                    default="all")
    ap.add_argument("--batch", type=int, default=8,
                    help="training env batch (walks down on OOM)")
    ap.add_argument("--eval-batch", type=int, default=8)
    ap.add_argument("--lane-slots", type=int, default=None)
    ap.add_argument("--split", action="store_true", default=None,
                    help="split-compilation learner (auto for > 16k links)")
    ap.add_argument("--no-split", dest="split", action="store_false")
    ap.add_argument("--out", default="ring_scaling_study.json")
    ap.add_argument("--cpu-mesh", action="store_true", default=None,
                    help="virtual 8-device CPU mesh (default); pass "
                         "--tpu to run single-chip on the real device")
    ap.add_argument("--tpu", dest="cpu_mesh", action="store_false")
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
    _enable_compilation_cache()
    from cityflow_tpu.compiler.net import compile_scenario
    from cityflow_tpu import ring_sim
    from cityflow_tpu.core.ring import (
        batch_ring_state, ring_step, ring_step_p1_batched,
        ring_step_p2_batched)
    from cityflow_tpu.core import ring_observe
    from cityflow_tpu.rl import ring_dqn

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg_path = os.path.join(here, args.config) \
        if not os.path.isabs(args.config) else args.config
    net = compile_scenario(cfg_path)
    split = args.split if args.split is not None else net.num_links > 16000
    horizon = max(args.steps * 4 + 64, 640)   # evals roll out to 600 steps
    sim = ring_sim.build_sim(net, horizon=horizon, sl=args.lane_slots)
    cfg = dataclasses.replace(sim.cfg, rl_traffic_light=True)
    cfg_ft = dataclasses.replace(sim.cfg, rl_traffic_light=False)
    tables, q = sim.tables, sim.q
    max_phases = int(net.n_phases.max()) if net.n_phases.size else 1
    G, I = cfg.G, cfg.I

    # split path rides the TRAILING-batch layout (core/ring.py
    # batch_ring_state: env axis minor, reshape views stay bitcasts);
    # the monolithic path keeps its own leading-batch vmaps. BA is the
    # state's batch axis for the vmapped obs/metric helpers below.
    BA = -1 if split else 0

    def batch_state(b):
        if split:
            return batch_ring_state(sim.state, b)
        return jax.tree_util.tree_map(
            lambda x: jnp.zeros((b,) + x.shape, x.dtype) + x[None]
            if hasattr(x, "shape") else x, sim.state)

    def fence(st):
        # value readback: block_until_ready is a no-op on the axon
        # tunnel (CLAUDE.md timing discipline) — only a transferred
        # value proves device execution
        float(jnp.max(st.overflow))
        return st

    make = ring_dqn.make_ring_dqn_split_step if split \
        else ring_dqn.make_ring_dqn_train_step
    init_fn, train_step = make(tables, cfg, max_phases)
    params, opt_state = init_fn(jax.random.PRNGKey(0), max_phases)
    treedef = jax.tree_util.tree_structure((params, opt_state))
    target = params
    key = jax.random.PRNGKey(0)
    print(f"net links={net.num_links} split={split}", flush=True)

    def _is_oom(e):
        return "RESOURCE_EXHAUSTED" in str(e) or "Out of memory" in str(e)

    # ---- weak scaling of the full TRAIN step ---------------------------
    rows = []
    for n_dev in ((1, 2, 4, 8) if args.phase in ("all", "scaling") else ()):
        if n_dev > len(jax.devices()):
            break
        B = args.per_device * n_dev
        mesh = Mesh(np.array(jax.devices()[:n_dev]), axis_names=("env",))
        repl = NamedSharding(mesh, P())
        st_host = batch_state(B)
        if split:
            # trailing-batch state: shard each leaf's LAST axis
            state = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, NamedSharding(
                    mesh, P(*([None] * (x.ndim - 1) + ["env"]))))
                if hasattr(x, "ndim") and x.ndim else x, st_host)
        else:
            shard = NamedSharding(mesh, P("env"))
            state = jax.device_put(st_host, shard)
        if split:
            # the split pieces are individually jitted; GSPMD propagates
            # the input shardings (state sharded on "env", params
            # replicated) and inserts the gradient all-reduce in the
            # update program's batch-mean
            step_sh = train_step
        else:
            step_sh = jax.jit(
                train_step,
                in_shardings=(None, repl, repl, repl, shard, None, repl,
                              None),
                out_shardings=(repl, repl, shard, repl, repl))
        p1, o1 = jax.device_put(params, repl), jax.device_put(
            opt_state, repl)
        t1 = jax.device_put(target, repl)
        p1, o1, state, k1, _ = step_sh(tables, p1, t1, o1, state, q,
                                       jax.device_put(key, repl), 0.3)
        fence(state)
        t0 = time.time()
        for _ in range(args.steps):
            p1, o1, state, k1, _ = step_sh(tables, p1, t1, o1, state, q,
                                           k1, 0.3)
        fence(state)
        dt = time.time() - t0
        # each train step advances every env by sim_steps_per_action=5
        rate = B * args.steps * 5 / dt
        rows.append(dict(devices=n_dev, batch=B,
                         env_steps_per_s=round(rate, 1),
                         train_iters_per_s=round(args.steps / dt, 2)))
        print(f"n={n_dev} B={B}: {rate:.1f} env-steps/s "
              f"({args.steps / dt:.2f} train-iters/s)", flush=True)
    if rows:
        base = rows[0]["env_steps_per_s"] / rows[0]["devices"]
        for r in rows:
            r["efficiency_vs_1dev"] = round(
                r["env_steps_per_s"] / (base * r["devices"]), 3)
    if args.phase == "scaling":
        _merge_out(args.out, args, rows, None)
        print(json.dumps(dict(weak_scaling=rows)))
        return

    # ---- DQN training (chunkable, OOM ladder on batch) ------------------
    from cityflow_tpu.rl.dqn import QParams, q_values
    losses, rewards_tr, snaps, snap_iters = [], [], [], []
    it0 = 0
    total = args.dqn_total or args.dqn_iters
    episode_len = 64
    target_sync = 10
    ckpt_every = max(total // 6, 1)
    train_perf = {}

    if args.dqn_state and os.path.exists(args.dqn_state):
        z = np.load(args.dqn_state)
        flat = [z[f"t{i}"] for i in range(int(z["n_flat"]))]
        params, opt_state = jax.tree_util.tree_unflatten(treedef, flat)
        it0 = int(z["iter"])
        losses = list(z["losses"])
        rewards_tr = list(z["rewards"])
        snap_iters = list(z["snap_iters"])
        snaps = [QParams(*(z[f"s{j}_{i}"] for i in range(4)))
                 for j in range(len(snap_iters))]
        if "key" in z:
            key = jnp.asarray(z["key"])
        if "batch" in z:
            args.batch = int(z["batch"])
        print(f"resumed {args.dqn_state} at iter {it0} "
              f"(batch {args.batch})", flush=True)

    if args.phase in ("all", "dqn-train"):
        print("training ring DQN...", flush=True)
        step_tr = train_step if split else jax.jit(train_step)
        if it0 == 0:
            snaps.append(jax.device_get(params))   # untrained baseline
            snap_iters.append(0)
        # OOM ladder: run the first (compile) iteration, halving the
        # batch until it fits (mirrors bench.py run_ring_ladder)
        while True:
            try:
                st_tr = batch_state(args.batch)
                t0 = time.time()
                params1, opt1, st1, key1, m1 = step_tr(
                    tables, params, target, opt_state, st_tr, q, key, 0.5)
                fence(st1)
                train_perf["compile_s"] = round(time.time() - t0, 1)
                break
            except jax.errors.JaxRuntimeError as e:
                if not _is_oom(e) or args.batch <= 1:
                    raise
                print(f"train OOM at batch={args.batch}, retrying "
                      f"batch={args.batch // 2}", file=sys.stderr,
                      flush=True)
                import gc
                gc.collect()
                args.batch //= 2
        params, opt_state, st_tr, key = params1, opt1, st1, key1
        losses.append(float(m1["loss"]))
        rewards_tr.append(float(m1["mean_reward"]))
        it_start = it0 + 1
        t_timed, n_timed = 0.0, 0
        for i in range(it_start, min(it0 + args.dqn_iters, total)):
            if i % target_sync == 0:
                target = params
            if i % ckpt_every == 0:
                snaps.append(jax.device_get(params))
                snap_iters.append(i)
            if i and i % episode_len == 0:
                st_tr = batch_state(args.batch)
            t0 = time.time()
            params, opt_state, st_tr, key, m = step_tr(
                tables, params, target, opt_state, st_tr, q, key,
                max(0.5 * (0.98 ** i), 0.05))
            # the loss readback is the timing fence: the TD update
            # consumes the post-rollforward state, so transferring the
            # loss value proves the whole iteration executed
            lf = float(m["loss"])
            t_timed += time.time() - t0
            n_timed += 1
            losses.append(lf)
            rewards_tr.append(float(m["mean_reward"]))
        it0 = min(it0 + args.dqn_iters, total)
        if n_timed:
            train_perf.update(
                batch=args.batch,
                train_iters_per_s=round(n_timed / t_timed, 3),
                env_steps_per_s=round(args.batch * n_timed * 5 / t_timed,
                                      1),
                timed_iters=n_timed,
                seconds=round(t_timed, 3),
                device=str(jax.devices()[0]).split(":")[0])
            print(f"train perf: {train_perf}", flush=True)
        if args.dqn_state:
            flat = jax.tree_util.tree_leaves(
                jax.device_get((params, opt_state)))
            save = {f"t{i}": a for i, a in enumerate(flat)}
            save.update(n_flat=len(flat), iter=it0,
                        key=jax.device_get(key), batch=args.batch,
                        losses=np.asarray(losses),
                        rewards=np.asarray(rewards_tr),
                        snap_iters=np.asarray(snap_iters))
            for j, s in enumerate(snaps):
                for i_, a in enumerate(s):
                    save[f"s{j}_{i_}"] = np.asarray(a)
            np.savez(args.dqn_state, **save)
            print(f"saved {args.dqn_state} at iter {it0}", flush=True)
        if args.phase == "dqn-train":
            dqn_part = _dqn_report(losses, rewards_tr, it0, target_sync,
                                   episode_len, train_perf, None, None)
            _merge_out(args.out, args, rows, dqn_part)
            print(json.dumps(dict(trained_to=it0, total=total,
                                  train_perf=train_perf)))
            return

    snaps.append(jax.device_get(params))
    snap_iters.append(it0)

    obs_fn, _ = ring_dqn.build_ring_intersection_obs(cfg, max_phases)
    from functools import partial

    EB = args.eval_batch

    @jax.jit
    def greedy_phase(tables_a, st, p):
        obs, _ = jax.vmap(obs_fn, in_axes=(None, BA),
                          out_axes=0)(tables_a, st)
        qv = jax.vmap(lambda o: ring_dqn._masked_q(
            p, o, tables_a["g_n_phases"]))(obs)
        acts = jnp.argmax(qv, axis=-1).astype(jnp.int32)
        phases = jnp.concatenate(
            [acts, jnp.zeros((acts.shape[0], I - G), jnp.int32)], axis=1)
        return st.replace_fields(phase=phases.T if split else phases)

    @partial(jax.jit, static_argnums=(1,))
    def waiting_sum(st, c):
        return jnp.sum(jax.vmap(
            lambda s: ring_observe.lane_waiting_ring(
                c, s).astype(jnp.float32), in_axes=BA)(st))

    if split:
        def env_step(st, c):
            st, mid = ring_step_p1_batched(tables, c, st, q)
            return ring_step_p2_batched(tables, c, st, mid)
    else:
        @partial(jax.jit, static_argnums=(1,))
        def env_step(st, c):
            return jax.vmap(lambda s: ring_step.__wrapped__(
                tables, c, s, q))(st)

    def eval_policy(p, horizon):
        use_dqn = p is not None
        c = cfg if use_dqn else cfg_ft
        st = batch_state(EB)
        tot = 0.0
        for i in range(horizon):
            if use_dqn and i % 5 == 0:
                st = greedy_phase(tables, st, p)
            st = env_step(st, c)
            tot += float(waiting_sum(st, c))
        att = float(jnp.mean(st.cum_travel
                             / jnp.maximum(st.finished_cnt, 1)))
        return tot / horizon, att, int(jnp.sum(st.finished_cnt))

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

    dqn_part = _dqn_report(losses, rewards_tr, it0, target_sync,
                           episode_len, train_perf, trend, evals)
    _merge_out(args.out, args, rows, dqn_part)
    print(json.dumps(dict(weak_scaling=rows,
                          dqn=dqn_part.get("beats_fixed_time"))))


def _dqn_report(losses, rewards_tr, it0, target_sync, episode_len,
                train_perf, trend, evals):
    def sub(xs, k=12):
        stride = max(1, len(xs) // k)
        return [round(x, 4) for x in xs[::stride]]

    half = len(losses) // 2
    dqn_part = dict(
        layout="ring",
        iters=it0,
        target_sync=target_sync, episode_len=episode_len,
        optimizer="adam+clip5, double-DQN, huber",
        obs="ring per-phase [waiting, pressure] + phase one-hot "
            "(core/ring_observe.phase_features)",
        loss_curve=sub(losses), reward_curve=sub(rewards_tr),
        loss_first_half_mean=round(sum(losses[:half]) / max(half, 1), 4),
        loss_second_half_mean=round(
            sum(losses[half:]) / max(len(losses) - half, 1), 4))
    if train_perf:
        dqn_part["train_perf"] = train_perf
    if trend:
        dqn_part["eval_trend"] = trend
    if evals:
        dqn_part.update(
            evals=evals,
            beats_fixed_time=bool(all(
                e["beats"]["waiting"] and e["beats"]["travel_time"]
                and e["beats"]["finished"] for e in evals)),
            beats_on_waiting_only=bool(all(e["beats"]["waiting"]
                                           for e in evals)))
    return dqn_part


def _merge_out(out_path, args, rows, dqn_part):
    host_cores = os.cpu_count() or 1
    virtual = args.cpu_mesh is not False
    doc = dict(kind="ring_scaling_study",
               config=args.config,
               mesh="virtual-cpu" if virtual else "real",
               host_cores=host_cores,
               note=("env inside the train step is the gen-2 ring "
                     "(core/ring.py). "
                     + (f"CAUTION: the weak-scaling table below ran on "
                        f"{host_cores} host CPU core(s) shared by ALL "
                        f"virtual devices — N devices contend for "
                        f"{host_cores} core(s), so 'efficiency' here "
                        f"measures host-core contention, NOT sharding "
                        f"overhead; it is a code-path validity check "
                        f"only. The honest multi-device evidence is the "
                        f"bitwise sharding tests (tests/test_multichip"
                        f".py). Real ICI uses the same code path."
                        if virtual else
                        "Real-device run: the table measures sharding "
                        "overhead over ICI.")))
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
        doc["dqn"] = {**old_dqn, **dqn_part}
    else:
        doc["dqn"] = dqn_part or old_dqn or None
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)


if __name__ == "__main__":
    main()
