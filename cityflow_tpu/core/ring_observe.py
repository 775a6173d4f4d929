"""RL observation kernels for the gen-2 ring layout.

Counts are per-slot reductions (no scatters at all — the ring IS the
per-lane segmentation); intersection-local quantities reuse the step's
type-shared one-hot operators, so a full MaxPressure controller runs
without a single dynamic gather.

Lane-indexed outputs are in RING order (lanes grouped by start
intersection); `lane_perm` maps them back to the original lane ids when
API parity is needed.
"""

import jax
import jax.numpy as jnp

from cityflow_tpu.core.ring import RingConfig, RingState, _typed_mm


def lane_counts_ring(cfg: RingConfig, rs: RingState):
    """(LNp,) i32 vehicles per lane (ring order) — it's just n_l."""
    return rs.n_l


def lane_waiting_ring(cfg: RingConfig, rs: RingState):
    """(LNp,) i32 waiting (speed < 0.1, engine.cpp:641) per lane."""
    occ = (jnp.arange(cfg.SL, dtype=jnp.int32)[:, None] < rs.n_l[None, :])
    return jnp.sum(occ & (rs.l_speed < 0.1), axis=0).astype(jnp.int32)


def to_original_lane_order(net, x_ring):
    """Permute a (LNp,)-indexed array to original lane ids (L,)."""
    return jnp.take(x_ring, net["lane_perm"], axis=-1)


def phase_pressures(net, cfg: RingConfig, rs: RingState, max_phases: int):
    """(G, P) MaxPressure per candidate phase: sum over the phase's
    available links of (start-lane waiting - end-lane waiting)."""
    G, LPI, IL, OL = cfg.G, cfg.LPI, cfg.IL, cfg.OL
    f = jnp.float32
    w = lane_waiting_ring(cfg, rs).astype(f)
    # start side: in-lane view via the step's shifted exchange
    from cityflow_tpu.core.ring import _shifted_exchange
    if cfg.fwd_shifts:
        w_in = _shifted_exchange(w[:, None], IL * G, cfg.fwd_shifts,
                                 net["fwd_gid"], net["fwd_res_j"],
                                 net["fwd_res_src"])[:, 0]
    else:
        src = net["in_src"].reshape(-1)
        w_in = jnp.where(src >= 0, jnp.take(w, jnp.clip(src, 0)), 0.0)
    w_in = w_in.reshape(IL, G)
    w_start = _typed_mm(cfg, net["E_start"], w_in)          # (LPI, G)
    w_end = _typed_mm(cfg, net["E_end"],
                      w.reshape(OL, cfg.I)[:, :G])          # (LPI, G)
    diff = w_start - w_end
    # per phase: mask links by the phase's roadlink availability
    TP = net["phase_rl_avail"].shape[0]
    out = []
    for ph in range(max_phases):
        row = jnp.clip(net["g_phase_offset"] + ph, 0, TP - 1)
        avail = jnp.take(net["phase_rl_avail"], row, axis=0)   # (G, MAXRL)
        lk_avail = _typed_mm(cfg, net["E_rl"], avail.T) > 0.5  # (LPI, G)
        valid = ph < net["g_n_phases"]
        p = jnp.sum(jnp.where(lk_avail, diff, 0.0), axis=0)
        out.append(jnp.where(valid, p, -jnp.inf))
    return jnp.stack(out, axis=-1)                             # (G, P)


def phase_features(net, cfg: RingConfig, rs: RingState, max_phases: int):
    """DQN observation kernel (ring twin of dqn.build_intersection_obs):
    returns (fw, fp, w_up) —
      fw  (G, P): total waiting on each phase's enabled upstream lanes,
      fp  (G, P): each phase's pressure (upstream minus downstream),
      w_up (G,) : total upstream waiting per intersection (reward proxy).
    Invalid phases contribute 0 (the Q mask handles action validity)."""
    G, LPI, IL, OL = cfg.G, cfg.LPI, cfg.IL, cfg.OL
    f = jnp.float32
    w = lane_waiting_ring(cfg, rs).astype(f)
    from cityflow_tpu.core.ring import _shifted_exchange
    if cfg.fwd_shifts:
        w_in = _shifted_exchange(w[:, None], IL * G, cfg.fwd_shifts,
                                 net["fwd_gid"], net["fwd_res_j"],
                                 net["fwd_res_src"])[:, 0]
    else:
        src = net["in_src"].reshape(-1)
        w_in = jnp.where(src >= 0, jnp.take(w, jnp.clip(src, 0)), 0.0)
    w_in = w_in.reshape(IL, G)
    w_start = _typed_mm(cfg, net["E_start"], w_in)          # (LPI, G)
    w_end = _typed_mm(cfg, net["E_end"],
                      w.reshape(OL, cfg.I)[:, :G])          # (LPI, G)
    diff = w_start - w_end
    TP = net["phase_rl_avail"].shape[0]
    fw, fp = [], []
    for ph in range(max_phases):
        row = jnp.clip(net["g_phase_offset"] + ph, 0, TP - 1)
        avail = jnp.take(net["phase_rl_avail"], row, axis=0)   # (G, MAXRL)
        lk_avail = _typed_mm(cfg, net["E_rl"], avail.T) > 0.5  # (LPI, G)
        valid = ph < net["g_n_phases"]
        fw.append(jnp.where(
            valid, jnp.sum(jnp.where(lk_avail, w_start, 0.0), axis=0), 0.0))
        fp.append(jnp.where(
            valid, jnp.sum(jnp.where(lk_avail, diff, 0.0), axis=0), 0.0))
    w_up = jnp.sum(w_start, axis=0)                            # (G,)
    return jnp.stack(fw, axis=-1), jnp.stack(fp, axis=-1), w_up


def max_pressure_phases_ring(net, cfg: RingConfig, rs: RingState,
                             max_phases: int):
    """(I,) i32 phase actions (ring intersection order; real inters lead)."""
    pr = phase_pressures(net, cfg, rs, max_phases)
    best = jnp.argmax(pr, axis=-1).astype(jnp.int32)
    return jnp.concatenate(
        [best, jnp.zeros(cfg.I - cfg.G, jnp.int32)], axis=0)


def observations_ring(net, cfg: RingConfig, rs: RingState):
    f = jnp.float32
    w = lane_waiting_ring(cfg, rs)
    now = rs.step.astype(f) * f(cfg.interval)
    occ_l = (jnp.arange(cfg.SL, dtype=jnp.int32)[:, None] < rs.n_l[None, :])
    occ_k = (jnp.arange(cfg.SK, dtype=jnp.int32)[:, None] < rs.n_k[None, :])
    inflight = (jnp.sum(jnp.where(occ_l, now - rs.l_enter, 0.0))
                + jnp.sum(jnp.where(occ_k, now - rs.k_enter, 0.0)))
    running = jnp.sum(rs.n_l) + jnp.sum(rs.n_k)
    n = rs.finished_cnt + running
    return dict(
        lane_count=rs.n_l, lane_waiting=w,
        vehicle_count=running.astype(jnp.int32),
        current_time=now,
        avg_travel_time=jnp.where(
            n == 0, 0.0, (rs.cum_travel + inflight) / jnp.maximum(n, 1)))
