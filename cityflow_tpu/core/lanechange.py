"""Lane change: the reference's signal/shadow protocol, vectorized.

Reference: src/vehicle/lanechange.{h,cpp} (SimpleLaneChange) and the
engine phases initSegments / planLaneChange / scheduleLaneChange
(engine.cpp:374-399, 792-820). Semantics:

  makeSignal     pick inner/outer target lane by estimated-gap benefit,
                 3s cooldown, skip the last 30m of the lane
  send/receive   target-lane neighbors receive the signal; a receiver keeps
                 the max-priority sender (vehicle.cpp:391-401) and yields
  schedule       gap-valid changers insert a SHADOW vehicle into the target
                 lane; real+shadow then move in lockstep (min of both speeds)
                 while the real's lateral offset integrates; on reaching
                 (w_cur+w_tgt)/2 the shadow takes over the identity
  abort          a shadow that would leave its lane aborts the change

Divergence note (documented, inherent): the reference arbitrates same-step
changers in std::set<Vehicle*> POINTER order and draws shadow priorities
from the engine RNG mid-step — both unreproducible outside that exact
binary/heap. We arbitrate in spawn-uid order and derive shadow priorities
deterministically, so laneChange:true runs are self-deterministic and
statistically faithful but not bit-identical to a given reference run
(laneChange:false runs remain bit-exact).

Neighbor queries (getVehicleAfter/BeforeDistance, lanechange.cpp:27-60)
are answered for ALL vehicles at once with one probe sort: vehicles and
per-vehicle probes on the inner/outer lanes sort together by
(lane, -distance); forward/backward fills give each probe its neighbors.
"""

import jax
import jax.numpy as jnp

from cityflow_tpu.core.state import SimState, StepConfig, OV_SLOTS
from cityflow_tpu.core.step import (
    gat, chain_step, on_last_road, no_collision_speed, P_LEN, P_MAXNEGACC,
    P_MAXSPEED, P_MINGAP)

COOLING_TIME = 3.0  # lanechange.h:43


def _probe_neighbors(net, cfg: StepConfig, st: SimState):
    """For every running lane vehicle, the nearest vehicle at >= dis (leader)
    and < dis (follower) on its inner and outer lanes. One 3V sort."""
    V = cfg.max_vehicles
    L = cfg.num_lanes
    f = st.dis.dtype
    on_lane = st.running & (st.drv >= 0) & (st.drv < L)
    lane = jnp.where(on_lane, st.drv, L)
    local = gat(net["lane_local"], st.drv)
    n_in_road = gat(net["road_num_lanes"], gat(net["lane_road"], st.drv))
    outer = jnp.where(on_lane & (local + 1 < n_in_road), lane + 1, L)
    inner = jnp.where(on_lane & (local > 0), lane - 1, L)

    ids = jnp.arange(V, dtype=jnp.int32)
    lanes3 = jnp.concatenate([lane, outer, inner])
    dis3 = jnp.concatenate([st.dis, st.dis, st.dis])
    kind3 = jnp.concatenate([jnp.zeros(V, jnp.int32),
                             jnp.ones(V, jnp.int32),
                             jnp.ones(V, jnp.int32)])
    idx3 = jnp.concatenate([ids, ids + V, ids + 2 * V])
    s_lane, _d, _k, s_idx = jax.lax.sort(
        (lanes3, jnp.where(lanes3 < L, -dis3, jnp.zeros_like(dis3)),
         kind3, idx3), num_keys=3)

    n3 = 3 * V
    pos = jnp.arange(n3, dtype=jnp.int32)
    is_veh = s_idx < V
    # leader of an entry = most recent VEHICLE at-or-before it in the sort
    # (valid if on the same lane); probes sort after equal-distance vehicles,
    # so this is exactly "nearest vehicle with dis >= probe dis"
    last_veh = jax.lax.cummax(jnp.where(is_veh, pos, -1), axis=0)
    lead_ok = (last_veh >= 0) & (s_lane[jnp.clip(last_veh, 0)] == s_lane)
    lead_veh = jnp.where(lead_ok, s_idx[jnp.clip(last_veh, 0)], -1)
    # follower = next VEHICLE at-or-after (strictly after, for probes)
    nxt_veh = jax.lax.cummin(
        jnp.where(is_veh, pos, n3)[::-1], axis=0)[::-1]
    foll_ok = (nxt_veh < n3) & (s_lane[jnp.clip(nxt_veh, 0, n3 - 1)] == s_lane)
    foll_veh = jnp.where(foll_ok, s_idx[jnp.clip(nxt_veh, 0, n3 - 1)], -1)

    # scatter back per probe; probes sort AFTER same-dis vehicles (kind key),
    # so "leader" = last vehicle at-or-before = nearest with dis >= probe ✓
    out = {}
    for name, base in (("outer", V), ("inner", 2 * V)):
        sel = (s_idx >= base) & (s_idx < base + V)
        probe_of = jnp.where(sel, s_idx - base, V)
        lead = jnp.full(V + 1, -1, jnp.int32).at[probe_of].set(
            jnp.where(sel, lead_veh, -1), mode="drop")[:V]
        foll = jnp.full(V + 1, -1, jnp.int32).at[probe_of].set(
            jnp.where(sel, foll_veh, -1), mode="drop")[:V]
        lane_arr = outer if name == "outer" else inner
        valid = lane_arr < L
        out[name + "_leader"] = jnp.where(valid, lead, -1)
        out[name + "_follower"] = jnp.where(valid, foll, -1)
        out[name + "_lane"] = lane_arr
    return out


def _estimate_gap(net, cfg, st, leader, lane_arr):
    """SimpleLaneChange::estimateGap (lanechange.cpp:215-220)."""
    f = st.dis.dtype
    no_leader = leader < 0
    llen = gat(net["drv_len"], lane_arr).astype(f)
    la = gat(jnp.stack([st.dis, st.params[:, P_LEN]], axis=-1), leader)
    return jnp.where(no_leader, llen - st.dis, la[:, 0] - st.dis - la[:, 1])


def plan_lane_change(net, cfg: StepConfig, st: SimState, arr):
    """planLaneChange + scheduleLaneChange: signals, arbitration, shadow
    insertion. Returns the updated state."""
    V = cfg.max_vehicles
    L = cfg.num_lanes
    f = st.dis.dtype
    dt = f.type(cfg.interval)
    p = st.params
    now = st.step.astype(f) * dt

    nb = _probe_neighbors(net, cfg, st)
    on_lane = st.running & (st.drv >= 0) & (st.drv < L)
    real = ~st.is_shadow

    # ---- SimpleLaneChange::makeSignal (lanechange.cpp:151-184) ----
    past_cool = now - st.lc_last_t >= COOLING_TIME
    mk = st.running & real & ~st.lc_changing & past_cool
    has_signal = mk                                # signalSend allocated
    lane_left = gat(net["drv_len"], st.drv).astype(f) - st.dis
    gap_ok = on_lane & (lane_left >= 30)
    cur_est = st.gap
    expected = 2 * p[:, P_LEN] + 4 * dt * p[:, P_MAXSPEED]
    want = mk & gap_ok & ~(cur_est > expected) & ~(cur_est < 1.5 * p[:, P_LEN])

    def lane_reachable(lane_arr):
        # onLastRoad() || router.getNextDrivable(lane) (lanechange.cpp:163,172)
        nxt, _ = chain_step(net, cfg, st.route, st.route_pos,
                            jnp.where(lane_arr < L, lane_arr, -1))
        return on_last_road(net, cfg, st.route, st.route_pos) | (nxt >= 0)

    outer_ok = want & (nb["outer_lane"] < L) & lane_reachable(nb["outer_lane"])
    outer_est = jnp.where(
        outer_ok, _estimate_gap(net, cfg, st, nb["outer_leader"],
                                nb["outer_lane"]), f.type(0))
    target = jnp.where(outer_ok & (outer_est > cur_est + p[:, P_LEN]),
                       nb["outer_lane"], -1)
    inner_ok = want & (nb["inner_lane"] < L) & lane_reachable(nb["inner_lane"])
    inner_est = _estimate_gap(net, cfg, st, nb["inner_leader"],
                              nb["inner_lane"])
    take_inner = inner_ok & (inner_est > cur_est + p[:, P_LEN]) \
        & (inner_est > outer_est)
    target = jnp.where(take_inner, nb["inner_lane"], target)

    # changing vehicles keep last step's signal (clearSignal early-returns)
    target = jnp.where(st.lc_changing, st.lc_target, target)
    has_signal = has_signal | st.lc_changing
    direction = jnp.where(target < 0, 0,
                          jnp.where(target == st.drv + 1, 1,
                                    jnp.where(target == st.drv - 1, -1, 0)))

    # planChange (lanechange.cpp:23-25)
    plan = (has_signal & (target >= 0) & (target != st.drv)) | st.lc_changing
    plan = plan & st.running & real

    # ---- updateLeaderAndFollower on the chosen target ----
    is_outer = target == nb["outer_lane"]
    tleader = jnp.where(is_outer, nb["outer_leader"], nb["inner_leader"])
    tfollower = jnp.where(is_outer, nb["outer_follower"],
                          nb["inner_follower"])
    tl_pk = gat(jnp.stack([st.dis, p[:, P_LEN]], axis=-1), tleader)
    lgap = jnp.where(tleader >= 0, tl_pk[:, 0] - st.dis - tl_pk[:, 1],
                     jnp.asarray(jnp.inf, f))
    # no on-lane leader: scan the target lane's outgoing lanelinks
    # (lanechange.cpp:33-47)
    rest = lane_left
    no_tl = tleader < 0
    lgap = jnp.where(no_tl, rest, lgap)
    best_gap = jnp.full(V, jnp.inf, f)
    t_safe = jnp.clip(target, 0, L - 1)
    for k in range(cfg.k_out):
        ol = gat(net["lane_out"], t_safe)[:, k]
        cand = jnp.where(ol >= 0, gat(arr["last_of"], ol), -1)
        ca = gat(jnp.stack([st.dis, p[:, P_LEN]], axis=-1), cand)
        cgap = ca[:, 0] + rest
        better = no_tl & (cand >= 0) & (cgap < best_gap)
        hit = better & (cgap < ca[:, 1])
        tleader = jnp.where(hit, cand, tleader)
        lgap = jnp.where(hit, rest - (ca[:, 1] - cgap), lgap)
        best_gap = jnp.where(better, cgap, best_gap)
    tf_pk = gat(jnp.stack([st.dis], axis=-1), tfollower)
    fgap = jnp.where(tfollower >= 0, st.dis - tf_pk[:, 0] - p[:, P_LEN],
                     jnp.asarray(jnp.inf, f))

    # ---- sendSignal / receiveSignal (vehicle.cpp:391-401) ----
    # receiver keeps the max-priority sender among all who target it
    sender_ok = plan & has_signal
    def recv_for(role_idx):
        pri = jnp.where(sender_ok, st.priority, jnp.int32(-2**31))
        tgt = jnp.where(sender_ok & (role_idx >= 0), role_idx, V)
        best = jnp.full(V + 1, jnp.int32(-2**31), jnp.int32).at[tgt].max(
            pri, mode="drop")[:V]
        # best sender slot: second scatter keyed by matching priority
        slot = jnp.full(V + 1, -1, jnp.int32).at[
            jnp.where(sender_ok & (gat(best, role_idx) == st.priority)
                      & (role_idx >= 0), role_idx, V)].max(
            jnp.arange(V, dtype=jnp.int32), mode="drop")[:V]
        return best, slot

    bl, sl_l = recv_for(tleader)
    bf, sl_f = recv_for(tfollower)
    best_pri = jnp.maximum(bl, bf)
    src = jnp.where(bl >= bf, sl_l, sl_f)
    can_recv = (st.running & ~st.lc_changing
                & ~(has_signal & (st.priority >= best_pri))
                & (best_pri > jnp.int32(-2**31)))
    lc_recv = jnp.where(can_recv, src, -1)

    # ---- schedule: gap-valid non-changing changers insert a shadow ----
    min_brake = 0.5 * st.speed * st.speed / p[:, P_MAXNEGACC]
    tf_brake_pk = gat(jnp.stack([st.speed, p[:, P_MAXNEGACC]], axis=-1),
                      tfollower)
    safe_before = jnp.where(
        tfollower >= 0,
        0.5 * tf_brake_pk[:, 0] * tf_brake_pk[:, 0] / tf_brake_pk[:, 1],
        f.type(0))
    gap_valid = (lgap >= min_brake) & (fgap >= safe_before)
    can_change = has_signal & (lc_recv < 0)
    do_change = (plan & can_change & ~st.lc_changing & gap_valid & on_lane
                 & (target >= 0))

    # allocate shadow slots
    MS = cfg.max_spawn_per_step
    changers = jnp.nonzero(do_change, size=MS, fill_value=-1)[0].astype(jnp.int32)
    free = jnp.nonzero(~st.active, size=MS, fill_value=-1)[0].astype(jnp.int32)
    ok = (changers >= 0) & (free >= 0)
    ov = jnp.any((changers >= 0) & (free < 0))
    src_slot = jnp.where(ok, changers, V)
    dst = jnp.where(ok, free, V)

    def cp(a, val=None):
        v = a[jnp.clip(src_slot, 0, V - 1)] if val is None else val
        return a.at[dst].set(v, mode="drop")

    st2 = st.replace_fields(
        lc_has_signal=has_signal, lc_target=target, lc_dir=direction,
        lc_recv=lc_recv, lc_tleader=tleader, lc_tfollower=tfollower,
        lc_lgap=lgap, lc_fgap=fgap,
        lc_changing=st.lc_changing | do_change,
    )
    # shadow fields: copy of the real with drivable=target (lanechange.cpp:71-102)
    sh_pri = jnp.int32(2**30) + st.uid[jnp.clip(src_slot, 0, V - 1)]
    new_seq = st.seq_counter
    st2 = st2.replace_fields(
        active=cp(st2.active, True), running=cp(st2.running, True),
        dis=cp(st2.dis), speed=cp(st2.speed),
        drv=cp(st2.drv, target[jnp.clip(src_slot, 0, V - 1)]),
        prev_drv=cp(st2.prev_drv), route=cp(st2.route),
        route_pos=cp(st2.route_pos), enter_time=cp(st2.enter_time),
        enter_ll_time=cp(st2.enter_ll_time),
        priority=cp(st2.priority, sh_pri),
        # the shadow copies the real's controllerInfo (vehicle.cpp copy
        # ctor), including the (possibly stale) gap that gates makeSignal
        leader=cp(st2.leader, jnp.int32(-1)), gap=cp(st2.gap),
        blocker=cp(st2.blocker, jnp.int32(-1)),
        custom_speed=cp(st2.custom_speed, f.type(0)),
        has_custom=cp(st2.has_custom, False),
        list_seq=cp(st2.list_seq, new_seq),
        uid=cp(st2.uid, st.uid[jnp.clip(src_slot, 0, V - 1)]
               | jnp.int32(2**30)),
        params=st2.params.at[dst].set(
            st.params[jnp.clip(src_slot, 0, V - 1)], mode="drop"),
        partner=cp(st2.partner, src_slot.astype(jnp.int32)),
        is_shadow=cp(st2.is_shadow, True),
        offset=cp(st2.offset, f.type(0)),
        lc_changing=cp(st2.lc_changing, False),
        lc_finished=cp(st2.lc_finished, False),
        lc_last_t=cp(st2.lc_last_t),
        lc_target=cp(st2.lc_target, jnp.int32(-1)),
        lc_has_signal=cp(st2.lc_has_signal, False),
        lc_dir=cp(st2.lc_dir, jnp.int32(0)),
        lc_recv=cp(st2.lc_recv, jnp.int32(-1)),
        lc_tleader=cp(st2.lc_tleader, jnp.int32(-1)),
        lc_tfollower=cp(st2.lc_tfollower, jnp.int32(-1)),
        lc_lgap=cp(st2.lc_lgap, f.type(0)),
        lc_fgap=cp(st2.lc_fgap, f.type(0)),
        lc_last_dir=cp(st2.lc_last_dir, jnp.int32(0)),
        seq_counter=st.seq_counter + 1,
        overflow=st2.overflow | jnp.where(ov, OV_SLOTS, 0).astype(jnp.int32),
    )
    # link real -> shadow
    st2 = st2.replace_fields(
        partner=st2.partner.at[src_slot].set(dst.astype(jnp.int32),
                                             mode="drop"))
    return st2


def yield_speed(net, cfg: StepConfig, st: SimState):
    """SimpleLaneChange::yieldSpeed for signal receivers
    (lanechange.cpp:186-206). 100 (no-op) otherwise."""
    f = st.dis.dtype
    dt = f.type(cfg.interval)
    src = st.lc_recv
    has = src >= 0
    spk = gat(jnp.stack([st.speed, st.params[:, P_MAXNEGACC], st.lc_fgap,
                         st.lc_tleader.astype(f)], axis=-1), src)
    src_speed, src_maxneg, src_fgap, src_tleader = (
        spk[:, 0], spk[:, 1], spk[:, 2], spk[:, 3].astype(jnp.int32))
    # safeGapBefore of the source = its targetFollower's min brake distance
    src_tf = gat(st.lc_tfollower, src)
    tfb = gat(jnp.stack([st.speed, st.params[:, P_MAXNEGACC]], axis=-1),
              src_tf)
    src_safe_before = jnp.where(src_tf >= 0,
                                0.5 * tfb[:, 0] * tfb[:, 0] / tfb[:, 1],
                                f.type(0))
    i_am_leader = src_tleader == jnp.arange(st.dis.shape[0], dtype=jnp.int32)
    gap = src_fgap - src_safe_before
    v = no_collision_speed(src_speed, src_maxneg, st.speed,
                           st.params[:, P_MAXNEGACC], gap, dt, f.type(0))
    v = jnp.where(v < 0, f.type(100), v)
    return jnp.where(has & ~i_am_leader, v,
                     jnp.asarray(100.0, f))
