"""The simulation step: a pure jittable function over `SimState`.

Each phase of the reference's barrier pipeline (engine.cpp:566-594) becomes a
dense array transformation; the reference's double-buffered per-vehicle writes
(vehicle.h Buffer, committed in Vehicle::update) make every phase a Jacobi
update, which is why this vectorization is exact.

Phase map (reference -> here):
  Flow::nextStep + planRoute       -> spawn_vehicles (host-precomputed table)
  Engine::handleWaiting            -> admit_waiting
  Engine::threadNotifyCross        -> notify_cross
  Engine::threadGetAction          -> get_action (speeds, hop walk, buffers)
  Engine::threadUpdateLocation     -> update_location (removals, transfers)
  Engine::threadUpdateAction       -> commit
  Engine::threadUpdateLeaderAndGap -> update_leader_and_gap
  TrafficLight::passTime           -> pass_time

All formula transcriptions cite the reference file:line and preserve
double-precision operation order for bit-exact parity in exact mode.
"""

from functools import partial
from typing import Any, Dict

import jax
import jax.numpy as jnp

from cityflow_tpu.core.state import (
    SimState, StepConfig, INT_MAX, OV_SLOTS, OV_LINK_TABLE, OV_HOPS, OV_REMOVE)

EPS = 1e-8  # reference utility.h:15

# param columns (compiler/net.py)
P_SPEED, P_LEN, P_WIDTH, P_MAXPOSACC, P_MAXNEGACC, P_USUALPOSACC, \
    P_USUALNEGACC, P_MINGAP, P_MAXSPEED, P_HEADWAY, P_YIELD, P_TURNSPEED = range(12)


def gat(a, i, fill=None):
    """Safe gather: a[clip(i)]; caller masks invalid lanes (i<0)."""
    n = a.shape[0]
    return jnp.take(a, jnp.clip(i, 0, n - 1), axis=0)


# ---------------------------------------------------------------------------
# arrangement: per-drivable ordered lists via one global sort
# ---------------------------------------------------------------------------

def arrangement(net, cfg: StepConfig, running, drv, dis, list_seq, veh_len,
                fattrs=None, iattrs=None):
    """Reproduce the reference's per-drivable std::list order: vehicles sorted
    by distance DESC, ties by insertion order (Drivable::pushVehicle appends;
    pushBuffer pre-sorted by distance desc, engine.cpp:480-493).

    Also emits dense per-lanelink attribute tables (vehicle slot, distance,
    length) so the conflict-cross phases read contiguous rows instead of
    issuing per-element gathers (the dominant TPU cost otherwise)."""
    V = cfg.max_vehicles
    D = cfg.num_drivables
    L = cfg.num_lanes
    LL = D - L
    key_drv = jnp.where(running, drv, D).astype(jnp.int32)
    neg_dis = jnp.where(running, -dis, jnp.zeros_like(dis))
    idx = jnp.arange(V, dtype=jnp.int32)
    s_drv, s_negdis, _sq, s_idx = jax.lax.sort(
        (key_drv, neg_dis, list_seq, idx), num_keys=3)

    pos = jnp.arange(V, dtype=jnp.int32)
    prev_same = jnp.concatenate(
        [jnp.zeros(1, bool), s_drv[1:] == s_drv[:-1]])
    next_same = jnp.concatenate(
        [s_drv[:-1] == s_drv[1:], jnp.zeros(1, bool)])
    valid = s_drv < D

    leader_sorted = jnp.where(prev_same, jnp.roll(s_idx, 1), -1)
    leader = jnp.zeros(V, jnp.int32).at[s_idx].set(leader_sorted)

    first_mask = valid & ~prev_same
    last_mask = valid & ~next_same
    first_of = jnp.full(D + 1, -1, jnp.int32).at[
        jnp.where(first_mask, s_drv, D)].set(s_idx, mode="drop")[:D]
    last_of = jnp.full(D + 1, -1, jnp.int32).at[
        jnp.where(last_mask, s_drv, D)].set(s_idx, mode="drop")[:D]

    seg_start = jax.lax.cummax(jnp.where(first_mask, pos, -1), axis=0)
    rank = pos - seg_start

    on_link = valid & (s_drv >= L)
    in_table = on_link & (rank < cfg.k_link)
    nrows = max(LL, 1) * cfg.k_link
    flat = jnp.where(in_table, (s_drv - L) * cfg.k_link + rank, nrows)
    link_veh = jnp.full(nrows + 1, -1, jnp.int32).at[
        flat].set(s_idx, mode="drop")[:-1].reshape(max(LL, 1), cfg.k_link)
    link_dis = jnp.zeros(nrows + 1, dis.dtype).at[
        flat].set(-s_negdis, mode="drop")[:-1].reshape(max(LL, 1), cfg.k_link)
    link_len = jnp.zeros(nrows + 1, dis.dtype).at[
        flat].set(veh_len[s_idx], mode="drop")[:-1].reshape(max(LL, 1),
                                                            cfg.k_link)

    out = dict(link_fattr=None, link_iattr=None)
    if fattrs is not None:
        out["link_fattr"] = jnp.zeros(
            (nrows + 1, fattrs.shape[1]), dis.dtype).at[flat].set(
            fattrs[s_idx], mode="drop")[:-1].reshape(
            max(LL, 1), cfg.k_link, fattrs.shape[1])
        out["link_iattr"] = jnp.zeros(
            (nrows + 1, iattrs.shape[1]), jnp.int32).at[flat].set(
            iattrs[s_idx], mode="drop")[:-1].reshape(
            max(LL, 1), cfg.k_link, iattrs.shape[1])

    ov = jnp.any(on_link & (rank >= cfg.k_link))
    rank_of = jnp.zeros(V, jnp.int32).at[s_idx].set(rank)
    return dict(leader=leader, first_of=first_of, last_of=last_of,
                link_veh=link_veh, link_dis=link_dis, link_len=link_len,
                sorted_idx=s_idx, sorted_drv=s_drv,
                rank=rank_of, overflow_link=ov, **out)


# ---------------------------------------------------------------------------
# router chain
# ---------------------------------------------------------------------------

def chain_step(net, cfg: StepConfig, route, pos, cur):
    """One hop of Router::getNextDrivable (router.cpp:49-76): lane -> selected
    lanelink (host-precomputed table), lanelink -> its end lane (pos+1)."""
    L = cfg.num_lanes
    rnl = net["route_next_ll"]
    NR, RLEN, MAXLPR = rnl.shape
    is_lane = (cur >= 0) & (cur < L)
    lane_local = gat(net["lane_local"], cur)
    flat_idx = (jnp.clip(route, 0, NR - 1) * RLEN
                + jnp.clip(pos, 0, RLEN - 1)) * MAXLPR + jnp.clip(lane_local, 0, MAXLPR - 1)
    nxt_from_lane = jnp.take(rnl.reshape(-1), flat_idx)
    nxt_from_ll = gat(net["ll_end"], cur - L)  # lane idx == drivable idx
    nxt = jnp.where(is_lane, nxt_from_lane,
                    jnp.where(cur >= L, nxt_from_ll, -1)).astype(jnp.int32)
    npos = jnp.where(cur >= L, pos + 1, pos).astype(jnp.int32)
    return nxt, npos


def on_last_road(net, cfg, route, pos):
    return pos >= gat(net["route_len"], route) - 1


# ---------------------------------------------------------------------------
# speed-model scalar formulas (vehicle.cpp; elementwise, exact op order)
# ---------------------------------------------------------------------------

def no_collision_speed(vL, dL, vF, dF, gap, interval, target_gap):
    """reference vehicle.cpp:200-209."""
    c = vF * interval / 2 + target_gap - 0.5 * vL * vL / dL - gap
    a = 0.5 / dF
    b = 0.5 * interval
    disc = b * b - 4 * a * c
    v1 = 0.5 / a * (jnp.sqrt(jnp.maximum(disc, 0.0)) - b)
    v2 = 2 * vL - dL * interval + 2 * (gap - target_gap) / interval
    v = jnp.minimum(v1, v2)
    return jnp.where(b * b < 4 * a * c, -100.0, v)


def brake_distance_after_accel(speed, acc, dec, interval):
    """reference vehicle.cpp:302-306."""
    next_speed = speed + acc * interval
    return (speed + next_speed) * interval / 2 + (next_speed * next_speed / dec / 2)


def stop_before_speed(speed, usual_pos, usual_neg, distance, interval):
    """reference vehicle.cpp:240-250 (getStopBeforeSpeed)."""
    bda = brake_distance_after_accel(speed, usual_pos, usual_neg, interval)
    ti = 2 * distance / (speed + EPS) / interval
    # (int)takeInterval: C truncation; x86 cvttsd2si out-of-range -> INT_MIN
    ti_int = jnp.where(jnp.abs(ti) >= 2.0**31, -(2.0**31), jnp.trunc(ti))
    ge1 = speed - speed / ti_int
    lt1 = speed - speed / ti
    slow = jnp.where(ti >= 1, ge1, lt1)
    return jnp.where(bda < distance, speed + usual_pos * interval, slow)


def distance_until_speed(speed, target, acc, interval):
    """reference vehicle.cpp:275-282 (NB: stage1speed adds acc/interval —
    transcribed as written)."""
    s1 = jnp.floor((target - speed) / acc / interval)
    v1 = speed + s1 * acc / interval
    d1 = (speed + v1) * (s1 * interval) / 2
    d = d1 + jnp.where(v1 < target, (v1 + target) * interval / 2, 0.0)
    return jnp.where(target <= speed, 0.0, d)


def reach_steps(speed, distance, target, acc, interval):
    """reference vehicle.cpp:252-268 (getReachSteps), returns int32."""
    r_fast = jnp.ceil(distance / jnp.where(speed > 0, speed, 1.0))
    dts = distance_until_speed(speed, target, acc, interval)
    r_a = jnp.ceil((jnp.sqrt(jnp.maximum(
        speed * speed + 2 * acc * distance, 0.0)) - speed) / acc / interval)
    r_b = (jnp.ceil((target - speed) / acc / interval)
           + jnp.ceil((distance - dts) / target / interval))
    r = jnp.where(speed > target, r_fast,
                  jnp.where(dts > distance, r_a, r_b))
    r = jnp.where(distance <= 0, 0.0, r)
    return r.astype(jnp.int32)


def can_yield(speed, max_neg, yield_dist, length, d):
    """reference vehicle.cpp:284-287."""
    min_brake = 0.5 * speed * speed / max_neg
    return ((d > 0) & (min_brake < d - yield_dist)) | ((d < 0) & (d + length < 0))


# ---------------------------------------------------------------------------
# leader scan across upcoming drivables (vehicle.cpp:157-196)
# ---------------------------------------------------------------------------

# float attr pack columns (build_attr_packs)
A_DIS, A_LEN, A_SPEED, A_MAXNEG, A_YIELD, A_UPA, A_TURNSPD, A_MAXSPD, \
    A_CYC, A_PREV = range(10)
NUM_A = 10


def build_attr_packs(cfg: StepConfig, st: SimState, cyc):
    """Per-vehicle attribute bundles consumed by the conflict-cross phases.
    Packing lets every downstream read move a whole bundle per index — on
    TPU a dynamic gather pays per INDEX, not per byte."""
    f = st.dis.dtype
    p = st.params
    fattrs = jnp.stack([
        st.dis, p[:, P_LEN], st.speed, p[:, P_MAXNEGACC], p[:, P_YIELD],
        p[:, P_USUALPOSACC], p[:, P_TURNSPEED], p[:, P_MAXSPEED],
        cyc.astype(f), st.prev_drv.astype(f)], axis=-1)
    iattrs = jnp.stack([st.enter_ll_time, st.priority], axis=-1)
    return fattrs, iattrs


def pack_attrs(st: SimState):
    """Hot per-vehicle attributes packed as rows: ONE contiguous row gather
    replaces several element gathers (TPU gathers pay per index, not per
    byte). fpack = [dis, speed, len]; ipack = [prev_drv, enter_ll_time,
    priority]."""
    fpack = jnp.stack([st.dis, st.speed, st.params[:, P_LEN]], axis=-1)
    ipack = jnp.stack([st.prev_drv, st.enter_ll_time, st.priority], axis=-1)
    return fpack, ipack


def leader_scan(net, cfg: StepConfig, st: SimState, arr, mask):
    """Vectorized Vehicle::updateLeaderAndGap fallback scan for vehicles with
    no leader on their own drivable. Returns (leader_idx, gap)."""
    p = st.params
    max_speed = p[:, P_MAXSPEED]
    bound = (max_speed * max_speed / p[:, P_USUALNEGACC] / 2
             + max_speed * cfg.interval * 2)
    L = cfg.num_lanes
    drv_len = net["drv_len"]
    veh_len = p[:, P_LEN]

    cur = st.drv
    pos = st.route_pos
    dis_rem = gat(drv_len, st.drv) - st.dis
    found = jnp.full_like(st.drv, -1)
    fgap = jnp.zeros_like(st.dis)
    done = ~mask
    fpack = jnp.stack([st.dis, veh_len], axis=-1)

    cand_pack = None
    if not cfg.exact:
        # fast mode: precompute per-DRIVABLE (candidate, dis-len) once.
        # For a lanelink the reference scans all links sharing its start
        # lane with strict < on dis_rem + (dis - len) (vehicle.cpp:170-180);
        # dis_rem is common, so argmin over (dis - len) picks the same
        # candidate up to rounding ties — the documented fast-mode delta.
        D = cfg.num_drivables
        lane_cand = arr["last_of"][:L]
        la = gat(fpack, lane_cand)
        lane_val = la[:, 0] - la[:, 1]
        LLn = D - L
        start_lane = net["ll_start"]
        bc = jnp.full(max(LLn, 1), -1, jnp.int32)
        bv = jnp.zeros(max(LLn, 1), st.dis.dtype)
        for k in range(cfg.k_out):
            ol = gat(net["lane_out"], start_lane)[:, k]
            cand = jnp.where(ol >= 0, gat(arr["last_of"], ol), -1)
            ca = gat(fpack, cand)
            val = ca[:, 0] - ca[:, 1]
            better = (cand >= 0) & ((bc < 0) | (val < bv))
            bv = jnp.where(better, val, bv)
            bc = jnp.where(better, cand, bc)
        cand_pack = jnp.stack([
            jnp.concatenate([lane_cand, bc]).astype(st.dis.dtype),
            jnp.concatenate([lane_val, bv])], axis=-1)       # (D,2)

    for _ in range(cfg.k_scan):
        nd, pos = chain_step(net, cfg, st.route, pos, cur)
        done = done | (nd < 0)
        if cfg.exact:
            is_ll = nd >= L
            # lanelink: scan ALL lanelinks leaving the same start lane
            # (overlap rule, vehicle.cpp:170-180), strict <, first wins
            start_lane = gat(net["ll_start"], nd - L)
            best_cand = jnp.full_like(nd, -1)
            best_gap = jnp.zeros_like(fgap)
            for k in range(cfg.k_out):
                ol = gat(net["lane_out"], start_lane)[:, k]
                cand = jnp.where(ol >= 0, gat(arr["last_of"], ol), -1)
                ca = gat(fpack, cand)
                cgap = dis_rem + ca[:, 0] - ca[:, 1]
                better = (cand >= 0) & ((best_cand < 0) | (cgap < best_gap))
                best_gap = jnp.where(better, cgap, best_gap)
                best_cand = jnp.where(better, cand, best_cand)
            lane_cand = gat(arr["last_of"], nd)
            la = gat(fpack, lane_cand)
            lane_gap = dis_rem + la[:, 0] - la[:, 1]
            cand = jnp.where(is_ll, best_cand, lane_cand)
            cgap = jnp.where(is_ll, best_gap, lane_gap)
        else:
            cp = gat(cand_pack, nd)                       # (V,2) one gather
            cand = cp[:, 0].astype(jnp.int32)
            cgap = dis_rem + cp[:, 1]
        hit = ~done & (cand >= 0)
        found = jnp.where(hit, cand, found)
        fgap = jnp.where(hit, cgap, fgap)
        done = done | hit
        dis_rem = dis_rem + gat(drv_len, nd)
        done = done | (dis_rem > bound)
        cur = nd
    return found, fgap


# ---------------------------------------------------------------------------
# step phases
# ---------------------------------------------------------------------------

def spawn_vehicles(net, cfg: StepConfig, st: SimState, spawn_tbl):
    """Activate this step's host-precomputed spawn rows into free slots
    (reference: Flow::nextStep + Engine::planRoute valid path,
    flow.cpp:6-22, engine.cpp:450-470)."""
    MS = cfg.max_spawn_per_step
    rows = {k: jax.lax.dynamic_slice_in_dim(spawn_tbl[k], st.spawn_cursor, MS)
            for k in ("step", "flow", "priority", "first_drv", "route")}
    want = rows["step"] == st.step                       # contiguous prefix
    free = jnp.nonzero(~st.active, size=MS, fill_value=-1)[0].astype(jnp.int32)
    slot = jnp.where(want, free, -1)
    ok = want & (slot >= 0)
    ov = jnp.any(want & (slot < 0))
    tgt = jnp.where(ok, slot, cfg.max_vehicles)          # drop-mode scatter

    f = st.dis.dtype
    uid = st.spawn_cursor + jnp.arange(MS, dtype=jnp.int32)
    flow_params = gat(net["flow_params"], rows["flow"]).astype(f)
    new = dict(
        active=True, running=False, dis=f.type(0), speed=flow_params[:, P_SPEED],
        drv=rows["first_drv"], prev_drv=jnp.int32(-1), route=rows["route"],
        route_pos=jnp.int32(0),
        enter_time=(st.step.astype(f) * f.type(cfg.interval)),
        enter_ll_time=jnp.int32(INT_MAX), priority=rows["priority"],
        leader=jnp.int32(-1), gap=f.type(0), blocker=jnp.int32(-1),
        custom_speed=f.type(0), has_custom=False,
        list_seq=jnp.int32(0), uid=uid)

    def scat(a, v):
        v = jnp.broadcast_to(v, (MS,) + a.shape[1:]) if jnp.ndim(v) <= 1 else v
        return a.at[tgt].set(v.astype(a.dtype), mode="drop")

    st = st.replace_fields(
        active=scat(st.active, new["active"]),
        running=scat(st.running, new["running"]),
        dis=scat(st.dis, new["dis"]), speed=scat(st.speed, new["speed"]),
        drv=scat(st.drv, new["drv"]), prev_drv=scat(st.prev_drv, new["prev_drv"]),
        route=scat(st.route, new["route"]),
        route_pos=scat(st.route_pos, new["route_pos"]),
        enter_time=scat(st.enter_time, new["enter_time"]),
        enter_ll_time=scat(st.enter_ll_time, new["enter_ll_time"]),
        priority=scat(st.priority, new["priority"]),
        leader=scat(st.leader, new["leader"]), gap=scat(st.gap, new["gap"]),
        blocker=scat(st.blocker, new["blocker"]),
        custom_speed=scat(st.custom_speed, new["custom_speed"]),
        has_custom=scat(st.has_custom, new["has_custom"]),
        list_seq=scat(st.list_seq, new["list_seq"]),
        uid=scat(st.uid, uid),
        params=st.params.at[tgt].set(flow_params, mode="drop"),
        partner=scat(st.partner, jnp.int32(-1)),
        is_shadow=scat(st.is_shadow, False),
        offset=scat(st.offset, f.type(0)),
        lc_changing=scat(st.lc_changing, False),
        lc_finished=scat(st.lc_finished, False),
        lc_last_t=scat(st.lc_last_t, f.type(0)),
        lc_target=scat(st.lc_target, jnp.int32(-1)),
        lc_has_signal=scat(st.lc_has_signal, False),
        lc_dir=scat(st.lc_dir, jnp.int32(0)),
        lc_recv=scat(st.lc_recv, jnp.int32(-1)),
        lc_tleader=scat(st.lc_tleader, jnp.int32(-1)),
        lc_tfollower=scat(st.lc_tfollower, jnp.int32(-1)),
        lc_lgap=scat(st.lc_lgap, f.type(0)),
        lc_fgap=scat(st.lc_fgap, f.type(0)),
        lc_last_dir=scat(st.lc_last_dir, jnp.int32(0)),
        spawn_cursor=st.spawn_cursor + jnp.sum(want).astype(jnp.int32),
        overflow=st.overflow | jnp.where(ov, OV_SLOTS, 0).astype(jnp.int32),
    )
    return st


def admit_waiting(net, cfg: StepConfig, st: SimState, arr_prev):
    """Engine::handleWaiting (engine.cpp:502-516): per lane, admit the FIFO
    head of the waiting buffer if Lane::available (roadnet.cpp:428-436)."""
    L = cfg.num_lanes
    waiting = st.active & ~st.running
    lane = st.drv  # waiting vehicles hold their first lane in drv
    # FIFO head per lane = min uid among waiting. Availability and tail data
    # are computed on the LANE domain (L << V) and read back with a single
    # packed per-vehicle row gather.
    V = st.uid.shape[0]
    big = jnp.int32(INT_MAX)
    seq = jnp.where(waiting, st.uid, big)
    lane_safe = jnp.where(waiting, lane, L)
    min_seq = jnp.full(L + 1, big, jnp.int32).at[
        lane_safe].min(seq, mode="drop")[:L]
    is_head = waiting & (st.uid == gat(min_seq, lane))
    head_slot = jnp.full(L + 1, V, jnp.int32).at[
        jnp.where(is_head, lane, L)].min(
        jnp.arange(V, dtype=jnp.int32), mode="drop")[:L]
    head_slot = jnp.where(head_slot < V, head_slot, -1)
    head_mingap = gat(st.params[:, P_MINGAP], head_slot)   # (L,) tiny

    tail_l = arr_prev["last_of"][:L]                       # (L,)
    tla = gat(jnp.stack([st.dis, st.params[:, P_LEN]], axis=-1), tail_l)
    has_tail_l = tail_l >= 0
    avail_l = ~has_tail_l | (tla[:, 0] > tla[:, 1] + head_mingap)
    lane_pack = jnp.stack([
        jnp.where(avail_l, 1.0, 0.0).astype(st.dis.dtype),
        jnp.where(has_tail_l, 1.0, 0.0).astype(st.dis.dtype),
        tail_l.astype(st.dis.dtype),
        (tla[:, 0] - tla[:, 1]).astype(st.dis.dtype)], axis=-1)  # (L,4)

    lp = gat(lane_pack, lane)                              # (V,4) one gather
    admit = is_head & (lp[:, 0] > 0)
    has_tail = lp[:, 1] > 0
    tail = lp[:, 2].astype(jnp.int32)

    leader = jnp.where(admit & has_tail, tail, st.leader)
    # updateLeaderAndGap(tail): gap = tail.dis - tail.len - 0 (vehicle.cpp:158-160)
    gap = jnp.where(admit & has_tail, lp[:, 3] - st.dis, st.gap)
    running = st.running | admit
    list_seq = jnp.where(admit, st.seq_counter, st.list_seq)

    st = st.replace_fields(running=running, leader=leader, gap=gap,
                           list_seq=list_seq,
                           seq_counter=st.seq_counter + 1)
    # tail == null -> full scan (engine.cpp:512 -> vehicle.cpp:161-196)
    need_scan = admit & ~has_tail
    cyc = blocker_cycles(cfg, st.blocker)
    fattrs, iattrs = build_attr_packs(cfg, st, cyc)
    arr_now = arrangement(net, cfg, st.running, st.drv, st.dis,
                          st.list_seq, st.params[:, P_LEN],
                          fattrs=fattrs, iattrs=iattrs)
    sl, sg = leader_scan(net, cfg, st, arr_now, need_scan)
    st = st.replace_fields(
        leader=jnp.where(need_scan, sl, st.leader),
        # scan miss keeps the stale gap (vehicle.cpp:162-196)
        gap=jnp.where(need_scan & (sl >= 0), sg, st.gap))
    return st, arr_now, fattrs, iattrs


def lanelink_available(net, cfg, st):
    """LaneLink::isAvailable (roadnet.h:429-431,472) via current phase mask."""
    row = gat(net["phase_offset"], net["ll_inter"]) + gat(st.phase, net["ll_inter"])
    mrl = net["phase_rl_avail"].shape[1]
    flat = row * mrl + net["ll_rl_local"]
    return jnp.take(net["phase_rl_avail"].reshape(-1), flat)


def notify_cross(net, cfg: StepConfig, st: SimState, arr, veh_next, ll_avail,
                 fattrs=None, iattrs=None):
    """Engine::threadNotifyCross (engine.cpp:317-372) in LINK-MAJOR layout.

    For each (link, cross-slot): the notifier is the candidate with the
    largest front position whose tail has not cleared the cross. Candidates
    are read as SLICES of the per-link attr tables (zero dynamic gathers);
    the end-lane/start-lane specials are per-LINK values (the end/start lane
    of a link is the same for all its crosses). The winner's derived fields
    (canYield, reachSteps, enter time, priority, deadlock flag) are computed
    on the own side, then ONE flat permutation (static lnk_cross_foe_pos)
    delivers every side's FOE bundle for Cross::canPass."""
    L = cfg.num_lanes
    f = st.dis.dtype
    LLk = net["lnk_cross_d"].shape
    LL, KC = LLk
    dt = f.type(cfg.interval)
    if net["cross_ll"].shape[0] == 0:
        z = jnp.zeros((LL, KC), f)
        zi = jnp.zeros((LL, KC), jnp.int32)
        zb = jnp.zeros((LL, KC), bool)
        return dict(foe_exists=zb, foe_yield=zb, foe_reach=zi,
                    foe_cleared=zb, foe_ent=zi, foe_pri=zi, foe_cyc=zb,
                    foe_dpos=zb, foe_dist=z, foe_idx=zi - 1)

    d = net["lnk_cross_d"].astype(f)              # (LL,KC)
    ll_len = net["drv_len"][L:].astype(f)         # (LL,) slice
    fA = arr["link_fattr"]                        # (LL,K,NA)
    iA = arr["link_iattr"]
    lv = arr["link_veh"]

    # per-link specials (LL-domain gathers, tiny)
    last_slot = gat(arr["last_of"], net["ll_end"])        # (LL,)
    last_fa = gat(fattrs, last_slot)
    last_ia = gat(iattrs, last_slot)
    first_slot = gat(arr["first_of"], net["ll_start"])
    first_fa = gat(fattrs, first_slot)
    first_ia = gat(iattrs, first_slot)
    first_next = gat(veh_next, first_slot)
    start_len = gat(net["drv_len"], net["ll_start"]).astype(f)

    # --- winner selection: candidates stacked along a K2 = k_link + 2 axis
    # [end-lane special, k_link on-link slots, start-lane special]. The chain
    # carries only cheap channels; the 10-channel float bundle is fetched by
    # a one-hot einsum (single MXU matmul, exact: one term each). Everything
    # runs in (KC, LL) layout — LL as the minor dim tiles the VPU lanes
    # (KC ~ 20 would waste >80% of each vector register).
    NA = fA.shape[2]
    K2 = cfg.k_link + 2
    NEG = jnp.asarray(-1e30, f)
    d_t = d.T                                                     # (KC,LL)

    fa_stack = jnp.concatenate(
        [last_fa[:, None, :], fA, first_fa[:, None, :]], axis=1)  # (LL,K2,NA)
    p_stack = jnp.concatenate(
        [(ll_len + last_fa[:, A_DIS])[:, None],
         fA[:, :, A_DIS],
         (-(start_len - first_fa[:, A_DIS]))[:, None]], axis=1)   # (LL,K2)
    v_stack = jnp.concatenate(
        [last_slot[:, None], lv, first_slot[:, None]], axis=1)
    ia_stack = jnp.concatenate(
        [last_ia[:, None, :], iA, first_ia[:, None, :]], axis=1)

    l_drv = L + jnp.arange(LL, dtype=jnp.int32)
    # per-candidate eligibility (engine.cpp:330-369), evaluated lazily per k
    e_ok = (last_slot >= 0) & (last_fa[:, A_PREV].astype(jnp.int32) == l_drv)
    t_e = ll_len + last_fa[:, A_DIS] - last_fa[:, A_LEN]
    tails = fA[:, :, A_DIS] - fA[:, :, A_LEN]                     # (LL,K)
    s_ok = (first_slot >= 0) & (first_next == l_drv) & ll_avail

    best_p = jnp.full((KC, LL), NEG, f)
    best_k = jnp.zeros((KC, LL), jnp.int32)
    best_v = jnp.full((KC, LL), -1, jnp.int32)
    best_ent = jnp.zeros((KC, LL), jnp.int32)
    best_pri = jnp.zeros((KC, LL), jnp.int32)
    for k in range(K2):
        if k == 0:
            el = e_ok[None, :] & (t_e[None, :] < d_t)
        elif k == K2 - 1:
            el = jnp.broadcast_to(s_ok[None, :], (KC, LL))
        else:
            el = (lv[:, k - 1] >= 0)[None, :] \
                & (tails[:, k - 1][None, :] <= d_t)
        pk = p_stack[:, k][None, :]
        better = el & (pk > best_p)
        best_p = jnp.where(better, pk, best_p)
        best_k = jnp.where(better, k, best_k)
        best_v = jnp.where(better, v_stack[:, k][None, :], best_v)
        best_ent = jnp.where(better, ia_stack[:, k, 0][None, :], best_ent)
        best_pri = jnp.where(better, ia_stack[:, k, 1][None, :], best_pri)
    oh = jax.nn.one_hot(best_k, K2, dtype=f)                      # (KC,LL,K2)
    best_fa = jnp.einsum("clk,lkn->cln", oh, fa_stack)            # (KC,LL,NA)
    best_ia = jnp.stack([best_ent, best_pri], axis=-1)

    ndist = d_t - best_p
    # own-side derived fields (Cross::canPass foe terms, roadnet.cpp:604-660)
    n_exists = best_v >= 0
    n_yield = can_yield(best_fa[..., A_SPEED], best_fa[..., A_MAXNEG],
                        best_fa[..., A_YIELD], best_fa[..., A_LEN], ndist)
    is_turn = net["ll_is_turn"][None, :]
    n_target = jnp.where(is_turn, best_fa[..., A_TURNSPD],
                         best_fa[..., A_MAXSPD])
    n_reach = reach_steps(best_fa[..., A_SPEED], ndist, n_target,
                          best_fa[..., A_UPA], dt)
    n_cleared = ndist + best_fa[..., A_LEN] < 0

    # permute to the FOE side: transpose back to link-major once, then two
    # flat static-index row gathers (floats and ints separately — INT_MAX
    # must not round-trip through f32)
    fpackd = jnp.stack([
        jnp.where(n_exists, 1.0, 0.0).astype(f),
        jnp.where(n_yield, 1.0, 0.0).astype(f),
        jnp.where(n_cleared, 1.0, 0.0).astype(f),
        best_fa[..., A_CYC],
        jnp.where(ndist > 0, 1.0, 0.0).astype(f),
        ndist], axis=-1).swapaxes(0, 1).reshape(LL * KC, 6)
    ipackd = jnp.stack([
        n_reach, best_ent, best_pri, best_v],
        axis=-1).swapaxes(0, 1).reshape(LL * KC, 4)
    pos = net["lnk_cross_foe_pos"].reshape(-1)
    foe = fpackd[pos].reshape(LL, KC, 6)
    ifoe = ipackd[pos].reshape(LL, KC, 4)
    return dict(
        foe_exists=foe[..., 0] > 0, foe_yield=foe[..., 1] > 0,
        foe_cleared=foe[..., 2] > 0, foe_cyc=foe[..., 3] > 0,
        foe_dpos=foe[..., 4] > 0, foe_dist=foe[..., 5].astype(f),
        foe_reach=ifoe[..., 0], foe_ent=ifoe[..., 1],
        foe_pri=ifoe[..., 2], foe_idx=ifoe[..., 3])


def blocker_cycles(cfg: StepConfig, blocker):
    """Deadlock detection along the committed blocker chain (Cross::canPass,
    roadnet.cpp:662-674). The reference runs Floyd's cycle finder from each
    foe; since the blocker graph is functional (<=1 outgoing edge), a walk
    from v either reaches -1 within V steps or is stuck on a cycle — so
    "cycle reachable from v" == "still alive after >=V steps". Computed for
    ALL slots at once by log2(V) pointer-doubling squarings (each one gather)
    — exact for any chain length, unlike a bounded Floyd unroll."""
    V = blocker.shape[0]
    # fast mode caps the walk: blocker chains beyond ~2^k_chase vehicles are
    # deep-gridlock cases where the cap only delays the deadlock release by
    # a step; exact mode walks the full V for strict reference parity
    limit = V if cfg.exact else min(V, 1 << min(cfg.k_chase, 10))
    f = blocker  # f[v] = node after 1 step (-1 absorbing via masked gather)
    steps = 1
    while steps < limit:
        f = jnp.where(f >= 0, gat(f, f), -1)
        steps *= 2
    return f >= 0


def get_action(net, cfg: StepConfig, st: SimState, arr, veh_next, ll_avail,
               notify_foe):
    """Engine::vehicleControl + Vehicle::getNextSpeed for all running
    vehicles (engine.cpp:188-251, vehicle.cpp:308-376)."""
    f = st.dis.dtype
    dt = f.type(cfg.interval)
    p = st.params
    L = cfg.num_lanes
    m = st.running
    speed = st.speed
    max_speed = p[:, P_MAXSPEED]
    veh_len = p[:, P_LEN]

    # --- car following (vehicle.cpp:212-238) ---
    leader = st.leader
    has_leader = leader >= 0
    lp = gat(st.params, leader)
    vL = gat(st.speed, leader)
    v_hard = no_collision_speed(vL, lp[:, P_MAXNEGACC], speed,
                                p[:, P_MAXNEGACC], st.gap, dt, f.type(0))
    assume_decel = jnp.where(speed > vL, speed - vL, f.type(0))
    v_soft = no_collision_speed(vL, lp[:, P_USUALNEGACC], speed,
                                p[:, P_USUALNEGACC], st.gap, dt, p[:, P_MINGAP])
    v_headway = ((st.gap + (vL + assume_decel / 2) * dt - speed * dt / 2)
                 / (p[:, P_HEADWAY] + dt / 2))
    v_follow_plain = jnp.minimum(jnp.minimum(v_hard, v_soft), v_headway)
    v_follow_custom = jnp.minimum(st.custom_speed, v_hard)
    v_cf_leader = jnp.where(st.has_custom, v_follow_custom, v_follow_plain)
    v_cf_no_leader = jnp.where(st.has_custom, st.custom_speed, max_speed)
    v_cf = jnp.where(has_leader, v_cf_leader, v_cf_no_leader)

    # --- intersection-related (vehicle.cpp:289-300,337-376) ---
    is_ll = st.drv >= L
    is_lane = ~is_ll & (st.drv >= 0)
    next_is_ll = veh_next >= L
    lane_left = gat(net["drv_len"], st.drv).astype(f) - st.dis
    approach = (max_speed * max_speed / p[:, P_USUALNEGACC] / 2
                + max_speed * dt * 2)
    isr_related = is_ll | (is_lane & next_is_ll & (lane_left <= approach))

    # red-light / blocked-entry branch
    end_lane = gat(net["ll_end"], veh_next - L)
    tail2 = gat(arr["last_of"], end_lane)
    t2a = gat(jnp.stack([st.dis, veh_len, st.speed], axis=-1), tail2)
    can_enter = ((tail2 < 0)
                 | (t2a[:, 0] > t2a[:, 1] + veh_len)
                 | (t2a[:, 2] >= 2))
    next_avail = gat(ll_avail, veh_next - L)
    red = next_is_ll & (~next_avail | ~can_enter)
    min_brake = 0.5 * speed * speed / p[:, P_MAXNEGACC]
    red_stop = red & ~(min_brake > lane_left)
    v_red = jnp.minimum(max_speed, stop_before_speed(
        speed, p[:, P_USUALPOSACC], p[:, P_USUALNEGACC], lane_left, dt))

    v_isr = max_speed
    next_turn = gat(net["ll_is_turn"], veh_next - L) & next_is_ll
    v_isr = jnp.where(next_turn, jnp.minimum(v_isr, p[:, P_TURNSPEED]), v_isr)

    # cross loop over the relevant lanelink's crosses (vehicle.cpp:357-374).
    # TPU layout: everything that depends only on (cross, side) — i.e. on the
    # NOTIFIER of each side — is computed once at C2 = 2*num_crosses
    # granularity, packed into per-link tables with STATIC indices, then read
    # per vehicle with ONE contiguous row gather per field. Only the
    # self-dependent terms (d1, own canYield/reachSteps) are (V, KC) work.
    the_ll = jnp.where(next_is_ll, veh_next - L,
                       jnp.where(is_ll, st.drv - L, -1))
    has_ll = the_ll >= 0
    dls = jnp.where(is_lane, -lane_left, st.dis)
    KC = cfg.k_cross
    C = net["cross_dist"].shape[0]

    # foe tables arrive in link-major layout straight from notify_cross
    lt = notify_foe

    # ---- per-vehicle row gathers ----
    safe_ll = jnp.clip(the_ll, 0, max(net["lnk_cross_d"].shape[0] - 1, 0))
    cvalid = net["lnk_cross_valid"][safe_ll] & has_ll[:, None]   # (V,KC)
    d_onl = net["lnk_cross_d"][safe_ll].astype(f)
    t2 = net["lnk_cross_foetype"][safe_ll]
    t1 = gat(net["ll_type"], the_ll)[:, None]
    has_foe = lt["foe_exists"][safe_ll]
    foe_yield = lt["foe_yield"][safe_ll]
    fr = lt["foe_reach"][safe_ll]
    foe_cleared = lt["foe_cleared"][safe_ll]
    foe_ent = lt["foe_ent"][safe_ll]
    foe_pri = lt["foe_pri"][safe_ll]
    foe_cyc = lt["foe_cyc"][safe_ll]
    foe_dpos = lt["foe_dpos"][safe_ll]
    d2 = lt["foe_dist"][safe_ll]
    foe = lt["foe_idx"][safe_ll]

    # ---- self-dependent terms ----
    d1 = d_onl - dls[:, None]
    self_yield = can_yield(speed[:, None], p[:, P_MAXNEGACC][:, None],
                           p[:, P_YIELD][:, None], veh_len[:, None], d1)
    self_target = jnp.where(gat(net["ll_is_turn"], the_ll),
                            p[:, P_TURNSPEED], max_speed)[:, None]
    sr = reach_steps(speed[:, None], d1, self_target,
                     p[:, P_USUALPOSACC][:, None], dt)
    my_ent = st.enter_ll_time[:, None]
    my_pri = st.priority[:, None]

    # Cross::canPass decision tree (roadnet.cpp:604-660)
    same_rank_y = jnp.where(
        fr > sr, -1, jnp.where(
            fr < sr, 1, jnp.where(
                my_ent == foe_ent,
                jnp.where(d1 == d2,
                          jnp.where(my_pri > foe_pri, -1, 1),
                          jnp.where(d1 < d2, -1, 1)),
                jnp.where(my_ent < foe_ent, -1, 1))))
    t_eq = jnp.where(foe_dpos, same_rank_y, jnp.where(foe_cleared, -1, 1))
    t_lt_pre = jnp.where(foe_dpos,
                         jnp.where(fr > sr, -1, 0),
                         jnp.where(foe_cleared, -1, 0))
    t_lt = jnp.where(t_lt_pre == 0, 1, t_lt_pre)
    y0 = jnp.where(t1 > t2, -1, jnp.where(t1 < t2, t_lt, t_eq))
    y = jnp.where(~foe_yield, 1, y0)
    # deadlock: blocker-chain cycle from foe flips a yield to a pass
    y = jnp.where((y == 1) & foe_cyc, -1, y)
    passes = ~has_foe | ~self_yield | (y == -1)

    considered = cvalid & (d_onl >= dls[:, None])
    fail = considered & ~passes
    any_fail = jnp.any(fail, axis=1)
    first_fail = jnp.argmax(fail, axis=1)
    rowi = jnp.arange(fail.shape[0])
    ff_d = d_onl[rowi, first_fail]
    ff_foe = foe[rowi, first_fail]
    v_stop_cross = stop_before_speed(
        speed, p[:, P_USUALPOSACC], p[:, P_USUALNEGACC],
        ff_d - dls - p[:, P_YIELD], dt)
    v_isr = jnp.where(any_fail, jnp.minimum(v_isr, v_stop_cross), v_isr)
    new_blocker = jnp.where(m & isr_related & ~red_stop & any_fail, ff_foe, -1)

    # red branch returns early: skips turn cap and cross loop (vehicle.cpp:343-352)
    v_isr_final = jnp.where(red_stop, v_red, v_isr)

    # --- assemble getNextSpeed min-chain (vehicle.cpp:308-335) ---
    v = max_speed
    v = jnp.minimum(v, speed + p[:, P_MAXPOSACC] * dt)
    v = jnp.minimum(v, gat(net["drv_max_speed"], st.drv).astype(f))
    v = jnp.minimum(v, v_cf)
    v = jnp.where(isr_related, jnp.minimum(v, v_isr_final), v)
    if cfg.lane_change:
        # laneChange->yieldSpeed (lanechange.cpp:186-206); 100 == no-op
        from cityflow_tpu.core import lanechange as lc_mod
        v = jnp.minimum(v, lc_mod.yield_speed(net, cfg, st))
    # (without laneChange no signal is ever received -> yieldSpeed == 100)
    # invalid-lane stop (vehicle.cpp:325-328)
    invalid = (veh_next < 0) & ~on_last_road(net, cfg, st.route, st.route_pos)
    v_inv = no_collision_speed(f.type(0), f.type(1), speed, p[:, P_MAXNEGACC],
                               lane_left, dt, p[:, P_MINGAP])
    v = jnp.where(invalid, jnp.minimum(v, v_inv), v)
    v = jnp.maximum(v, speed - p[:, P_MAXNEGACC] * dt)

    if cfg.lane_change:
        # real+shadow move in lockstep: min of both next speeds
        # (engine.cpp:195-205); symmetric, so computed for both members
        paired = st.partner >= 0
        v = jnp.where(paired & m, jnp.minimum(v, gat(v, st.partner)), v)

    # --- kinematics (engine.cpp:212-221) ---
    neg = v < 0
    delta_dis = jnp.where(neg, 0.5 * speed * speed / p[:, P_MAXNEGACC],
                          (speed + v) * dt / 2)
    new_speed = jnp.where(neg, f.type(0), v)

    # --- setDeltaDistance hop walk (vehicle.cpp:49-68) ---
    d = st.dis + delta_dis
    cur = st.drv
    pos = st.route_pos
    end = jnp.zeros_like(m)
    for _ in range(cfg.k_hop):
        go = m & (cur >= 0) & (d > gat(net["drv_len"], cur).astype(f))
        nd, npos = chain_step(net, cfg, st.route, pos, cur)
        hit_end = go & (nd < 0)
        end = end | hit_end
        d = jnp.where(go, d - gat(net["drv_len"], cur).astype(f), d)
        cur = jnp.where(go, nd, cur)
        pos = jnp.where(go, npos, pos)
    ov_hop = jnp.any(m & (cur >= 0) & (d > gat(net["drv_len"], cur).astype(f)))
    changed = m & (cur != st.drv)

    buf = dict(dis=jnp.where(m, d, st.dis),
               speed=jnp.where(m, new_speed, st.speed),
               drv=cur, route_pos=pos, changed=changed,
               end=end, blocker=new_blocker)

    if cfg.lane_change:
        # shadow about to leave its lane -> abort (engine.cpp:223-226);
        # abort wins over a same-step finish (reference order is pointer-
        # dependent; we pick the safe deterministic resolution)
        abort = m & st.is_shadow & changed & (st.partner >= 0)
        # changing real: integrate lateral offset (engine.cpp:228-243)
        chg = m & st.lc_changing & ~st.is_shadow & (st.partner >= 0)
        dirn = st.lc_dir.astype(f)
        new_off = jnp.abs(st.offset + jnp.maximum(
            f.type(0.2) * new_speed, f.type(1)) * dt * dirn)
        cur_w = gat(net["lane_width"], st.drv).astype(f)
        tgt_w = gat(net["lane_width"], st.lc_target).astype(f)
        max_off = (tgt_w + cur_w) / 2
        new_off = jnp.minimum(new_off, max_off)
        finish = chg & (new_off >= max_off) & ~gat(abort, st.partner)
        buf["offset"] = jnp.where(chg, new_off * dirn, st.offset)
        buf["finish"] = finish
        buf["abort"] = abort
        # abort-ended shadows are removed this step (vehicle.cpp:412-416)
        buf["end"] = buf["end"] | abort | finish
    return buf, ov_hop


def update_location(net, cfg: StepConfig, st: SimState, arr, buf):
    """Engine::threadUpdateLocation + main-stage push (engine.cpp:282-315,
    477-494): removals (finish stats in drivable-list order) and transfers
    (pushBuffer sorted by new distance desc)."""
    f = st.dis.dtype
    m = st.running
    removed = m & buf["end"]

    # finish stats, summed in (drivable, list-rank) order for exact parity
    # with the single-thread reference accumulation (engine.cpp:296-303).
    # Vehicles whose lane change finished are identity-swap removals and do
    # not count (engine.cpp:299-303 hasFinished guard).
    counted = removed
    if cfg.lane_change:
        lc_fin = st.lc_finished | buf.get("finish", jnp.zeros_like(m))
        counted = removed & ~lc_fin
    now = st.step.astype(f) * f.type(cfg.interval)
    tt = now - st.enter_time
    if cfg.exact:
        rm_sorted = counted[arr["sorted_idx"]]
        pos = jnp.nonzero(rm_sorted, size=cfg.max_remove, fill_value=-1)[0]
        vals = jnp.where(pos >= 0, tt[arr["sorted_idx"]][jnp.clip(pos, 0)], f.type(0))
        total = jax.lax.fori_loop(
            0, cfg.max_remove, lambda i, acc: acc + vals[i], f.type(0))
        ov_rm = jnp.sum(counted) > cfg.max_remove
    else:
        total = jnp.sum(jnp.where(counted, tt, f.type(0)))
        ov_rm = jnp.array(False)
    n_rm = jnp.sum(counted).astype(jnp.int32)

    # transfers: assign new list order by buffered-distance desc (engine.cpp:480)
    trans = m & buf["changed"] & ~removed
    neg_dis = jnp.where(trans, -buf["dis"], jnp.inf)
    order = jnp.argsort(neg_dis, stable=True)  # ties: uid-stable fallback
    rank = jnp.zeros_like(st.list_seq).at[order].set(
        jnp.arange(cfg.max_vehicles, dtype=jnp.int32))
    new_seq = jnp.where(trans, st.seq_counter + rank, st.list_seq)
    n_trans = jnp.sum(trans).astype(jnp.int32)

    # enterLaneLinkTime on push (engine.cpp:484-491)
    to_ll = buf["drv"] >= cfg.num_lanes
    new_ent = jnp.where(trans,
                        jnp.where(to_ll, st.step, INT_MAX),
                        st.enter_ll_time).astype(jnp.int32)

    st = st.replace_fields(
        finished_cnt=st.finished_cnt + n_rm,
        cum_travel=st.cum_travel + total,
        list_seq=new_seq, enter_ll_time=new_ent,
        seq_counter=st.seq_counter + n_trans,
        overflow=st.overflow | jnp.where(ov_rm, OV_REMOVE, 0).astype(jnp.int32))
    return st, removed


def commit(net, cfg: StepConfig, st: SimState, buf, removed):
    """Vehicle::update (vehicle.cpp:107-143) for survivors; removed slots
    are freed (engine.cpp:296-310)."""
    m = st.running & ~removed
    changed = buf["changed"] & m
    st = st.replace_fields(
        dis=jnp.where(m, buf["dis"], st.dis),
        speed=jnp.where(m, buf["speed"], st.speed),
        prev_drv=jnp.where(changed, st.drv, st.prev_drv),
        drv=jnp.where(changed, buf["drv"], jnp.where(removed, -1, st.drv)),
        route_pos=jnp.where(changed, buf["route_pos"], st.route_pos),
        blocker=jnp.where(m, buf["blocker"], -1),
        has_custom=jnp.zeros_like(st.has_custom),
        active=st.active & ~removed,
        running=m,
    )
    # clear blockers pointing at vehicles removed this step (engine.cpp:419-421)
    bl_removed = gat(removed, st.blocker) & (st.blocker >= 0)
    st = st.replace_fields(blocker=jnp.where(bl_removed, -1, st.blocker))

    if cfg.lane_change:
        st = lc_commit(cfg, st, buf, removed)
    return st


def lc_commit(cfg: StepConfig, st: SimState, buf, removed):
    """Lane-change epilogue of Vehicle::update / finishChanging /
    abortChanging (lanechange.cpp:115-148, vehicle.cpp:378-381,412-416)."""
    V = cfg.max_vehicles
    f = st.dis.dtype
    finish = buf.get("finish", jnp.zeros(V, bool))
    # promote the shadow of every finishing real: it takes over the identity
    shadow = jnp.where(finish, st.partner, V)
    real_uid = jnp.where(finish, st.uid, -1)
    uid = st.uid.at[shadow].set(real_uid, mode="drop")
    promote = jnp.zeros(V, bool).at[shadow].set(finish, mode="drop")
    # unlink pairs whose partner was removed this step (finish, abort, or
    # route end); a changing real whose shadow died reverts (abortChanging)
    partner_dead = (st.partner >= 0) & gat(removed, st.partner)
    st = st.replace_fields(
        uid=uid,
        is_shadow=jnp.where(promote | partner_dead, False, st.is_shadow),
        partner=jnp.where(promote | partner_dead | removed, -1, st.partner),
        offset=buf["offset"] if "offset" in buf else st.offset,
        lc_changing=jnp.where(partner_dead | removed, False, st.lc_changing),
        lc_finished=st.lc_finished | finish,
    )
    st = st.replace_fields(
        offset=jnp.where(partner_dead | removed | promote, f.type(0),
                         st.offset))
    # clearSignal (lanechange.cpp:129-137): lastDir = direction; signals are
    # per-step (re-made next step); changing vehicles keep target via state
    st = st.replace_fields(
        lc_last_dir=jnp.where(st.running, st.lc_dir, st.lc_last_dir),
        lc_recv=jnp.full(V, -1, jnp.int32),
        lc_has_signal=jnp.where(st.lc_changing, st.lc_has_signal,
                                jnp.zeros(V, bool)),
        lc_target=jnp.where(st.lc_changing, st.lc_target, -1))
    return st


def update_leader_and_gap(net, cfg: StepConfig, st: SimState,
                          fattrs=None, iattrs=None):
    """Engine::threadUpdateLeaderAndGap (engine.cpp:429-442)."""
    arr = arrangement(net, cfg, st.running, st.drv, st.dis,
                      st.list_seq, st.params[:, P_LEN],
                      fattrs=fattrs, iattrs=iattrs)
    in_leader = arr["leader"]
    has_in = in_leader >= 0
    ila = gat(jnp.stack([st.dis, st.params[:, P_LEN]], axis=-1), in_leader)
    gap_in = ila[:, 0] - ila[:, 1] - st.dis
    need_scan = st.running & ~has_in
    sl, sg = leader_scan(net, cfg, st, arr, need_scan)
    leader = jnp.where(st.running, jnp.where(has_in, in_leader, sl), -1)
    # when the scan finds NO leader the reference leaves controllerInfo.gap
    # untouched (vehicle.cpp:162-196 returns without writing) — the stale
    # value feeds SimpleLaneChange::makeSignal's gap gating
    gap = jnp.where(st.running,
                    jnp.where(has_in, gap_in,
                              jnp.where(sl >= 0, sg, st.gap)), st.gap)
    st = st.replace_fields(leader=leader, gap=gap, last_of_drv=arr["last_of"])
    if cfg.track_history:
        st = update_history(cfg, st)
    return st, arr


def update_history(cfg: StepConfig, st: SimState):
    """Lane::updateHistory (roadnet.cpp:900-915): 240-step rolling window of
    per-step (vehicleNum, speedSum) per lane, feeding RouterType::DURATION
    road costs (roadnet.cpp:719-734). Runs on every threadUpdateLeaderAndGap
    call, exactly like the reference (twice per step with laneChange on).
    We keep speed SUMS where the reference keeps (num, avg) pairs — equal up
    to one extra rounding per entry; sums are unordered (documented delta)."""
    f = st.dis.dtype
    L = cfg.num_lanes
    HL1 = cfg.history_len + 1
    on_lane = st.running & (st.drv < L) & (st.drv >= 0)
    lane = jnp.where(on_lane, st.drv, L)
    cur_num = jnp.zeros(L + 1, f).at[lane].add(
        jnp.where(on_lane, f.type(1), f.type(0)))[:L]
    cur_ssum = jnp.zeros(L + 1, f).at[lane].add(
        jnp.where(on_lane, st.speed, f.type(0)))[:L]
    slot = st.hist_t % HL1
    full = st.hist_t >= HL1
    old_num = jax.lax.dynamic_slice_in_dim(st.hist_ring_num, slot, 1)[0]
    old_ssum = jax.lax.dynamic_slice_in_dim(st.hist_ring_ssum, slot, 1)[0]
    old_num = jnp.where(full, old_num, f.type(0))
    old_ssum = jnp.where(full, old_ssum, f.type(0))
    return st.replace_fields(
        hist_num=st.hist_num - old_num + cur_num,
        hist_ssum=st.hist_ssum - old_ssum + cur_ssum,
        hist_ring_num=jax.lax.dynamic_update_slice_in_dim(
            st.hist_ring_num, cur_num[None], slot, 0),
        hist_ring_ssum=jax.lax.dynamic_update_slice_in_dim(
            st.hist_ring_ssum, cur_ssum[None], slot, 0),
        hist_t=st.hist_t + 1)


def pass_time(net, cfg: StepConfig, st: SimState):
    """TrafficLight::passTime (trafficlight.cpp:29-37), fixed-time mode."""
    f = st.phase_remain.dtype
    n = net["n_phases"]
    has = (n > 0) & ~net["inter_virtual"]
    remain = jnp.where(has, st.phase_remain - f.type(cfg.interval), st.phase_remain)
    phase = st.phase
    for _ in range(cfg.k_phase):
        go = has & (remain <= 0)
        nxt = jnp.where(go, (phase + 1) % jnp.maximum(n, 1), phase)
        t = gat(net["phase_time"], net["phase_offset"] + nxt).astype(f)
        remain = jnp.where(go, remain + t, remain)
        phase = nxt
    return st.replace_fields(phase=phase, phase_remain=remain)


# ---------------------------------------------------------------------------
# the step
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnums=(1,))
def step(net: Dict[str, Any], cfg: StepConfig, st: SimState, spawn_tbl):
    """One Engine::nextStep (engine.cpp:566-594), laneChange disabled."""
    # Flow::nextStep + planRoute (host-precomputed RNG replay)
    st = spawn_vehicles(net, cfg, st, spawn_tbl)

    # handleWaiting (uses end-of-previous-step arrangement for lane tails)
    arr_prev = dict(last_of=st.last_of_drv)
    st, arr, fattrs, iattrs = admit_waiting(net, cfg, st, arr_prev)

    if cfg.lane_change:
        # initSegments + planLaneChange + scheduleLaneChange
        # (engine.cpp:571-575), then a full leader/gap recompute because
        # shadow insertion changed the lists (engine.cpp:574)
        from cityflow_tpu.core import lanechange as lc_mod
        st = lc_mod.plan_lane_change(net, cfg, st, arr)
        cyc = blocker_cycles(cfg, st.blocker)
        fattrs, iattrs = build_attr_packs(cfg, st, cyc)
        st, arr = update_leader_and_gap(net, cfg, st, fattrs, iattrs)

    # notifyCross
    ll_avail = lanelink_available(net, cfg, st)
    veh_next, _ = chain_step(net, cfg, st.route, st.route_pos, st.drv)
    notify_foe = notify_cross(net, cfg, st, arr, veh_next, ll_avail,
                              fattrs, iattrs)

    # getAction
    buf, ov_hop = get_action(net, cfg, st, arr, veh_next, ll_avail,
                             notify_foe)

    # updateLocation / updateAction
    st, removed = update_location(net, cfg, st, arr, buf)
    st = commit(net, cfg, st, buf, removed)

    # updateLeaderAndGap
    st, _arr2 = update_leader_and_gap(net, cfg, st)

    # traffic lights
    if not cfg.rl_traffic_light:
        st = pass_time(net, cfg, st)

    ov = jnp.where(ov_hop, OV_HOPS, 0) | jnp.where(
        arr["overflow_link"], OV_LINK_TABLE, 0)
    st = st.replace_fields(step=st.step + 1,
                           overflow=st.overflow | ov.astype(jnp.int32))
    return st


# ---------------------------------------------------------------------------
# phase-split step: three separately-jitted sub-programs. Identical semantics
# to step(); used for very large nets where one monolithic program exceeds
# practical XLA compile budgets — each part compiles (and persists in the
# compilation cache) independently.
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnums=(1,))
def step_part1(net, cfg: StepConfig, st: SimState, spawn_tbl):
    st = spawn_vehicles(net, cfg, st, spawn_tbl)
    arr_prev = dict(last_of=st.last_of_drv)
    st, arr, fattrs, iattrs = admit_waiting(net, cfg, st, arr_prev)
    if cfg.lane_change:
        from cityflow_tpu.core import lanechange as lc_mod
        st = lc_mod.plan_lane_change(net, cfg, st, arr)
        cyc = blocker_cycles(cfg, st.blocker)
        fattrs, iattrs = build_attr_packs(cfg, st, cyc)
        st, arr = update_leader_and_gap(net, cfg, st, fattrs, iattrs)
    return st, arr, fattrs, iattrs


@partial(jax.jit, static_argnums=(1,))
def step_part2(net, cfg: StepConfig, st: SimState, arr, fattrs, iattrs):
    ll_avail = lanelink_available(net, cfg, st)
    veh_next, _ = chain_step(net, cfg, st.route, st.route_pos, st.drv)
    notify_foe = notify_cross(net, cfg, st, arr, veh_next, ll_avail,
                              fattrs, iattrs)
    buf, ov_hop = get_action(net, cfg, st, arr, veh_next, ll_avail,
                             notify_foe)
    return buf, ov_hop


@partial(jax.jit, static_argnums=(1,))
def step_part2a(net, cfg: StepConfig, st: SimState, arr, fattrs, iattrs):
    ll_avail = lanelink_available(net, cfg, st)
    veh_next, _ = chain_step(net, cfg, st.route, st.route_pos, st.drv)
    notify_foe = notify_cross(net, cfg, st, arr, veh_next, ll_avail,
                              fattrs, iattrs)
    return ll_avail, veh_next, notify_foe


@partial(jax.jit, static_argnums=(1,))
def step_part2b(net, cfg: StepConfig, st: SimState, arr, ll_avail, veh_next,
                notify_foe):
    return get_action(net, cfg, st, arr, veh_next, ll_avail, notify_foe)


@partial(jax.jit, static_argnums=(1,))
def step_part3(net, cfg: StepConfig, st: SimState, arr, buf, ov_hop):
    st, removed = update_location(net, cfg, st, arr, buf)
    st = commit(net, cfg, st, buf, removed)
    st, _arr2 = update_leader_and_gap(net, cfg, st)
    if not cfg.rl_traffic_light:
        st = pass_time(net, cfg, st)
    ov = jnp.where(ov_hop, OV_HOPS, 0) | jnp.where(
        arr["overflow_link"], OV_LINK_TABLE, 0)
    return st.replace_fields(step=st.step + 1,
                             overflow=st.overflow | ov.astype(jnp.int32))


def step_split(net, cfg: StepConfig, st: SimState, spawn_tbl):
    """step() as three jit calls (see above)."""
    st, arr, fattrs, iattrs = step_part1(net, cfg, st, spawn_tbl)
    buf, ov_hop = step_part2(net, cfg, st, arr, fattrs, iattrs)
    return step_part3(net, cfg, st, arr, buf, ov_hop)
