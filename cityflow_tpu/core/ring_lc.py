"""Lane change in the gen-2 ring layout.

The reference's signal/shadow protocol (src/vehicle/lanechange.{h,cpp},
engine.cpp:792-820) re-expressed over per-lane ring slots, mirroring the
vectorized semantics of the gen-1 port (core/lanechange.py — the same
documented divergence applies: Jacobi arbitration instead of the
reference's std::set pointer order, deterministic shadow priorities
instead of mid-step RNG draws; laneChange:false runs stay bit-exact).

Layout mapping:
  * neighbor queries (Lane::getVehicleAfter/BeforeDistance,
    roadnet.cpp:877-898) become rank counts between a lane ring and its
    inner/outer neighbor ring: rings are distance-descending, so the
    "leader" of distance d is slot cnt-1 where cnt = #{slots with dis >=
    d}, and the "follower" is slot cnt — per-slot loops over the
    (static-permutation) neighbor columns, no sorts and no dynamic
    gathers;
  * shadow insertion (LaneChange::insertShadow, lanechange.cpp:71-102)
    is a rank-preserving ring insert (shift-down above the insertion
    rank), bounded at cfg.LCI inserts per lane per step
    (overflow-flagged);
  * route lookups for the target lane ride per-vehicle ROW bundles
    (l_rnrow / l_auxrow = the route-next and two-hop-aux table rows of
    the vehicle's current (route, rpos)), filled at admission and at the
    compacted link->lane transfer — a lane's neighbor column is a static
    llocal+-1 one-hot over MAXLPR, so reachability and the shadow's
    next-link need no per-vehicle table gathers (the TPU cost model
    forbids dense dynamic gathers, docs/design.md);
  * the stale-gap semantics of Vehicle::updateLeaderAndGap
    (vehicle.cpp:157-196 leaves controllerInfo.gap untouched when the
    bounded scan finds no leader; SimpleLaneChange::makeSignal gates on
    that value) are carried in explicit l_gap / k_gap channels refreshed
    here each step, exactly like gen-1's update_leader_and_gap.

Pairing: real and shadow share the uid; the shadow's l_sh flag is set and
both carry l_dir (the change direction), so each side finds its partner
in the statically-known inner/outer neighbor column by uid match — no
slot pointers that ring shifts would invalidate.
"""

import jax.numpy as jnp

COOLING_TIME = 3.0      # lanechange.h:43; lastChangeTime is never written
                        # after construction (reference finishChanging sets
                        # it on the DYING real's object only), so the
                        # cooldown reduces to now >= COOLING_TIME — same
                        # reduction as gen-1 (lc_last_t is always 0)

SHBIT = 1 << 30         # shadow priority offset (gen-1 lanechange.py:248)


def _perm(net, cfg, rows, which):
    """Static lane-axis permutation to the inner/outer neighbor column
    via the shift-decomposition plan; rows (LNp, CH) -> (LNp, CH) where
    row p holds the neighbor lane's values (0 when no neighbor)."""
    from cityflow_tpu.core.ring import _shifted_exchange
    if which == "inner":
        out = _shifted_exchange(rows, cfg.LNp, cfg.inn_shifts,
                                net["inn_gid"], net["inn_res_j"],
                                net["inn_res_src"])
        valid = net["ln_inner"] >= 0
    else:
        out = _shifted_exchange(rows, cfg.LNp, cfg.out_shifts,
                                net["out_gid"], net["out_res_j"],
                                net["out_res_src"])
        valid = net["ln_outer"] >= 0
    return jnp.where(valid[:, None], out, 0.0), valid


def perm_channels(net, cfg, chans, which):
    """[(SL, LNp) or (LNp,)] channels -> stacked permuted (C, SL, LNp)
    (1-row channels come back as (1, LNp))."""
    f = jnp.float32
    shaped = [c[None, :] if c.ndim == 1 else c for c in chans]
    sls = [c.shape[0] for c in shaped]
    rows = jnp.concatenate([c.astype(f) for c in shaped], axis=0)
    out, valid = _perm(net, cfg, rows.T, which)
    out = out.T
    res = []
    o = 0
    for n in sls:
        res.append(out[o:o + n])
        o += n
    return res, valid


def _sel_llocal(net, row_bundle, delta):
    """Select the (llocal + delta) column of a (MAXLPR, SL, LNp) row
    bundle — llocal is static per lane column, so this is a static
    one-hot select over MAXLPR."""
    MAXLPR = row_bundle.shape[0]
    llocal = net["ln_llocal"]
    out = jnp.full_like(row_bundle[0], -1)
    for c in range(MAXLPR):
        out = jnp.where((llocal + delta == c)[None, :], row_bundle[c], out)
    return out


def refresh_gaps(net, cfg, rs, fx):
    """End-of-previous-step Vehicle::updateLeaderAndGap values
    (engine.cpp:581; gen-1 update_leader_and_gap): fresh gap where a
    leader exists within the scan bound, previous (stale) value
    otherwise. fx = the link-domain front context from
    ring.lc_front_ctx. Non-uniform templates: the LEADER's len and MY
    maxSpeed/usualNegAcc come from per-slot _PP params (the uniform path
    folds to the same scalar constants, bit-pinned)."""
    from cityflow_tpu.core.ring import _PP
    f = jnp.float32
    LNp, LKp = cfg.LNp, cfg.LKp
    if cfg.uniform:
        p_len = cfg.params[1]
        lead_len = p_len                 # scalar: any leader's len
        klead_len = p_len
        etl0 = p_len                     # hop-2 end-lane tail's len
        k_etl = p_len
        p_una, p_maxspd = cfg.params[6], cfg.params[8]
        bound = (p_maxspd * p_maxspd / p_una / 2
                 + p_maxspd * cfg.interval * 2)
    else:
        pp_l = _PP(cfg, net, rs.l_tpl)
        pp_k = _PP(cfg, net, rs.k_tpl)
        len_l, len_k = pp_l[1], pp_k[1]
        # leader of slot s is slot s-1: shift each ring down one slot
        lead_len = jnp.concatenate(
            [jnp.zeros((1, LNp), f), len_l[:-1]], axis=0)
        klead_len = jnp.concatenate(
            [jnp.zeros((1, LKp), f), len_k[:-1]], axis=0)
        etl0 = fx["etl"]
        k_etl = fx["k_etl"]
        ms0, una0 = pp_l[8][0], pp_l[6][0]      # front-row SELF params
        bound = ms0 * ms0 / una0 / 2 + ms0 * cfg.interval * 2

    # lanes: slots > 0 always have the slot above as leader
    lead_dis = jnp.concatenate(
        [jnp.full((1, LNp), 1e9, f), rs.l_dis[:-1]], axis=0)
    fresh_mid = lead_dis - lead_len - rs.l_dis
    lane_left0 = net["ln_len"] - rs.l_dis[0]
    # fronts: hop-1 candidates = ALL out-link ring tails of my lane (the
    # vehicle.cpp:170-180 overlap rule; any tail => leader, strict-min);
    # hop-2 = my next link's end-lane tail, only within the scan bound
    has_next = rs.l_nxt[0] >= 0
    fresh1 = has_next & fx["best_ex"]
    g1 = lane_left0 + fx["best_val"]
    fresh2 = has_next & ~fx["best_ex"] & fx["ete"] \
        & (lane_left0 + fx["nlen"] <= bound)
    g2 = lane_left0 + fx["nlen"] + fx["etd"] - etl0
    gap0 = jnp.where(fresh1, g1, jnp.where(fresh2, g2, rs.l_gap[0]))
    new_l_gap = jnp.concatenate([gap0[None], fresh_mid[1:]], axis=0)

    # links: slots > 0 fresh; front fresh iff the end-lane tail exists
    klead = jnp.concatenate(
        [jnp.full((1, LKp), 1e9, f), rs.k_dis[:-1]], axis=0)
    kfresh = klead - klead_len - rs.k_dis
    kgap0 = jnp.where(fx["k_ete"],
                      (net["lk_len"] - rs.k_dis[0]) + fx["k_etd"] - k_etl,
                      rs.k_gap[0])
    new_k_gap = jnp.concatenate([kgap0[None], kfresh[1:]], axis=0)
    return rs.replace_fields(l_gap=new_l_gap, k_gap=new_k_gap)


def lc_phase(net, cfg, rs, fx):
    """planLaneChange + scheduleLaneChange (engine.cpp:571-575, 792-820):
    make signals, exchange them, arbitrate, insert shadows. Returns
    (rs_with_shadows, ov_bits); the per-slot yieldSpeed array rides in
    rs.l_yv (100 = no-op), already remapped through the insertions so
    slot indices stay aligned for the movement phase."""
    f = jnp.float32
    i32 = jnp.int32
    dt = cfg.dt
    SL, LNp = cfg.SL, cfg.LNp
    from cityflow_tpu.core.ring import (
        no_collision_speed, _hilo, _from_hilo, _pri_gt, _PP)
    # SELF params per slot (vehicle.h:31-45): scalar constants on the
    # uniform path (bit-pinned), per-slot _PP arrays on the mixed path
    pp_s = _PP(cfg, net, None if cfg.uniform else rs.l_tpl)
    len_s, neg_s, spd_s = pp_s[1], pp_s[4], pp_s[8]

    # NOTE: refresh_gaps already ran on the PRE-admission state (the
    # reference computes gaps in the END-of-previous-step
    # updateLeaderAndGap, before this step's spawns exist); admitted
    # vehicles carry their handleWaiting-time gap instead.

    sl_iota = jnp.arange(SL, dtype=i32)[:, None]
    occ = sl_iota < rs.n_l[None, :]
    now = rs.step.astype(f) * dt
    sh = rs.l_sh
    chg = rs.l_chg
    dis = rs.l_dis
    speed = rs.l_speed
    lane_left = net["ln_len"][None, :] - dis

    # ---- neighbor rings (both directions) -------------------------------
    nb = {}
    for d, which in ((1, "outer"), (-1, "inner")):
        nb_ch = [dis, speed, occ.astype(f), rs.n_l.astype(f)]
        if not cfg.uniform:
            nb_ch += [len_s, neg_s]        # LEADER len / FOLLOWER negAcc
        perm, valid = perm_channels(net, cfg, nb_ch, which)
        nb_dis, nb_spd, nb_occf, nb_nf = perm[:4]
        nb_occ = (nb_occf > 0.5) & valid[None, :]
        nb_n = nb_nf[0].astype(i32)
        # cnt = #{t: nb_dis[t] >= my dis}  (AfterDistance >=,
        # roadnet.cpp:889-897; rings are distance-descending)
        cnt = jnp.zeros((SL, LNp), i32)
        for t in range(SL):
            cnt = cnt + (nb_occ[t][None, :]
                         & (nb_dis[t][None, :] >= dis)).astype(i32)
        lead_ex = cnt > 0
        foll_ex = cnt < jnp.where(valid, nb_n, 0)[None, :]
        lead_dis = jnp.zeros((SL, LNp), f)
        foll_dis = jnp.zeros((SL, LNp), f)
        foll_spd = jnp.zeros((SL, LNp), f)
        lead_len = jnp.zeros((SL, LNp), f) if not cfg.uniform else None
        foll_neg = jnp.zeros((SL, LNp), f) if not cfg.uniform else None
        for t in range(SL):
            oh_l = cnt == (t + 1)       # leader slot = cnt - 1
            oh_f = cnt == t             # follower slot = cnt
            lead_dis = jnp.where(oh_l, nb_dis[t][None, :], lead_dis)
            foll_dis = jnp.where(oh_f & foll_ex, nb_dis[t][None, :],
                                 foll_dis)
            foll_spd = jnp.where(oh_f & foll_ex, nb_spd[t][None, :],
                                 foll_spd)
            if not cfg.uniform:
                lead_len = jnp.where(oh_l, perm[4][t][None, :], lead_len)
                foll_neg = jnp.where(oh_f & foll_ex, perm[5][t][None, :],
                                     foll_neg)
        nb[d] = dict(valid=valid, cnt=cnt, lead_ex=lead_ex, foll_ex=foll_ex,
                     lead_dis=lead_dis, foll_dis=foll_dis, foll_spd=foll_spd,
                     lead_len=lead_len, foll_neg=foll_neg)

    # ---- SimpleLaneChange::makeSignal (lanechange.cpp:151-184) ----------
    mk = occ & ~sh & ~chg & (now >= COOLING_TIME)
    has_signal = mk | (occ & ~sh & chg)
    cur_est = rs.l_gap
    expected = 2 * len_s + 4 * cfg.interval * spd_s
    want = mk & (lane_left >= 30) & ~(cur_est > expected) \
        & ~(cur_est < 1.5 * len_s)

    nxt_out = _sel_llocal(net, rs.l_rnrow, +1)
    nxt_in = _sel_llocal(net, rs.l_rnrow, -1)
    reach_out = rs.l_last | (nxt_out >= 0)
    reach_in = rs.l_last | (nxt_in >= 0)
    (ln_len_out,), _ = perm_channels(net, cfg, [net["ln_len"]], "outer")
    (ln_len_in,), _ = perm_channels(net, cfg, [net["ln_len"]], "inner")

    def estimate(d, nb_len):
        # estimateGap (lanechange.cpp:215-220): the LEADER's len
        e = nb[d]
        l_len = len_s if cfg.uniform else e["lead_len"]
        return jnp.where(e["lead_ex"], e["lead_dis"] - dis - l_len,
                         nb_len - dis)

    outer_ok = want & nb[1]["valid"][None, :] & reach_out
    outer_est = jnp.where(outer_ok, estimate(1, ln_len_out), f(0))
    dir_new = jnp.where(outer_ok & (outer_est > cur_est + len_s),
                        i32(1), i32(0))
    inner_ok = want & nb[-1]["valid"][None, :] & reach_in
    inner_est = estimate(-1, ln_len_in)
    take_inner = inner_ok & (inner_est > cur_est + len_s) \
        & (inner_est > outer_est)
    dir_new = jnp.where(take_inner, i32(-1), dir_new)

    dirc = jnp.where(chg, rs.l_dir, dir_new)
    plan = occ & ~sh & ((has_signal & (dirc != 0)) | chg)

    # ---- updateLeaderAndFollower (lanechange.cpp:27-60) -----------------
    def dsel(a, b):        # dirc==+1 -> a (outer), else b (inner)
        return jnp.where(dirc > 0, a, b)

    tl_ex = dsel(nb[1]["lead_ex"], nb[-1]["lead_ex"])
    tl_dis = dsel(nb[1]["lead_dis"], nb[-1]["lead_dis"])
    tf_ex = dsel(nb[1]["foll_ex"], nb[-1]["foll_ex"])
    tf_dis = dsel(nb[1]["foll_dis"], nb[-1]["foll_dis"])
    tf_spd = dsel(nb[1]["foll_spd"], nb[-1]["foll_spd"])
    tl_slot = dsel(nb[1]["cnt"], nb[-1]["cnt"]) - 1
    tf_slot = tl_slot + 1
    tl_len = len_s if cfg.uniform \
        else dsel(nb[1]["lead_len"], nb[-1]["lead_len"])
    tf_neg = neg_s if cfg.uniform \
        else dsel(nb[1]["foll_neg"], nb[-1]["foll_neg"])

    rest = lane_left
    lgap = jnp.where(tl_ex, tl_dis - dis - tl_len, rest)
    # no on-lane leader: scan the TARGET lane's out-link ring tails in
    # laneLinks order (running strict-min; "hit" when the min candidate
    # overlaps back into the lane) — lanechange.cpp:33-47
    olt_ch = [fx["olt_dis"][k] for k in range(cfg.KOUT)] \
        + [fx["olt_ex"][k].astype(f) for k in range(cfg.KOUT)]
    if not cfg.uniform:
        olt_ch += [fx["olt_len"][k] for k in range(cfg.KOUT)]
    olt_o, _ = perm_channels(net, cfg, olt_ch, "outer")
    olt_i, _ = perm_channels(net, cfg, olt_ch, "inner")
    no_tl = ~tl_ex
    best_gap = jnp.full((SL, LNp), jnp.inf, f)
    for k in range(cfg.KOUT):
        c_dis = dsel(olt_o[k], olt_i[k])
        c_ex = dsel(olt_o[cfg.KOUT + k], olt_i[cfg.KOUT + k]) > 0.5
        c_len = len_s if cfg.uniform \
            else dsel(olt_o[2 * cfg.KOUT + k], olt_i[2 * cfg.KOUT + k])
        cgap = c_dis + rest
        better = no_tl & c_ex & (cgap < best_gap)
        hit = better & (cgap < c_len)
        lgap = jnp.where(hit, rest - (c_len - cgap), lgap)
        best_gap = jnp.where(better, cgap, best_gap)
    fgap = jnp.where(tf_ex, dis - tf_dis - len_s, jnp.asarray(jnp.inf, f))

    # gap validity (lanechange.h:80): leader/follower brake distances
    # (safeGapAfter = MY minBrake, safeGapBefore = the FOLLOWER's)
    min_brake = 0.5 * speed * speed / neg_s
    safe_before = jnp.where(tf_ex, 0.5 * tf_spd * tf_spd / tf_neg, f(0))
    gap_valid = (lgap >= min_brake) & (fgap >= safe_before)

    # ---- sendSignal / receiveSignal (vehicle.cpp:391-401) ---------------
    # receiver keeps the max-priority sender among those whose target
    # leader/follower slot is the receiver; only the follower role yields
    # (lanechange.cpp:186-206). Senders on my INNER lane with dir=+1 and
    # on my OUTER lane with dir=-1 target me.
    prih, pril = _hilo(rs.l_pri)
    ygap = fgap - safe_before                 # sender-side yield gap
    send_ch = [plan.astype(f), dirc.astype(f), tl_slot.astype(f),
               tf_slot.astype(f), prih, pril, speed, ygap]
    if not cfg.uniform:
        send_ch.append(neg_s)                 # sender maxNegAcc
    s_in, _ = perm_channels(net, cfg, send_ch, "inner")
    s_out, _ = perm_channels(net, cfg, send_ch, "outer")
    best_h = jnp.full((SL, LNp), -1.0, f)
    best_l = jnp.zeros((SL, LNp), f)
    best_role_f = jnp.zeros((SL, LNp), bool)
    best_spd = jnp.zeros((SL, LNp), f)
    best_gapv = jnp.zeros((SL, LNp), f)
    best_sneg = None if cfg.uniform else jnp.ones((SL, LNp), f)
    got = jnp.zeros((SL, LNp), bool)
    my_slot = jnp.broadcast_to(sl_iota.astype(f), (SL, LNp))
    for S, want_dir in ((s_in, 1.0), (s_out, -1.0)):
        for t in range(SL):
            s_ok = (S[0][t] > 0.5) & (S[1][t] == want_dir)
            as_l = S[2][t][None, :] == my_slot
            as_f = S[3][t][None, :] == my_slot
            cand = s_ok[None, :] & (as_l | as_f)
            better = cand & (~got | _pri_gt(S[4][t][None, :],
                                            S[5][t][None, :],
                                            best_h, best_l))
            best_h = jnp.where(better, S[4][t][None, :], best_h)
            best_l = jnp.where(better, S[5][t][None, :], best_l)
            best_role_f = jnp.where(better, as_f & ~as_l, best_role_f)
            best_spd = jnp.where(better, S[6][t][None, :], best_spd)
            best_gapv = jnp.where(better, S[7][t][None, :], best_gapv)
            if not cfg.uniform:
                best_sneg = jnp.where(better, S[8][t][None, :], best_sneg)
            got = got | cand
    received = occ & ~chg & got \
        & ~(has_signal & ~_pri_gt(best_h, best_l, prih, pril))

    # yieldSpeed for the kept FOLLOWER-role signal (lanechange.cpp:186-206):
    # noCollisionSpeed(srcSpeed, SOURCE maxNegAcc, mySpeed, MY maxNegAcc)
    if cfg.uniform:
        v_y = no_collision_speed(best_spd, f(neg_s), speed, f(neg_s),
                                 best_gapv, dt, f(0))
    else:
        v_y = no_collision_speed(best_spd, best_sneg, speed, neg_s,
                                 best_gapv, dt, f(0))
    v_y = jnp.where(v_y < 0, f(100.0), v_y)
    yv = jnp.where(received & best_role_f, v_y, f(100.0))

    # ---- schedule: gap-valid non-receivers insert a shadow --------------
    can_change = has_signal & ~received
    do_change = plan & can_change & ~chg & gap_valid & (dirc != 0)

    # winner selection per TARGET lane: up to LCI changers, picked by
    # descending distance (deterministic stand-in for the reference's
    # urgency/pointer order — all SimpleLaneChange urgencies equal 1)
    (dc_in, d_in, dis_in), _ = perm_channels(
        net, cfg, [do_change.astype(f), dirc.astype(f), dis], "inner")
    (dc_out, d_out, dis_out), _ = perm_channels(
        net, cfg, [do_change.astype(f), dirc.astype(f), dis], "outer")
    src = ((dc_in, d_in, dis_in, 1.0), (dc_out, d_out, dis_out, -1.0))

    ncand = jnp.zeros(LNp, i32)
    for dc, dd, _ds, want_dir in src:
        for t in range(SL):
            ncand = ncand + ((dc[t] > 0.5) & (dd[t] == want_dir)).astype(i32)
    ov = jnp.where(jnp.any(ncand > cfg.LCI), 1, 0).astype(i32)

    accepted = []                      # per j: (LNp,) code = side*SL+slot
    for j in range(cfg.LCI):
        w_dis = jnp.full(LNp, -jnp.inf, f)
        w_code = jnp.full(LNp, -1, i32)
        for side, (dc, dd, ds, want_dir) in enumerate(src):
            for t in range(SL):
                code = side * SL + t
                used = jnp.zeros(LNp, bool)
                for a in accepted:
                    used = used | (a == code)
                c_ok = (dc[t] > 0.5) & (dd[t] == want_dir) & ~used
                better = c_ok & (ds[t] > w_dis)
                w_dis = jnp.where(better, ds[t], w_dis)
                w_code = jnp.where(better, code, w_code)
        accepted.append(w_code)

    # reals whose shadow actually got a slot: my code as seen from my
    # target lane is (side 0 = target's inner = dir>0 sender)
    my_code = jnp.where(dirc > 0, sl_iota, SL + sl_iota).astype(f)
    acc_f = jnp.stack([a.astype(f) for a in accepted], axis=0)  # (LCI,LNp)
    acc_out, _ = perm_channels(net, cfg,
                               [acc_f[j] for j in range(cfg.LCI)], "outer")
    acc_in, _ = perm_channels(net, cfg,
                              [acc_f[j] for j in range(cfg.LCI)], "inner")
    inserted = jnp.zeros((SL, LNp), bool)
    for j in range(cfg.LCI):
        a_t = jnp.where(dirc > 0, acc_out[j][0][None, :],
                        acc_in[j][0][None, :])
        inserted = inserted | (a_t == my_code)
    started = do_change & inserted

    # ---- pre-insert channel updates (real side) -------------------------
    # shadows keep their stored direction (it encodes where their real
    # sits: the movement/commit partner lookups depend on it)
    chg2 = chg | started
    dir2 = jnp.where(sh, rs.l_dir, jnp.where(chg2, dirc, 0))

    # shadow bundle per source row (copies the real's controllerInfo,
    # lanechange.cpp:71-102 / vehicle copy ctor; drivable = target,
    # router updated -> next link from the TARGET lane)
    sh_nxt = jnp.where(dirc > 0, nxt_out, nxt_in)
    aux_t = jnp.where(dirc > 0, _sel_llocal(net, rs.l_auxrow, +1),
                      _sel_llocal(net, rs.l_auxrow, -1))
    sh_nxt3 = jnp.where(aux_t >= 0, (aux_t >> 1) - 2, -1)
    sh_prih, sh_pril = _hilo(SHBIT + rs.l_uid)

    MR = rs.l_rnrow.shape[0]
    bundle = {
        "dis": dis, "speed": speed, "flow": rs.l_flow.astype(f),
        "route": rs.l_route.astype(f), "rpos": rs.l_rpos.astype(f),
        "nxt": sh_nxt.astype(f), "nxt3": sh_nxt3.astype(f),
        "prev": rs.l_prev.astype(f), "enter": rs.l_enter,
        "prih": sh_prih, "pril": sh_pril, "uid": rs.l_uid.astype(f),
        "last": rs.l_last.astype(f), "gap": rs.l_gap,
        "dir": dirc.astype(f),
    }
    if not cfg.uniform:
        bundle["tpl"] = rs.l_tpl.astype(f)  # shadow copies the template
    for c in range(MR):
        bundle[f"rn{c}"] = rs.l_rnrow[c].astype(f)
        bundle[f"ax{c}"] = rs.l_auxrow[c].astype(f)
    BCH = list(bundle.keys())
    b_in, _ = perm_channels(net, cfg, [bundle[k] for k in BCH], "inner")
    b_out, _ = perm_channels(net, cfg, [bundle[k] for k in BCH], "outer")

    # extract the winner bundles (target-lane domain)
    ins = []
    for j in range(cfg.LCI):
        vals = {k: jnp.zeros(LNp, f) for k in BCH}
        ex = accepted[j] >= 0
        for side, B in ((0, b_in), (1, b_out)):
            for t in range(SL):
                m = accepted[j] == (side * SL + t)
                for ki, k in enumerate(BCH):
                    vals[k] = jnp.where(m, B[ki][t], vals[k])
        ins.append((ex, vals))

    # ---- rank-preserving inserts ---------------------------------------
    cur = {
        "dis": rs.l_dis, "speed": rs.l_speed, "flow": rs.l_flow,
        "route": rs.l_route, "rpos": rs.l_rpos, "nxt": rs.l_nxt,
        "nxt3": rs.l_nxt3, "prev": rs.l_prev, "enter": rs.l_enter,
        "pri": rs.l_pri, "uid": rs.l_uid, "last": rs.l_last,
        "gap": rs.l_gap, "dir": dir2, "off": rs.l_off,
        "sh": rs.l_sh, "chg": chg2, "yv": yv,
        "custom": rs.l_custom, "hascustom": rs.l_hascustom,
    }
    if not cfg.uniform:
        cur["tpl"] = rs.l_tpl
    for c in range(MR):
        cur[f"rn{c}"] = rs.l_rnrow[c]
        cur[f"ax{c}"] = rs.l_auxrow[c]
    n_cur = rs.n_l
    occ0 = occ
    dis0 = rs.l_dis
    consts = {"off": 0.0, "sh": True, "chg": False, "yv": 100.0,
              "custom": 0.0, "hascustom": False}
    for j, (ex_j, vals) in enumerate(ins):
        # insertion rank on the ORIGINAL ring + earlier same-lane inserts
        # (winners are distance-descending, so each earlier insert sits
        # at-or-above this one: LaneChange::insertShadow inserts before
        # the targetFollower, i.e. after every dis >= d)
        pos = jnp.zeros(LNp, i32)
        for t in range(SL):
            pos = pos + (occ0[t] & (dis0[t] >= vals["dis"])).astype(i32)
        pos = pos + jnp.asarray(j, i32)
        ov = ov | jnp.where(jnp.any(ex_j & (n_cur >= SL)), 2, 0).astype(i32)
        ex_j = ex_j & (n_cur < SL)

        def insert(a, v):
            shifted = jnp.concatenate(
                [jnp.zeros((1, LNp), a.dtype), a[:-1]], axis=0)
            placed = jnp.where((sl_iota == pos[None, :]) & ex_j[None, :],
                               jnp.broadcast_to(v, (LNp,))[None, :]
                               .astype(a.dtype), a)
            return jnp.where((sl_iota > pos[None, :]) & ex_j[None, :],
                             shifted, placed)

        for k in cur:
            if k == "pri":
                v = _from_hilo(vals["prih"], vals["pril"])
            elif k in consts:
                v = jnp.full(LNp, consts[k],
                             jnp.bool_ if isinstance(consts[k], bool)
                             else f)
            else:
                v = vals[k]
            cur[k] = insert(cur[k], v)
        n_cur = n_cur + ex_j.astype(i32)

    tpl_kw = {} if cfg.uniform else dict(l_tpl=cur["tpl"].astype(i32))
    rs = rs.replace_fields(
        n_l=n_cur,
        l_dis=cur["dis"], l_speed=cur["speed"],
        l_flow=cur["flow"].astype(i32), l_route=cur["route"].astype(i32),
        l_rpos=cur["rpos"].astype(i32), l_nxt=cur["nxt"].astype(i32),
        l_nxt3=cur["nxt3"].astype(i32), l_prev=cur["prev"].astype(i32),
        l_enter=cur["enter"], l_pri=cur["pri"].astype(i32),
        l_uid=cur["uid"].astype(i32), l_last=cur["last"].astype(bool),
        l_gap=cur["gap"], l_dir=cur["dir"].astype(i32),
        l_off=cur["off"], l_sh=cur["sh"].astype(bool),
        l_chg=cur["chg"].astype(bool), l_yv=cur["yv"],
        l_custom=cur["custom"], l_hascustom=cur["hascustom"].astype(bool),
        l_rnrow=jnp.stack([cur[f"rn{c}"].astype(i32) for c in range(MR)],
                          axis=0),
        l_auxrow=jnp.stack([cur[f"ax{c}"].astype(i32) for c in range(MR)],
                           axis=0), **tpl_kw)
    return rs, ov


def partner_fetch(net, cfg, rs, chans):
    """For every paired row ((l_chg & ~l_sh) real or l_sh shadow), its
    partner's channel values by uid match in the statically-derived
    partner lane column. Returns ([(SL, LNp) fetched...], found mask).
    Reals look toward l_dir; shadows toward -l_dir (the real sits on the
    opposite side of the change)."""
    f = jnp.float32
    SL, LNp = cfg.SL, cfg.LNp
    sl_iota = jnp.arange(SL, dtype=jnp.int32)[:, None]
    occ = sl_iota < rs.n_l[None, :]
    base = [rs.l_uid.astype(f), rs.l_sh.astype(f), occ.astype(f)]
    allch = base + [c.astype(f) for c in chans]
    p_in, _ = perm_channels(net, cfg, allch, "inner")
    p_out, _ = perm_channels(net, cfg, allch, "outer")
    # partner direction: real toward dir, shadow toward -dir
    look = jnp.where(rs.l_sh, -rs.l_dir, rs.l_dir)
    use_out = look > 0

    def P(ci, t):
        return jnp.where(use_out, p_out[ci][t][None, :], p_in[ci][t][None, :])

    found = jnp.zeros((SL, LNp), bool)
    out = [jnp.zeros((SL, LNp), f) for _ in chans]
    my_uid = rs.l_uid.astype(f)
    my_sh = rs.l_sh
    for t in range(SL):
        m = (P(2, t) > 0.5) & (P(0, t) == my_uid) \
            & ((P(1, t) > 0.5) != my_sh)
        m = m & ~found
        for ci in range(len(chans)):
            out[ci] = jnp.where(m, P(3 + ci, t), out[ci])
        found = found | m
    paired = occ & (((rs.l_chg) & ~rs.l_sh) | rs.l_sh) & (look != 0)
    return out, found & paired
