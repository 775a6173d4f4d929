"""Host driver for the gen-2 ring simulator: builds device tables, spawn
queues, and exposes a simple step/fetch interface (used by bench.py, the
Engine fast path, and tests)."""

from dataclasses import dataclass
from typing import Dict, Optional

import numpy as np

from cityflow_tpu.compiler.net import CompiledNet
from cityflow_tpu.compiler.ring_net import build_ring, RingMeta
from cityflow_tpu.compiler.spawn import SpawnGenerator
from cityflow_tpu.core.ring import (
    RingConfig, RingState, init_ring_state, ring_step, P_LEN, P_MINGAP)


@dataclass
class RingSim:
    net: CompiledNet = None
    meta: RingMeta = None
    cfg: RingConfig = None
    tables: Dict = None          # device arrays
    q: Dict = None               # spawn queues (EL, QCAP)
    state: RingState = None
    gen: SpawnGenerator = None


def _flow_tpl_now(net: CompiledNet, tpl_params: np.ndarray) -> np.ndarray:
    """Current flow -> template-index map. Recomputed from the LIVE
    flow_params rows (manual push_vehicle writes synthetic flow rows after
    compile; the template itself was validated against tpl_params by
    ring_backend.check_uniform_template)."""
    fp = net.flow_params.astype(np.float32)
    eq = np.all(np.isclose(fp[:, None, :], tpl_params[None]), axis=2)
    return np.where(eq.any(1), eq.argmax(1), 0).astype(np.int32)


def _build_queues(gen: SpawnGenerator, meta: RingMeta, horizon: int,
                  qcap_round: int = 256, flow_tpl=None):
    """Group the host-replayed spawn rows (mt19937 stream, compiler/spawn.py)
    into per-entry-lane FIFO queues. Row uid = global row index (gen-1 uses
    the same: spawn_cursor + arange)."""
    gen.extend(horizon)
    t = gen.arrays()
    EL = len(meta.entry_lanes)
    el_index = {int(p): i for i, p in enumerate(meta.entry_lanes)}
    per = [[] for _ in range(EL)]
    lane_pos = meta.lane_pos
    for r in range(len(t["step"])):
        fd = int(t["first_drv"][r])
        p = int(lane_pos[fd])
        e = el_index.get(p)
        if e is None:
            raise ValueError("spawn row on a lane outside the entry set "
                             "(push_vehicle with a new road needs a rebuild)")
        per[e].append(r)
    qcap = max((len(v) for v in per), default=1) or 1
    qcap = ((qcap + qcap_round - 1) // qcap_round) * qcap_round
    q = {k: np.full((EL, qcap), -1, np.int32)
         for k in ("step", "flow", "pri", "route", "uid")}
    for e, rows in enumerate(per):
        for j, r in enumerate(rows):
            q["step"][e, j] = t["step"][r]
            q["flow"][e, j] = t["flow"][r]
            q["pri"][e, j] = t["priority"][r]
            q["route"][e, j] = t["route"][r]
            q["uid"][e, j] = r
    if flow_tpl is not None:
        q["tpl"] = np.where(
            q["flow"] >= 0,
            flow_tpl[np.clip(q["flow"], 0, len(flow_tpl) - 1)],
            0).astype(np.int32)
    return q


def build_sim(net: CompiledNet, horizon: int = 512,
              sl: Optional[int] = None, sk: Optional[int] = None,
              tmax: int = 512, skc: Optional[int] = None,
              lane_change: Optional[bool] = None) -> RingSim:
    import jax.numpy as jnp
    cfgj = net.host.config
    interval = float(cfgj["interval"])
    if lane_change is None:
        lane_change = bool(cfgj.get("laneChange", False))
    tb, meta = build_ring(net, interval)
    if not meta.supported:
        raise ValueError(f"ring layout unsupported: {meta.unsupported_reason}")

    if meta.uniform_params:
        p = meta.param_row
        min_len = float(p[P_LEN]) + float(p[P_MINGAP])
        max_spd = float(p[8])
        params = tuple(float(v) for v in meta.param_row)
    else:
        # capacity / exit-hop bounds from the worst-case template; the
        # scalar params tuple is POISONED so any use site missed by the
        # per-slot materialization fails loudly (NaN) instead of silently
        # simulating the wrong template
        used = np.asarray(tb["tpl_params"])
        min_len = float((used[:, P_LEN] + used[:, P_MINGAP]).min())
        max_spd = float(used[:, 8].max())
        params = tuple([float("nan")] * 12)
    lane_cap = int(np.ceil(np.asarray(tb["ln_len"]).max() / min_len)) + 2
    link_cap = int(np.ceil(np.asarray(tb["lk_len"]).max() / min_len)) + 2
    SL = sl if sl is not None else lane_cap
    SK = sk if sk is not None else link_cap
    xk = max(2, int(np.ceil(max_spd * interval / min_len)))

    cfg = RingConfig(
        interval=interval, I=meta.I, G=meta.G, T=meta.T,
        LPI=meta.LPI, OL=meta.OL, IL=meta.IL, KC=meta.KC,
        KIN=meta.KIN, KOUT=meta.KOUT, LNp=meta.LNp, LKp=meta.LKp,
        SL=SL, SK=SK, AP=max(2, xk), XK=xk, SA=4, TMAX=tmax,
        type_ranges=meta.type_ranges,
        params=params,
        uniform=bool(meta.uniform_params), TP=int(meta.TP),
        rl_traffic_light=bool(cfgj["rlTrafficLight"]),
        foe_via_perm=meta.foe_via_perm,
        SKC=(skc if skc is not None else 4),
        fwd_shifts=tuple(meta.fwd_shifts),
        bwd_shifts=tuple(meta.bwd_shifts),
        lane_change=bool(lane_change),
        MAXLPR=int(np.asarray(tb["route_next"]).shape[2]),
        inn_shifts=tuple(meta.inn_shifts),
        out_shifts=tuple(meta.out_shifts),
        track_history=(str(cfgj.get("routerType", "LENGTH")).upper()
                       == "DURATION"))

    gen = SpawnGenerator(net, int(cfgj["seed"]), interval)
    q = _build_queues(gen, meta, horizon,
                      flow_tpl=None if cfg.uniform
                      else _flow_tpl_now(net, np.asarray(tb["tpl_params"])))
    st = init_ring_state(cfg, tb, len(meta.entry_lanes))   # host-side tables
    tables = {k: jnp.asarray(v) for k, v in tb.items()}
    qd = {k: jnp.asarray(v) for k, v in q.items()}
    return RingSim(net=net, meta=meta, cfg=cfg, tables=tables, q=qd,
                   state=st, gen=gen)


def step(sim: RingSim):
    import os
    if (sim.net.num_links > 16000
            or (sim.cfg.lane_change and sim.net.num_links > 4000)
            or os.environ.get("CITYFLOW_RING_SPLIT")):
        # split compilation: monolithic city-scale programs (30x30+)
        # schedule ~8x worse and exceed practical XLA compile budgets
        # (docs/design.md); identical semantics by construction. Lane
        # change roughly doubles the program, so the threshold drops
        # (measured: monolithic 16x16 LC exceeds a 10-min XLA:CPU
        # compile; the split halves compile in ~25s). The env override
        # lets long CPU parity runs compile in two cacheable pieces (a
        # mid-compile kill caches nothing).
        from cityflow_tpu.core.ring import ring_step_split
        sim.state = ring_step_split(sim.tables, sim.cfg, sim.state, sim.q)
    else:
        sim.state = ring_step(sim.tables, sim.cfg, sim.state, sim.q)
    return sim.state


def rebuild_queues(sim: RingSim, gen: SpawnGenerator, horizon: int):
    """Re-derive the per-entry-lane queues from (a longer prefix of) the
    spawn stream. The stream replay is deterministic, so the per-lane
    grouping of already-consumed rows is unchanged and the live
    `el_cursor` values stay valid; only new rows append."""
    import jax.numpy as jnp
    q = _build_queues(gen, sim.meta, horizon,
                      flow_tpl=None if sim.cfg.uniform
                      else _flow_tpl_now(
                          sim.net,
                          np.asarray(sim.tables["tpl_params"])))
    sim.q = {k: jnp.asarray(v) for k, v in q.items()}
    sim.gen = gen
    return sim


def grow_slots(sim: RingSim, dsl: int = 0, dsk: int = 0):
    """Capacity growth: rings are front-prefix compact (slots >= n are
    empty), so appending empty tail slots is state-preserving. Triggers a
    recompile (new SL/SK static shapes)."""
    import dataclasses
    import jax.numpy as jnp
    if not dsl and not dsk:
        return sim
    st = sim.state
    cfg = sim.cfg

    def padl(a, fill):
        if a is None:
            return None
        ext = jnp.full((dsl,) + a.shape[1:], fill, a.dtype)
        return jnp.concatenate([a, ext], axis=0)

    def padk(a, fill):
        if a is None:
            return None
        ext = jnp.full((dsk,) + a.shape[1:], fill, a.dtype)
        return jnp.concatenate([a, ext], axis=0)

    kw = {}
    if dsl:
        for n in ("l_dis", "l_speed", "l_enter", "l_custom", "l_off",
                  "l_gap", "l_yv"):
            if getattr(st, n) is not None:
                kw[n] = padl(getattr(st, n), 0.0)
        for n, fill in (("l_flow", 0), ("l_route", 0), ("l_rpos", 0),
                        ("l_nxt", -1), ("l_nxt3", -1), ("l_prev", -1),
                        ("l_pri", 0), ("l_uid", -1), ("l_dir", 0)):
            if getattr(st, n) is not None:
                kw[n] = padl(getattr(st, n), fill)
        for n in ("l_last", "l_hascustom", "l_sh", "l_chg"):
            if getattr(st, n) is not None:
                kw[n] = padl(getattr(st, n), False)
        if st.l_tpl is not None:
            kw["l_tpl"] = padl(st.l_tpl, 0)
        if st.l_rnrow is not None:
            kw["l_rnrow"] = jnp.concatenate(
                [st.l_rnrow, jnp.full(
                    (st.l_rnrow.shape[0], dsl, cfg.LNp), -1,
                    st.l_rnrow.dtype)], axis=1)
            kw["l_auxrow"] = jnp.concatenate(
                [st.l_auxrow, jnp.full(
                    (st.l_auxrow.shape[0], dsl, cfg.LNp), -1,
                    st.l_auxrow.dtype)], axis=1)
    if dsk:
        for n in ("k_dis", "k_speed", "k_enter", "k_custom", "k_gap"):
            if getattr(st, n) is not None:
                kw[n] = padk(getattr(st, n), 0.0)
        for n, fill in (("k_flow", 0), ("k_route", 0), ("k_rpos", 0),
                        ("k_entll", 0), ("k_pri", 0), ("k_uid", -1),
                        ("k_nxtl", -1)):
            kw[n] = padk(getattr(st, n), fill)
        kw["k_hascustom"] = padk(st.k_hascustom, False)
        if st.k_tpl is not None:
            kw["k_tpl"] = padk(st.k_tpl, 0)
    sim.state = st.replace_fields(**kw)
    sim.cfg = dataclasses.replace(cfg, SL=cfg.SL + dsl, SK=cfg.SK + dsk)
    return sim


def _fill_cross_drivable_leaders(sim, c, out, lead, nl, nk, ls, lp, ks, kp,
                                 idx_l, idx_k):
    """Reference Vehicle::updateLeaderAndGap forward walk for ring-front
    vehicles (vehicle.cpp:157-196): scan routed next drivables in order;
    at a LaneLink hop consider ALL lanelinks leaving the previous lane
    (the overlapping-lanelink rule, vehicle.cpp:170-180) and take the
    min-gap last vehicle; stop once the accumulated distance exceeds
    maxSpeed^2/(2*usualNegAcc) + 2*maxSpeed*interval. The walk is capped
    at nxt/endlane/nxt3/endlane(nxt3) — the route info carried per slot;
    with default templates the distance bound (~89 m) terminates inside
    that window on any net with lanes longer than ~60 m."""
    import jax
    m = sim.meta
    net = sim.net
    cfg = sim.cfg
    L = net.num_lanes
    LNp = m.pos_lane.shape[0]
    fronts = np.nonzero(lead[:nl + nk] < 0)[0]
    if not len(fronts):
        return
    lk_end = np.asarray(jax.device_get(sim.tables["lk_end_lane"]))
    if m.uniform_params:
        p_row = np.asarray(m.param_row, np.float64)
        tpl_all = None
        tpp = None
    else:
        tpp = np.asarray(jax.device_get(sim.tables["tpl_params"]),
                         np.float64)
        tpl_all = np.concatenate(
            [c["l_tpl"][ls, lp], c["k_tpl"][ks, kp]]).astype(np.int64)
        p_row = None
    # rearmost occupied row per ring lane / link position
    last_l = np.full(LNp, -1, np.int64)
    for pos in np.nonzero(c["n_l"] > 0)[0]:
        last_l[pos] = idx_l[int(c["n_l"][pos]) - 1, pos]
    LKp = m.pos_link.shape[0]
    last_k = np.full(LKp, -1, np.int64)
    for pos in np.nonzero(c["n_k"] > 0)[0]:
        last_k[pos] = idx_k[int(c["n_k"][pos]) - 1, pos]
    # ring lane pos -> ring link positions of all lanelinks leaving it
    links_from = {}
    for k_orig in range(net.num_links):
        sl_pos = int(m.lane_pos[net.ll_start[k_orig]])
        links_from.setdefault(sl_pos, []).append(int(m.link_pos[k_orig]))

    def _len_row(r):
        return float(p_row[1]) if tpl_all is None else \
            float(tpp[tpl_all[r], 1])

    def _lane_len(pos):
        return float(net.drv_len[m.pos_lane[pos]])

    def _link_len(pos):
        return float(net.drv_len[L + m.pos_link[pos]])

    interval = float(cfg.interval)
    dis = out["dis"]
    for i in fronts:
        if tpl_all is None:
            ms, una = float(p_row[8]), float(p_row[6])
        else:
            ms, una = float(tpp[tpl_all[i], 8]), float(tpp[tpl_all[i], 6])
        bound = ms * ms / una / 2 + ms * interval * 2
        # chain of (kind, ring pos[, prev lane ring pos]) next drivables
        chain = []
        if i < nl:
            cur_len = _lane_len(lp[i])
            v0 = int(c["l_nxt"][ls[i], lp[i]])
            if v0 >= LNp:
                kpos0 = v0 - LNp
                chain.append(("link", kpos0, int(lp[i])))
                el = int(lk_end[kpos0])
                if el >= 0:
                    chain.append(("lane", el))
                    v3 = int(c["l_nxt3"][ls[i], lp[i]])
                    if v3 >= LNp:
                        chain.append(("link", v3 - LNp, el))
                        el3 = int(lk_end[v3 - LNp])
                        if el3 >= 0:
                            chain.append(("lane", el3))
        else:
            cur_len = _link_len(kp[i - nl])
            el = int(lk_end[kp[i - nl]])
            if el >= 0:
                chain.append(("lane", el))
                v3 = int(c["k_nxtl"][ks[i - nl], kp[i - nl]])
                if v3 >= LNp:
                    chain.append(("link", v3 - LNp, el))
                    el3 = int(lk_end[v3 - LNp])
                    if el3 >= 0:
                        chain.append(("lane", el3))
        dis_rem = cur_len - float(dis[i])
        found = -1
        for item in chain:
            if item[0] == "link":
                _, kpos, prevl = item
                best_gap = None
                for k2 in links_from.get(prevl, ()):
                    r2 = int(last_k[k2])
                    if r2 >= 0:
                        g2 = dis_rem + float(dis[r2]) - _len_row(r2)
                        if best_gap is None or g2 < best_gap:
                            best_gap, found = g2, r2
                if found >= 0:
                    break
                dis_rem += _link_len(kpos)
            else:
                r2 = int(last_l[item[1]])
                if r2 >= 0:
                    found = r2
                    break
                dis_rem += _lane_len(item[1])
            if dis_rem > bound:
                break
        if found >= 0:
            lead[i] = found


def fetch_full(sim: RingSim, gen: Optional[SpawnGenerator] = None):
    """Full host view in the gen-1 cache shape (engine.Engine._fetch):
    one row per live vehicle (lane slots first, then link slots) plus one
    row per spawned-but-waiting queue entry. Extra keys:
      kind/pos/slot — write-back coordinates for mutations,
      len/width     — template geometry (uniform by ring contract).
    Vectorized numpy; no per-vehicle Python loops on the device data."""
    import jax
    m = sim.meta
    st = sim.state
    cfg = sim.cfg
    lc = cfg.lane_change
    names = ["n_l", "n_k", "step", "l_uid", "l_dis", "l_speed", "l_route",
             "l_rpos", "l_enter", "l_pri", "l_prev", "l_custom",
             "l_hascustom", "l_nxt", "l_nxt3",
             "k_uid", "k_dis", "k_speed", "k_route", "k_rpos", "k_enter",
             "k_pri", "k_custom", "k_hascustom", "k_nxtl", "el_cursor"]
    if lc:
        names += ["l_sh", "l_dir", "l_off", "l_gap", "k_gap"]
    if not cfg.uniform:
        names += ["l_tpl", "k_tpl"]
    vals = jax.device_get([getattr(st, n) for n in names])
    c = dict(zip(names, vals))
    SL, LNp = c["l_uid"].shape
    SK, LKp = c["k_uid"].shape
    now = int(c["step"])
    L = sim.net.num_lanes

    lmask = (np.arange(SL)[:, None] < c["n_l"][None, :]) \
        & (m.pos_lane >= 0)[None, :]
    kmask = (np.arange(SK)[:, None] < c["n_k"][None, :]) \
        & (m.pos_link >= 0)[None, :]
    ls, lp = np.nonzero(lmask)
    ks, kp = np.nonzero(kmask)
    nl, nk = len(ls), len(ks)

    def litem(name):
        return c[name][ls, lp]

    def kitem(name):
        return c[name][ks, kp]

    out = {}
    out["kind"] = np.concatenate([np.zeros(nl, np.int32),
                                  np.ones(nk, np.int32)])
    out["pos"] = np.concatenate([lp.astype(np.int32), kp.astype(np.int32)])
    out["slot"] = np.concatenate([ls.astype(np.int32), ks.astype(np.int32)])
    out["drv"] = np.concatenate([m.pos_lane[lp],
                                 L + m.pos_link[kp]]).astype(np.int32)
    for g1, ln, kn in (("dis", "l_dis", "k_dis"),
                       ("speed", "l_speed", "k_speed"),
                       ("route", "l_route", "k_route"),
                       ("enter_time", "l_enter", "k_enter"),
                       ("priority", "l_pri", "k_pri"),
                       ("uid", "l_uid", "k_uid"),
                       ("custom_speed", "l_custom", "k_custom"),
                       ("has_custom", "l_hascustom", "k_hascustom")):
        out[g1] = np.concatenate([litem(ln), kitem(kn)])
    # k_rpos stores the pre-transfer rpos; +1 lands on arrival at the next
    # lane (commit payload `rpos=k_rpos+1`), matching gen-1 route_pos
    out["route_pos"] = np.concatenate([litem("l_rpos"), kitem("k_rpos")])
    prev_lane = np.where(lp >= 0, c["l_prev"][ls, lp], -1)
    pl = np.full(nl, -1, np.int64)
    pv = prev_lane >= LNp
    pl[pv] = L + m.pos_link[np.clip(prev_lane[pv] - LNp, 0, LKp - 1)]
    pu = (prev_lane >= 0) & ~pv
    pl[pu] = m.pos_lane[np.clip(prev_lane[pu], 0, LNp - 1)]
    kprev = m.pos_link[kp]          # link vehicles: came from its start lane
    out["prev_drv"] = np.concatenate([pl, np.where(
        kprev >= 0, -1, -1)]).astype(np.int32)
    out["is_shadow"] = np.concatenate(
        [litem("l_sh"), np.zeros(nk, bool)]) if lc \
        else np.zeros(nl + nk, bool)
    out["offset"] = np.concatenate(
        [litem("l_off"), np.zeros(nk)]) if lc else np.zeros(nl + nk)
    out["lc_last_dir"] = np.concatenate(
        [litem("l_dir"), np.zeros(nk, np.int32)]).astype(np.int32) if lc \
        else np.zeros(nl + nk, np.int32)
    out["gap"] = np.concatenate(
        [litem("l_gap"), kitem("k_gap")]) if lc else np.zeros(nl + nk)
    # in-ring order IS the front-to-back list order
    out["list_seq"] = out["slot"].astype(np.int32)
    # leader: the slot above in the same ring; ring-front vehicles get
    # the cross-drivable leader via the reference's forward walk below
    lead = np.full(nl + nk, -1, np.int64)
    idx_l = np.full((SL, LNp), -1, np.int64)
    idx_l[ls, lp] = np.arange(nl)
    has_above_l = ls > 0
    lead[:nl][has_above_l] = idx_l[ls[has_above_l] - 1, lp[has_above_l]]
    idx_k = np.full((SK, LKp), -1, np.int64)
    idx_k[ks, kp] = nl + np.arange(nk)
    has_above_k = ks > 0
    lead[nl:][has_above_k] = idx_k[ks[has_above_k] - 1, kp[has_above_k]]
    _fill_cross_drivable_leaders(sim, c, out, lead, nl, nk, ls, lp, ks, kp,
                                 idx_l, idx_k)
    out["leader"] = lead.astype(np.int32)
    # partner: the row with the same uid and the opposite shadow flag
    part = np.full(nl + nk, -1, np.int32)
    if lc and nl:
        keyed = {}
        for i in range(nl):
            keyed[(int(out["uid"][i]), bool(out["is_shadow"][i]))] = i
        for i in range(nl):
            j = keyed.get((int(out["uid"][i]), not bool(out["is_shadow"][i])))
            if j is not None and (out["lc_last_dir"][i]
                                  or out["lc_last_dir"][j]):
                part[i] = j
    out["partner"] = part
    out["running"] = np.ones(nl + nk, bool)

    # spawned-but-waiting queue rows (gen-1: active & ~running)
    if gen is None:
        gen = sim.gen
    qh = {k: np.asarray(jax.device_get(v)) for k, v in sim.q.items()}
    EL, QCAP = qh["step"].shape
    cur = c["el_cursor"]
    col = np.arange(QCAP)[None, :]
    # spawn processing for step s runs INSIDE the (s+1)-th next_step call
    # (pre-increment rs.step == s), so after `now` completed steps only
    # rows with step < now have been created in the reference's pool
    wmask = (col >= cur[:, None]) & (qh["step"] >= 0) & (qh["step"] < now)
    we, wj = np.nonzero(wmask)
    nw = len(we)
    if nw:
        wrow = {k: qh[k][we, wj] for k in qh}
        pad = {
            "kind": np.full(nw, 2, np.int32), "pos": we.astype(np.int32),
            "slot": wj.astype(np.int32), "drv": np.full(nw, -1, np.int32),
            "dis": np.zeros(nw), "speed": np.zeros(nw),
            "route": wrow["route"], "route_pos": np.zeros(nw, np.int32),
            "enter_time": wrow["step"].astype(np.float64) * cfg.interval,
            "priority": wrow["pri"], "uid": wrow["uid"],
            "custom_speed": np.zeros(nw), "has_custom": np.zeros(nw, bool),
            "prev_drv": np.full(nw, -1, np.int32),
            "is_shadow": np.zeros(nw, bool), "offset": np.zeros(nw),
            "lc_last_dir": np.zeros(nw, np.int32), "gap": np.zeros(nw),
            "list_seq": np.zeros(nw, np.int32),
            "leader": np.full(nw, -1, np.int32),
            "partner": np.full(nw, -1, np.int32),
            "running": np.zeros(nw, bool),
        }
        for k in out:
            out[k] = np.concatenate([out[k], pad[k]])
    n = nl + nk + nw
    out["active"] = np.ones(n, bool)
    if m.uniform_params:
        p = m.param_row
        out["len"] = np.full(n, float(p[1]))
        out["width"] = np.full(n, float(p[2]))
    else:
        tpl = np.concatenate(
            [c["l_tpl"][ls, lp], c["k_tpl"][ks, kp],
             wrow["tpl"] if nw else np.zeros(0, np.int32)]).astype(np.int64)
        tpp = np.asarray(jax.device_get(sim.tables["tpl_params"]))
        out["len"] = tpp[tpl, 1].astype(np.float64)
        out["width"] = tpp[tpl, 2].astype(np.float64)
    return out


def fetch_vehicles(sim: RingSim):
    """Host view: {uid: (global_drivable_id, dis, speed)} for all running
    vehicles (used by tests and the Engine getters)."""
    import jax
    m = sim.meta
    st = sim.state
    names = ["n_l", "n_k", "l_uid", "l_dis", "l_speed", "k_uid", "k_dis",
             "k_speed"]
    lc = sim.cfg.lane_change
    if lc:
        names.append("l_sh")
    vals = jax.device_get([getattr(st, n) for n in names])
    c = dict(zip(names, vals))
    out = {}
    L = sim.net.num_lanes
    for pos in range(m.LNp):
        lane = m.pos_lane[pos]
        if lane < 0:
            continue
        for s in range(int(c["n_l"][pos])):
            uid = int(c["l_uid"][s, pos])
            if lc and bool(c["l_sh"][s, pos]):
                uid |= 1 << 30          # gen-1 shadow-uid convention
            out[uid] = (
                int(lane), float(c["l_dis"][s, pos]),
                float(c["l_speed"][s, pos]))
    for pos in range(m.LKp):
        link = m.pos_link[pos]
        if link < 0:
            continue
        for s in range(int(c["n_k"][pos])):
            out[int(c["k_uid"][s, pos])] = (
                int(L + link), float(c["k_dis"][s, pos]),
                float(c["k_speed"][s, pos]))
    return out
