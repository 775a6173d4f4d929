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


def _build_queues(gen: SpawnGenerator, meta: RingMeta, horizon: int,
                  qcap_round: int = 256):
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
    if not meta.uniform_params:
        raise ValueError("ring layout requires uniform vehicle templates")

    p = meta.param_row
    min_len = float(p[P_LEN]) + float(p[P_MINGAP])
    lane_cap = int(np.ceil(np.asarray(tb["ln_len"]).max() / min_len)) + 2
    link_cap = int(np.ceil(np.asarray(tb["lk_len"]).max() / min_len)) + 2
    SL = sl if sl is not None else lane_cap
    SK = sk if sk is not None else link_cap
    xk = max(2, int(np.ceil(float(p[8]) * interval / min_len)))

    cfg = RingConfig(
        interval=interval, I=meta.I, G=meta.G, T=meta.T,
        LPI=meta.LPI, OL=meta.OL, IL=meta.IL, KC=meta.KC,
        KIN=meta.KIN, KOUT=meta.KOUT, LNp=meta.LNp, LKp=meta.LKp,
        SL=SL, SK=SK, AP=max(2, xk), XK=xk, SA=4, TMAX=tmax,
        type_ranges=meta.type_ranges,
        params=tuple(float(v) for v in meta.param_row),
        rl_traffic_light=bool(cfgj["rlTrafficLight"]),
        foe_via_perm=meta.foe_via_perm,
        SKC=(skc if skc is not None else 4),
        fwd_shifts=tuple(meta.fwd_shifts),
        bwd_shifts=tuple(meta.bwd_shifts),
        lane_change=bool(lane_change),
        MAXLPR=int(np.asarray(tb["route_next"]).shape[2]),
        inn_shifts=tuple(meta.inn_shifts),
        out_shifts=tuple(meta.out_shifts))

    gen = SpawnGenerator(net, int(cfgj["seed"]), interval)
    q = _build_queues(gen, meta, horizon)
    st = init_ring_state(cfg, tb, len(meta.entry_lanes))   # host-side tables
    tables = {k: jnp.asarray(v) for k, v in tb.items()}
    qd = {k: jnp.asarray(v) for k, v in q.items()}
    return RingSim(net=net, meta=meta, cfg=cfg, tables=tables, q=qd,
                   state=st, gen=gen)


def step(sim: RingSim):
    sim.state = ring_step(sim.tables, sim.cfg, sim.state, sim.q)
    return sim.state


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
