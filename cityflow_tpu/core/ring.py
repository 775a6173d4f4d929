"""Gen-2 ring-layout step: vehicle attributes stored per-drivable.

Same semantics as gen-1 fast mode (core/step.py) — each phase mirrors the
reference (engine.cpp / vehicle.cpp / roadnet.cpp) through the gen-1
function it replaces — but laid out for the TPU cost model measured in
docs/design.md:

  * per-drivable slot arrays, front slot first: leader = static shift,
    admission = append, front exits = prefix shift-out (no sorts, no
    slot-pool scatter tables);
  * intersection-local operators (notify candidate maps, Cross::canPass
    foe exchange, availability masks, lane<->link transfer routing) are
    type-shared one-hot matrices applied with einsum (MXU) instead of
    LL*KC-index dynamic gathers (measured 84x cheaper at 30x30 scale);
  * the only dynamic-index work left is the per-transfer route-table
    lookup, done on a compacted set of a few hundred rows, plus one
    constant-index lane permutation per step (the in-lane view).

Scope (checked at build time by compiler/ring_net.py): lane lengths above
the leader-scan bound; lane change and non-uniform vehicle templates are
both supported, including together (tests/test_ring_lc.py::
test_ring_lc_matches_gen1_mixed_templates). Non-uniform templates ride as
a per-slot template-index channel;
params materialize via a one-hot einsum against tpl_params (the _PP
provider) with the leader's maxNegAcc/usualNegAcc/len where the reference
uses them (vehicle.cpp:160,217,229). Exact mode stays on the gen-1 path;
equivalence against gen-1 is tested in tests/test_ring.py (incl.
config_2x2_mixed — 3 templates — whose gen-1 run is itself bit-exact vs
the unmodified reference, tests/test_golden_grids.py).

Integer channels routed through f32 exchanges: priorities are carried as
(hi, lo) 16-bit halves (exact in f32; reference compares them as signed
ints, vehicle.cpp:33), enter times as min(t, 2^25) (f32-exact; only
ordering matters, roadnet.cpp:646-654), uids/routes/flows are < 2^24.
"""

import dataclasses
from dataclasses import dataclass
from functools import partial
from typing import Any, Tuple

import jax
import jax.numpy as jnp

from cityflow_tpu.core.state import (
    INT_MAX, OV_SLOTS, OV_LINK_TABLE, OV_HOPS, OV_REMOVE)
from cityflow_tpu.core.step import (
    no_collision_speed, stop_before_speed, reach_steps, can_yield)

P_SPEED, P_LEN, P_WIDTH, P_MAXPOSACC, P_MAXNEGACC, P_USUALPOSACC, \
    P_USUALNEGACC, P_MINGAP, P_MAXSPEED, P_HEADWAY, P_YIELD, P_TURNSPEED = range(12)

ENT_BIG = float(1 << 25)
HI = jax.lax.Precision.HIGHEST


@dataclass(frozen=True)
class RingConfig:
    interval: float
    I: int; G: int; T: int
    LPI: int; OL: int; IL: int; KC: int; KIN: int; KOUT: int
    LNp: int; LKp: int
    SL: int = 16
    SK: int = 10
    AP: int = 2               # lane front slots computed in the link domain
    XK: int = 2               # max front departures per drivable per step
    SA: int = 4               # max appends per lane per step
    TMAX: int = 512           # (unused; kept for config stability)
    TI: int = 12              # compacted link->lane transfers per
                              # intersection per step (overflow-flagged)
    type_ranges: Tuple[Tuple[int, int], ...] = ()
    params: Tuple[float, ...] = ()
    uniform: bool = True      # all templates identical: params are scalars
    TP: int = 1               # distinct templates (tpl_params table rows)
    rl_traffic_light: bool = False
    k_phase: int = 8
    k_cyc: int = 4
    foe_via_perm: bool = True
    SKC: int = 99             # link ring slots that evaluate Cross::canPass;
                              # deeper (queued) slots are car-following anyway
                              # — the reference evaluates all (documented
                              # fast-mode cap, like gen-1's k_chase)
    fwd_shifts: Tuple[int, ...] = ()   # exchange shift plans (ring_net);
    bwd_shifts: Tuple[int, ...] = ()   # empty tuple -> plain gather
    lane_change: bool = False # enable the signal/shadow protocol (ring_lc)
    LCI: int = 2              # shadow inserts per lane per step (flagged)
    LCD: int = 2              # mid-ring finish removals per lane per step
    track_history: bool = False  # Lane::updateHistory rolling window
                              # (roadnet.cpp:900-915) feeding
                              # RouterType::DURATION host reroutes
    history_len: int = 240    # HISTORY_LEN (roadnet.h:306)
    MAXLPR: int = 1           # route-table lanes-per-road width (rn rows)
    inn_shifts: Tuple[int, ...] = ()   # lane -> inner-lane permutation plan
    out_shifts: Tuple[int, ...] = ()   # lane -> outer-lane permutation plan

    @property
    def dt(self):
        return jnp.float32(self.interval)


@partial(jax.tree_util.register_dataclass,
         data_fields=["step", "finished_cnt", "cum_travel", "overflow",
                      "n_l", "n_k", "el_cursor", "phase", "phase_remain",
                      "blk",
                      "l_dis", "l_speed", "l_flow", "l_route", "l_rpos",
                      "l_nxt", "l_nxt3", "l_prev", "l_enter", "l_pri",
                      "l_uid", "l_last", "l_custom", "l_hascustom",
                      "k_dis", "k_speed", "k_flow", "k_route", "k_rpos",
                      "k_entll", "k_enter", "k_pri", "k_uid", "k_nxtl",
                      "k_custom", "k_hascustom",
                      "l_off", "l_sh", "l_chg", "l_dir", "l_gap", "l_yv",
                      "l_rnrow", "l_auxrow", "k_gap", "l_tpl", "k_tpl",
                      "h_ring_num", "h_ring_ssum", "h_num", "h_ssum",
                      "h_t"],
         meta_fields=[])
@dataclass
class RingState:
    step: Any
    finished_cnt: Any
    cum_travel: Any
    overflow: Any
    n_l: Any                  # (LNp,) i32 occupied lane slots (front prefix)
    n_k: Any                  # (LKp,) i32
    el_cursor: Any            # (EL,) i32 next spawn-queue row per entry lane
    phase: Any                # (I,) i32 (ring intersection order)
    phase_remain: Any         # (I,) f32
    blk: Any                  # (LKp,) i32 blocker foe-lpi per link (-1)
    l_dis: Any; l_speed: Any; l_flow: Any; l_route: Any; l_rpos: Any
    l_nxt: Any; l_nxt3: Any; l_prev: Any; l_enter: Any; l_pri: Any
    l_uid: Any; l_last: Any; l_custom: Any; l_hascustom: Any
    k_dis: Any; k_speed: Any; k_flow: Any; k_route: Any; k_rpos: Any
    k_entll: Any; k_enter: Any; k_pri: Any; k_uid: Any; k_nxtl: Any
    k_custom: Any; k_hascustom: Any
    # lane-change channels (None when cfg.lane_change is off — zero cost)
    l_off: Any = None         # signed lateral offset (changing reals)
    l_sh: Any = None          # shadow flag
    l_chg: Any = None         # changing flag (real side)
    l_dir: Any = None         # -1/0/+1 change direction (both sides)
    l_gap: Any = None         # Vehicle::controllerInfo.gap incl. staleness
    l_yv: Any = None          # per-step yieldSpeed (100 = no-op)
    l_rnrow: Any = None       # (MAXLPR, SL, LNp) route-next row bundle
    l_auxrow: Any = None      # (MAXLPR, SL, LNp) two-hop aux row bundle
    k_gap: Any = None         # link-side gap channel (staleness carrier)
    # template channels (None when cfg.uniform — zero cost)
    l_tpl: Any = None         # (SL, LNp) i32 template index
    k_tpl: Any = None         # (SK, LKp) i32 template index
    # lane-history channels (None when cfg.track_history is off):
    # Lane::updateHistory rolling window (roadnet.cpp:900-915), kept as
    # speed SUMS like gen-1 core/step.update_history (one extra rounding
    # vs the reference's (num, avg) pairs — documented delta)
    h_ring_num: Any = None    # (history_len+1, LNp) per-step lane counts
    h_ring_ssum: Any = None   # (history_len+1, LNp) per-step speed sums
    h_num: Any = None         # (LNp,) window count sum
    h_ssum: Any = None        # (LNp,) window speed sum
    h_t: Any = None           # i32 updateHistory calls so far

    def replace_fields(self, **kw):
        return dataclasses.replace(self, **kw)


def init_ring_state(cfg: RingConfig, net, num_entry: int) -> RingState:
    import numpy as np
    f = jnp.float32
    SL, SK, LNp, LKp = cfg.SL, cfg.SK, cfg.LNp, cfg.LKp
    zl = lambda: jnp.zeros((SL, LNp), f)
    il_ = lambda v=0: jnp.full((SL, LNp), v, jnp.int32)
    zk = lambda: jnp.zeros((SK, LKp), f)
    ik = lambda v=0: jnp.full((SK, LKp), v, jnp.int32)
    n_ph = np.asarray(net["i_n_phases"])
    off = np.asarray(net["i_phase_offset"])
    pt = np.asarray(net["phase_time"])
    first = pt[np.clip(off, 0, len(pt) - 1)]
    remain = jnp.asarray(np.where(n_ph > 0, first, 0.0), f)
    lc = {}
    if cfg.lane_change:
        lc = dict(
            l_off=zl(), l_sh=jnp.zeros((SL, LNp), bool),
            l_chg=jnp.zeros((SL, LNp), bool), l_dir=il_(0),
            l_gap=zl(),                      # Vehicle ctor: gap = 0
            l_yv=jnp.full((SL, LNp), 100.0, f),
            l_rnrow=jnp.full((cfg.MAXLPR, SL, LNp), -1, jnp.int32),
            l_auxrow=jnp.full((cfg.MAXLPR, SL, LNp), -1, jnp.int32),
            k_gap=zk())
    if not cfg.uniform:
        lc = dict(lc, l_tpl=il_(0), k_tpl=ik(0))
    if cfg.track_history:
        HL1 = cfg.history_len + 1
        lc = dict(lc,
                  h_ring_num=jnp.zeros((HL1, LNp), f),
                  h_ring_ssum=jnp.zeros((HL1, LNp), f),
                  h_num=jnp.zeros(LNp, f), h_ssum=jnp.zeros(LNp, f),
                  h_t=jnp.int32(0))
    return RingState(
        step=jnp.int32(0), finished_cnt=jnp.int32(0), cum_travel=f(0),
        overflow=jnp.int32(0),
        n_l=jnp.zeros(LNp, jnp.int32), n_k=jnp.zeros(LKp, jnp.int32),
        el_cursor=jnp.zeros(num_entry, jnp.int32),
        phase=jnp.zeros(cfg.I, jnp.int32), phase_remain=remain,
        blk=jnp.full(LKp, -1, jnp.int32),
        l_dis=zl(), l_speed=zl(), l_flow=il_(), l_route=il_(), l_rpos=il_(),
        l_nxt=il_(-1), l_nxt3=il_(-1), l_prev=il_(-1), l_enter=zl(),
        l_pri=il_(), l_uid=il_(-1), l_last=jnp.zeros((SL, LNp), bool),
        l_custom=zl(), l_hascustom=jnp.zeros((SL, LNp), bool),
        k_dis=zk(), k_speed=zk(), k_flow=ik(), k_route=ik(), k_rpos=ik(),
        k_entll=ik(INT_MAX), k_enter=zk(), k_pri=ik(), k_uid=ik(-1),
        k_nxtl=ik(-1), k_custom=zk(), k_hascustom=jnp.zeros((SK, LKp), bool),
        **lc)


def _update_history(cfg: RingConfig, rs: RingState) -> RingState:
    """Lane::updateHistory (roadnet.cpp:900-915) on the ring layout —
    the per-lane count is the slot occupancy n_l (shadow slots included,
    like the reference's lane list) and the speed sum reduces the l_speed
    channel over occupied slots. Same window arithmetic as gen-1
    core/step.update_history: the subtraction removes exactly the stored
    entry, so the window sums carry no accumulation drift."""
    f = rs.l_speed.dtype
    SL = cfg.SL
    HL1 = cfg.history_len + 1
    occ = jnp.arange(SL, dtype=jnp.int32)[:, None] < rs.n_l[None, :]
    cur_num = rs.n_l.astype(f)
    cur_ssum = jnp.sum(jnp.where(occ, rs.l_speed, f.type(0)), axis=0)
    slot = rs.h_t % HL1
    full = rs.h_t >= HL1
    old_num = jax.lax.dynamic_slice_in_dim(rs.h_ring_num, slot, 1)[0]
    old_ssum = jax.lax.dynamic_slice_in_dim(rs.h_ring_ssum, slot, 1)[0]
    old_num = jnp.where(full, old_num, f.type(0))
    old_ssum = jnp.where(full, old_ssum, f.type(0))
    return rs.replace_fields(
        h_num=rs.h_num - old_num + cur_num,
        h_ssum=rs.h_ssum - old_ssum + cur_ssum,
        h_ring_num=jax.lax.dynamic_update_slice_in_dim(
            rs.h_ring_num, cur_num[None], slot, 0),
        h_ring_ssum=jax.lax.dynamic_update_slice_in_dim(
            rs.h_ring_ssum, cur_ssum[None], slot, 0),
        h_t=rs.h_t + 1)


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def _typed_mm(cfg, E, x):
    """Per-type one-hot operator: E (T, A, B) applied to x (..., B, G)
    column blocks -> (..., A, G). Runs on the MXU."""
    outs = []
    for t, (g0, g1) in enumerate(cfg.type_ranges):
        outs.append(jnp.einsum("ab,...bg->...ag", E[t], x[..., g0:g1],
                               precision=HI))
    return jnp.concatenate(outs, axis=-1)


def _sel_slot(oh, x):
    return jnp.sum(jnp.where(oh, x, jnp.zeros_like(x)), axis=0)


def _hilo(pri):
    f = jnp.float32
    return (pri >> 16).astype(f), (pri & 0xFFFF).astype(f)


def _from_hilo(h, l):
    return (h.astype(jnp.int32) << 16) | l.astype(jnp.int32)


def _pri_gt(ah, al, bh, bl):
    return (ah > bh) | ((ah == bh) & (al > bl))


class _PP:
    """Param provider. Uniform: scalars from cfg.params (the compiled
    program is identical to the pre-template one). Non-uniform: per-slot
    f32 arrays materialized from a template-index array via one one-hot
    einsum against tpl_params (TP, 12) — MXU work, no per-slot gathers.
    Reference semantics: every vehicle carries its flow template
    (VehicleInfo, vehicle.h:31-45); formulas mix SELF params with the
    LEADER's maxNegAcc/usualNegAcc/len (vehicle.cpp:217,229,160) — build
    one _PP per role from the matching tpl array."""

    def __init__(self, cfg, net, tpl=None):
        self.cfg = cfg
        if cfg.uniform:
            self.P = None
        else:
            f = jnp.float32
            oh = (tpl[..., None] == jnp.arange(cfg.TP, dtype=jnp.int32)) \
                .astype(f)
            self.P = jnp.einsum("...t,tp->...p", oh, net["tpl_params"],
                                precision=HI)

    def __getitem__(self, i):
        if self.cfg.uniform:
            # raw python float: keeps the uniform program bit-identical
            # to the pre-template one (scalar constants fold at trace
            # time exactly as before; the goldens pin this)
            return self.cfg.params[i]
        return self.P[..., i]


def _shifted_exchange(rows, n_out, shifts, gid, res_j, res_src):
    """Apply a constant index map as masked static slices + tiny residual
    gather (ring_net.shift_plan). `rows` is (N_in, CH); returns (n_out, CH).
    On TPU a constant-index row gather still pays the scalar core per index
    (~5 ns x LNp x B adds up to tens of ms per step at 30x30); the slices
    are vector loads."""
    n_in, ch = rows.shape
    lo = max(0, -min(shifts)) if shifts else 0
    hi = max(0, (max(shifts) if shifts else 0) + n_out - n_in)
    rows_p = jnp.pad(rows, ((lo, hi), (0, 0)))
    out = jnp.zeros((n_out, ch), rows.dtype)
    for k, o in enumerate(shifts):
        sl = jax.lax.dynamic_slice_in_dim(rows_p, o + lo, n_out, axis=0)
        out = jnp.where((gid == k)[:, None], sl, out)
    if res_j.shape[0]:
        res_rows = jnp.take(rows, jnp.clip(res_src, 0), axis=0)
        out = out.at[jnp.clip(res_j, 0, n_out - 1)].set(res_rows)
    return out


def _fwd_ex(net, cfg, rows):
    """Lane -> in-lane exchange ((LNp, CH) -> (IL*G, CH)), module-level
    variant of the per-phase closures."""
    in_src = net["in_src"].reshape(-1)
    src_ok = in_src >= 0
    if cfg.fwd_shifts:
        return _shifted_exchange(rows, cfg.IL * cfg.G, cfg.fwd_shifts,
                                 net["fwd_gid"], net["fwd_res_j"],
                                 net["fwd_res_src"])
    return jnp.where(src_ok[:, None],
                     jnp.take(rows, jnp.clip(in_src, 0), axis=0), 0.0)


def _bwd_ex(net, cfg, rows):
    """In-lane -> lane exchange ((IL*G, CH) -> (LNp, CH))."""
    if cfg.bwd_shifts:
        return _shifted_exchange(rows, cfg.LNp, cfg.bwd_shifts,
                                 net["bwd_gid"], net["bwd_res_j"],
                                 net["bwd_res_src"])
    iv = net["in_inv"]
    return jnp.where((iv >= 0)[:, None],
                     jnp.take(rows, jnp.clip(iv, 0), axis=0), 0.0)


def lc_front_ctx(net, cfg: RingConfig, rs: RingState):
    """Link-domain context for the LC phase (pre-insert state): per-lane
    out-link ring tails (olt_*, the lanechange.cpp:33-47 fallback
    candidates and the vehicle.cpp:170-180 overlap-rule leaders), the
    front vehicle's next-link length + end-lane tail (nlen/etd/ete), and
    per-link end-lane tails (k_etd/k_ete) for the k_gap refresh.
    Non-uniform templates: candidate/tail LEN channels ride along
    (etl / olt_len / k_etl) and best_val subtracts each candidate's OWN
    len; the uniform path stays structurally identical (bit-pinned)."""
    f = jnp.float32
    SL, SK, LNp, LKp = cfg.SL, cfg.SK, cfg.LNp, cfg.LKp
    G, LPI, IL, OL = cfg.G, cfg.LPI, cfg.IL, cfg.OL
    p_len = cfg.params[1]
    tpp = net["tpl_params"] if not cfg.uniform else None
    sl_idx = jnp.arange(SL, dtype=jnp.int32)[:, None]
    sk_idx = jnp.arange(SK, dtype=jnp.int32)[:, None]

    def ol_view(x):
        return x.reshape(OL, cfg.I)[:, :G]

    # lane tails -> per-link end-lane tails
    oh_tail = sl_idx == (rs.n_l - 1)[None, :]
    tl_dis = _sel_slot(oh_tail, rs.l_dis)
    tl_exists = rs.n_l > 0
    etd_lk = _typed_mm(cfg, net["E_end"], ol_view(tl_dis)[None])[0]
    ete_lk = _typed_mm(cfg, net["E_end"],
                       ol_view(tl_exists.astype(f))[None])[0] > 0.5
    if not cfg.uniform:
        tl_tpl = _sel_slot(oh_tail, rs.l_tpl.astype(f)).astype(jnp.int32)
        tl_len = _PP(cfg, net, tl_tpl)[P_LEN]                   # (LNp,)
        etl_lk = _typed_mm(cfg, net["E_end"], ol_view(tl_len)[None])[0]

    # link ring tails -> per-in-lane out-link candidates (laneLinks order)
    oh_ktail = sk_idx == (rs.n_k - 1)[None, :]
    kt_dis = _sel_slot(oh_ktail, rs.k_dis)
    kt_exists = rs.n_k > 0
    oc_in = [kt_dis.reshape(LPI, G), kt_exists.astype(f).reshape(LPI, G)]
    if not cfg.uniform:
        kt_tpl = _sel_slot(oh_ktail, rs.k_tpl.astype(f)).astype(jnp.int32)
        kt_len = _PP(cfg, net, kt_tpl)[P_LEN]
        oc_in.append(kt_len.reshape(LPI, G))
    oc = _typed_mm(cfg, net["E_out"], jnp.stack(oc_in, axis=0)) \
        .reshape(len(oc_in), IL, cfg.KOUT, G)
    oc_valid = net["out_valid_g"] > 0
    best_ex = jnp.zeros((IL, G), bool)
    best_raw = jnp.zeros((IL, G), f)
    if cfg.uniform:
        # strict-min (first wins) over dis: same winner as the leader
        # scan's min over dis - len (uniform lengths)
        for k in range(cfg.KOUT):
            cand_ex = (oc[1, :, k] > 0.5) & oc_valid[:, k]
            better = cand_ex & (~best_ex | (oc[0, :, k] < best_raw))
            best_raw = jnp.where(better, oc[0, :, k], best_raw)
            best_ex = best_ex | cand_ex
        best_val_il = best_raw - p_len
    else:
        # each candidate subtracts ITS OWN len (vehicle.cpp:174 gap rule)
        for k in range(cfg.KOUT):
            cand_ex = (oc[1, :, k] > 0.5) & oc_valid[:, k]
            v = oc[0, :, k] - oc[2, :, k]
            better = cand_ex & (~best_ex | (v < best_raw))
            best_raw = jnp.where(better, v, best_raw)
            best_ex = best_ex | cand_ex
        best_val_il = best_raw

    # the front vehicle's next link: length + end-lane tail, via the
    # (IL, G) one-hot routing used by the main phase
    nxt_ilg = _fwd_ex(net, cfg, rs.l_nxt[0].astype(f)[:, None])[:, 0] \
        .reshape(IL, G).astype(jnp.int32)
    g_iota = jnp.arange(G, dtype=jnp.int32)[None, :]
    lpi_h = jnp.where(nxt_ilg >= 0, (nxt_ilg - LNp - g_iota)
                      // jnp.int32(G), -1)
    ohl = (lpi_h[None] == jnp.arange(LPI, dtype=jnp.int32)
           [:, None, None]).astype(f)
    fl_in = [net["lk_len"].reshape(LPI, G), etd_lk, ete_lk.astype(f)]
    if not cfg.uniform:
        fl_in.append(etl_lk)
    fl = jnp.einsum("lig,clg->cig", ohl, jnp.stack(fl_in), precision=HI)

    # back to the lane axis
    ch = [best_val_il.reshape(-1), best_ex.astype(f).reshape(-1),
          fl[0].reshape(-1), fl[1].reshape(-1), fl[2].reshape(-1)]
    for k in range(cfg.KOUT):
        ch.append(oc[0, :, k].reshape(-1))
        ch.append((oc[1, :, k] > 0.5)
                  .astype(f).reshape(-1) * oc_valid[:, k].reshape(-1))
    if not cfg.uniform:
        ch.append(fl[3].reshape(-1))                 # end-tail len
        for k in range(cfg.KOUT):
            ch.append(oc[2, :, k].reshape(-1))       # candidate len
    lane = _bwd_ex(net, cfg, jnp.stack(ch, axis=-1))
    out = dict(
        best_val=lane[:, 0], best_ex=lane[:, 1] > 0.5,
        nlen=lane[:, 2], etd=lane[:, 3], ete=lane[:, 4] > 0.5,
        olt_dis=jnp.stack([lane[:, 5 + 2 * k] for k in range(cfg.KOUT)]),
        olt_ex=jnp.stack([lane[:, 6 + 2 * k] > 0.5
                          for k in range(cfg.KOUT)]),
        k_etd=etd_lk.reshape(-1), k_ete=ete_lk.reshape(-1))
    if not cfg.uniform:
        base = 5 + 2 * cfg.KOUT
        out["etl"] = lane[:, base]
        out["olt_len"] = jnp.stack(
            [lane[:, base + 1 + k] for k in range(cfg.KOUT)])
        out["k_etl"] = etl_lk.reshape(-1)
    return out


# ---------------------------------------------------------------------------
# the step
# ---------------------------------------------------------------------------

def _notify_phase(net, cfg: RingConfig, rs: RingState, q,
                  debug: bool = False):
    """One Engine::nextStep (engine.cpp:566-594) in ring layout;
    `q` = per-entry-lane spawn queues (host mt19937 replay).
    With debug=True also returns a dict of intermediates (tests only)."""
    dbg = {}
    f = jnp.float32
    dt = cfg.dt
    SL, SK, LNp, LKp = cfg.SL, cfg.SK, cfg.LNp, cfg.LKp
    G, LPI, KC, IL, OL, AP = cfg.G, cfg.LPI, cfg.KC, cfg.IL, cfg.OL, cfg.AP
    ov = rs.overflow

    # scalar params: the uniform path's constants (bit-pinned by the
    # goldens). On the non-uniform path these are NaN-poisoned
    # (ring_sim.build_sim) — every use below is either guarded by
    # cfg.uniform / cfg.lane_change (LC forces uniform) or replaced by a
    # _PP per-slot provider, so a missed site fails loudly.
    (p_speed0, p_len, p_width, p_maxpos, p_maxneg, p_upa, p_una,
     p_mingap, p_maxspd, p_headway, p_yield, p_turnspd) = cfg.params
    approach = p_maxspd * p_maxspd / p_una / 2 + p_maxspd * cfg.interval * 2
    tpp = net["tpl_params"] if not cfg.uniform else None

    # =====================================================================
    # 1. spawn + admission (Flow::nextStep + Engine::handleWaiting,
    #    engine.cpp:502-516; gen-1 spawn_vehicles/admit_waiting)
    # =====================================================================
    if cfg.lane_change:
        # stale-gap refresh on the PRE-admission rings: the reference's
        # makeSignal reads controllerInfo.gap as written by the END of
        # the previous step's updateLeaderAndGap (engine.cpp:581), i.e.
        # before this step's spawns/admissions exist
        from cityflow_tpu.core import ring_lc
        fx = lc_front_ctx(net, cfg, rs)
        rs = ring_lc.refresh_gaps(net, cfg, rs, fx)
    el_lane = net["el_lane"]
    EL = el_lane.shape[0]
    QCAP = q["step"].shape[1]
    cur = jnp.clip(rs.el_cursor, 0, QCAP - 1)
    row = {k: jnp.take_along_axis(q[k], cur[:, None], axis=1)[:, 0]
           for k in q}
    has_row = (rs.el_cursor < QCAP) & (row["step"] >= 0) \
        & (row["step"] <= rs.step)
    n_e = jnp.take(rs.n_l, el_lane)
    tail_flat = jnp.clip(n_e - 1, 0) * LNp + el_lane
    t_dis = jnp.take(rs.l_dis.reshape(-1), tail_flat)
    # Lane::available (roadnet.cpp:428-436): tail dis > tail len +
    # INCOMING vehicle's minGap (gen-1 step.py head_mingap/tla sourcing)
    if cfg.uniform:
        avail_e = (n_e == 0) | (t_dis > p_len + p_mingap)
    else:
        t_tpl_e = jnp.take(rs.l_tpl.reshape(-1), tail_flat)
        t_len_e = jnp.take(tpp[:, P_LEN], t_tpl_e)
        q_mingap = jnp.take(tpp[:, P_MINGAP], row["tpl"])
        avail_e = (n_e == 0) | (t_dis > t_len_e + q_mingap)
    admit = has_row & avail_e & (n_e < SL)
    ov = ov | jnp.where(jnp.any(has_row & avail_e & (n_e >= SL)),
                        OV_SLOTS, 0).astype(jnp.int32)

    ln_llocal = net["ln_llocal"]
    rn = net["route_next"]
    NR, RLEN, MAXLPR = rn.shape

    def rn_at(route, pos, llocal):
        fi = (jnp.clip(route, 0, NR - 1) * RLEN
              + jnp.clip(pos, 0, RLEN - 1)) * MAXLPR \
            + jnp.clip(llocal, 0, MAXLPR - 1)
        return jnp.take(rn.reshape(-1), fi)

    rt = jnp.clip(row["route"], 0, NR - 1)
    nxt0 = rn_at(rt, 0, jnp.take(ln_llocal, el_lane))
    end0 = jnp.take(net["lk_end_lane"], jnp.clip(nxt0 - LNp, 0, LKp - 1))
    nxt3_0 = jnp.where(nxt0 >= 0,
                       rn_at(rt, 1, jnp.take(ln_llocal, jnp.clip(end0, 0))),
                       -1)
    last0 = jnp.take(net["route_len"], rt) <= 1

    # spread EL-domain values to the lane axis with the static one-hot
    # (13 per-attr scalar-core scatters cost ~5 ms/step at 30x30)
    E_el = net["E_el"]                              # (LNp, EL)
    adm_lane = jnp.einsum("ne,e->n", E_el, admit.astype(f),
                          precision=HI) > 0.5       # (LNp,)
    pri_h0, pri_l0 = _hilo(row["pri"])

    def spread(v):
        return jnp.einsum("ne,e->n", E_el,
                          jnp.where(admit, v.astype(f), 0.0), precision=HI)
    vals = jnp.stack([spread(row["flow"]), spread(rt),
                      spread(nxt0), spread(nxt3_0),
                      spread(pri_h0), spread(pri_l0),
                      spread(row["uid"]), spread(last0)], axis=0)
    place = adm_lane[None, :] & (jnp.arange(SL, dtype=jnp.int32)[:, None]
                                 == rs.n_l[None, :])

    def put(a, dense_v):
        return jnp.where(place, dense_v[None, :].astype(a.dtype), a)

    def putc(a, const):
        return jnp.where(place, jnp.asarray(const, a.dtype), a)

    lc_adm = {}
    if cfg.lane_change:
        # per-vehicle route-row bundles (ring_lc module docstring): the
        # row of (route, rpos=0) from route_next and route_aux, fetched
        # in the (small) EL domain and spread like the other channels
        aux_flat = net["route_aux"].reshape(-1)
        rn_flat = rn.reshape(-1)
        base = jnp.clip(rt, 0, NR - 1) * RLEN * MAXLPR
        rn_rows = [spread(jnp.take(rn_flat, base + c))
                   for c in range(cfg.MAXLPR)]
        ax_rows = [spread(jnp.take(aux_flat, base + c))
                   for c in range(cfg.MAXLPR)]
        # admission-time gap: handleWaiting calls updateLeaderAndGap with
        # the pre-push tail (engine.cpp:510-512); an empty lane runs the
        # full scan (hop-1 = out-link ring tails of the entry lane, hop-2
        # = the first link's end-lane tail within the lookahead bound)
        tail_ex_e = n_e > 0
        b_ex_e = jnp.take(fx["best_ex"], el_lane)
        b_val_e = jnp.take(fx["best_val"], el_lane)
        ln_len_e = jnp.take(net["ln_len"], el_lane)
        nlen_e = jnp.take(net["lk_len"], jnp.clip(nxt0 - LNp, 0, LKp - 1))
        n_end = jnp.take(rs.n_l, jnp.clip(end0, 0, LNp - 1))
        etd_e = jnp.take(rs.l_dis.reshape(-1),
                         jnp.clip(n_end - 1, 0) * LNp
                         + jnp.clip(end0, 0, LNp - 1))
        has_n0 = nxt0 >= 0
        if cfg.uniform:
            etl_e = p_len                    # end-lane tail's len
            tl_len_e = p_len                 # entry lane tail's len
            approach_e = approach            # SELF lookahead bound
        else:
            # per-entry (small EL domain) gathers, like the avail check
            etl_tpl_e = jnp.take(rs.l_tpl.reshape(-1),
                                 jnp.clip(n_end - 1, 0) * LNp
                                 + jnp.clip(end0, 0, LNp - 1))
            etl_e = jnp.take(tpp[:, P_LEN], etl_tpl_e)
            tl_len_e = t_len_e               # from the avail check above
            ms_e = jnp.take(tpp[:, P_MAXSPEED], row["tpl"])
            una_e = jnp.take(tpp[:, P_USUALNEGACC], row["tpl"])
            approach_e = ms_e * ms_e / una_e / 2 + ms_e * cfg.interval * 2
        f1_e = has_n0 & b_ex_e
        f2_e = has_n0 & ~b_ex_e & (n_end > 0) \
            & (ln_len_e + nlen_e <= approach_e)
        scan_gap = jnp.where(
            f1_e, ln_len_e + b_val_e,
            jnp.where(f2_e, ln_len_e + nlen_e + etd_e - etl_e, f(0)))
        adm_gap = jnp.where(tail_ex_e, t_dis - tl_len_e, scan_gap)
        lc_adm = dict(
            l_off=putc(rs.l_off, 0.0),
            l_sh=putc(rs.l_sh, False), l_chg=putc(rs.l_chg, False),
            l_dir=putc(rs.l_dir, 0),
            l_gap=put(rs.l_gap, spread(adm_gap)),
            l_yv=putc(rs.l_yv, 100.0),
            l_rnrow=jnp.stack(
                [jnp.where(place, rn_rows[c][None, :].astype(jnp.int32),
                           rs.l_rnrow[c]) for c in range(cfg.MAXLPR)],
                axis=0),
            l_auxrow=jnp.stack(
                [jnp.where(place, ax_rows[c][None, :].astype(jnp.int32),
                           rs.l_auxrow[c]) for c in range(cfg.MAXLPR)],
                axis=0))
    tpl_adm = {}
    if not cfg.uniform:
        # spawn speed = the template's startSpeed; template index rides
        # the ring like flow/route (VehicleInfo copy at Flow::nextStep)
        q_speed0 = jnp.take(tpp[:, P_SPEED], row["tpl"])
        tpl_adm = dict(
            l_speed=put(rs.l_speed, spread(q_speed0)),
            l_tpl=put(rs.l_tpl, spread(row["tpl"])))
    rs = rs.replace_fields(
        l_dis=putc(rs.l_dis, 0.0),
        l_speed=(tpl_adm.pop("l_speed") if tpl_adm
                 else putc(rs.l_speed, p_speed0)),
        l_flow=put(rs.l_flow, vals[0]),
        l_route=put(rs.l_route, vals[1]),
        l_rpos=putc(rs.l_rpos, 0),
        l_nxt=put(rs.l_nxt, vals[2]), l_nxt3=put(rs.l_nxt3, vals[3]),
        l_prev=putc(rs.l_prev, -1),
        # enterTime is the SPAWN step (Vehicle ctor at Flow::nextStep,
        # flow.cpp; gen-1 spawn_vehicles step.py:350), not the admission
        # step — vehicles may wait in the queue for many steps first
        l_enter=put(rs.l_enter, spread(row["step"]) * dt),
        l_pri=jnp.where(place, _from_hilo(vals[4], vals[5]), rs.l_pri),
        l_uid=put(rs.l_uid, vals[6]),
        l_last=jnp.where(place, vals[7] > 0.5, rs.l_last),
        l_custom=putc(rs.l_custom, 0.0),
        l_hascustom=putc(rs.l_hascustom, False),
        n_l=rs.n_l + adm_lane.astype(jnp.int32),
        el_cursor=rs.el_cursor + admit.astype(jnp.int32),
        **lc_adm, **tpl_adm)

    # ---- lane change: signals, arbitration, shadow insertion ------------
    # (initSegments + planLaneChange + scheduleLaneChange,
    # engine.cpp:571-575; all subsequent phases see the post-insert rings;
    # fx link-ring tails are unaffected by lane admissions, so the
    # pre-admission context stays valid here)
    if cfg.lane_change:
        rs, lc_ov = ring_lc.lc_phase(net, cfg, rs, fx)
        ov = ov | jnp.where(lc_ov & 1, OV_REMOVE, 0).astype(jnp.int32) \
            | jnp.where(lc_ov & 2, OV_SLOTS, 0).astype(jnp.int32)
        if cfg.track_history:
            # first Lane::updateHistory of the step: the laneChange
            # pipeline runs updateLeaderAndGap after shadow insertion
            # (engine.cpp:571-581), and updateHistory rides every
            # updateLeaderAndGap call — counts see fresh shadows, speeds
            # are last step's committed values (gen-1 does the same)
            rs = _update_history(cfg, rs)

    # =====================================================================
    # 2. views
    # =====================================================================
    sl_idx = jnp.arange(SL, dtype=jnp.int32)[:, None]
    sk_idx = jnp.arange(SK, dtype=jnp.int32)[:, None]
    occ_l = sl_idx < rs.n_l[None, :]
    occ_k = sk_idx < rs.n_k[None, :]

    # lane tail bundle (rear vehicle; link end-specials + canEnter)
    oh_tail = sl_idx == (rs.n_l - 1)[None, :]
    tl_dis = _sel_slot(oh_tail, rs.l_dis)
    tl_prev = _sel_slot(oh_tail, rs.l_prev)
    tl_speed = _sel_slot(oh_tail, rs.l_speed)
    tl_prih, tl_pril = _hilo(_sel_slot(oh_tail, rs.l_pri))
    tl_exists = rs.n_l > 0
    tl_tpl = _sel_slot(oh_tail, rs.l_tpl) if not cfg.uniform else None

    # link ring tail (overlap-rule leader candidates)
    oh_ktail = sk_idx == (rs.n_k - 1)[None, :]
    kt_dis = _sel_slot(oh_ktail, rs.k_dis)
    kt_speed = _sel_slot(oh_ktail, rs.k_speed)
    kt_exists = rs.n_k > 0
    kt_tpl = _sel_slot(oh_ktail, rs.k_tpl) if not cfg.uniform else None

    # forward exchange: lane-front bundles -> (AP, IL, G) in-lane view.
    # One constant-index row gather per step (the global lane permutation).
    prih_l, pril_l = _hilo(rs.l_pri[:AP])
    fch = [rs.l_dis[:AP], rs.l_speed[:AP],
           rs.l_nxt[:AP].astype(f), rs.l_nxt3[:AP].astype(f),
           rs.l_route[:AP].astype(f), rs.l_rpos[:AP].astype(f),
           rs.l_flow[:AP].astype(f), prih_l, pril_l,
           rs.l_uid[:AP].astype(f), rs.l_enter[:AP],
           rs.l_custom[:AP], rs.l_hascustom[:AP].astype(f),
           occ_l[:AP].astype(f)]
    if cfg.lane_change:
        # stale-gap channel for lane->link transfer payloads + per-slot
        # yieldSpeed for the link-domain front min-chain (ch 14, 15)
        fch.append(rs.l_gap[:AP])
        fch.append(rs.l_yv[:AP])
    if not cfg.uniform:
        # template index (ch 16 with LC, else 14): small ints, exact f32
        fch.append(rs.l_tpl[:AP].astype(f))
    CH_TPL = 16 if cfg.lane_change else 14
    NFC = len(fch)
    fwd = jnp.concatenate(
        [jnp.stack(fch, axis=0).reshape(NFC * AP, LNp),
         net["ln_len"][None, :], net["ln_maxspd"][None, :]], axis=0)
    in_src = net["in_src"].reshape(-1)
    src_ok = in_src >= 0

    def fwd_exchange(rows):        # (LNp, CH) -> (IL*G, CH)
        if cfg.fwd_shifts:
            return _shifted_exchange(rows, IL * G, cfg.fwd_shifts,
                                     net["fwd_gid"], net["fwd_res_j"],
                                     net["fwd_res_src"])
        return jnp.where(src_ok[:, None],
                         jnp.take(rows, jnp.clip(in_src, 0), axis=0), 0.0)

    def bwd_exchange(rows):        # (IL*G, CH) -> (LNp, CH)
        if cfg.bwd_shifts:
            return _shifted_exchange(rows, LNp, cfg.bwd_shifts,
                                     net["bwd_gid"], net["bwd_res_j"],
                                     net["bwd_res_src"])
        iv = net["in_inv"]
        return jnp.where((iv >= 0)[:, None],
                         jnp.take(rows, jnp.clip(iv, 0), axis=0), 0.0)

    inl = fwd_exchange(fwd.T).T
    inl = jnp.where(src_ok[None, :], inl, 0.0).reshape(-1, IL, G)

    def ap_ch(c):
        return inl[c * AP:(c + 1) * AP]
    h_dis = ap_ch(0); h_speed = ap_ch(1)
    h_nxt = ap_ch(2).astype(jnp.int32); h_nxt3 = ap_ch(3).astype(jnp.int32)
    h_route = ap_ch(4).astype(jnp.int32); h_rpos = ap_ch(5).astype(jnp.int32)
    h_flow = ap_ch(6).astype(jnp.int32)
    h_prih = ap_ch(7); h_pril = ap_ch(8)
    h_uid = ap_ch(9).astype(jnp.int32); h_enter = ap_ch(10)
    h_custom = ap_ch(11); h_hascustom = ap_ch(12) > 0
    h_occ = (ap_ch(13) > 0) & src_ok.reshape(IL, G)[None]
    h_tpl = ap_ch(CH_TPL).astype(jnp.int32) if not cfg.uniform else None
    il_len = inl[NFC * AP]
    il_maxspd = inl[NFC * AP + 1]

    # =====================================================================
    # 3. link domain
    # =====================================================================
    ph_row = net["g_phase_offset"] + jnp.clip(rs.phase[:G], 0)
    avail_rows = jnp.take(
        net["phase_rl_avail"],
        jnp.clip(ph_row, 0, net["phase_rl_avail"].shape[0] - 1), axis=0)
    avail_lk = _typed_mm(cfg, net["E_rl"], avail_rows.T) > 0.5   # (LPI, G)

    lk_id = (LNp + jnp.arange(LKp, dtype=jnp.int32)).reshape(LPI, G)
    lk_len = net["lk_len"].reshape(LPI, G)
    lk_turn = net["lk_turn"].reshape(LPI, G)

    def Estart(x):
        return _typed_mm(cfg, net["E_start"], x)

    def Eend(x):
        return _typed_mm(cfg, net["E_end"], x)

    def ol_view(x):     # (LNp,) -> (OL, G): real inters lead the I axis
        return x.reshape(OL, cfg.I)[:, :G]

    end_tail_dis = Eend(ol_view(tl_dis))
    end_tail_prev = Eend(ol_view(tl_prev.astype(f))).astype(jnp.int32)
    end_tail_speed = Eend(ol_view(tl_speed))
    end_tail_prih = Eend(ol_view(tl_prih))
    end_tail_pril = Eend(ol_view(tl_pril))
    end_tail_exists = Eend(ol_view(tl_exists.astype(f))) > 0.5
    if not cfg.uniform:
        end_tail_tpl = Eend(ol_view(tl_tpl.astype(f))).astype(jnp.int32)
        et_pp = _PP(cfg, net, end_tail_tpl)       # end-lane tail's params
        end_tail_len = et_pp[P_LEN]

    st_head_dis = Estart(h_dis[0])
    st_head_nxt = Estart(h_nxt[0].astype(f)).astype(jnp.int32)
    st_head_speed = Estart(h_speed[0])
    st_head_prih = Estart(h_prih[0])
    st_head_pril = Estart(h_pril[0])
    st_head_occ = Estart(h_occ[0].astype(f)) > 0.5
    st_len = Estart(il_len)
    st_head_tpl = Estart(h_tpl[0].astype(f)).astype(jnp.int32) \
        if not cfg.uniform else None

    # ---- notify winners (Engine::threadNotifyCross, engine.cpp:317-372;
    #      gen-1 notify_cross candidate chain) ----------------------------
    d = net["lk_d"].reshape(KC, LPI, G)
    cvalid = net["lk_cvalid"].reshape(KC, LPI, G)
    kdis3 = rs.k_dis.reshape(SK, LPI, G)
    kspd3 = rs.k_speed.reshape(SK, LPI, G)
    kent3 = rs.k_entll.reshape(SK, LPI, G)
    kpri3 = rs.k_pri.reshape(SK, LPI, G)
    occ_k3 = occ_k.reshape(SK, LPI, G)
    n_k3 = rs.n_k.reshape(LPI, G)
    if not cfg.uniform:
        k_tpl3 = rs.k_tpl.reshape(SK, LPI, G)
        pp_k = _PP(cfg, net, k_tpl3)              # link-row self params
        k_len3 = pp_k[P_LEN]

    # candidates = occupied slots whose tail has not cleared the cross;
    # tails decrease along the ring, so the winner is slot `cnt` (the count
    # of slots still past the cross) — one fused broadcast-reduce
    tail_off = p_len if cfg.uniform else k_len3   # each vehicle's OWN len
    cnt = jnp.sum(occ_k3[:, None] & ((kdis3 - tail_off)[:, None] > d[None]),
                  axis=0).astype(jnp.int32)
    ring_hit = cnt < n_k3[None]

    e_ok = end_tail_exists & (end_tail_prev == lk_id)
    p_e = lk_len + end_tail_dis
    t_e = p_e - (p_len if cfg.uniform else end_tail_len)
    e_elig = e_ok[None] & (t_e[None] < d)
    s_ok = st_head_occ & (st_head_nxt == lk_id) & avail_lk
    p_s = st_head_dis - st_len

    # winner channels via a single one-hot contraction over the slot axis
    # (a per-slot where-chain writes the full (KC,LPI,G) arrays SK times)
    oh_w = (jnp.arange(SK, dtype=jnp.int32)[:, None, None, None]
            == cnt[None]) & ring_hit[None]              # (SK,KC,LPI,G)
    def wsel(x3):                                        # (SK,LPI,G) ->
        return jnp.sum(jnp.where(oh_w, x3[:, None], 0.0), axis=0)
    w_p = wsel(kdis3)
    w_speed = wsel(kspd3)
    w_entf = wsel(jnp.minimum(kent3, 1 << 25).astype(f))
    kprih, kpril = _hilo(kpri3)
    w_prih = wsel(kprih)
    w_pril = wsel(kpril)
    use_start = ~e_elig & ~ring_hit & s_ok[None]
    w_p = jnp.where(use_start, p_s[None], w_p)
    w_speed = jnp.where(use_start, st_head_speed[None], w_speed)
    w_entf = jnp.where(use_start, f(ENT_BIG), w_entf)
    w_prih = jnp.where(use_start, st_head_prih[None], w_prih)
    w_pril = jnp.where(use_start, st_head_pril[None], w_pril)
    w_p = jnp.where(e_elig, p_e[None], w_p)
    w_speed = jnp.where(e_elig, end_tail_speed[None], w_speed)
    w_entf = jnp.where(e_elig, f(ENT_BIG), w_entf)
    w_prih = jnp.where(e_elig, end_tail_prih[None], w_prih)
    w_pril = jnp.where(e_elig, end_tail_pril[None], w_pril)
    exists = e_elig | ring_hit | use_start

    ndist = d - w_p
    if cfg.uniform:
        n_yield = can_yield(w_speed, f(p_maxneg), f(p_yield), f(p_len),
                            ndist)
        n_target = jnp.where(lk_turn[None], f(p_turnspd), f(p_maxspd))
        n_reach = reach_steps(w_speed, ndist, n_target, f(p_upa), dt)
        n_cleared = ndist + p_len < 0
    else:
        # the notifying vehicle's OWN params (Cross::notify stores the
        # notifier; canPass reads its reach/yield — roadnet.cpp:595-660)
        w_tpl = wsel(k_tpl3.astype(f)).astype(jnp.int32)
        w_tpl = jnp.where(use_start, st_head_tpl[None], w_tpl)
        w_tpl = jnp.where(e_elig, end_tail_tpl[None], w_tpl)
        pp_w = _PP(cfg, net, w_tpl)
        n_yield = can_yield(w_speed, pp_w[P_MAXNEGACC], pp_w[P_YIELD],
                            pp_w[P_LEN], ndist)
        n_target = jnp.where(lk_turn[None], pp_w[P_TURNSPEED],
                             pp_w[P_MAXSPEED])
        n_reach = reach_steps(w_speed, ndist, n_target,
                              pp_w[P_USUALPOSACC], dt)
        n_cleared = ndist + pp_w[P_LEN] < 0

    # blocker-cycle flag, link granularity (fast-mode stand-in for
    # Cross::canPass Floyd cycle detection, roadnet.cpp:662-674; blocker
    # edges never leave an intersection since every edge comes from one of
    # its crosses). Pointer doubling via one-hot composition.
    blk3 = rs.blk.reshape(LPI, G)
    lpi_iota = jnp.arange(LPI, dtype=jnp.int32)[:, None, None]
    fcur = blk3
    for _ in range(cfg.k_cyc):
        ohf = (fcur[None] == lpi_iota)                  # (LPIv, LPI, G)
        f2 = jnp.einsum("vlg,vg->lg", ohf.astype(f), blk3.astype(f),
                        precision=HI).astype(jnp.int32)
        any_src = jnp.any(ohf, axis=0)
        fcur = jnp.where((fcur >= 0) & any_src, f2, -1)
    cyc_link = fcur >= 0

    # ---- foe exchange (gen-1 lnk_cross_foe_pos permutation) -------------
    # channels 0-3 are bools, 4 is a small int: exact in single-pass bf16.
    # channels 5-8 (ndist, ent, pri hi/lo) need full f32: 3-pass bf16 (HI).
    fields = jnp.stack([
        exists.astype(f), n_yield.astype(f), n_cleared.astype(f),
        jnp.broadcast_to(cyc_link[None].astype(f), (KC, LPI, G)),
        jnp.minimum(n_reach, 255).astype(f),   # ints <= 256 exact in bf16
        ndist, w_entf, w_prih, w_pril], axis=0)
    NF = fields.shape[0]
    NB = 5                           # bf16-safe leading channels
    if cfg.foe_via_perm:
        # keep the two precision groups SEPARATE end to end: a combined
        # (NF, KC, LPI, G) f32 slab cost a pad+relayout-copy+re-slice
        # chain of ~25 ms/step at 30x30 B=128 (r05 profile); the lo
        # group also STAYS bf16 (its values already crossed the exchange
        # in bf16 — flags and ints <= 256 are exact)
        x = fields.reshape(NF, KC * LPI, G)
        lo_t, hi_t = [], []
        for t, (g0, g1) in enumerate(cfg.type_ranges):
            P = net["foe_perm"][t]
            lo_t.append(jnp.einsum("st,ctg->csg", P.astype(jnp.bfloat16),
                                   x[:NB, :, g0:g1].astype(jnp.bfloat16)))
            hi_t.append(jnp.einsum("st,ctg->csg", P, x[NB:, :, g0:g1],
                                   precision=HI))
        lo = jnp.concatenate(lo_t, axis=-1).reshape(NB, KC, LPI, G)
        hi = jnp.concatenate(hi_t, axis=-1).reshape(NF - NB, KC, LPI, G)
        foe_exists = lo[0] > 0.5
        foe_yield = lo[1] > 0.5
        foe_cleared = lo[2] > 0.5
        foe_cyc = lo[3] > 0.5
        foe_reach = lo[4].astype(f)      # ints <= 255: exact round-trip
        foe_dist = hi[0]
        foe_ent = hi[1]
        foe_ph, foe_plo = hi[2], hi[3]
    else:
        flat = fields.reshape(NF, KC * LKp)
        foe = jnp.take(flat, net["foe_gather"].reshape(-1),
                       axis=1).reshape(NF, KC, LPI, G)
        foe_exists = foe[0] > 0.5
        foe_yield = foe[1] > 0.5
        foe_cleared = foe[2] > 0.5
        foe_cyc = foe[3] > 0.5
        foe_reach = foe[4]
        foe_dist = foe[5]
        foe_ent = foe[6]
        foe_ph, foe_plo = foe[7], foe[8]
    foe_dpos = foe_dist > 0

    # ---- per-row cross decisions (Cross::canPass, roadnet.cpp:604-660;
    #      gen-1 get_action decision tree) --------------------------------
    t1 = net["lk_type"].reshape(LPI, G)
    t2 = net["lk_foetype"].reshape(KC, LPI, G)
    foelpi = net["lk_foelpi"].reshape(KC, LPI, G)


    def cross_caps(dls, speed, my_ent_f, my_ph, my_plo, relevant, pp=None):
        """Batched over a leading row axis: inputs (R, LPI, G), outputs
        (R, LPI, G); intermediates (R, KC, LPI, G) stay inside one fused
        loop (per-row calls emitted R separate fusion chains).
        pp: subject params — None/uniform keeps the scalar constants."""
        d1 = d[None] - dls[:, None]                     # (R, KC, LPI, G)
        if cfg.uniform:
            self_yield = can_yield(speed[:, None], f(p_maxneg), f(p_yield),
                                   f(p_len), d1)
            self_target4 = jnp.where(lk_turn, f(p_turnspd),
                                     f(p_maxspd))[None, None]
            self_upa = f(p_upa)
        else:
            self_yield = can_yield(
                speed[:, None], pp[P_MAXNEGACC][:, None],
                pp[P_YIELD][:, None], pp[P_LEN][:, None], d1)
            self_target4 = jnp.where(lk_turn[None], pp[P_TURNSPEED],
                                     pp[P_MAXSPEED])[:, None]
            self_upa = pp[P_USUALPOSACC][:, None]
        # both sides saturate at 255 (the foe channel crosses the bf16
        # exchange): beyond that the reference would still compare exact
        # ints, but "both >= 255 steps away" ties fall through to the
        # enter-time rule, which is the right behavior anyway
        sr = jnp.minimum(reach_steps(speed[:, None], d1,
                                     self_target4,
                                     self_upa, dt), 255)
        fr = foe_reach[None]
        # final tie-break: vehicle priority (roadnet.cpp:652). Symmetric
        # grids hit exact (reach, enterTime, distance) triple ties
        # constantly, so this must be the reference's comparison; the
        # 32-bit priorities ride the exchange as exact 16-bit f32 halves
        pri_win = _pri_gt(my_ph[:, None], my_plo[:, None],
                          foe_ph[None], foe_plo[None])
        same_rank_y = jnp.where(
            fr > sr, -1, jnp.where(
                fr < sr, 1, jnp.where(
                    my_ent_f[:, None] == foe_ent[None],
                    jnp.where(d1 == foe_dist[None],
                              jnp.where(pri_win, -1, 1),
                              jnp.where(d1 < foe_dist[None], -1, 1)),
                    jnp.where(my_ent_f[:, None] < foe_ent[None], -1, 1))))
        t_eq = jnp.where(foe_dpos[None], same_rank_y,
                         jnp.where(foe_cleared[None], -1, 1))
        t_lt_pre = jnp.where(foe_dpos[None], jnp.where(fr > sr, -1, 0),
                             jnp.where(foe_cleared[None], -1, 0))
        t_lt = jnp.where(t_lt_pre == 0, 1, t_lt_pre)
        y0 = jnp.where(t1[None, None] > t2[None], -1,
                       jnp.where(t1[None, None] < t2[None], t_lt, t_eq))
        y = jnp.where(~foe_yield[None], 1, y0)
        y = jnp.where((y == 1) & foe_cyc[None], -1, y)
        passes = ~foe_exists[None] | ~self_yield | (y == -1)
        considered = cvalid[None] & (d[None] >= dls[:, None]) \
            & relevant[:, None]
        fail = considered & ~passes
        any_fail = jnp.any(fail, axis=1)
        # first (nearest) failing cross: crosses are distance-ASC, so the
        # min failing distance IS the first (argmax+one-hot costs ~13 ms)
        ff_d = jnp.min(jnp.where(fail, d[None], jnp.inf), axis=1)
        ff_foe = jnp.max(jnp.where(fail & (d[None] == ff_d[:, None]),
                                   foelpi[None], -1), axis=1)
        return any_fail, ff_d, ff_foe

    def isr_speed(dls, speed, lane_left, any_fail, ff_d, is_approach,
                  next_avail, can_enter, pp=None):
        """getIntersectionRelatedSpeed (vehicle.cpp:337-376; gen-1).
        pp: subject params — None/uniform keeps the scalar constants."""
        if cfg.uniform:
            s_maxspd, s_turn = f(p_maxspd), f(p_turnspd)
            s_upa, s_una = f(p_upa), f(p_una)
            s_yield, s_maxneg = f(p_yield), f(p_maxneg)
        else:
            s_maxspd, s_turn = pp[P_MAXSPEED], pp[P_TURNSPEED]
            s_upa, s_una = pp[P_USUALPOSACC], pp[P_USUALNEGACC]
            s_yield, s_maxneg = pp[P_YIELD], pp[P_MAXNEGACC]
        if cfg.uniform:
            v_isr = jnp.full_like(speed, s_maxspd)
        else:
            v_isr = jnp.broadcast_to(s_maxspd, speed.shape)
        if isinstance(is_approach, bool):
            app_mask = jnp.full_like(speed, is_approach, dtype=bool)
        else:
            app_mask = is_approach
        v_isr = jnp.where(app_mask & lk_turn,
                          jnp.minimum(v_isr, s_turn), v_isr)
        v_stop = stop_before_speed(speed, s_upa, s_una,
                                   ff_d - dls - s_yield, dt)
        v_isr = jnp.where(any_fail, jnp.minimum(v_isr, v_stop), v_isr)
        red = app_mask & (~next_avail | ~can_enter)
        min_brake = 0.5 * speed * speed / s_maxneg
        red_stop = red & ~(min_brake > lane_left)
        v_red = jnp.minimum(s_maxspd, stop_before_speed(
            speed, s_upa, s_una, lane_left, dt))
        return jnp.where(red_stop, v_red, v_isr), red_stop

    # Lane::canEnter of the link's end lane (roadnet.cpp:438-445; gen-1
    # step.py:662-664: tail dis > tail len + SUBJECT len, or tail moving)
    if cfg.uniform:
        can_enter_k = (~end_tail_exists
                       | (end_tail_dis > p_len + p_len)
                       | (end_tail_speed >= 2))
    else:
        def can_enter_of(own_len):     # own_len broadcasts over (LPI, G)
            return (~end_tail_exists
                    | (end_tail_dis > end_tail_len + own_len)
                    | (end_tail_speed >= 2))

    def min_chain(speed, gap, lead_spd, has_lead, v_isr, isr_rel, custom,
                  has_custom, drv_maxspd, invalid, lane_left,
                  v_yield=None, raw=False, pp=None, lead_pp=None):
        """Vehicle::getNextSpeed min-rule (vehicle.cpp:308-335; gen-1).

        v_yield: lane-change yieldSpeed term (100 = no-op), applied after
        the intersection term like gen-1 (step.py min-chain order).
        raw=True returns the clamped speed BEFORE the negative-speed
        kinematics split (engine.cpp:212-219 runs after the cross-partner
        min in vehicleControl) — used by the lane-change lockstep path.
        pp/lead_pp: SELF / LEADER params — the no-collision terms use the
        leader's maxNegAcc/usualNegAcc (vehicle.cpp:217,229; gen-1
        step.py:636-640), everything else self."""
        if cfg.uniform:
            s_maxneg, s_una = f(p_maxneg), f(p_una)
            s_mingap, s_headway = f(p_mingap), p_headway
            s_maxspd, s_maxpos = f(p_maxspd), f(p_maxpos)
            l_maxneg, l_una = f(p_maxneg), f(p_una)
        else:
            s_maxneg, s_una = pp[P_MAXNEGACC], pp[P_USUALNEGACC]
            s_mingap, s_headway = pp[P_MINGAP], pp[P_HEADWAY]
            s_maxspd, s_maxpos = pp[P_MAXSPEED], pp[P_MAXPOSACC]
            l_maxneg, l_una = lead_pp[P_MAXNEGACC], lead_pp[P_USUALNEGACC]
        v_hard = no_collision_speed(lead_spd, l_maxneg, speed,
                                    s_maxneg, gap, dt, f(0))
        assume_decel = jnp.where(speed > lead_spd, speed - lead_spd, f(0))
        v_soft = no_collision_speed(lead_spd, l_una, speed, s_una,
                                    gap, dt, s_mingap)
        v_headway = ((gap + (lead_spd + assume_decel / 2) * dt
                      - speed * dt / 2) / (s_headway + dt / 2))
        v_plain = jnp.minimum(jnp.minimum(v_hard, v_soft), v_headway)
        v_cust = jnp.minimum(custom, v_hard)
        v_lead = jnp.where(has_custom, v_cust, v_plain)
        v_nolead = jnp.where(has_custom, custom, s_maxspd)
        v_cf = jnp.where(has_lead, v_lead, v_nolead)
        v = jnp.minimum(s_maxspd, speed + s_maxpos * dt)
        v = jnp.minimum(v, drv_maxspd)
        v = jnp.minimum(v, v_cf)
        v = jnp.where(isr_rel, jnp.minimum(v, v_isr), v)
        if v_yield is not None:
            v = jnp.minimum(v, v_yield)
        v_inv = no_collision_speed(f(0), f(1), speed, s_maxneg,
                                   lane_left, dt, s_mingap)
        v = jnp.where(invalid, jnp.minimum(v, v_inv), v)
        v = jnp.maximum(v, speed - s_maxneg * dt)
        if raw:
            return v
        neg = v < 0
        delta = jnp.where(neg, 0.5 * speed * speed / s_maxneg,
                          (speed + v) * dt / 2)
        return jnp.where(neg, f(0), v), delta

    # --- link ring rows ---
    lead_dis_k = jnp.concatenate(
        [jnp.full((1, LKp), 1e9, f), rs.k_dis[:-1]], axis=0)
    lead_spd_k = jnp.concatenate(
        [jnp.zeros((1, LKp), f), rs.k_speed[:-1]], axis=0)
    has_lead_k = jnp.concatenate(
        [jnp.zeros((1, LKp), bool), occ_k[:-1]], axis=0)
    if cfg.uniform:
        lead_len_k3 = p_len
        lead_pp_k = None
        ce_k = can_enter_k
    else:
        # leader's len/maxNegAcc/usualNegAcc: shift the tpl channel the
        # same way dis/speed shift; slot 0's leader is the end-lane tail
        lead_tpl_k = jnp.concatenate(
            [jnp.zeros((1, LKp), jnp.int32), rs.k_tpl[:-1]], axis=0) \
            .reshape(SK, LPI, G).at[0].set(end_tail_tpl)
        lead_pp_k = _PP(cfg, net, lead_tpl_k)
        lead_len_k3 = lead_pp_k[P_LEN].reshape(SK, LKp)
        ce_k = can_enter_of(k_len3)
    gap_k = (lead_dis_k - lead_len_k3 - rs.k_dis).reshape(SK, LPI, G)
    # front: leader = end-lane tail (gen-1 leader_scan from a lanelink)
    fr_gap = (lk_len - kdis3[0]) + end_tail_dis \
        - (p_len if cfg.uniform else end_tail_len)
    gap_k = gap_k.at[0].set(jnp.where(end_tail_exists, fr_gap, gap_k[0]))
    lead_spd_k3 = lead_spd_k.reshape(SK, LPI, G)
    lead_spd_k3 = lead_spd_k3.at[0].set(end_tail_speed)
    has_lead_k3 = has_lead_k.reshape(SK, LPI, G)
    has_lead_k3 = has_lead_k3.at[0].set(end_tail_exists)

    R = min(cfg.SKC, SK)
    pp_kR = None if cfg.uniform else _PP(cfg, net, k_tpl3[:R])
    af_r, fd_r, ffo_r = cross_caps(
        kdis3[:R], kspd3[:R], jnp.minimum(kent3[:R], 1 << 25).astype(f),
        kprih[:R], kpril[:R], occ_k3[:R], pp=pp_kR)
    if SK > R:
        padz = lambda x, fill: jnp.concatenate(
            [x, jnp.full((SK - R, LPI, G), fill, x.dtype)], axis=0)
        k_fail_all = padz(af_r, False)
        k_ffd_all = padz(fd_r, 0.0)
        k_fffoe_all = padz(ffo_r, 0)
    else:
        k_fail_all, k_ffd_all, k_fffoe_all = af_r, fd_r, ffo_r
    v_isr_k, _ = isr_speed(kdis3, kspd3, jnp.zeros((SK, LPI, G), f),
                           k_fail_all, k_ffd_all, False, avail_lk,
                           ce_k, pp=None if cfg.uniform else pp_k)
    ns_k3, dd_k = min_chain(
        kspd3, gap_k, lead_spd_k3, has_lead_k3, v_isr_k,
        jnp.ones((SK, LPI, G), bool),
        rs.k_custom.reshape(SK, LPI, G),
        rs.k_hascustom.reshape(SK, LPI, G),
        f(10000.0),                  # LaneLink maxSpeed, roadnet.h:456
        jnp.zeros((SK, LPI, G), bool), jnp.zeros((SK, LPI, G), f),
        pp=None if cfg.uniform else pp_k,
        lead_pp=lead_pp_k)
    nd_k3 = kdis3 + dd_k

    # --- approach rows: lane fronts computed per-link then selected back
    g_iota = jnp.arange(G, dtype=jnp.int32)[None, :]

    def oh_lpi(nxt_ids):     # (IL, G) link ids -> one-hot (LPI, IL, G)
        lpi_h = jnp.where(nxt_ids >= 0, (nxt_ids - LNp - g_iota)
                          // jnp.int32(G), -1)
        return (lpi_h[None] == jnp.arange(LPI, dtype=jnp.int32)
                [:, None, None]).astype(f)

    # one einsum per direction with ALL channels stacked — per-channel
    # einsums re-materialize the (LPI, IL, G) one-hot each time
    def to_link(ohl, xs):    # [(IL,G)...] -> (C, LPI, G)
        return jnp.einsum("lig,cig->clg", ohl,
                          jnp.stack([x.astype(f) for x in xs]), precision=HI)

    def from_link(ohl, ys):  # [(LPI,G)...] -> (C, IL, G)
        return jnp.einsum("lig,clg->cig", ohl,
                          jnp.stack([y.astype(f) for y in ys]), precision=HI)

    # leader candidates for lane heads: ring tails of all out-links
    # (Lane::laneLinks order, strict-min on dis-len = the leader-scan
    # nearest-rear-end rule, vehicle.cpp:170-180; gen-1 leader_scan fast
    # path), else own link's end-lane tail. Non-uniform: each candidate
    # subtracts ITS OWN len, and the winner's template rides along for
    # the no-collision leader params.
    if cfg.uniform:
        ktail_val = kt_dis - p_len
        oc_ch = [ktail_val.reshape(LPI, G),
                 kt_exists.astype(f).reshape(LPI, G),
                 kt_speed.reshape(LPI, G)]
    else:
        kt_len = jnp.take(tpp[:, P_LEN], kt_tpl)
        ktail_val = kt_dis - kt_len
        oc_ch = [ktail_val.reshape(LPI, G),
                 kt_exists.astype(f).reshape(LPI, G),
                 kt_speed.reshape(LPI, G),
                 kt_tpl.astype(f).reshape(LPI, G)]
    oc = _typed_mm(cfg, net["E_out"], jnp.stack(oc_ch, axis=0))
    oc = oc.reshape(len(oc_ch), IL, cfg.KOUT, G)
    oc_valid = net["out_valid_g"] > 0                   # (IL, KOUT, G)
    best_val = jnp.zeros((IL, G), f)
    best_spd = jnp.zeros((IL, G), f)
    best_ex = jnp.zeros((IL, G), bool)
    best_tpl = jnp.zeros((IL, G), f)
    for k in range(cfg.KOUT):
        cand_ex = (oc[1, :, k] > 0.5) & oc_valid[:, k]
        better = cand_ex & (~best_ex | (oc[0, :, k] < best_val))
        best_val = jnp.where(better, oc[0, :, k], best_val)
        best_spd = jnp.where(better, oc[2, :, k], best_spd)
        if not cfg.uniform:
            best_tpl = jnp.where(better, oc[3, :, k], best_tpl)
        best_ex = best_ex | cand_ex

    # route each lane-front slot to its chosen link (one-hot over LPI),
    # run ONE batched cross_caps/isr pass over all AP rows, select back
    ohls = [oh_lpi(h_nxt[a]) for a in range(AP)]
    mine_ilgs = [h_occ[a] & (h_nxt[a] >= 0) for a in range(AP)]

    ap_hch = [[mine_ilgs[a], h_dis[a], h_speed[a], h_prih[a], h_pril[a]]
              for a in range(AP)]
    if not cfg.uniform:
        for a in range(AP):
            ap_hch[a].append(h_tpl[a].astype(f))
    lk_ch = [to_link(ohls[a], ap_hch[a]) for a in range(AP)]
    mine_lk = jnp.stack([c[0] for c in lk_ch]) > 0.5      # (AP, LPI, G)
    dis_lk = jnp.stack([c[1] for c in lk_ch])
    spd_lk = jnp.stack([c[2] for c in lk_ch])
    prih_lk = jnp.stack([c[3] for c in lk_ch])
    pril_lk = jnp.stack([c[4] for c in lk_ch])
    if cfg.uniform:
        pp_ap = None
        approach_ap = approach
        ce_ap = can_enter_k
    else:
        tpl_ap = jnp.stack([c[5] for c in lk_ch]).astype(jnp.int32)
        pp_ap = _PP(cfg, net, tpl_ap)                     # (AP, LPI, G)
        ms_ap = pp_ap[P_MAXSPEED]
        approach_ap = (ms_ap * ms_ap / pp_ap[P_USUALNEGACC] / 2
                       + ms_ap * dt * 2)
        ce_ap = can_enter_of(pp_ap[P_LEN])
    dls_ap = dis_lk - st_len[None]
    lane_left_lk = st_len[None] - dis_lk
    af_ap, fd_ap, ffo_ap = cross_caps(
        dls_ap, spd_lk, jnp.full((AP, LPI, G), f(ENT_BIG)),
        prih_lk, pril_lk, mine_lk, pp=pp_ap)
    v_isr_ap, red_ap = isr_speed(dls_ap, spd_lk, lane_left_lk, af_ap,
                                 fd_ap, True, avail_lk, ce_ap, pp=pp_ap)
    isr_rel_ap = mine_lk & (lane_left_lk <= approach_ap)

    ap_out = []          # per a: (speed, dis, relevant, fail, ffoe, red)
    for a in range(AP):
        ohl = ohls[a]
        mine_ilg = mine_ilgs[a]
        lead_pp_a = None
        # back to the lane side (one stacked einsum)
        if a == 0:
            bk_ch = [v_isr_ap[a], isr_rel_ap[a], end_tail_dis,
                     end_tail_exists, end_tail_speed, lk_len]
            if not cfg.uniform:
                bk_ch.append(end_tail_tpl.astype(f))
            bk = from_link(ohl, bk_ch)
            v_isr_a, isr_rel_a = bk[0], bk[1] > 0.5
            etd, ete, ets, nlen = bk[2], bk[3] > 0.5, bk[4], bk[5]
            lane_left_a = il_len - h_dis[0]
            gap1 = lane_left_a + best_val
            if cfg.uniform:
                gap2 = lane_left_a + nlen + etd - p_len
            else:
                # hop-2 leader = the next link's end-lane tail: its len
                et_tpl_a = bk[6].astype(jnp.int32)
                gap2 = lane_left_a + nlen + etd \
                    - jnp.take(tpp[:, P_LEN], et_tpl_a)
                lead_pp_a = _PP(cfg, net, jnp.where(
                    best_ex, best_tpl.astype(jnp.int32), et_tpl_a))
            has_lead = best_ex | ete
            glap = jnp.where(best_ex, gap1, gap2)
            lead_spd = jnp.where(best_ex, best_spd, ets)
        else:
            bk = from_link(ohl, [v_isr_ap[a], isr_rel_ap[a]])
            v_isr_a, isr_rel_a = bk[0], bk[1] > 0.5
            has_lead = h_occ[a - 1]
            if cfg.uniform:
                glap = h_dis[a - 1] - p_len - h_dis[a]
            else:
                glap = h_dis[a - 1] \
                    - jnp.take(tpp[:, P_LEN], h_tpl[a - 1]) - h_dis[a]
                lead_pp_a = _PP(cfg, net, h_tpl[a - 1])
            lead_spd = h_speed[a - 1]
        mc_args = (h_speed[a], glap, lead_spd, has_lead,
                   v_isr_a, isr_rel_a, h_custom[a], h_hascustom[a],
                   il_maxspd, jnp.zeros((IL, G), bool),
                   il_len - h_dis[a])
        mc_kw = {} if cfg.uniform else dict(
            pp=_PP(cfg, net, h_tpl[a]), lead_pp=lead_pp_a)
        if cfg.lane_change:
            # raw (pre-kinematics) speed: the cross-partner lockstep min
            # runs in the lane domain before the negative-speed split
            vr = min_chain(*mc_args, v_yield=ap_ch(15)[a], raw=True,
                           **mc_kw)
            ap_out.append(dict(spd=vr, dis=h_dis[a],
                               rel=mine_ilg, fail_lk=af_ap[a] & mine_lk[a],
                               ffo_lk=ffo_ap[a],
                               red_lk=red_ap[a] & mine_lk[a]))
        else:
            vs, dd = min_chain(*mc_args, **mc_kw)
            ap_out.append(dict(spd=vs, dis=h_dis[a] + dd,
                               rel=mine_ilg, fail_lk=af_ap[a] & mine_lk[a],
                               ffo_lk=ffo_ap[a],
                               red_lk=red_ap[a] & mine_lk[a]))

    # --- lane-domain dynamics for all slots, then override fronts --------
    lead_dis_l = jnp.concatenate(
        [jnp.full((1, LNp), 1e9, f), rs.l_dis[:-1]], axis=0)
    lead_spd_l = jnp.concatenate(
        [jnp.zeros((1, LNp), f), rs.l_speed[:-1]], axis=0)
    has_lead_l = jnp.concatenate(
        [jnp.zeros((1, LNp), bool), occ_l[:-1]], axis=0)
    if cfg.uniform:
        lane_mc_kw = {}
        gap_l = lead_dis_l - p_len - rs.l_dis
    else:
        lead_tpl_l = jnp.concatenate(
            [jnp.zeros((1, LNp), jnp.int32), rs.l_tpl[:-1]], axis=0)
        lead_pp_l = _PP(cfg, net, lead_tpl_l)
        lane_mc_kw = dict(pp=_PP(cfg, net, rs.l_tpl), lead_pp=lead_pp_l)
        gap_l = lead_dis_l - lead_pp_l[P_LEN] - rs.l_dis
    lane_left_l = net["ln_len"][None, :] - rs.l_dis
    invalid_l = occ_l & (rs.l_nxt < 0) & ~rs.l_last
    in_inv = net["in_inv"]
    has_inv = in_inv >= 0
    lane_mc_args = (
        rs.l_speed, gap_l, lead_spd_l, has_lead_l,
        jnp.zeros((SL, LNp), f), jnp.zeros((SL, LNp), bool),
        rs.l_custom, rs.l_hascustom, net["ln_maxspd"][None, :],
        invalid_l, lane_left_l)
    if cfg.lane_change:
        from cityflow_tpu.core import ring_lc
        vraw_l = min_chain(*lane_mc_args, v_yield=rs.l_yv, raw=True,
                           **lane_mc_kw)
        back = jnp.stack(
            [x for a in range(AP) for x in
             (ap_out[a]["spd"].reshape(-1),
              ap_out[a]["rel"].reshape(-1).astype(f))], axis=-1)
        got = bwd_exchange(back)
        for a in range(AP):
            use = has_inv & (got[:, 2 * a + 1] > 0)
            vraw_l = vraw_l.at[a].set(
                jnp.where(use, got[:, 2 * a], vraw_l[a]))
        # real+shadow lockstep: min of both raw next speeds
        # (engine.cpp:195-210; gen-1 step.py partner min)
        (pv,), pf = ring_lc.partner_fetch(net, cfg, rs, [vraw_l])
        vmin = jnp.where(pf, jnp.minimum(vraw_l, pv), vraw_l)
        if debug:
            dbg["lc_vraw"] = vraw_l
            dbg["lc_pv"] = pv
            dbg["lc_pf"] = pf
        neg = vmin < 0
        mneg_l = f(p_maxneg) if cfg.uniform \
            else _PP(cfg, net, rs.l_tpl)[P_MAXNEGACC]
        delta_l = jnp.where(neg, 0.5 * rs.l_speed * rs.l_speed / mneg_l,
                            (rs.l_speed + vmin) * dt / 2)
        new_spd_l = jnp.where(neg, f(0), vmin)
        new_dis_l = rs.l_dis + delta_l
    else:
        new_spd_l, delta_l = min_chain(*lane_mc_args, **lane_mc_kw)
        new_dis_l = rs.l_dis + delta_l
        back = jnp.stack(
            [x for a in range(AP) for x in
             (ap_out[a]["spd"].reshape(-1), ap_out[a]["dis"].reshape(-1),
              ap_out[a]["rel"].reshape(-1).astype(f))],
            axis=-1)                                         # (ILG, 3*AP)
        got = bwd_exchange(back)
        for a in range(AP):
            use = has_inv & (got[:, 3 * a + 2] > 0)
            new_spd_l = new_spd_l.at[a].set(
                jnp.where(use, got[:, 3 * a], new_spd_l[a]))
            new_dis_l = new_dis_l.at[a].set(
                jnp.where(use, got[:, 3 * a + 1], new_dis_l[a]))

    mid = dict(
        inl=inl,
        nd_k3=nd_k3, ns_k3=ns_k3,
        new_dis_l=new_dis_l, new_spd_l=new_spd_l,
        k_fail=jnp.stack(k_fail_all) if isinstance(k_fail_all, list)
        else k_fail_all,
        k_fffoe=jnp.stack(k_fffoe_all) if isinstance(k_fffoe_all, list)
        else k_fffoe_all,
        ap_spd=jnp.stack([o["spd"] for o in ap_out]),
        ap_dis=jnp.stack([o["dis"] for o in ap_out]),
        ap_fail=jnp.stack([o["fail_lk"] for o in ap_out]),
        ap_ffo=jnp.stack([o["ffo_lk"] for o in ap_out]),
        ap_red=jnp.stack([o["red_lk"] for o in ap_out]),
        ov=ov)
    return rs, mid, dbg


def _commit_phase(net, cfg: RingConfig, rs: RingState, mid):
    """Phase 4: transfers / removals / ring commits / lights. Split from
    the notify/decision phase so each half compiles (and caches) as its
    own executable — the monolithic 30x30 program pushed past practical
    XLA compile budgets on the tunneled backend."""
    f = jnp.float32
    dt = cfg.dt
    SL, SK, LNp, LKp = cfg.SL, cfg.SK, cfg.LNp, cfg.LKp
    G, LPI, KC, IL, OL, AP = cfg.G, cfg.LPI, cfg.KC, cfg.IL, cfg.OL, cfg.AP
    ov = mid["ov"]
    sl_idx = jnp.arange(SL, dtype=jnp.int32)[:, None]
    sk_idx = jnp.arange(SK, dtype=jnp.int32)[:, None]
    occ_l = sl_idx < rs.n_l[None, :]
    occ_k = sk_idx < rs.n_k[None, :]
    occ_k3 = occ_k.reshape(SK, LPI, G)
    ln_llocal = net["ln_llocal"]
    rn = net["route_next"]
    NR, RLEN, MAXLPR = rn.shape

    def rn_at(route, pos, llocal):
        fi = (jnp.clip(route, 0, NR - 1) * RLEN
              + jnp.clip(pos, 0, RLEN - 1)) * MAXLPR \
            + jnp.clip(llocal, 0, MAXLPR - 1)
        return jnp.take(rn.reshape(-1), fi)

    in_src = net["in_src"].reshape(-1)
    src_ok = in_src >= 0

    def fwd_exchange(rows):
        if cfg.fwd_shifts:
            return _shifted_exchange(rows, IL * G, cfg.fwd_shifts,
                                     net["fwd_gid"], net["fwd_res_j"],
                                     net["fwd_res_src"])
        return jnp.where(src_ok[:, None],
                         jnp.take(rows, jnp.clip(in_src, 0), axis=0), 0.0)

    inl = mid["inl"]

    def ap_ch(c):
        return inl[c * AP:(c + 1) * AP]
    h_dis = ap_ch(0); h_speed = ap_ch(1)
    h_nxt = ap_ch(2).astype(jnp.int32); h_nxt3 = ap_ch(3).astype(jnp.int32)
    h_route = ap_ch(4).astype(jnp.int32); h_rpos = ap_ch(5).astype(jnp.int32)
    h_flow = ap_ch(6).astype(jnp.int32)
    h_prih = ap_ch(7); h_pril = ap_ch(8)
    h_uid = ap_ch(9).astype(jnp.int32); h_enter = ap_ch(10)
    h_occ = (ap_ch(13) > 0) & src_ok.reshape(IL, G)[None]
    h_tpl = ap_ch(16 if cfg.lane_change else 14).astype(jnp.int32) \
        if not cfg.uniform else None
    NFC = (inl.shape[0] - 2) // AP   # 14 (+gap,yv LC; +tpl non-uniform)
    il_len = inl[NFC * AP]

    g_iota = jnp.arange(G, dtype=jnp.int32)[None, :]

    def oh_lpi(nxt_ids):
        lpi_h = jnp.where(nxt_ids >= 0, (nxt_ids - LNp - g_iota)
                          // jnp.int32(G), -1)
        return (lpi_h[None] == jnp.arange(LPI, dtype=jnp.int32)
                [:, None, None]).astype(f)

    def to_link(ohl, xs):
        return jnp.einsum("lig,cig->clg", ohl,
                          jnp.stack([x.astype(f) for x in xs]), precision=HI)

    ohls = [oh_lpi(h_nxt[a]) for a in range(AP)]
    ap_out = [dict(spd=mid["ap_spd"][a], dis=mid["ap_dis"][a],
                   fail_lk=mid["ap_fail"][a], ffo_lk=mid["ap_ffo"][a],
                   red_lk=mid["ap_red"][a]) for a in range(AP)]
    k_fail_all = mid["k_fail"]
    k_fffoe_all = mid["k_fffoe"]
    nd_k3, ns_k3 = mid["nd_k3"], mid["ns_k3"]
    new_dis_l, new_spd_l = mid["new_dis_l"], mid["new_spd_l"]
    invalid_l = occ_l & (rs.l_nxt < 0) & ~rs.l_last
    dbg = {}

    # =====================================================================
    # 4. transfers / removals / commit
    # =====================================================================
    ln_len_b = net["ln_len"][None, :]
    # invalid vehicles never cross the lane end (v_inv stops them; clamp
    # guards fp edges so they cannot fall off the ring)
    new_dis_l = jnp.where(invalid_l, jnp.minimum(new_dis_l, ln_len_b),
                          new_dis_l)
    cross_l = occ_l & (new_dis_l > ln_len_b)
    pref = jnp.ones((LNp,), bool)
    leave_pref_l = []
    for s in range(min(cfg.XK, SL)):
        cur_l = cross_l[s] & pref
        leave_pref_l.append(cur_l)
        pref = cur_l
    x_l = sum(c.astype(jnp.int32) for c in leave_pref_l)
    if SL > cfg.XK:
        deep = cross_l[cfg.XK:] & (sl_idx[cfg.XK:] < rs.n_l[None, :])
        ov = ov | jnp.where(jnp.any(deep), OV_HOPS, 0).astype(jnp.int32)

    XKl = len(leave_pref_l)
    lcc = None
    if cfg.lane_change:
        from cityflow_tpu.core import ring_lc
        i32 = jnp.int32
        leave_full = jnp.concatenate(
            [jnp.stack(leave_pref_l, axis=0),
             jnp.zeros((SL - XKl, LNp), bool)], axis=0)
        sh = rs.l_sh
        chg_real = occ_l & rs.l_chg & ~sh
        # pair exchange round 1: who transfers into a link / dies at
        # route end this step
        chanA = leave_full & ~rs.l_last
        chanB = leave_full & rs.l_last
        (pA_, pB_), pf2 = ring_lc.partner_fetch(
            net, cfg, rs, [chanA.astype(f), chanB.astype(f)])
        pA = pA_ > 0.5
        pB = pB_ > 0.5
        # shadow abort: itself or its real crosses into a link
        # (engine.cpp:223-226 via gen-1 step.py "abort wins over a
        # same-step finish"). With equal-length sibling lanes the
        # lockstep pair crosses together, so the partner-cross term only
        # fires for unequal curved-lane lengths — there the reference
        # would keep the pair alive across the lane/link boundary; the
        # ring aborts instead (documented divergence).
        abort_sh = occ_l & sh & ~rs.l_last & (chanA | (pf2 & pA))
        # changing real: lateral offset integration (engine.cpp:228-243)
        dirn = rs.l_dir.astype(f)
        max_off = jnp.where(rs.l_dir > 0, net["ln_maxoff_out"][None, :],
                            net["ln_maxoff_in"][None, :])
        new_off = jnp.minimum(jnp.abs(
            rs.l_off + jnp.maximum(0.2 * new_spd_l, 1.0) * dt * dirn),
            max_off)
        finish_pre = chg_real & (new_off >= max_off) & ~leave_full
        # round 2: abort/finish flags across the pair
        (pAb_, pFin_), pf3 = ring_lc.partner_fetch(
            net, cfg, rs, [abort_sh.astype(f), finish_pre.astype(f)])
        pAb = pAb_ > 0.5
        pFin = pFin_ > 0.5
        finish = finish_pre & ~(pf3 & pAb)
        promote = occ_l & sh & ~abort_sh & pf3 & pFin
        unlink_real = chg_real & (~pf2 | (pf3 & pAb) | pB)
        unlink_sh = occ_l & sh & (~pf2 | pB)
        die_mid = finish | (abort_sh & ~leave_full)
        lcc = dict(die_mid=die_mid, abort_sh=abort_sh, finish=finish,
                   promote=promote, unlink_real=unlink_real,
                   unlink_sh=unlink_sh, new_off=new_off,
                   leave_full=leave_full, dirn=dirn)
        # shadows never transfer (they abort at the lane end); an aborted
        # shadow COUNTS toward finished-vehicle stats (the
        # engine.cpp:296-303 hasFinished guard passes for aborts — the
        # reference quirk, same as gen-1 update_location); a finishing
        # real is an identity-swap removal and does NOT count
        removed_l = [leave_pref_l[s] & (rs.l_last[s] | rs.l_sh[s])
                     for s in range(XKl)]
        exited_l = [leave_pref_l[s] & ~rs.l_last[s] & ~rs.l_sh[s]
                    & (rs.l_nxt[s] >= 0) for s in range(XKl)]
    else:
        removed_l = [leave_pref_l[s] & rs.l_last[s] for s in range(XKl)]
        exited_l = [leave_pref_l[s] & ~rs.l_last[s] & (rs.l_nxt[s] >= 0)
                    for s in range(XKl)]
    now = rs.step.astype(f) * dt
    tt = now - rs.l_enter
    n_rm = sum(r.astype(jnp.int32).sum() for r in removed_l)
    t_rm = sum(jnp.where(removed_l[s], tt[s], f(0)).sum()
               for s in range(len(removed_l)))
    if cfg.lane_change:
        cm = lcc["abort_sh"] & ~lcc["leave_full"]
        n_rm = n_rm + cm.astype(jnp.int32).sum()
        t_rm = t_rm + jnp.where(cm, tt, f(0)).sum()

    nd_k = nd_k3.reshape(SK, LKp)
    ns_k = ns_k3.reshape(SK, LKp)
    cross_k = occ_k & (nd_k > net["lk_len"][None, :])
    prefk = jnp.ones((LKp,), bool)
    leave_pref_k = []
    for s in range(min(cfg.XK, SK)):
        cur_k = cross_k[s] & prefk
        leave_pref_k.append(cur_k)
        prefk = cur_k
    x_k = sum(c.astype(jnp.int32) for c in leave_pref_k)
    if SK > cfg.XK:
        deepk = cross_k[cfg.XK:] & (sk_idx[cfg.XK:] < rs.n_k[None, :])
        ov = ov | jnp.where(jnp.any(deepk), OV_HOPS, 0).astype(jnp.int32)

    # ---- compact route lookups for link->lane entrants ------------------
    # Per-INTERSECTION compaction: exits from one intersection's links this
    # step are sorted to the front of its (XKe*LPI) candidate axis with a
    # multi-operand lax.sort (sorting network — jnp.nonzero lowers to a
    # 15 ms custom scan at this scale), then only the first TI rows do the
    # dynamic route-table lookups.
    XKe = len(leave_pref_k)
    exit_flags = jnp.stack(leave_pref_k, axis=0)           # (XKe, LKp)
    TI = min(cfg.TI, XKe * LPI)
    NC = XKe * LPI
    ef3 = exit_flags.reshape(XKe, LPI, G).reshape(NC, G)
    ov = ov | jnp.where(
        jnp.any(ef3.astype(jnp.int32).sum(0) > TI),
        OV_REMOVE, 0).astype(jnp.int32)
    src_iota = jnp.broadcast_to(
        jnp.arange(NC, dtype=jnp.int32)[:, None], (NC, G))
    key = jnp.where(ef3, src_iota, NC)
    # the combined route-table index is a pure function of (route, rpos+1,
    # end-lane local idx) — nxt and the baked two-hop aux (ring_net
    # route_aux) each need ONE gather at this index
    endl_local = jnp.take(ln_llocal, jnp.clip(net["lk_end_lane"], 0)) \
        .reshape(1, LPI, G)
    rowb3 = ((jnp.clip(rs.k_route[:XKe].reshape(XKe, LPI, G), 0, NR - 1)
              * RLEN + jnp.clip(rs.k_rpos[:XKe].reshape(XKe, LPI, G) + 1,
                                0, RLEN - 1)) * MAXLPR).reshape(NC, G)
    gidx3 = rowb3 + jnp.broadcast_to(
        jnp.clip(endl_local, 0, MAXLPR - 1), (XKe, LPI, G)).reshape(NC, G)
    skey, s_gidx, s_rowb = jax.lax.sort((key, gidx3, rowb3),
                                        dimension=0, num_keys=1)
    # stage 2: global compaction of the (TI, G) survivors to T2 rows so the
    # dynamic gathers run on ~T2*B indices instead of TI*G*B
    T2 = min(1024, TI * G)
    flat_key = jnp.where(skey[:TI] < NC,
                         jnp.arange(TI, dtype=jnp.int32)[:, None] * G
                         + jnp.arange(G, dtype=jnp.int32)[None, :],
                         TI * G).reshape(-1)
    k2, g2, b2 = jax.lax.sort(
        (flat_key, s_gidx[:TI].reshape(-1), s_rowb[:TI].reshape(-1)),
        dimension=0, num_keys=1)
    v2 = k2[:T2] < TI * G
    gi = jnp.clip(g2[:T2], 0, NR * RLEN * MAXLPR - 1)
    if T2 < TI * G:
        ov = ov | jnp.where(jnp.all(v2), OV_REMOVE, 0).astype(jnp.int32)
    r_aux = jnp.take(net["route_aux"].reshape(-1), gi)
    # compacted values to spread back: {name: (vals_T2, fill)}
    rvals = {
        "nxt": (jnp.take(rn.reshape(-1), gi), -1),
        "nxt3": ((r_aux >> 1) - 2, -1),
        "last": ((r_aux & 1), 0),
    }
    if cfg.lane_change:
        # full route-table ROWS at (route, rpos+1) for the entrant's
        # lane-change reachability checks (ring_lc route-row bundles)
        FMAX = NR * RLEN * MAXLPR - 1
        for c in range(cfg.MAXLPR):
            bi = jnp.clip(b2[:T2] + c, 0, FMAX)
            rvals[f"rn{c}"] = (jnp.take(rn.reshape(-1), bi), -1)
            rvals[f"ax{c}"] = (jnp.take(net["route_aux"].reshape(-1), bi),
                               -1)
    # scatter back to the (TI, G) stage-1 grid, then to the (NC, G) rows
    tgt2 = jnp.where(v2, jnp.clip(k2[:T2], 0, TI * G - 1), TI * G)
    s_grid = {
        name: jnp.full(TI * G + 1, fill, jnp.int32).at[tgt2].set(
            vals.astype(jnp.int32), mode="drop")[:-1].reshape(TI, G)
        for name, (vals, fill) in rvals.items()}
    pays = {name: jnp.full((NC, G), fill, jnp.int32)
            for name, (_, fill) in rvals.items()}
    c_valid = skey[:TI] < NC
    for ti in range(TI):
        hit = (src_iota == skey[ti][None, :]) & c_valid[ti][None, :]
        for name in pays:
            pays[name] = jnp.where(hit, s_grid[name][ti][None, :],
                                   pays[name])
    pay_nxt = pays["nxt"].reshape(XKe, LKp)
    pay_nxt3 = pays["nxt3"].reshape(XKe, LKp)
    pay_last = (pays["last"] > 0).reshape(XKe, LKp)

    # ---- link ring: shift out + append entering lane fronts -------------
    ex_cols = [exited_l[a].astype(f) if a < len(exited_l)
               else jnp.zeros(LNp, f) for a in range(AP)]
    if cfg.lane_change:
        # the lockstep/yield min runs in the lane domain, so the final
        # front speeds/distances live there — exchange them forward
        for a in range(AP):
            ex_cols.append(new_dis_l[a])
            ex_cols.append(new_spd_l[a])
    ex_stack = jnp.stack(ex_cols, axis=-1)                   # (LNp, AP[*3])
    ex_in = fwd_exchange(ex_stack) * src_ok[:, None]
    ent_valid = []
    ent_bundles = []
    ENT_CH = ["dis", "speed", "flow", "route", "rpos", "enter", "prih",
              "pril", "uid", "nxtl"]
    if cfg.lane_change:
        ENT_CH = ENT_CH + ["gap"]
    if not cfg.uniform:
        ENT_CH = ENT_CH + ["tpl"]
    for a in range(AP):
        ex_a = (ex_in[:, a] > 0).reshape(IL, G) & h_occ[a]
        ohl = ohls[a]
        ok = ex_a & (h_nxt[a] >= 0)
        okf = ok.astype(f)
        if cfg.lane_change:
            dis_f = ex_in[:, AP + 2 * a].reshape(IL, G)
            spd_f = ex_in[:, AP + 2 * a + 1].reshape(IL, G)
            src = [dis_f - il_len, spd_f]
        else:
            src = [ap_out[a]["dis"] - il_len, ap_out[a]["spd"]]
        src += [h_flow[a].astype(f), h_route[a].astype(f),
                h_rpos[a].astype(f), h_enter[a], h_prih[a], h_pril[a],
                h_uid[a].astype(f), h_nxt3[a].astype(f)]
        if cfg.lane_change:
            src.append(ap_ch(14)[a])          # stale controllerInfo.gap
        if not cfg.uniform:
            src.append(h_tpl[a].astype(f))
        got_ = to_link(ohl, [okf] + [jnp.where(ok, x, 0.0) for x in src])
        ent_valid.append(got_[0] > 0.5)
        ent_bundles.append(dict(zip(ENT_CH, got_[1:])))

    m_k = sum(e.astype(jnp.int32) for e in ent_valid).reshape(-1)
    new_n_k = rs.n_k - x_k + m_k
    ov = ov | jnp.where(jnp.any(new_n_k > SK),
                        OV_LINK_TABLE, 0).astype(jnp.int32)
    new_n_k = jnp.minimum(new_n_k, SK)

    def shift_out(updated, x_cnt, S, N, fill):
        # one padded buffer per channel; the shifted views are SLICES of
        # it, which fuse as inputs into the select loop (the former
        # per-shift concatenates each materialized a full slab —
        # ~15 slice+concat passes/step at 30x30 in the r05 profile)
        upd_pad = jnp.concatenate(
            [updated, jnp.full((cfg.XK, N), fill, updated.dtype)], axis=0)
        out = jax.lax.slice_in_dim(upd_pad, 0, S, axis=0)
        for x in range(1, cfg.XK + 1):
            out = jnp.where((x_cnt == x)[None, :],
                            jax.lax.slice_in_dim(upd_pad, x, x + S, axis=0),
                            out)
        return out

    def append_k(out, vals_per_a, fill):
        base = (rs.n_k - x_k)[None, :]
        for j in range(AP):
            prevcnt = (sum(e.astype(jnp.int32) for e in ent_valid[:j])
                       .reshape(-1) if j else jnp.zeros(LKp, jnp.int32))
            place = (sk_idx == base + prevcnt[None, :]) \
                & ent_valid[j].reshape(-1)[None, :]
            out = jnp.where(place, vals_per_a[j].reshape(-1)[None, :]
                            .astype(out.dtype), out)
        return out

    def commit_k(updated, name, fill, cast=None):
        outv = shift_out(updated, x_k, SK, LKp, fill)
        outv = append_k(outv, [ent_bundles[a][name] for a in range(AP)], fill)
        return outv if cast is None else outv.astype(cast)

    i32 = jnp.int32
    new_k_dis = commit_k(nd_k, "dis", 0.0)
    new_k_speed = commit_k(ns_k, "speed", 0.0)
    new_k_flow = commit_k(rs.k_flow.astype(f), "flow", 0.0, i32)
    new_k_route = commit_k(rs.k_route.astype(f), "route", 0.0, i32)
    new_k_rpos = commit_k(rs.k_rpos.astype(f), "rpos", 0.0, i32)
    new_k_enter = commit_k(rs.k_enter, "enter", 0.0)
    prih_k, pril_k = _hilo(rs.k_pri)
    nk_prih = commit_k(prih_k, "prih", 0.0)
    nk_pril = commit_k(pril_k, "pril", 0.0)
    new_k_pri = _from_hilo(nk_prih, nk_pril)
    new_k_uid = commit_k(rs.k_uid.astype(f), "uid", -1.0, i32)
    new_k_nxtl = commit_k(rs.k_nxtl.astype(f), "nxtl", -1.0, i32)
    # entrants entered this step (engine.cpp:484-491)
    ent_step_val = [jnp.full((LPI, G), rs.step.astype(f))] * AP
    new_k_entll = shift_out(rs.k_entll.astype(f), x_k, SK, LKp,
                            float(INT_MAX))
    new_k_entll = append_k(new_k_entll, ent_step_val,
                           float(INT_MAX)).astype(i32)
    new_k_gap = commit_k(rs.k_gap, "gap", 0.0) if cfg.lane_change else None
    new_k_tpl = commit_k(rs.k_tpl.astype(f), "tpl", 0.0, i32) \
        if not cfg.uniform else None

    # ---- lane ring: shift out + append link leavers (pushBuffer order:
    #      distance desc, engine.cpp:477-494) ----------------------------
    payload = dict(
        dis=nd_k - net["lk_len"][None, :], speed=ns_k,
        flow=rs.k_flow.astype(f), route=rs.k_route.astype(f),
        rpos=(rs.k_rpos + 1).astype(f), enter=rs.k_enter,
        prih=jnp.broadcast_to(prih_k, (SK, LKp)),
        pril=jnp.broadcast_to(pril_k, (SK, LKp)),
        uid=rs.k_uid.astype(f),
        nxt=jnp.concatenate([pay_nxt.astype(f),
                             jnp.full((SK - XKe, LKp), -1.0, f)], axis=0),
        nxt3=jnp.concatenate([pay_nxt3.astype(f),
                              jnp.full((SK - XKe, LKp), -1.0, f)], axis=0),
        last=jnp.concatenate([pay_last.astype(f),
                              jnp.zeros((SK - XKe, LKp), f)], axis=0),
        prev=jnp.broadcast_to(
            (LNp + jnp.arange(LKp, dtype=i32))[None, :].astype(f),
            (SK, LKp)))
    if not cfg.uniform:
        payload["tpl"] = rs.k_tpl.astype(f)
    if cfg.lane_change:
        payload["gap"] = rs.k_gap
        payload["zero"] = jnp.zeros((SK, LKp), f)
        for c in range(cfg.MAXLPR):
            for nm in (f"rn{c}", f"ax{c}"):
                payload[nm] = jnp.concatenate(
                    [pays[nm].reshape(XKe, LKp).astype(f),
                     jnp.full((SK - XKe, LKp), -1.0, f)], axis=0)
    PCH = list(payload.keys())
    cand_list, cand_valid = [], []
    for kin in range(cfg.KIN):
        E_app = net["E_app"][:, kin]                 # (T, OL, LPI)
        for xs in range(XKe):
            stackch = jnp.stack([payload[c][xs] for c in PCH], axis=0)
            got = _typed_mm(cfg, E_app,
                            stackch.reshape(len(PCH), LPI, G))
            vflag = _typed_mm(
                cfg, E_app,
                exit_flags[xs].astype(f).reshape(LPI, G)[None])[0]
            cand_list.append(got)
            cand_valid.append(vflag > 0.5)
    A = len(cand_list)
    cands = jnp.stack(cand_list, axis=0)             # (A, PCH, OL, G)
    cvalidv = jnp.stack(cand_valid, axis=0)          # (A, OL, G)
    disx = jnp.where(cvalidv, cands[:, PCH.index("dis")], -jnp.inf)
    # multi-operand lax.sort = vectorized sorting network along the tiny A
    # axis (argsort + take_along_axis would lower to a scalar-core gather
    # over every element). Sort only (key, valid, iota) — routing all PCH
    # channels through the network cost 8 ms/step at 30x30 B=128 — and
    # apply the stable permutation to the SA rows commit_l consumes with
    # a one-hot contraction (exact: each output selects one input).
    iota_a = jnp.broadcast_to(
        jnp.arange(A, dtype=f)[:, None, None], disx.shape)
    skey_s, svalid_s, sidx_s = jax.lax.sort(
        (-disx, cvalidv.astype(f), iota_a), dimension=0, num_keys=1)
    cvalid_s = svalid_s > 0.5
    SAE = min(cfg.SA, A)
    # apply the permutation as a where-sum (exact one-hot select; an
    # einsum here lowered to a convolution whose padded layout cost
    # 2.6 GB of HBM at 30x30 B=128)
    sidx_i = sidx_s.astype(jnp.int32)
    cands_s = jnp.stack(
        [sum(jnp.where((sidx_i[j] == s)[None], cands[s],
                       jnp.zeros_like(cands[s])) for s in range(A))
         for j in range(SAE)], axis=0)
    m_ol = cvalidv.astype(i32).sum(0)
    if A > cfg.SA:
        ov = ov | jnp.where(jnp.any(cvalid_s[cfg.SA:]),
                            OV_REMOVE, 0).astype(jnp.int32)

    m_l = jnp.zeros((OL, cfg.I), i32).at[:, :G].set(m_ol).reshape(-1)
    if cfg.lane_change:
        # mid-ring deletions (finishing reals + aborted shadows) compose
        # with the prefix leavers into one generalized rank-preserving
        # delete: out[s] = updated[s+x] where s+x is the (s+1)-th kept
        # slot, x bounded by XK prefix exits + LCD mid deaths
        d_l = lcc["die_mid"].astype(i32).sum(0)
        del_full = lcc["leave_full"] | lcc["die_mid"]
        totdel = x_l + d_l
        XD = min(cfg.XK + cfg.LCD, SL)
        ov = ov | jnp.where(jnp.any(totdel > XD),
                            OV_REMOVE, 0).astype(jnp.int32)
        dexc = jnp.cumsum(del_full.astype(i32), axis=0) \
            - del_full.astype(i32)
        del_pad = jnp.concatenate(
            [del_full, jnp.ones((XD, LNp), bool)], axis=0)
        dex_pad = jnp.concatenate(
            [dexc, jnp.full((XD, LNp), SL + XD, i32)], axis=0)
    else:
        totdel = x_l
    new_n_l = rs.n_l - totdel + m_l
    ov = ov | jnp.where(jnp.any(new_n_l > SL), OV_SLOTS, 0).astype(jnp.int32)
    new_n_l = jnp.minimum(new_n_l, SL)

    def commit_l(updated, ch_i, fill, cast=None):
        if cfg.lane_change:
            upd_pad = jnp.concatenate(
                [updated, jnp.full((XD, LNp), fill, updated.dtype)],
                axis=0)
            outv = jnp.full_like(updated, fill)
            for x in range(XD + 1):
                cond = ~del_pad[x:x + SL] & (dex_pad[x:x + SL] == x)
                outv = jnp.where(cond, upd_pad[x:x + SL], outv)
        else:
            outv = shift_out(updated, x_l, SL, LNp, fill)
        base = (rs.n_l - totdel)[None, :]
        for j in range(min(cfg.SA, A)):
            val = jnp.zeros((OL, cfg.I), f).at[:, :G].set(
                jnp.where(cvalid_s[j], cands_s[j, ch_i], 0.0)).reshape(-1)
            vmask = jnp.zeros((OL, cfg.I), bool).at[:, :G].set(
                cvalid_s[j]).reshape(-1)
            place = (sl_idx == base + j) & vmask[None, :]
            outv = jnp.where(place, val[None, :].astype(outv.dtype), outv)
        return outv if cast is None else outv.astype(cast)

    new_l_dis = commit_l(new_dis_l, PCH.index("dis"), 0.0)
    new_l_speed = commit_l(new_spd_l, PCH.index("speed"), 0.0)
    new_l_flow = commit_l(rs.l_flow.astype(f), PCH.index("flow"), 0.0, i32)
    new_l_route = commit_l(rs.l_route.astype(f), PCH.index("route"), 0.0, i32)
    new_l_rpos = commit_l(rs.l_rpos.astype(f), PCH.index("rpos"), 0.0, i32)
    new_l_enter = commit_l(rs.l_enter, PCH.index("enter"), 0.0)
    prih_la, pril_la = _hilo(rs.l_pri)
    nl_prih = commit_l(prih_la, PCH.index("prih"), 0.0)
    nl_pril = commit_l(pril_la, PCH.index("pril"), 0.0)
    new_l_pri = _from_hilo(nl_prih, nl_pril)
    new_l_uid = commit_l(rs.l_uid.astype(f), PCH.index("uid"), -1.0, i32)
    new_l_nxt = commit_l(rs.l_nxt.astype(f), PCH.index("nxt"), -1.0, i32)
    new_l_nxt3 = commit_l(rs.l_nxt3.astype(f), PCH.index("nxt3"), -1.0, i32)
    new_l_last = commit_l(rs.l_last.astype(f), PCH.index("last"), 0.0) > 0.5
    new_l_prev = commit_l(rs.l_prev.astype(f), PCH.index("prev"), -1.0, i32)
    tpl_commit_kw = {}
    if not cfg.uniform:
        tpl_commit_kw = dict(
            l_tpl=commit_l(rs.l_tpl.astype(f), PCH.index("tpl"), 0.0, i32),
            k_tpl=new_k_tpl)

    lc_commit_kw = {}
    if cfg.lane_change:
        # pair-state epilogue (finishChanging/abortChanging + gen-1
        # lc_commit): promote finishing reals' shadows, unlink broken
        # pairs, integrate the lateral offset on surviving reals
        chg_real = occ_l & rs.l_chg & ~rs.l_sh
        clear = lcc["unlink_real"] | lcc["promote"] | lcc["unlink_sh"]
        off_u = jnp.where(clear, f(0),
                          jnp.where(chg_real,
                                    lcc["new_off"] * lcc["dirn"], rs.l_off))
        sh_u = rs.l_sh & ~(lcc["promote"] | lcc["unlink_sh"])
        chg_u = rs.l_chg & ~rs.l_sh & ~lcc["unlink_real"]
        dir_u = jnp.where(sh_u | chg_u, rs.l_dir, 0)
        zi = PCH.index("zero")
        lc_commit_kw = dict(
            l_off=commit_l(off_u, zi, 0.0),
            l_sh=commit_l(sh_u.astype(f), zi, 0.0) > 0.5,
            l_chg=commit_l(chg_u.astype(f), zi, 0.0) > 0.5,
            l_dir=commit_l(dir_u.astype(f), zi, 0.0, i32),
            l_gap=commit_l(rs.l_gap, PCH.index("gap"), 0.0),
            l_rnrow=jnp.stack(
                [commit_l(rs.l_rnrow[c].astype(f), PCH.index(f"rn{c}"),
                          -1.0, i32) for c in range(cfg.MAXLPR)], axis=0),
            l_auxrow=jnp.stack(
                [commit_l(rs.l_auxrow[c].astype(f), PCH.index(f"ax{c}"),
                          -1.0, i32) for c in range(cfg.MAXLPR)], axis=0),
            k_gap=new_k_gap)

    # ---- blocker graph commit (front-most failing vehicle per link) -----
    blk_new = jnp.full((LPI, G), -1, i32)
    for s in reversed(range(SK)):
        blk_new = jnp.where(occ_k3[s] & k_fail_all[s], k_fffoe_all[s], blk_new)
    for a in reversed(range(AP)):
        m = ap_out[a]["fail_lk"] & ~ap_out[a]["red_lk"]
        blk_new = jnp.where((blk_new < 0) & m, ap_out[a]["ffo_lk"], blk_new)

    # ---- lights (TrafficLight::passTime; gen-1 pass_time) ---------------
    phase, remain = rs.phase, rs.phase_remain
    if not cfg.rl_traffic_light:
        n_ph = net["i_n_phases"]
        has = (n_ph > 0) & ~net["i_virtual"]
        remain = jnp.where(has, remain - dt, remain)
        for _ in range(cfg.k_phase):
            go = has & (remain <= 0)
            nxtp = jnp.where(go, (phase + 1) % jnp.maximum(n_ph, 1), phase)
            tph = jnp.take(net["phase_time"],
                           jnp.clip(net["i_phase_offset"] + nxtp, 0,
                                    net["phase_time"].shape[0] - 1))
            remain = jnp.where(go, remain + tph, remain)
            phase = nxtp

    dbg.update(dict(x_l=x_l, x_k=x_k, m_k=m_k, m_l=m_l,
                    new_dis_l=new_dis_l, new_spd_l=new_spd_l))
    new_rs = rs.replace_fields(
        step=rs.step + 1,
        finished_cnt=rs.finished_cnt + n_rm,
        cum_travel=rs.cum_travel + t_rm,
        overflow=ov,
        n_l=new_n_l, n_k=new_n_k, blk=blk_new.reshape(-1),
        phase=phase, phase_remain=remain,
        l_dis=new_l_dis, l_speed=new_l_speed, l_flow=new_l_flow,
        l_route=new_l_route, l_rpos=new_l_rpos, l_nxt=new_l_nxt,
        l_nxt3=new_l_nxt3, l_prev=new_l_prev, l_enter=new_l_enter,
        l_pri=new_l_pri, l_uid=new_l_uid, l_last=new_l_last,
        l_custom=jnp.zeros((SL, LNp), f),
        l_hascustom=jnp.zeros((SL, LNp), bool),
        k_dis=new_k_dis, k_speed=new_k_speed, k_flow=new_k_flow,
        k_route=new_k_route, k_rpos=new_k_rpos, k_entll=new_k_entll,
        k_enter=new_k_enter, k_pri=new_k_pri, k_uid=new_k_uid,
        k_nxtl=new_k_nxtl,
        k_custom=jnp.zeros((SK, LKp), f),
        k_hascustom=jnp.zeros((SK, LKp), bool),
        **lc_commit_kw, **tpl_commit_kw)
    if cfg.track_history:
        # end-of-step Lane::updateHistory on committed state (the final
        # threadUpdateLeaderAndGap of nextStep, engine.cpp:581)
        new_rs = _update_history(cfg, new_rs)
    return new_rs, dbg


@partial(jax.jit, static_argnums=(1, 4))
def ring_step(net, cfg: RingConfig, rs: RingState, q, debug: bool = False):
    """One Engine::nextStep, single executable (tests / small nets)."""
    rs, mid, dbg1 = _notify_phase(net, cfg, rs, q, debug)
    new_rs, dbg2 = _commit_phase(net, cfg, rs, mid)
    if debug:
        dbg1.update(dbg2)
        return new_rs, dbg1
    return new_rs


@partial(jax.jit, static_argnums=(1,))
def ring_step_p1(net, cfg: RingConfig, rs: RingState, q):
    rs, mid, _ = _notify_phase(net, cfg, rs, q, False)
    return rs, mid


@partial(jax.jit, static_argnums=(1,))
def ring_step_p2(net, cfg: RingConfig, rs: RingState, mid):
    new_rs, _ = _commit_phase(net, cfg, rs, mid)
    return new_rs


def ring_step_split(net, cfg: RingConfig, rs: RingState, q):
    """ring_step as two separately-jitted (and separately-cached)
    programs; identical semantics by construction."""
    rs, mid = ring_step_p1(net, cfg, rs, q)
    return ring_step_p2(net, cfg, rs, mid)


# Batched entries with net/q as jit ARGUMENTS: a vmapped closure over the
# tables bakes them into the HLO as (100+ MB of) constants, which blows up
# both compile time and persistent-cache load time on the tunneled backend.
# The batched state is DONATED: without aliasing, B=64 x sl=40 on 30x30
# double-buffers ~2x the live state and overflows one chip's HBM (the
# round-3 bench crash). Callers must not reuse rs_b after the call.
# BATCH AXIS IS TRAILING (state leaves are shape + (B,)): with the env
# axis minor, every (SL, LNp) -> (SK, LPI, G) reshape view stays a
# bitcast and the one-hot einsums contract with (..., G, B) as the free
# minor dims, so XLA's layout assignment has a single consistent
# row-major answer. Measured on the real chip (tools/exp_batch_axis.py,
# 16x16 B=128): ~3% faster steps and 10x faster compiles (30 s vs 311 s)
# than leading-batch vmap. Build batched state with batch_ring_state();
# prefer B a multiple of 128 to fill the (8, 128) vector tiles (B=64
# pads the minor dim 2x).


def batch_ring_state(st: RingState, B: int) -> RingState:
    """Replicate a single-env RingState into the TRAILING-batch layout
    consumed by ring_step_*_batched (leaves become shape + (B,))."""
    return jax.tree_util.tree_map(
        lambda x: jnp.zeros(x.shape + (B,), x.dtype) + x[..., None]
        if hasattr(x, "shape") else x, st)


@partial(jax.jit, static_argnums=(1,), donate_argnums=(2,))
def ring_step_p1_batched(net, cfg: RingConfig, rs_b, q):
    def one(s):
        rs2, mid, _ = _notify_phase(net, cfg, s, q, False)
        return rs2, mid
    return jax.vmap(one, in_axes=-1, out_axes=-1)(rs_b)


@partial(jax.jit, static_argnums=(1,), donate_argnums=(2, 3))
def ring_step_p2_batched(net, cfg: RingConfig, rs_b, mid_b):
    def one(s, m):
        new_rs, _ = _commit_phase(net, cfg, s, m)
        return new_rs
    return jax.vmap(one, in_axes=-1, out_axes=-1)(rs_b, mid_b)


@partial(jax.jit, static_argnums=(1,), donate_argnums=(2,))
def ring_step_batched(net, cfg: RingConfig, rs_b, q):
    def one(s):
        rs2, mid, _ = _notify_phase(net, cfg, s, q, False)
        new_rs, _ = _commit_phase(net, cfg, rs2, mid)
        return new_rs
    return jax.vmap(one, in_axes=-1, out_axes=-1)(rs_b)
