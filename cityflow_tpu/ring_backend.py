"""Ring (gen-2) backend for the reference-compatible `Engine`.

`Engine(config, exact=False)` auto-selects this shell whenever the
compiled scenario fits the ring layout (grid-like nets — see
compiler/ring_net.py `RingMeta.supported`; non-uniform vehicle templates
ride the one-hot `_PP` template channel, core/ring.py).  All 23 API
methods of the reference pybind11 module (src/cityflow.cpp:10-47) are
served from the per-drivable slot arrays via `ring_sim.fetch_full`; the
step itself is the jitted `ring_step` — 1-2 orders of magnitude faster
than the gen-1 slot-pool shell on city-scale nets.

Scope notes (documented divergences, see docs/api.md "Backend
divergences" for the contract-level table and the `backend=` switch):
  * f32 fast mode only (bit-exact mode stays on the gen-1 exact path);
  * `push_vehicle` accepts any template row the ring already knows (the
    uniform row, or any row of the baked tpl_params table); a genuinely
    NEW template requires the gen-1 backend (`check_uniform_template`);
  * `get_leader` answers the leader INCLUDING across the drivable
    boundary (reference vehicle.cpp:157-196 forward walk with the
    overlapping-lanelink rule), reconstructed at fetch time;
  * `set_vehicle_speed` applies to the NEXT `next_step` only and then
    auto-clears — exactly the reference's buffered one-shot
    (setCustomSpeed buffers, vehicle.cpp:120-121 clears on update();
    both backends match; re-issue per step for continuous control).
"""

from dataclasses import replace as dc_replace
from typing import Dict

import numpy as np

import jax
import jax.numpy as jnp

from cityflow_tpu import ring_sim
from cityflow_tpu.core.state import OV_SLOTS


class RingShell:
    def __init__(self, engine, horizon: int = 1024):
        self.engine = engine
        self.horizon = max(horizon, 256)
        self.sim = ring_sim.build_sim(engine.net, horizon=self.horizon)
        if engine.rl_traffic_light:
            self.sim.cfg = dc_replace(self.sim.cfg, rl_traffic_light=True)
        # the Engine's spawn generator is the single source of truth for
        # the RNG stream (reseeds, manual pushes); re-derive the queues
        # from it so both backends replay the same spawn rows
        ring_sim.rebuild_queues(self.sim, engine._spawn, self.horizon)
        m = self.sim.meta
        inv = np.zeros(m.I, np.int64)
        inv[m.new2old_inter] = np.arange(m.I)
        self._orig2ring = inv            # original inter idx -> ring idx
        self.step_count = 0
        self._known_ov = 0

    # -- stepping ------------------------------------------------------
    def step_once(self):
        if self.step_count + 8 >= self.horizon:
            self.horizon *= 2
            self.engine._spawn.extend(self.horizon)
            self.engine._upload_spawn()
            ring_sim.rebuild_queues(self.sim, self.engine._spawn,
                                    self.horizon)
        for _ in range(8):
            prev = self.sim.state
            new = ring_sim.step(self.sim)
            ov = int(jax.device_get(new.overflow))
            fresh = ov & ~self._known_ov
            if not fresh:
                self.step_count += 1
                return
            if fresh & OV_SLOTS:
                # state-preserving slot growth + retry on the PRE-step
                # state (the overflowing step dropped work)
                self.sim.state = prev
                ring_sim.grow_slots(self.sim, dsl=8, dsk=4)
            else:
                # non-capacity flags (deadlock-walk/append caps): record
                # and accept, like the gen-1 shell records OV bits it
                # cannot grow away
                self._known_ov = ov
                self.step_count += 1
                return
        raise RuntimeError("ring capacity growth failed")

    # -- views ---------------------------------------------------------
    def fetch(self) -> Dict[str, np.ndarray]:
        return ring_sim.fetch_full(self.sim, self.engine._spawn)

    def now_step(self) -> int:
        return self.step_count

    def stats(self):
        tt, n = jax.device_get((self.sim.state.cum_travel,
                                self.sim.state.finished_cnt))
        return float(tt), int(n)

    def phases_np(self) -> np.ndarray:
        ring_phase = np.asarray(jax.device_get(self.sim.state.phase))
        return ring_phase[self._orig2ring]

    # -- mutations -----------------------------------------------------
    def set_tl_phase(self, inter_index: int, phase_id: int):
        g = int(self._orig2ring[inter_index])
        st = self.sim.state
        self.sim.state = st.replace_fields(
            phase=st.phase.at[g].set(int(phase_id)))

    def set_custom_speed(self, row: dict, speed: float, on: bool = True):
        st = self.sim.state
        s, p = int(row["slot"]), int(row["pos"])
        if row["kind"] == 0:
            self.sim.state = st.replace_fields(
                l_custom=st.l_custom.at[s, p].set(speed),
                l_hascustom=st.l_hascustom.at[s, p].set(on))
        elif row["kind"] == 1:
            self.sim.state = st.replace_fields(
                k_custom=st.k_custom.at[s, p].set(speed),
                k_hascustom=st.k_hascustom.at[s, p].set(on))
        else:
            raise RuntimeError("cannot set speed on a waiting vehicle")

    def refresh_route_tables(self, rid: int):
        """Recompute the ring route-row pair for `rid` after the host net
        tables changed (Engine._register_route): the same transform as
        compiler/ring_net.py build_ring's route section."""
        sim = self.sim
        m = sim.meta
        net = self.engine.net
        L = net.num_lanes
        LNp, LKp = sim.cfg.LNp, sim.cfg.LKp
        rn = np.asarray(net.route_next_ll[rid])       # (RLEN, MAXLPR)
        ring_next = np.where(
            rn >= L,
            LNp + m.link_pos[np.clip(rn - L, 0, max(len(m.link_pos) - 1,
                                                    0))],
            -1).astype(np.int32)
        if not hasattr(self, "_lk_end_lane"):
            self._lk_end_lane = np.asarray(
                jax.device_get(sim.tables["lk_end_lane"]))
            self._ln_llocal = np.asarray(
                jax.device_get(sim.tables["ln_llocal"]))
        RLEN, MAXLPR = ring_next.shape
        rl = int(net.route_len[rid])
        aux = np.zeros((RLEN, MAXLPR), np.int32)
        for p2 in range(RLEN):
            last2 = p2 >= rl - 1
            for li in range(MAXLPR):
                nxt = ring_next[p2, li]
                nxt3 = -1
                if nxt >= 0:
                    el2 = self._lk_end_lane[nxt - LNp]
                    if el2 >= 0 and p2 + 1 < RLEN:
                        nxt3 = ring_next[p2 + 1,
                                         int(self._ln_llocal[el2])]
                aux[p2, li] = ((nxt3 + 2) << 1) | int(bool(last2))
        sim.tables["route_next"] = sim.tables["route_next"] \
            .at[rid].set(jnp.asarray(ring_next))
        sim.tables["route_aux"] = sim.tables["route_aux"] \
            .at[rid].set(jnp.asarray(aux))
        sim.tables["route_len"] = sim.tables["route_len"] \
            .at[rid].set(rl)

    def set_route(self, row: dict, rid: int) -> bool:
        """Router::setRoute semantics on the ring state (router.cpp:
        245-264 via gen-1 engine.py set_vehicle_route)."""
        if row["kind"] != 0:
            return False                  # on a lanelink
        sim = self.sim
        m = sim.meta
        self.refresh_route_tables(rid)
        net = self.engine.net
        s, p = int(row["slot"]), int(row["pos"])
        lane = int(row["drv"])
        llocal = int(net.lane_local[lane])
        rnrow = np.asarray(jax.device_get(sim.tables["route_next"][rid, 0]))
        auxrow = np.asarray(jax.device_get(sim.tables["route_aux"][rid, 0]))
        rl = int(net.route_len[rid])
        if rl > 1 and rnrow[llocal] < 0:
            return False                  # onValidLane fails
        st = sim.state
        kw = dict(
            l_route=st.l_route.at[s, p].set(rid),
            l_rpos=st.l_rpos.at[s, p].set(0),
            l_nxt=st.l_nxt.at[s, p].set(int(rnrow[llocal])),
            l_nxt3=st.l_nxt3.at[s, p].set(
                int((auxrow[llocal] >> 1) - 2)),
            l_last=st.l_last.at[s, p].set(rl <= 1))
        if sim.cfg.lane_change:
            kw["l_rnrow"] = st.l_rnrow.at[:, s, p].set(
                jnp.asarray(rnrow.astype(np.int32)))
            kw["l_auxrow"] = st.l_auxrow.at[:, s, p].set(
                jnp.asarray(auxrow.astype(np.int32)))
        sim.state = st.replace_fields(**kw)
        return True

    def on_spawn_changed(self):
        """Manual push / reseed: re-derive the queues from the shared
        generator (deterministic prefix keeps live cursors valid)."""
        ring_sim.rebuild_queues(self.sim, self.engine._spawn, self.horizon)

    def check_uniform_template(self, params_row) -> bool:
        """push_vehicle template acceptance: the row must be one the ring
        already knows — the single uniform row, or (non-uniform path) any
        row of the baked tpl_params table. A genuinely NEW template would
        need a table rebuild; the Engine raises and points at gen-1."""
        row = np.asarray(params_row, np.float64)
        if self.sim.meta.uniform_params:
            return bool(np.allclose(row, np.asarray(
                self.sim.meta.param_row, np.float64)))
        tpp = np.asarray(jax.device_get(self.sim.tables["tpl_params"]),
                         np.float64)
        return bool(np.any(np.all(np.isclose(tpp, row[None]), axis=1)))

    def reset(self):
        from cityflow_tpu.core.ring import init_ring_state
        tb_host = {k: np.asarray(jax.device_get(v))
                   for k, v in self.sim.tables.items()}
        self.sim.state = init_ring_state(self.sim.cfg, tb_host,
                                         len(self.sim.meta.entry_lanes))
        self.step_count = 0
        self._known_ov = 0
        self.on_spawn_changed()
