"""`cityflow_tpu.Engine` — the reference-compatible Python API.

Mirrors the pybind11 surface of the reference `cityflow.Engine`
(reference: src/cityflow.cpp:10-47). The simulation itself runs as one jitted
array program per step (core/step.py); this class is the host-side shell:
scenario compilation, spawn-table management, capacity growth, and getter
formatting (string ids, dict marshalling).
"""

import copy
import json
import math
import os
from dataclasses import replace as dc_replace
from typing import Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from cityflow_tpu.compiler.net import CompiledNet, compile_scenario, INT_MAX
from cityflow_tpu.compiler.spawn import SpawnGenerator
from cityflow_tpu.core.state import SimState, StepConfig, init_state
from cityflow_tpu.core import step as step_mod
from cityflow_tpu.core.step import (
    OV_SLOTS, OV_LINK_TABLE, OV_HOPS, OV_REMOVE, P_LEN)


def ensure_exact_cpu_flags():
    """Exact mode needs strict per-op IEEE f64: the reference is built with
    g++ -O2 (no -mfma), while XLA:CPU contracts mul+add into FMA by default.
    Capping codegen at SSE4.2 (no FMA instruction) restores bit-exactness.
    Must run before the CPU backend initializes."""
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_cpu_max_isa" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_cpu_max_isa=SSE4_2").strip()


_cache_enabled = False


def _enable_compilation_cache():
    global _cache_enabled
    if _cache_enabled:
        return
    _cache_enabled = True
    cache_dir = os.environ.get("CITYFLOW_TPU_CACHE",
                               os.path.expanduser("~/.cache/cityflow_tpu_xla"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def _net_device_arrays(net: CompiledNet, dtype=None) -> Dict[str, jnp.ndarray]:
    """Static tables to device. Float tables are cast to the working dtype —
    stray f64 in the fast path would silently run in (slow, emulated) f64 on
    TPU."""
    keys = ["drv_len", "drv_max_speed", "lane_road", "lane_local",
            "lane_width", "road_num_lanes", "lane_out",
            "ll_start", "ll_end", "ll_is_turn", "ll_type", "ll_inter",
            "ll_rl_local", "phase_offset", "n_phases", "phase_time",
            "phase_rl_avail", "inter_virtual", "cross_dist", "cross_ll",
            "ll_cross_idx", "ll_cross_side",
            "lnk_cross_d", "lnk_cross_valid", "lnk_cross_selfflat",
            "lnk_cross_foeflat", "lnk_cross_foetype", "lnk_cross_foe_pos",
            "cross_end_lane",
            "cross_start_lane", "cross_type", "cross_is_turn",
            "route_len", "route_roads",
            "route_next_ll", "flow_route", "flow_params", "flow_interval",
            "flow_start", "flow_end"]
    out = {}
    for k in keys:
        a = np.asarray(getattr(net, k))
        if dtype is not None and a.dtype == np.float64:
            a = a.astype(dtype)
        out[k] = jnp.asarray(a)
    return out


class Archive:
    """In-memory snapshot (reference: src/engine/archive.{h,cpp}). State is
    immutable jax arrays, so a snapshot is just a reference copy."""

    def __init__(self, state: SimState, host_aux: dict):
        self.state = state
        self.host_aux = copy.deepcopy(host_aux)

    def dump(self, path: str):
        from cityflow_tpu import serialize
        serialize.dump_archive(self, path)


class Engine:
    def __init__(self, config_file: str, thread_num: int = 1,
                 exact: bool = True, max_vehicles: int = 2048,
                 spawn_horizon: int = 4096, backend: str = "auto"):
        """backend: "auto" picks the gen-2 ring fast path when
        exact=False and the scenario fits the ring layout (grid nets,
        uniform vehicle templates); "gen1" forces the slot-pool path;
        "ring" requires the ring (raises when unsupported)."""
        del thread_num  # results are threadNum-independent (SURVEY.md 2.4)
        self._config_file = config_file
        self.net = compile_scenario(config_file)
        cfgj = self.net.host.config
        self.interval = float(cfgj["interval"])
        self.seed = int(cfgj["seed"])
        self.rl_traffic_light = bool(cfgj["rlTrafficLight"])
        self.lane_change = bool(cfgj.get("laneChange", False))
        self.save_replay_in_config = bool(cfgj.get("saveReplay", False))
        self.save_replay = self.save_replay_in_config
        # Extension key (the reference hardcodes RouterType::LENGTH at
        # router.h:42; DURATION exists but is unreachable — we expose it):
        # "routerType": "LENGTH" | "DURATION"
        self.router_type = str(cfgj.get("routerType", "LENGTH")).upper()
        if self.router_type not in ("LENGTH", "DURATION"):
            raise ValueError(f"unknown routerType {self.router_type}")
        self._exact = exact
        if exact:
            jax.config.update("jax_enable_x64", True)
        _enable_compilation_cache()

        self._net_dev = _net_device_arrays(
            self.net, np.float64 if exact else np.float32)
        self._spawn_horizon = spawn_horizon
        self._spawn = SpawnGenerator(self.net, self.seed, self.interval)
        self._spawn.extend(spawn_horizon)
        self._spawn_dev = None
        self._upload_spawn()

        kc = max(self.net.host.kc, 1)
        ko = max(self.net.host.ko, 1)
        self.cfg = StepConfig(
            interval=self.interval,
            num_lanes=self.net.num_lanes,
            num_drivables=self.net.num_lanes + self.net.num_links,
            max_vehicles=max_vehicles,
            max_spawn_per_step=self._spawn.max_per_step,
            k_out=ko, k_cross=kc,
            rl_traffic_light=self.rl_traffic_light,
            lane_change=self.lane_change,
            exact=exact,
            track_history=(self.router_type == "DURATION"))
        self._ring = None
        if not exact and backend in ("auto", "ring"):
            from cityflow_tpu.ring_backend import RingShell
            try:
                self._ring = RingShell(self)
            except ValueError:
                if backend == "ring":
                    raise
        elif backend == "ring":
            raise ValueError("backend='ring' requires exact=False")
        self.state = None if self._ring else self._fresh_state()
        self._manually_pushed = 0
        self._pushed_ids: Dict[int, str] = {}   # uid -> custom id
        self._fetched_step = -1
        self._cache: Dict[str, np.ndarray] = {}
        self._replay = None
        if self.save_replay:
            self._open_replay(cfgj.get("roadnetLogFile"), cfgj.get("replayLogFile"))

    # ------------------------------------------------------------------
    # infrastructure
    # ------------------------------------------------------------------
    def _fresh_state(self) -> SimState:
        return init_state(self.cfg, self.net.num_inters, self.net.phase_time,
                          self.net.n_phases, self.net.phase_offset)

    def _upload_spawn(self):
        t = self._spawn.arrays()
        pad = max(self._spawn.max_per_step, 1)
        def p(a, fill):
            return jnp.asarray(np.concatenate(
                [a, np.full(pad, fill, a.dtype)]))
        self._spawn_dev = dict(
            step=p(t["step"], -1), flow=p(t["flow"], 0),
            priority=p(t["priority"], 0),
            first_drv=p(t["first_drv"], 0), route=p(t["route"], 0))

    def _grow(self, bits: int):
        cfg = self.cfg
        if bits & OV_SLOTS:
            cfg = dc_replace(cfg, max_vehicles=cfg.max_vehicles * 2)
        if bits & OV_LINK_TABLE:
            cfg = dc_replace(cfg, k_link=cfg.k_link * 2)
        if bits & OV_HOPS:
            cfg = dc_replace(cfg, k_hop=cfg.k_hop * 2)
        if bits & OV_REMOVE:
            cfg = dc_replace(cfg, max_remove=cfg.max_remove * 2)
        oldV = self.cfg.max_vehicles
        self.cfg = cfg
        if cfg.max_vehicles != oldV:
            self.state = _pad_state(self.state, oldV, cfg.max_vehicles)

    def _now_step(self) -> int:
        if self._ring is not None:
            return self._ring.now_step()
        return int(self.state.step)

    def _phases_np(self) -> np.ndarray:
        """Current phase per intersection in ORIGINAL order (replay)."""
        if self._ring is not None:
            return self._ring.phases_np()
        return np.asarray(jax.device_get(self.state.phase))

    def _step_once(self):
        if self._ring is not None:
            self._ring.step_once()
            return
        if int(self.state.step) + 1 >= self._spawn.next_step:
            self._spawn.extend(self._spawn.next_step * 2)
            self._upload_spawn()
            if self._spawn.max_per_step > self.cfg.max_spawn_per_step:
                self.cfg = dc_replace(
                    self.cfg, max_spawn_per_step=self._spawn.max_per_step)
        prev = self.state
        for _ in range(8):  # capacity growth retries
            new = step_mod.step(self._net_dev, self.cfg, prev, self._spawn_dev)
            ov = int(new.overflow) & ~int(prev.overflow)
            if ov == 0:
                self.state = new
                return
            self._grow(ov)
            prev = _pad_state(prev, prev.active.shape[0],
                              self.cfg.max_vehicles)
        raise RuntimeError("simulation capacity growth failed")

    def _fetch(self) -> Dict[str, np.ndarray]:
        if self._ring is not None:
            key = (self._ring.now_step(), self._manually_pushed)
            if self._fetched_step != key:
                self._cache = self._ring.fetch()
                self._fetched_step = key
                self._id_map = None
            return self._cache
        key = (int(self.state.step), int(self.state.spawn_cursor))
        if self._fetched_step != key:
            st = self.state
            names = ["active", "running", "dis", "speed", "drv", "prev_drv",
                     "route", "route_pos", "enter_time", "priority", "leader",
                     "gap", "list_seq", "uid", "is_shadow", "partner",
                     "lc_last_dir", "offset"]
            vals = jax.device_get([getattr(st, n) for n in names])
            self._cache = dict(zip(names, vals))
            params = np.asarray(jax.device_get(st.params))
            self._cache["len"] = params[:, 1]
            self._cache["width"] = params[:, 2]
            self._fetched_step = key
            self._id_map = None       # lazy per-fetch id -> slot index
        return self._cache

    def _veh_id(self, uid: int) -> str:
        if uid & (1 << 30):  # shadow twin (engine.cpp:814: id + "_shadow")
            return self._veh_id(uid & ~(1 << 30)) + "_shadow"
        if uid in self._pushed_ids:
            return self._pushed_ids[uid]
        t = self._spawn.arrays()
        return f"flow_{t['flow'][uid]}_{t['cnt'][uid]}"

    def _id_to_slot(self, vid: str) -> Optional[int]:
        """O(1) id lookup via a per-fetch id->slot map (the reference keeps a
        std::map of the vehicle pool, engine.cpp:615-630; rebuilding per
        fetched step keeps every query O(1) instead of O(N) string scans)."""
        c = self._fetch()
        if getattr(self, "_id_map", None) is None:
            self._id_map = {
                self._veh_id(int(c["uid"][slot])): int(slot)
                for slot in np.nonzero(c["active"])[0]}
        return self._id_map.get(vid)

    def _lane_order(self, c):
        """Front-to-back per-drivable vehicle order (distance desc, list_seq)."""
        run = np.nonzero(c["running"])[0]
        order = run[np.lexsort((c["list_seq"][run], -c["dis"][run],
                                c["drv"][run]))]
        return order

    # ------------------------------------------------------------------
    # control API (reference cityflow.cpp:12-46)
    # ------------------------------------------------------------------
    def next_step(self):
        self._step_once()
        if self.save_replay and self._replay is not None:
            self._write_replay_line()

    def reset(self, seed: bool = False):
        """reference Engine::reset (engine.cpp:744-760): flows and state
        reset; the mt19937 stream continues unless resetRnd."""
        cur = self._now_step()
        self._pushed_ids.clear()
        self._manually_pushed = 0
        self._fetched_step = -1
        self._spawn.reset_flows(reseed_to=self.seed if seed else None,
                                current_step=cur)
        self._spawn.extend(self._spawn_horizon)
        self._upload_spawn()
        if self._ring is not None:
            self._ring.reset()
        else:
            self.state = self._fresh_state()
        return None

    def set_random_seed(self, seed: int):
        """reference Engine::setRandomSeed: reseeds the stream mid-run."""
        self.seed = int(seed)
        cur = self._now_step()
        self._spawn.reseed(seed, cur)
        self._spawn.extend(max(self._spawn_horizon, cur * 2))
        self._upload_spawn()
        if self._ring is not None:
            self._ring.on_spawn_changed()
            self._fetched_step = -1

    def set_tl_phase(self, intersection_id: str, phase_id: int):
        """reference engine.cpp:719-725 (guarded by rlTrafficLight)."""
        if not self.rl_traffic_light:
            print("please set rlTrafficLight to true to enable traffic light control")
            return
        idx = self.net.host.inter_index[intersection_id]
        if self._ring is not None:
            self._ring.set_tl_phase(idx, int(phase_id))
            return
        self.state = self.state.replace_fields(
            phase=self.state.phase.at[idx].set(int(phase_id)))

    def set_vehicle_speed(self, vid: str, speed: float):
        slot = self._id_to_slot(vid)
        if slot is None:
            raise RuntimeError(f"Vehicle '{vid}' not found")
        if self._ring is not None:
            c = self._fetch()
            self._ring.set_custom_speed(
                {k: c[k][slot] for k in ("kind", "pos", "slot")}, speed)
            self._fetched_step = -1
            return
        st = self.state
        self.state = st.replace_fields(
            custom_speed=st.custom_speed.at[slot].set(speed),
            has_custom=st.has_custom.at[slot].set(True))

    def _register_route(self, route) -> int:
        """Write a new road route into the (headroomed) route tables;
        returns its id. Contents-only update: no re-jit."""
        host = self.net.host
        key = tuple(r.index for r in route)
        if not hasattr(self, "_route_ids"):
            self._route_ids = {tuple(r.index for r in rt): i
                               for i, rt in enumerate(host.routes)}
        if key in self._route_ids:
            return self._route_ids[key]
        rid = len(host.routes)
        net = self.net
        if rid >= net.route_len.shape[0] or \
                len(route) > net.route_roads.shape[1]:
            raise RuntimeError("route table headroom exhausted; recreate the "
                               "Engine with a larger scenario compile")
        from cityflow_tpu.compiler import flows as flows_mod
        net.route_len[rid] = len(route)
        L = net.num_lanes
        for k, road in enumerate(route):
            net.route_roads[rid, k] = road.index
            net.route_next_ll[rid, k, :] = -1
            for lane in road.lanes:
                nxt = flows_mod.next_lanelink_for(route, k, lane)
                if nxt is not None:
                    net.route_next_ll[rid, k, lane.lane_index] = L + nxt.index
        host.routes.append(route)
        self._route_ids[key] = rid
        for k in ("route_len", "route_roads", "route_next_ll"):
            self._net_dev[k] = jnp.asarray(getattr(net, k))
        return rid

    def _lane_history_np(self):
        """(window num, window speed sum) per ORIGINAL lane index from
        whichever backend holds the live window (gen-1 state.hist_* or
        the ring h_* channels via meta.lane_pos)."""
        if self._ring is not None:
            st = self._ring.sim.state
            num, ssum = jax.device_get((st.h_num, st.h_ssum))
            lp = self._ring.sim.meta.lane_pos
            return num[lp], ssum[lp]
        return jax.device_get((self.state.hist_num, self.state.hist_ssum))

    def _road_durations(self) -> Dict[int, float]:
        """Road::getAverageDuration per road from the device-side lane
        history (roadnet.cpp:719-734): average speed weighted by history
        vehicle counts over the road's lanes; -1 when the window is empty."""
        out: Dict[int, float] = {}
        if not self.cfg.track_history:
            return out
        num, ssum = self._lane_history_np()
        for road in self.net.host.net.roads:
            n = 0.0
            s = 0.0
            for lane in road.lanes:
                n += float(num[lane.index])
                s += float(ssum[lane.index])
            if n <= 0:
                out[road.index] = -1.0     # getAverageSpeed -1: no history
            else:
                from cityflow_tpu.compiler.flows import road_average_length
                # avgSpeed 0 (all-stopped window) -> duration inf, exactly
                # like the reference's double division
                avg_speed = s / n
                out[road.index] = (math.inf if avg_speed == 0
                                   else road_average_length(road) / avg_speed)
        return out

    def _router_cost(self, max_speed: float):
        from cityflow_tpu.compiler import flows as flows_mod
        if self.router_type == "DURATION":
            return flows_mod.duration_cost_fn(self._road_durations(),
                                              max_speed)
        return flows_mod.length_cost

    def get_lane_history(self) -> Dict[str, tuple]:
        """Per-lane (historyVehicleNum, historyAverageSpeed) — the rolling
        window behind DURATION routing (Lane::getHistoryVehicleNum /
        getHistoryAverageSpeed, roadnet.cpp:917-923)."""
        if not self.cfg.track_history:
            raise RuntimeError('lane history requires routerType "DURATION"')
        num, ssum = self._lane_history_np()
        ids = self.net.host.lane_ids
        return {ids[i]: (int(num[i]), float(ssum[i] / num[i]) if num[i] else 0.0)
                for i in range(len(ids))}

    def set_vehicle_route(self, vid: str, anchors: List[str]) -> bool:
        """reference Engine::setRoute -> Router::setRoute
        (engine.cpp:852-866, router.cpp:245-264)."""
        from cityflow_tpu.compiler import flows as flows_mod
        host = self.net.host
        slot = self._id_to_slot(vid)
        if slot is None:
            return False
        c = self._fetch()
        drv = int(c["drv"][slot])
        if drv < 0 or drv >= self.cfg.num_lanes:
            return False  # on a lanelink (router.cpp:246)
        try:
            anchor_roads = [host.net.road_map[a] for a in anchors]
        except KeyError:
            return False
        cur_road = host.net.lanes[drv].road
        if self._ring is not None:
            max_spd = float(self._ring.sim.meta.param_row[8])
        else:
            max_spd = float(jax.device_get(self.state.params[slot, 8]))
        route = flows_mod.update_shortest_path(
            host.net, [cur_road] + anchor_roads,
            cost=self._router_cost(max_spd))
        if route is None:
            return False
        rid = self._register_route(route)
        # onValidLane under the new route (router.cpp:254-257)
        if len(route) > 1 and \
                self.net.route_next_ll[rid, 0, host.net.lanes[drv].lane_index] < 0:
            return False
        if self._ring is not None:
            c = self._fetch()
            ok = self._ring.set_route(
                {k: c[k][slot] for k in ("kind", "pos", "slot", "drv")}, rid)
            if ok:
                self._fetched_step = -1
            return ok
        st = self.state
        self.state = st.replace_fields(
            route=st.route.at[slot].set(rid),
            route_pos=st.route_pos.at[slot].set(0))
        self._fetched_step = -1
        return True

    def push_vehicle(self, info: dict, roads: List[str]):
        """reference Engine::pushVehicle(info, roads) (engine.cpp:693-717):
        creates a vehicle with custom parameters and an anchor-road route,
        queued for next step's planRoute. RNG draws are replayed exactly."""
        from cityflow_tpu.compiler import flows as flows_mod
        from cityflow_tpu.compiler.flows import VehicleTemplate
        host = self.net.host
        tpl = VehicleTemplate(
            speed=float(info.get("speed", 0.0)),
            len=float(info.get("length", 5.0)),
            width=float(info.get("width", 2.0)),
            maxPosAcc=float(info.get("maxPosAcc", 4.5)),
            maxNegAcc=float(info.get("maxNegAcc", 4.5)),
            usualPosAcc=float(info.get("usualPosAcc", 2.5)),
            usualNegAcc=float(info.get("usualNegAcc", 2.5)),
            minGap=float(info.get("minGap", 2.0)),
            maxSpeed=float(info.get("maxSpeed", 16.66667)),
            headwayTime=float(info.get("headwayTime", 1.0)))
        if self._ring is not None and \
                not self._ring.check_uniform_template(tpl.as_list()):
            raise ValueError(
                "the ring backend bakes the scenario's single uniform "
                "vehicle template; push_vehicle with different parameters "
                "needs Engine(..., backend='gen1') (or exact=True)")
        anchor_roads = [host.net.road_map[r] for r in roads]
        route = flows_mod.update_shortest_path(
            host.net, anchor_roads, cost=self._router_cost(tpl.maxSpeed))
        rid = self._register_route(route) if route is not None else -1
        # synthetic flow row for the custom params
        net = self.net
        n_real = len(host.flows)
        fid = n_real + len(self._pushed_ids)
        if fid >= net.flow_params.shape[0]:
            raise RuntimeError("flow table headroom exhausted")
        net.flow_params[fid] = tpl.as_list()
        self._net_dev["flow_params"] = jnp.asarray(
            net.flow_params if self._exact
            else net.flow_params.astype(np.float32))
        serial = self._manually_pushed
        self._manually_pushed += 1
        cands = (flows_mod.first_lane_candidates(route)
                 if route is not None else [])
        self._spawn.inject_manual(self._now_step(),
                                  anchor_roads[0].index, fid, rid,
                                  [l.index for l in cands], serial)
        self._upload_spawn()
        if self._ring is not None:
            if rid >= 0:
                self._ring.refresh_route_tables(rid)
            self._ring.on_spawn_changed()
            self._fetched_step = -1
        if self._spawn.max_per_step > self.cfg.max_spawn_per_step:
            self.cfg = dc_replace(
                self.cfg, max_spawn_per_step=self._spawn.max_per_step)
        # name the row's uid
        t = self._spawn.arrays()
        hits = np.nonzero((t["flow"] == fid) & (t["cnt"] == serial))[0]
        if hits.size:
            self._pushed_ids[int(hits[0])] = f"manually_pushed_{serial}"

    # ------------------------------------------------------------------
    # query API
    # ------------------------------------------------------------------
    def get_current_time(self) -> float:
        return self._now_step() * self.interval

    def get_vehicle_count(self) -> int:
        c = self._fetch()
        return int(np.sum(c["running"]))

    def get_vehicles(self, include_waiting: bool = False) -> List[str]:
        """Pool order = std::map<int priority> ascending (engine.cpp:780-790)."""
        c = self._fetch()
        mask = (c["active"] if include_waiting else c["running"]) \
            & ~c["is_shadow"]  # isReal filter (engine.cpp:785)
        slots = np.nonzero(mask)[0]
        slots = slots[np.argsort(c["priority"][slots], kind="stable")]
        return [self._veh_id(int(c["uid"][s])) for s in slots]

    def get_lane_vehicle_count(self) -> Dict[str, int]:
        c = self._fetch()
        counts = np.bincount(c["drv"][c["running"]],
                             minlength=self.cfg.num_drivables)
        return {lid: int(counts[i]) for i, lid in enumerate(self.net.host.lane_ids)}

    def get_lane_waiting_vehicle_count(self) -> Dict[str, int]:
        """speed < 0.1 -> waiting (engine.cpp:641)."""
        c = self._fetch()
        m = c["running"] & (c["speed"] < 0.1)
        counts = np.bincount(c["drv"][m], minlength=self.cfg.num_drivables)
        return {lid: int(counts[i]) for i, lid in enumerate(self.net.host.lane_ids)}

    def get_lane_vehicles(self) -> Dict[str, List[str]]:
        c = self._fetch()
        ret = {lid: [] for lid in self.net.host.lane_ids}
        L = self.cfg.num_lanes
        for slot in self._lane_order(c):
            d = c["drv"][slot]
            if d < L:
                ret[self.net.host.lane_ids[d]].append(
                    self._veh_id(int(c["uid"][slot])))
        return ret

    def get_vehicle_speed(self) -> Dict[str, float]:
        c = self._fetch()
        return {self._veh_id(int(c["uid"][s])): float(c["speed"][s])
                for s in self._pool_order(c)}

    def get_vehicle_distance(self) -> Dict[str, float]:
        c = self._fetch()
        return {self._veh_id(int(c["uid"][s])): float(c["dis"][s])
                for s in self._pool_order(c)}

    def _pool_order(self, c):
        slots = np.nonzero(c["running"] & ~c["is_shadow"])[0]
        return slots[np.argsort(c["priority"][slots], kind="stable")]

    def get_leader(self, vid: str) -> str:
        c = self._fetch()
        slot = self._id_to_slot(vid)
        if slot is None:
            raise RuntimeError(f"Vehicle '{vid}' not found")
        # a shadow's leader query answers through its real twin
        # (engine.cpp:842-845)
        if self.lane_change and c["is_shadow"][slot] and c["partner"][slot] >= 0:
            slot = int(c["partner"][slot])
        l = c["leader"][slot]
        return self._veh_id(int(c["uid"][l])) if l >= 0 else ""

    def get_average_travel_time(self) -> float:
        """reference engine.cpp:682-691: finished cumulative + in-flight,
        summed over the pool in priority order (float64 order preserved)."""
        c = self._fetch()
        if self._ring is not None:
            tt, n = self._ring.stats()
        else:
            tt = float(self.state.cum_travel)
            n = int(self.state.finished_cnt)
        now = self.get_current_time()
        slots = np.nonzero(c["active"])[0]
        slots = slots[np.argsort(c["priority"][slots], kind="stable")]
        for s in slots:
            tt += now - float(c["enter_time"][s])
            n += 1
        return 0.0 if n == 0 else tt / n

    def get_vehicle_info(self, vid: str) -> Dict[str, str]:
        """reference vehicle.cpp:435-457 (std::to_string -> '%f' 6dp)."""
        c = self._fetch()
        slot = self._id_to_slot(vid)
        if slot is None:
            raise RuntimeError(f"Vehicle '{vid}' not found")
        running = bool(c["running"][slot])
        info = {"running": str(int(running))}
        if not running:
            return info
        host = self.net.host
        L = self.cfg.num_lanes
        d = int(c["drv"][slot])
        info["distance"] = f"{float(c['dis'][slot]):.6f}"
        info["speed"] = f"{float(c['speed'][slot]):.6f}"
        info["drivable"] = (host.lane_ids[d] if d < L else host.ll_ids[d - L])
        if d < L:
            road = host.net.lanes[d].road
            info["road"] = road.id
            info["intersection"] = road.end_intersection.id
        route = host.routes[int(c["route"][slot])]
        pos = int(c["route_pos"][slot])
        info["route"] = "".join(r.id + " " for r in route[pos:])
        return info

    # ------------------------------------------------------------------
    # replay / archive
    # ------------------------------------------------------------------
    def set_save_replay(self, open_: bool):
        if not self.save_replay_in_config:
            print("saveReplay is not set to true in config file!")
            return
        self.save_replay = open_

    def set_replay_file(self, path: str):
        if not self.save_replay_in_config:
            print("saveReplay is not set to true in config file!")
            return
        self._open_replay(None, path)

    def _open_replay(self, roadnet_log, replay_log):
        from cityflow_tpu import replay
        base = self.net.host.dir
        if roadnet_log:
            replay.write_roadnet_log(self.net, os.path.join(base, roadnet_log))
        if self._replay is not None:
            self._replay.close()
        self._replay = open(os.path.join(base, replay_log), "w")

    def _write_replay_line(self):
        from cityflow_tpu import replay
        self._replay.write(replay.step_line(self, self._fetch()) + "\n")
        self._replay.flush()

    def snapshot(self) -> Archive:
        """reference Archive(engine) (archive.cpp:9-37): device state plus the
        full spawn/RNG stream state (archive.cpp:161-165 serializes the
        mt19937; ours snapshots the replay origin + manual pushes)."""
        aux = dict(pushed=self._pushed_ids,
                   manually_pushed=self._manually_pushed,
                   spawn=self._spawn.snapshot_state())
        if self._ring is not None:
            aux["ring_step"] = self._ring.step_count
            aux["ring_ov"] = self._ring._known_ov
            return Archive(self._ring.sim.state, aux)
        return Archive(self.state, aux)

    def load(self, archive: Archive):
        if self._ring is not None:
            self._ring.sim.state = archive.state
            self._ring.step_count = archive.host_aux.get(
                "ring_step", int(jax.device_get(archive.state.step)))
            self._ring._known_ov = archive.host_aux.get("ring_ov", 0)
            self._pushed_ids = copy.deepcopy(archive.host_aux["pushed"])
            self._manually_pushed = archive.host_aux["manually_pushed"]
            if "spawn" in archive.host_aux:
                self._spawn.restore_state(archive.host_aux["spawn"])
                self._spawn.extend(max(self._spawn.next_step,
                                       self._ring.step_count + 2))
                self._upload_spawn()
                self._ring.on_spawn_changed()
            self._fetched_step = -1
            return
        self.state = archive.state
        self._pushed_ids = copy.deepcopy(archive.host_aux["pushed"])
        self._manually_pushed = archive.host_aux["manually_pushed"]
        if "spawn" in archive.host_aux:
            self._spawn.restore_state(archive.host_aux["spawn"])
            self._spawn.extend(max(self._spawn.next_step,
                                   int(self.state.step) + 2))
            self._upload_spawn()
            if self._spawn.max_per_step > self.cfg.max_spawn_per_step:
                self.cfg = dc_replace(
                    self.cfg, max_spawn_per_step=self._spawn.max_per_step)
        self._fetched_step = -1

    def load_from_file(self, path: str):
        from cityflow_tpu import serialize
        serialize.load_archive_into(self, path)


def _pad_state(st: SimState, old_v: int, new_v: int) -> SimState:
    if new_v == old_v:
        return st
    pad = new_v - old_v
    def grow(a, fill):
        extra = jnp.full((pad,) + a.shape[1:], fill, a.dtype)
        return jnp.concatenate([a, extra], axis=0)
    return st.replace_fields(
        active=grow(st.active, False), running=grow(st.running, False),
        dis=grow(st.dis, 0), speed=grow(st.speed, 0),
        drv=grow(st.drv, -1), prev_drv=grow(st.prev_drv, -1),
        route=grow(st.route, 0), route_pos=grow(st.route_pos, 0),
        enter_time=grow(st.enter_time, 0),
        enter_ll_time=grow(st.enter_ll_time, INT_MAX),
        priority=grow(st.priority, 0), leader=grow(st.leader, -1),
        gap=grow(st.gap, 0), blocker=grow(st.blocker, -1),
        custom_speed=grow(st.custom_speed, 0),
        has_custom=grow(st.has_custom, False),
        list_seq=grow(st.list_seq, 0), uid=grow(st.uid, -1),
        params=grow(st.params, 0),
        partner=grow(st.partner, -1), is_shadow=grow(st.is_shadow, False),
        offset=grow(st.offset, 0), lc_changing=grow(st.lc_changing, False),
        lc_finished=grow(st.lc_finished, False),
        lc_last_t=grow(st.lc_last_t, 0),
        lc_target=grow(st.lc_target, -1),
        lc_has_signal=grow(st.lc_has_signal, False),
        lc_dir=grow(st.lc_dir, 0), lc_recv=grow(st.lc_recv, -1),
        lc_tleader=grow(st.lc_tleader, -1),
        lc_tfollower=grow(st.lc_tfollower, -1),
        lc_lgap=grow(st.lc_lgap, 0), lc_fgap=grow(st.lc_fgap, 0),
        lc_last_dir=grow(st.lc_last_dir, 0))
