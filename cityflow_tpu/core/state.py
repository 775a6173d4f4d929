"""Simulation state and static configuration.

The whole dynamic simulation state is one pytree of fixed-shape arrays
(`SimState`). One step of the reference's barrier-phase pipeline
(engine.cpp:566-594) becomes a pure function `step: SimState -> SimState`;
batching over environment instances is `jax.vmap`, scale-out is
`shard_map` over a device mesh.

Vehicles live in a slot pool of static capacity `cfg.max_vehicles`; a slot is
`active` from spawn (waiting buffer) until removal, `running` once admitted
onto its first lane (reference Engine::handleWaiting, engine.cpp:502-516).
"""

import dataclasses
from dataclasses import dataclass
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

INT_MAX = 2**31 - 1


@partial(jax.tree_util.register_dataclass,
         data_fields=["step", "seq_counter", "spawn_cursor", "finished_cnt",
                      "cum_travel", "overflow",
                      "active", "running", "dis", "speed", "drv", "prev_drv",
                      "route", "route_pos", "enter_time", "enter_ll_time",
                      "priority", "leader", "gap", "blocker", "custom_speed",
                      "has_custom", "list_seq", "uid", "params",
                      "partner", "is_shadow", "offset", "lc_changing",
                      "lc_finished", "lc_last_t", "lc_target", "lc_has_signal",
                      "lc_dir", "lc_recv", "lc_tleader", "lc_tfollower",
                      "lc_lgap", "lc_fgap", "lc_last_dir",
                      "phase", "phase_remain",
                      "last_of_drv",
                      "hist_ring_num", "hist_ring_ssum", "hist_num",
                      "hist_ssum", "hist_t"],
         meta_fields=[])
@dataclass
class SimState:
    # scalars
    step: Any                 # i32 current engine step
    seq_counter: Any          # i32 monotonically increasing list-order ticket
    spawn_cursor: Any         # i32 rows of the spawn table consumed
    finished_cnt: Any         # i32 vehicles that completed their route
    cum_travel: Any           # f   cumulative travel time of finished vehicles
    overflow: Any             # i32 bitmask of capacity-violation flags

    # per-slot (V,)
    active: Any               # bool in pool (waiting or running)
    running: Any              # bool on a drivable
    dis: Any                  # f   distance along current drivable
    speed: Any                # f
    drv: Any                  # i32 current drivable (-1 none)
    prev_drv: Any             # i32
    route: Any                # i32 route id
    route_pos: Any            # i32 index of current road within route
    enter_time: Any           # f
    enter_ll_time: Any        # i32 (INT_MAX when not on a lanelink)
    priority: Any             # i32 (mt19937 draw; pool iteration order)
    leader: Any               # i32 slot of leader (-1)
    gap: Any                  # f
    blocker: Any              # i32 slot of blocking vehicle at a cross (-1)
    custom_speed: Any         # f   set_vehicle_speed buffer (one step)
    has_custom: Any           # bool
    list_seq: Any             # i32 order-within-drivable ticket
    uid: Any                  # i32 global spawn uid (-1 free slot)
    params: Any               # (V, 12) f vehicle params (see net.P_*)

    # lane change (reference: vehicle.h LaneChangeInfo + lanechange.h)
    partner: Any              # i32 slot of shadow/real twin (-1)
    is_shadow: Any            # bool (partnerType == 2)
    offset: Any               # f lateral offset of the changing real vehicle
    lc_changing: Any          # bool LaneChange::changing (real side)
    lc_finished: Any          # bool LaneChange::finished (skip finish stats)
    lc_last_t: Any            # f LaneChange::lastChangeTime
    lc_target: Any            # i32 signalSend->target lane (-1 none)
    lc_has_signal: Any        # bool signalSend allocated this step
    lc_dir: Any               # i32 signalSend->direction (-1/0/1)
    lc_recv: Any              # i32 signalRecv source vehicle (-1)
    lc_tleader: Any           # i32 targetLeader slot (-1)
    lc_tfollower: Any         # i32 targetFollower slot (-1)
    lc_lgap: Any              # f leaderGap
    lc_fgap: Any              # f followerGap
    lc_last_dir: Any          # i32 lastDir (replay logging)

    # lights (I,)
    phase: Any                # i32
    phase_remain: Any         # f

    # cached arrangement from the end of the previous step (per-drivable
    # rear vehicle), used by handleWaiting admission before this step's sort
    last_of_drv: Any          # (D,) i32

    # per-lane rolling history (reference Lane::updateHistory,
    # roadnet.cpp:900-915; 240-step window of per-step (vehicleNum,
    # speedSum) powering RouterType::DURATION). Shapes are (HL+1, L) /
    # (L,) when cfg.track_history else (1, 1) / (1,) dummies.
    hist_ring_num: Any        # ring of per-step vehicle counts
    hist_ring_ssum: Any       # ring of per-step speed sums
    hist_num: Any             # (L,) window vehicle-count sum
    hist_ssum: Any            # (L,) window speed sum
    hist_t: Any               # i32 number of updateHistory calls so far

    def replace_fields(self, **kw) -> "SimState":
        return dataclasses.replace(self, **kw)


# overflow bit flags
OV_SLOTS = 1        # vehicle pool exhausted
OV_LINK_TABLE = 2   # more vehicles on one lanelink than cfg.k_link
OV_HOPS = 4         # a vehicle crossed more than cfg.k_hop drivables in a step
OV_REMOVE = 8       # more removals in one step than cfg.max_remove


@dataclass(frozen=True)
class StepConfig:
    """Static (hashable) compile-time configuration."""
    interval: float
    num_lanes: int
    num_drivables: int
    max_vehicles: int = 4096
    max_spawn_per_step: int = 16
    k_link: int = 16          # dense per-lanelink vehicle table width
    k_out: int = 8            # max outgoing lanelinks per lane
    k_cross: int = 32         # max crosses per lanelink
    k_scan: int = 6           # leader-scan drivable lookahead
    k_hop: int = 4            # max drivables crossed per step
    k_chase: int = 6          # fast-mode deadlock-walk cap (2**k_chase steps)
    k_phase: int = 8          # light phase advances per step
    max_remove: int = 16      # ordered-sum buffer for finish stats (grows)
    rl_traffic_light: bool = False
    lane_change: bool = False
    exact: bool = True        # f64 + ordered reductions (golden parity)
    track_history: bool = False   # Lane::updateHistory rolling window
    history_len: int = 240        # reference roadnet.h:316

    @property
    def dtype(self):
        return jnp.float64 if self.exact else jnp.float32


def init_state(cfg: StepConfig, num_inters: int, phase_time0: np.ndarray,
               n_phases: np.ndarray, phase_offset: np.ndarray) -> SimState:
    V = cfg.max_vehicles
    f = cfg.dtype
    zf = lambda *s: jnp.zeros(s, f)
    zi = lambda *s: jnp.zeros(s, jnp.int32)

    # TrafficLight::init(0): remainDuration = phases[0].time (trafficlight.cpp:6-11)
    off = np.clip(phase_offset, 0, len(phase_time0) - 1)
    first_time = phase_time0[off]  # (I,) time of phase 0 per inter
    remain = jnp.asarray(np.where(n_phases > 0, first_time, 0.0), f)

    return SimState(
        step=jnp.int32(0), seq_counter=jnp.int32(0), spawn_cursor=jnp.int32(0),
        finished_cnt=jnp.int32(0), cum_travel=f(0), overflow=jnp.int32(0),
        active=jnp.zeros(V, bool), running=jnp.zeros(V, bool),
        dis=zf(V), speed=zf(V),
        drv=jnp.full(V, -1, jnp.int32), prev_drv=jnp.full(V, -1, jnp.int32),
        route=zi(V), route_pos=zi(V), enter_time=zf(V),
        enter_ll_time=jnp.full(V, INT_MAX, jnp.int32),
        priority=zi(V), leader=jnp.full(V, -1, jnp.int32), gap=zf(V),
        blocker=jnp.full(V, -1, jnp.int32),
        custom_speed=zf(V), has_custom=jnp.zeros(V, bool),
        list_seq=zi(V), uid=jnp.full(V, -1, jnp.int32),
        params=zf(V, 12),
        partner=jnp.full(V, -1, jnp.int32), is_shadow=jnp.zeros(V, bool),
        offset=zf(V), lc_changing=jnp.zeros(V, bool),
        lc_finished=jnp.zeros(V, bool), lc_last_t=zf(V),
        lc_target=jnp.full(V, -1, jnp.int32),
        lc_has_signal=jnp.zeros(V, bool), lc_dir=zi(V),
        lc_recv=jnp.full(V, -1, jnp.int32),
        lc_tleader=jnp.full(V, -1, jnp.int32),
        lc_tfollower=jnp.full(V, -1, jnp.int32),
        lc_lgap=zf(V), lc_fgap=zf(V), lc_last_dir=zi(V),
        phase=zi(num_inters), phase_remain=remain,
        last_of_drv=jnp.full(cfg.num_drivables, -1, jnp.int32),
        hist_ring_num=(zf(cfg.history_len + 1, cfg.num_lanes)
                       if cfg.track_history else zf(1, 1)),
        hist_ring_ssum=(zf(cfg.history_len + 1, cfg.num_lanes)
                        if cfg.track_history else zf(1, 1)),
        hist_num=zf(cfg.num_lanes) if cfg.track_history else zf(1),
        hist_ssum=zf(cfg.num_lanes) if cfg.track_history else zf(1),
        hist_t=jnp.int32(0),
    )
