"""On-device RL observation kernels.

The reference computes observations by walking C++ lane lists per Python call
(engine.cpp:628-660). Here observations are segment-sum reductions over the
vehicle slot arrays — O(V) scatter-adds, fused by XLA, vmappable over envs.
"""

import jax
import jax.numpy as jnp

from cityflow_tpu.core.state import SimState, StepConfig


def lane_vehicle_count(cfg: StepConfig, st: SimState) -> jnp.ndarray:
    """(L,) int32 — Engine::getLaneVehicleCount (engine.cpp:628-634)."""
    L = cfg.num_lanes
    on_lane = st.running & (st.drv >= 0) & (st.drv < L)
    idx = jnp.where(on_lane, st.drv, L)
    return jnp.zeros(L + 1, jnp.int32).at[idx].add(1, mode="drop")[:L]


def lane_waiting_vehicle_count(cfg: StepConfig, st: SimState) -> jnp.ndarray:
    """(L,) int32 — speed < 0.1 => waiting (engine.cpp:636-648)."""
    L = cfg.num_lanes
    m = st.running & (st.drv >= 0) & (st.drv < L) & (st.speed < 0.1)
    idx = jnp.where(m, st.drv, L)
    return jnp.zeros(L + 1, jnp.int32).at[idx].add(1, mode="drop")[:L]


def drivable_vehicle_count(cfg: StepConfig, st: SimState) -> jnp.ndarray:
    """(D,) int32 — counts on lanes AND lanelinks."""
    D = cfg.num_drivables
    m = st.running & (st.drv >= 0)
    idx = jnp.where(m, st.drv, D)
    return jnp.zeros(D + 1, jnp.int32).at[idx].add(1, mode="drop")[:D]


def intersection_pressure(net, cfg: StepConfig, st: SimState) -> jnp.ndarray:
    """(I,) f32 — MaxPressure-style signal: for each intersection, the sum
    over its lanelinks of (start-lane waiting - end-lane waiting)."""
    w = lane_waiting_vehicle_count(cfg, st).astype(jnp.float32)
    start_w = w[net["ll_start"]]
    end_w = w[net["ll_end"]]
    I = net["phase_offset"].shape[0]
    return jnp.zeros(I, jnp.float32).at[net["ll_inter"]].add(start_w - end_w)


def observations(net, cfg: StepConfig, st: SimState) -> dict:
    """The standard RL observation bundle, all on device."""
    return dict(
        lane_count=lane_vehicle_count(cfg, st),
        lane_waiting=lane_waiting_vehicle_count(cfg, st),
        pressure=intersection_pressure(net, cfg, st),
        vehicle_count=jnp.sum(st.running).astype(jnp.int32),
        current_time=st.step.astype(jnp.float32) * cfg.interval,
        avg_travel_time=_avg_travel_time(cfg, st),
    )


def _avg_travel_time(cfg: StepConfig, st: SimState):
    """Engine::getAverageTravelTime (engine.cpp:682-691), unordered sum
    (fast path; the exact engine computes this host-side in pool order)."""
    now = st.step.astype(st.dis.dtype) * cfg.interval
    inflight = jnp.where(st.active, now - st.enter_time, 0).sum()
    n = st.finished_cnt + jnp.sum(st.active).astype(jnp.int32)
    tt = st.cum_travel + inflight
    return jnp.where(n == 0, 0.0, tt / jnp.maximum(n, 1))
