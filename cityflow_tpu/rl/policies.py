"""On-device signal-control policies.

MaxPressure (Varaiya 2013): pick, per intersection, the phase whose enabled
roadlinks have maximum total pressure (upstream waiting minus downstream
waiting). Runs entirely on device as scatter-adds + masked argmax — the
controller that the reference's users implement in Python against the
getter API becomes part of the jitted step."""

import jax.numpy as jnp

from cityflow_tpu.core.observe import lane_waiting_vehicle_count
from cityflow_tpu.core.state import SimState, StepConfig


def phase_pressures(net, cfg: StepConfig, st: SimState, max_phases: int):
    """(TP,) pressure of every (intersection, phase) row."""
    w = lane_waiting_vehicle_count(cfg, st).astype(jnp.float32)
    ll_pressure = w[net["ll_start"]] - w[net["ll_end"]]          # (LL,)
    TP = net["phase_time"].shape[0]
    MRL = net["phase_rl_avail"].shape[1]
    out = jnp.zeros(TP + 1, jnp.float32)
    inter = net["ll_inter"]
    n_ph = net["n_phases"][inter]                                # (LL,)
    base = net["phase_offset"][inter]
    flat_avail = net["phase_rl_avail"].reshape(-1)
    for p in range(max_phases):
        row = base + p
        ok = p < n_ph
        avail = jnp.take(flat_avail,
                         jnp.clip(row * MRL + net["ll_rl_local"],
                                  0, flat_avail.shape[0] - 1))
        contrib = jnp.where(ok & avail, ll_pressure, 0.0)
        out = out.at[jnp.where(ok, row, TP)].add(contrib, mode="drop")
    return out[:TP]


def max_pressure_phases(net, cfg: StepConfig, st: SimState,
                        max_phases: int) -> jnp.ndarray:
    """(I,) int32 — per-intersection argmax-pressure phase."""
    tp = phase_pressures(net, cfg, st, max_phases)
    I = net["phase_offset"].shape[0]
    base = net["phase_offset"]
    n = net["n_phases"]
    best = jnp.zeros(I, jnp.int32)
    best_v = jnp.full(I, -jnp.inf, jnp.float32)
    TP = tp.shape[0]
    for p in range(max_phases):
        row = jnp.clip(base + p, 0, TP - 1)
        v = tp[row]
        ok = p < n
        better = ok & (v > best_v)
        best = jnp.where(better, p, best)
        best_v = jnp.where(better, v, best_v)
    return best
