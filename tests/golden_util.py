"""Helpers to compare engine trajectories against reference goldens
(tests/goldens/*.jsonl.gz produced by tools/oracle/dump_golden.cpp)."""

import gzip
import json
import os

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))


def rl_phase_commands(step, inter_ids, n_phases=8, period=5):
    """Deterministic RL-controller schedule (BASELINE config #2): every
    `period` steps each real intersection gets an explicit phase via
    set_tl_phase.  The same rule generates the oracle's --phases file
    (tools/oracle/dump_golden.cpp) and drives the engine under test, so
    the golden and the replay agree without a shared artifact."""
    if step % period:
        return []
    k = step // period
    return [(iid, (k * 7 + 3 * i) % n_phases)
            for i, iid in enumerate(inter_ids)]


def golden_records(name):
    with gzip.open(os.path.join(HERE, "goldens", name), "rt") as f:
        for line in f:
            # the oracle prints C++ inf/nan as-is; python json wants Infinity
            yield json.loads(line.replace(":inf", ":Infinity")
                                 .replace(":-inf", ":-Infinity")
                                 .replace(":nan", ":NaN"))


def engine_step_record(eng):
    """Produce a record comparable with the oracle's per-step dump."""
    c = eng._fetch()
    host = eng.net.host
    L = eng.cfg.num_lanes
    out = []
    for s in np.nonzero(c["running"])[0]:
        d = int(c["drv"][s])
        out.append(dict(
            id=eng._veh_id(int(c["uid"][s])),
            drv=host.lane_ids[d] if d < L else host.ll_ids[d - L],
            dis=float(c["dis"][s]), speed=float(c["speed"][s])))
    return {v["id"]: v for v in out}


def compare_step(eng, gold, t, atol=0.0, check_speed=True,
                 ignore_shadow=False):
    """Return list of mismatch strings (empty = exact match).
    ignore_shadow drops lane-change shadow twins (the oracle's per-step dump
    lists only real vehicles; the shadow's state is implied by its real)."""
    mine = engine_step_record(eng)
    if ignore_shadow:
        mine = {k: v for k, v in mine.items() if not k.endswith("_shadow")}
    theirs = {v["id"]: v for v in gold["vehicles"]}
    errs = []
    only_mine = set(mine) - set(theirs)
    only_theirs = set(theirs) - set(mine)
    if only_mine:
        errs.append(f"t={t}: extra vehicles {sorted(only_mine)[:5]}")
    if only_theirs:
        errs.append(f"t={t}: missing vehicles {sorted(only_theirs)[:5]}")
    for vid in set(mine) & set(theirs):
        m, g = mine[vid], theirs[vid]
        if m["drv"] != g["drv"]:
            errs.append(f"t={t} {vid}: drv {m['drv']} != {g['drv']}")
            continue
        if abs(m["dis"] - g["dis"]) > atol:
            errs.append(f"t={t} {vid}: dis {m['dis']!r} != {g['dis']!r} "
                        f"(diff {m['dis']-g['dis']:.3e})")
        if check_speed and abs(m["speed"] - g["speed"]) > atol:
            errs.append(f"t={t} {vid}: speed {m['speed']!r} != {g['speed']!r}")
    return errs
