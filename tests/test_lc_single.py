"""Per-mechanism lane-change validation: single-changer scenario vs the
unmodified reference engine (tests/goldens/lc_single_180.jsonl.gz).

Full-trajectory bit-exactness for lane change is impossible in general (the
reference arbitrates same-step changers in std::set POINTER order and draws
shadow priorities from the engine mt19937 mid-step). This fixture removes
both obstacles: two vehicles, both spawned before the first change, so
 - the mid-step shadow-priority draw cannot shift any later spawn draws,
 - there is at most one NEW changer per step.
Every lane-change mechanism then has a deterministic, directly comparable
effect: makeSignal's gap gating + target choice (lanechange.cpp:151-184),
estimateGap (lanechange.cpp:213-219), gap validity/insertShadow
(engine.cpp:792-820), yieldSpeed (lanechange.cpp:186-206), offset
integration + finishChanging (engine.cpp:228-243, lanechange.cpp:115-127).

The scenario (fixtures/config_lc_single.json): a 3 m/s leader and a fast
follower on the same lane of the route's LAST road (grid lanes are
turn-restricted elsewhere, so the reference only changes lanes there); the
follower overtakes via repeated changes from t~152.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HERE = os.path.dirname(os.path.abspath(__file__))
CONFIG = os.path.join(HERE, "fixtures", "config_lc_single.json")

from golden_util import golden_records, compare_step, engine_step_record


def _is_lane_change(a, b):
    """drivable transition that stays on the same road = a lane change"""
    if a == b or "_TO_" in a or "_TO_" in b:
        return False
    return a.rsplit("_", 1)[0] == b.rsplit("_", 1)[0]


def _count_changes(prev, cur_items, acc):
    for vid, drv in cur_items:
        if vid in prev and _is_lane_change(prev[vid], drv):
            acc.append(vid)
        prev[vid] = drv


def test_single_changer_bit_exact_until_first_change():
    from cityflow_tpu.engine import Engine
    eng = Engine(CONFIG)
    gold = golden_records("lc_single_180.jsonl.gz")
    next(gold)  # static record
    lc_gold = []
    prev_g = {}
    for t in range(1, 151):
        eng.next_step()
        g = next(gold)
        errs = compare_step(eng, g, t)   # [] == bit-exact
        assert not errs, (t, errs[:4])
        _count_changes(prev_g, [(v["id"], v["drv"]) for v in g["vehicles"]],
                       lc_gold)
    assert not lc_gold   # window really is pre-change


def test_single_changer_through_changes():
    """Across the change events the trajectories must still agree to fp
    noise (one new changer per step, no arbitration freedom): same
    drivables, positions within 1e-6 m, same change events."""
    from cityflow_tpu.engine import Engine
    eng = Engine(CONFIG)
    gold = golden_records("lc_single_180.jsonl.gz")
    next(gold)
    ev_g, ev_m = [], []
    prev_g, prev_m = {}, {}
    for t in range(1, 176):
        eng.next_step()
        g = next(gold)
        errs = compare_step(eng, g, t, atol=1e-6, ignore_shadow=True)
        assert not errs, (t, errs[:4])
        _count_changes(prev_g, [(v["id"], v["drv"]) for v in g["vehicles"]],
                       ev_g)
        mine = engine_step_record(eng)
        _count_changes(prev_m, [(k, v["drv"]) for k, v in mine.items()
                                if not k.endswith("_shadow")], ev_m)
    assert len(ev_g) >= 1            # the scenario really exercises LC
    assert ev_m == ev_g              # same changes in the same order
