"""Lane-change validation.

The reference arbitrates same-step lane changers in std::set pointer order
and draws shadow priorities from the engine RNG mid-step, so laneChange:true
runs are not bit-reproducible outside a specific binary+heap (see
core/lanechange.py). We therefore validate against the reference on
AGGREGATES: per-step active vehicle count (incl. shadows) and average travel
time must track the reference closely over 400 steps.
"""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HERE = os.path.dirname(os.path.abspath(__file__))
CONFIG = os.path.join(HERE, "fixtures", "config_example_lc.json")
GOLD = os.path.join(HERE, "goldens", "example_lc_400_agg.json")


@pytest.mark.slow
def test_lane_change_aggregates_track_reference():
    from cityflow_tpu.engine import Engine
    gold = json.load(open(GOLD))
    eng = Engine(CONFIG)
    cnt_diffs = []
    att_rel = 0.0
    for t, g_cnt, g_att in gold[:400]:
        eng.next_step()
        cnt = eng.get_vehicle_count()
        att = eng.get_average_travel_time()
        cnt_diffs.append(abs(cnt - g_cnt))
        if t > 100:   # compare travel time in the saturated regime
            att_rel = max(att_rel, abs(att - g_att) / g_att)
    # individual change decisions differ (arbitration order is pointer-order
    # in the reference), so instantaneous counts drift transiently as the
    # intersection saturates; the track must stay close on average and the
    # travel-time curve must match within a few percent
    mean_diff = sum(cnt_diffs) / len(cnt_diffs)
    assert mean_diff <= 6, (mean_diff, max(cnt_diffs))
    assert max(cnt_diffs) <= 25, max(cnt_diffs)
    assert att_rel < 0.08, att_rel  # a few %: decision-order drift


def test_lane_change_shadows_appear_and_finish():
    import numpy as np
    from cityflow_tpu.engine import Engine
    eng = Engine(CONFIG)
    shadow_steps = 0
    for _ in range(120):
        eng.next_step()
        c = eng._fetch()
        shadow_steps += int(np.sum(c["is_shadow"] & c["running"]))
    assert shadow_steps > 0, "no lane changes happened"
    assert int(eng.state.overflow) == 0
    # shadows must never be reported by the real-vehicle API
    assert not any(v.endswith("_shadow") for v in eng.get_vehicles())


@pytest.mark.slow
def test_lane_change_grid_aggregates():
    """2x2 grid with laneChange: multi-intersection LC aggregate tracking."""
    from cityflow_tpu.engine import Engine
    gold = json.load(open(os.path.join(HERE, "goldens",
                                       "grid2x2_lc_400_agg.json")))
    eng = Engine(os.path.join(HERE, "fixtures", "config_2x2_lc.json"))
    cnt_diffs = []
    att_rel = 0.0
    for t, g_cnt, g_att in gold[:400]:
        eng.next_step()
        cnt_diffs.append(abs(eng.get_vehicle_count() - g_cnt))
        if t > 100:
            att_rel = max(att_rel,
                          abs(eng.get_average_travel_time() - g_att) / g_att)
    mean_diff = sum(cnt_diffs) / len(cnt_diffs)
    assert mean_diff <= 0.05 * max(g[1] for g in gold) + 5, \
        (mean_diff, max(cnt_diffs))
    assert att_rel < 0.10, att_rel
