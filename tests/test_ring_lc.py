"""Gen-2 ring lane change vs gen-1 fast mode: trajectory equivalence.

core/ring_lc.py re-expresses the signal/shadow protocol
(src/vehicle/lanechange.{h,cpp}, engine.cpp:792-820) over per-lane ring
slots.  Gen-1's vectorized lane change (core/lanechange.py) is already
validated against the unmodified reference (test_lc_single.py bit-exact,
test_lane_change.py aggregates), so pinning ring==gen-1 with
laneChange:true transitively pins the ring to the reference semantics.

The 1x1s fixture is a dense 1x1 grid with short (100 m) 3-lane roads so
changes fire early, inside the strict f32 comparison window.
"""

import os
import sys

import numpy as np
import pytest

import jax

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from test_ring import _fix, _gen1_setup, _fetch_gen1


def _run_compare_lc(cfg_path, steps, warmup=8, tol=1e-3, sl=None, sk=None,
                    strict_until=None, check_every=1):
    from cityflow_tpu.core import step as step_mod
    from cityflow_tpu import ring_sim

    net, cfg1, net_dev, st1, spawn_dev = _gen1_setup(cfg_path, steps)
    assert cfg1.lane_change
    sim = ring_sim.build_sim(net, horizon=steps + 8, skc=99, sl=sl, sk=sk)
    assert sim.cfg.lane_change
    strict_until = steps if strict_until is None else strict_until
    worst = 0.0
    chg_total = 0
    for i in range(1, steps + 1):
        st1 = step_mod.step(net_dev, cfg1, st1, spawn_dev)
        ring_sim.step(sim)
        if i <= warmup or i % check_every:
            continue
        a = _fetch_gen1(st1)
        b = ring_sim.fetch_vehicles(sim)
        g_chg = int(jax.device_get(st1.lc_changing.sum()))
        g_sh = int(jax.device_get(st1.is_shadow.sum()))
        r_chg = int(jax.device_get(sim.state.l_chg.sum()))
        r_sh = int(jax.device_get(sim.state.l_sh.sum()))
        chg_total += r_chg
        if i <= strict_until:
            assert set(a) == set(b), (
                f"step {i}: sets differ miss={sorted(set(a) - set(b))} "
                f"extra={sorted(set(b) - set(a))}")
            assert (g_chg, g_sh) == (r_chg, r_sh), \
                f"step {i}: chg/sh {g_chg}/{g_sh} vs {r_chg}/{r_sh}"
            for u in a:
                assert a[u][0] == b[u][0], \
                    f"step {i}: uid {u} drivable {a[u]} vs {b[u]}"
                worst = max(worst, abs(a[u][1] - b[u][1]),
                            abs(a[u][2] - b[u][2]))
            assert worst <= tol, f"step {i}: worst drift {worst}"
        else:
            assert abs(len(a) - len(b)) <= max(2, len(a) // 50), \
                f"step {i}: counts {len(a)} vs {len(b)}"
    assert int(jax.device_get(sim.state.overflow)) == 0
    assert chg_total > 0, "scenario triggered no lane changes"
    c1 = jax.device_get((st1.cum_travel, st1.finished_cnt))
    c2 = jax.device_get((sim.state.cum_travel, sim.state.finished_cnt))
    if strict_until >= steps:
        assert int(c1[1]) == int(c2[1])
        if float(c1[0]):
            assert abs(float(c1[0]) - float(c2[0])) \
                / max(float(c1[0]), 1) < 0.02
    else:
        assert abs(int(c1[1]) - int(c2[1])) <= max(3, int(c1[1]) // 20)
    return worst


def test_ring_lc_matches_gen1_1x1s():
    _run_compare_lc(_fix("config_1x1s_lc.json"), 80, sl=12, sk=6)


@pytest.mark.slow
def test_ring_lc_matches_gen1_1x1s_long():
    _run_compare_lc(_fix("config_1x1s_lc.json"), 300, sl=16, sk=6,
                    strict_until=160, check_every=2)


@pytest.mark.slow
def test_ring_lc_matches_gen1_2x2():
    # multi-intersection grid: changes on 300 m roads fire later; strict
    # window covers the first wave, aggregates beyond
    _run_compare_lc(_fix("config_2x2_lc.json"), 220, strict_until=120,
                    check_every=2, tol=2e-3)


def test_ring_lc_noop_when_disabled():
    # laneChange:false configs must build with the LC channels inert
    from cityflow_tpu import ring_sim
    from cityflow_tpu.compiler.net import compile_scenario
    net = compile_scenario(_fix("config_4x4.json"))
    sim = ring_sim.build_sim(net, horizon=24)
    assert not sim.cfg.lane_change
    for _ in range(12):
        ring_sim.step(sim)
    # LC channels are not allocated at all on the non-LC path
    assert sim.state.l_sh is None
    assert int(jax.device_get(sim.state.overflow)) == 0


def test_ring_lc_matches_gen1_mixed_templates():
    """Lane change + NON-uniform vehicle templates on the ring (VERDICT
    r03 next-round 8): the LC urgency/benefit/yield math is templated
    through the one-hot _PP channel (leader len, follower maxNegAcc,
    self len/maxSpeed/maxNegAcc), so this combination no longer falls
    back to gen-1. Three distinct templates on the dense 1x1s net."""
    _run_compare_lc(_fix("config_1x1s_mixed_lc.json"), 80, sl=12, sk=6)
