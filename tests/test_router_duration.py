"""Lane history + RouterType::DURATION (reference roadnet.cpp:900-923,
router.cpp:193-200 — dead-by-default there since router.h:42 hardcodes
LENGTH; exposed here via the config key "routerType")."""

import json
import math
import os

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))


def _duration_config(tmp_path):
    with open(os.path.join(HERE, "fixtures", "config_example.json")) as f:
        cfg = json.load(f)
    cfg["routerType"] = "DURATION"
    p = tmp_path / "config_duration.json"
    with open(p, "w") as f:
        json.dump(cfg, f)
    return str(p)


def test_history_matches_reference_formula(tmp_path):
    """hist sums == reference Lane::updateHistory accumulation replayed in
    python from the per-step lane occupancy/speed the API reports."""
    from cityflow_tpu.engine import Engine
    eng = Engine(_duration_config(tmp_path))
    L = eng.net.num_lanes
    ids = eng.net.host.lane_ids
    exp_entries = {i: [] for i in range(L)}     # (num, speed_sum) per step
    for _ in range(40):
        eng.next_step()
        lv = eng.get_lane_vehicles()
        speeds = eng.get_vehicle_speed()
        for i, lid in enumerate(ids):
            vs = lv.get(lid, [])
            exp_entries[i].append(
                (len(vs), sum(speeds[v] for v in vs)))
    hist = eng.get_lane_history()
    for i, lid in enumerate(ids):
        num = sum(n for n, _ in exp_entries[i][-241:])
        ssum = sum(s for _, s in exp_entries[i][-241:])
        got_n, got_avg = hist[lid]
        assert got_n == num, (lid, got_n, num)
        if num:
            assert abs(got_avg - ssum / num) < 1e-9


def test_duration_cost_changes_route(tmp_path):
    """Dijkstra with injected road durations must route around congestion
    that LENGTH routing ignores (router.cpp:193-200)."""
    from cityflow_tpu.compiler.net import compile_scenario
    from cityflow_tpu.compiler import flows as flows_mod
    net = compile_scenario(os.path.join(HERE, "fixtures", "config_2x2.json"))
    hn = net.host.net
    # pick an origin/destination with at least two road-disjoint paths
    # in the 2x2 grid: horizontal-then-vertical vs vertical-then-horizontal
    start = hn.road_map["road_0_1_0"]
    end = hn.road_map["road_2_1_0"]
    base = flows_mod.update_shortest_path(hn, [start, end])
    assert base is not None
    # congest every road on the LENGTH-optimal path except the anchors
    durations = {}
    for r in base[1:-1]:
        durations[r.index] = 1e6
    cost = flows_mod.duration_cost_fn(durations, max_speed=16.67)
    slow = flows_mod.update_shortest_path(hn, [start, end], cost=cost)
    assert slow is not None
    assert [r.id for r in slow] != [r.id for r in base]
    # and with empty history the DURATION route uses the len/maxSpeed
    # fallback, which ranks roads like LENGTH does up to the lane-count sum
    cost0 = flows_mod.duration_cost_fn({}, max_speed=16.67)
    free = flows_mod.update_shortest_path(hn, [start, end], cost=cost0)
    assert free is not None


def test_duration_reroute_api(tmp_path):
    """set_vehicle_route under routerType DURATION consumes the live
    history (smoke: must succeed and keep the vehicle on a valid route)."""
    from cityflow_tpu.engine import Engine
    eng = Engine(_duration_config(tmp_path))
    for _ in range(25):
        eng.next_step()
    vids = eng.get_vehicles(include_waiting=False)
    moved = 0
    for v in vids[:5]:
        info = eng.get_vehicle_info(v)
        if info.get("drivable", "").startswith("road"):
            ok = eng.set_vehicle_route(v, [info["road"]])
            moved += 1
    eng.next_step()
    assert eng.get_vehicle_count() > 0


def test_ring_backend_serves_duration(tmp_path):
    """routerType=DURATION on backend='ring' (VERDICT r04 next-round 7):
    the ring maintains the Lane::updateHistory window on device (h_*
    channels, core/ring._update_history) and must match gen-1 fast mode
    per lane after 40 steps; live reroutes consume it through the same
    Engine._router_cost host path."""
    from cityflow_tpu.engine import Engine
    cfgp = _duration_config(tmp_path)
    e1 = Engine(cfgp, exact=False, backend="gen1")
    e2 = Engine(cfgp, exact=False, backend="ring")
    assert e2._ring is not None, "ring must serve DURATION now"
    assert e2._ring.sim.cfg.track_history
    for _ in range(40):
        e1.next_step()
        e2.next_step()
    h1, h2 = e1.get_lane_history(), e2.get_lane_history()
    assert set(h1) == set(h2)
    for lid in h1:
        n1, s1 = h1[lid]
        n2, s2 = h2[lid]
        assert n1 == n2, (lid, n1, n2)
        assert abs(s1 - s2) <= 2e-3 * max(abs(s1), 1.0), (lid, s1, s2)
    d1, d2 = e1._road_durations(), e2._road_durations()
    assert set(d1) == set(d2)
    for ri in d1:
        if d1[ri] < 0 or math.isinf(d1[ri]):
            assert d1[ri] == d2[ri] or (
                math.isinf(d1[ri]) and math.isinf(d2[ri]))
        else:
            assert abs(d1[ri] - d2[ri]) <= 2e-3 * max(abs(d1[ri]), 1.0)
    # reroute smoke on the ring backend: must consume the live history
    vids = e2.get_vehicles(include_waiting=False)
    moved = 0
    for v in vids[:8]:
        info = e2.get_vehicle_info(v)
        if info.get("drivable", "").startswith("road"):
            if e2.set_vehicle_route(v, [info["road"]]):
                moved += 1
    e2.next_step()
    assert e2.get_vehicle_count() > 0


def test_history_durations_match_oracle(tmp_path):
    """Road::getAverageDuration per road per step vs the unmodified
    reference (golden from tools/oracle/dump_history.cpp on the 2x2
    fixture): history vehicle sums must be EQUAL, durations equal to
    1e-9 relative (we keep speed sums where the reference keeps
    (num, avg) pairs — one extra rounding per entry)."""
    import gzip
    import math
    from cityflow_tpu.engine import Engine
    with open(os.path.join(HERE, "fixtures", "config_2x2.json")) as f:
        cfg = json.load(f)
    cfg["routerType"] = "DURATION"
    p = tmp_path / "config_2x2_dur.json"
    json.dump(cfg, open(p, "w"))
    eng = Engine(str(p))
    gold = [json.loads(l) for l in gzip.open(
        os.path.join(HERE, "goldens", "history_2x2_40.jsonl.gz"), "rt")]
    road_index = {r.id: r.index for r in eng.net.host.net.roads}
    for rec in gold:
        eng.next_step()
        durs = eng._road_durations()
        nums, _ = __import__("jax").device_get(
            (eng.state.hist_num, eng.state.hist_ssum))
        for rid, ref_num, ref_dur in rec["roads"]:
            ri = road_index[rid]
            road = eng.net.host.net.roads[ri]
            my_num = sum(int(nums[l.index]) for l in road.lanes)
            assert my_num == ref_num, (rec["t"], rid, my_num, ref_num)
            my_dur = durs[ri]
            if ref_dur < 0:
                assert my_dur < 0, (rec["t"], rid, my_dur)
            elif math.isinf(ref_dur):
                assert math.isinf(my_dur)
            else:
                assert abs(my_dur - ref_dur) <= 1e-9 * max(abs(ref_dur), 1), \
                    (rec["t"], rid, my_dur, ref_dur)
