"""Ring-backed `Engine`: the reference-compatible API served from the
gen-2 ring layout (ring_backend.RingShell).

`Engine(config, exact=False)` auto-selects the ring on supported
scenarios; these tests pin (a) the selection logic, (b) getter agreement
with the gen-1 fast backend on the same config, and (c) the control
surface (custom speed, reset reproducibility, archive round trip,
replay logging, set_vehicle_route, push_vehicle) through the ring."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HERE = os.path.dirname(os.path.abspath(__file__))


def _fix(name):
    return os.path.join(HERE, "fixtures", name)


def _mk(cfg="config_4x4.json", **kw):
    from cityflow_tpu.engine import Engine
    return Engine(_fix(cfg), exact=False, **kw)


def test_backend_selection():
    eng = _mk()
    assert eng._ring is not None
    g = _mk(backend="gen1")
    assert g._ring is None
    from cityflow_tpu.engine import Engine
    e = Engine(_fix("config_4x4.json"), exact=True)
    assert e._ring is None          # exact mode never rides the ring


def test_ring_engine_matches_gen1_fast():
    r = _mk()
    g = _mk(backend="gen1")
    for t in range(60):
        r.next_step()
        g.next_step()
        if t % 10 == 9:
            assert r.get_vehicle_count() == g.get_vehicle_count(), t
            assert sorted(r.get_vehicles()) == sorted(g.get_vehicles()), t
            assert r.get_lane_vehicle_count() == g.get_lane_vehicle_count()
            sp_r, sp_g = r.get_vehicle_speed(), g.get_vehicle_speed()
            for v in sp_r:
                assert abs(sp_r[v] - sp_g[v]) < 1e-3, (t, v)
    assert abs(r.get_average_travel_time()
               - g.get_average_travel_time()) < 0.5
    # waiting sets agree too
    assert sorted(r.get_vehicles(include_waiting=True)) \
        == sorted(g.get_vehicles(include_waiting=True))
    wr = r.get_lane_waiting_vehicle_count()
    wg = g.get_lane_waiting_vehicle_count()
    assert wr == wg


def test_ring_engine_mixed_templates():
    """Non-uniform vehicle templates ride the ring-backed Engine:
    auto-selection accepts them (laneChange:false), getters agree with
    gen-1, and get_vehicle_info reports each vehicle's own template
    geometry (Engine::getVehicleInfo, engine.cpp:615-680)."""
    r = _mk("config_2x2_mixed.json")
    assert r._ring is not None
    assert not r._ring.sim.cfg.uniform and r._ring.sim.cfg.TP == 3
    g = _mk("config_2x2_mixed.json", backend="gen1")
    for t in range(60):
        r.next_step()
        g.next_step()
        if t % 20 == 19:
            assert sorted(r.get_vehicles()) == sorted(g.get_vehicles()), t
            assert r.get_lane_vehicle_count() == g.get_lane_vehicle_count()
    for v in r.get_vehicles():
        ir = r.get_vehicle_info(v)
        ig = g.get_vehicle_info(v)
        assert ir["drivable"] == ig["drivable"], v
        assert abs(float(ir["distance"]) - float(ig["distance"])) < 2e-3
    # per-template geometry comes back through the ring fetch (feeds the
    # replay log's per-vehicle len/width, engine.cpp:518-554)
    cr = r._fetch()
    lens = {round(float(cr["len"][i]), 3)
            for i in range(len(cr["uid"])) if cr["running"][i]}
    assert lens <= {5.0, 10.0, 4.0} and len(lens) > 1, lens


def test_ring_engine_control_surface():
    eng = _mk()
    for _ in range(30):
        eng.next_step()
    vid = eng.get_vehicles()[0]
    for _ in range(8):
        eng.set_vehicle_speed(vid, 1.0)
        eng.next_step()
        if vid not in eng.get_vehicle_speed():
            pytest.skip("vehicle left before converging")
    assert eng.get_vehicle_speed()[vid] <= 1.0 + 1e-6
    info = eng.get_vehicle_info(vid)
    assert info["running"] == "1" and "route" in info
    assert isinstance(eng.get_leader(vid), str)
    with pytest.raises(RuntimeError):
        eng.get_vehicle_info("nope_1")
    with pytest.raises(RuntimeError):
        eng.set_vehicle_speed("nope_1", 1.0)


def test_ring_engine_reset_reproducibility():
    eng = _mk()
    for _ in range(40):
        eng.next_step()
    a = (eng.get_current_time(), eng.get_vehicle_count(),
         eng.get_average_travel_time())
    eng.reset(seed=True)
    assert eng.get_current_time() == 0.0
    for _ in range(40):
        eng.next_step()
    b = (eng.get_current_time(), eng.get_vehicle_count(),
         eng.get_average_travel_time())
    assert a == b


def test_ring_engine_archive_roundtrip(tmp_path):
    eng = _mk()
    for _ in range(30):
        eng.next_step()
    snap = eng.snapshot()
    path = str(tmp_path / "ring_arch.json")
    snap.dump(path)
    for _ in range(10):
        eng.next_step()
    after = (eng.get_vehicle_count(), eng.get_average_travel_time())
    eng.load_from_file(path)
    assert eng.get_current_time() == 30.0
    for _ in range(10):
        eng.next_step()
    replayed = (eng.get_vehicle_count(), eng.get_average_travel_time())
    assert replayed == after


def test_ring_engine_set_route():
    eng = _mk()
    for _ in range(20):
        eng.next_step()
    # pick a vehicle on a lane and reroute it to its current road's end
    for v in eng.get_vehicles():
        info = eng.get_vehicle_info(v)
        road = info.get("road")
        if not road:
            continue
        rest = info["route"].split()
        if len(rest) < 2:
            continue
        target = rest[1]
        if eng.set_vehicle_route(v, [target]):
            assert eng.get_vehicle_info(v)["route"].split()[-1] == target
            for _ in range(5):
                eng.next_step()
            return
    pytest.skip("no reroutable vehicle found")


def test_ring_engine_push_vehicle():
    eng = _mk()
    for _ in range(5):
        eng.next_step()
    # the scenario template (ring bakes exactly one): pushing it is legal
    p = eng._ring.sim.meta.param_row
    info = {"speed": float(p[0]), "length": float(p[1]),
            "width": float(p[2]), "maxPosAcc": float(p[3]),
            "maxNegAcc": float(p[4]), "usualPosAcc": float(p[5]),
            "usualNegAcc": float(p[6]), "minGap": float(p[7]),
            "maxSpeed": float(p[8]), "headwayTime": float(p[9])}
    flow0 = eng.net.host.flows[0]
    roads = [r.id for r in flow0.route[:2]]
    eng.push_vehicle(info, roads)
    for _ in range(12):
        eng.next_step()
    assert "manually_pushed_0" in eng.get_vehicles(include_waiting=True)
    # a DIFFERENT template must be rejected loudly, not silently wrong
    bad = dict(info, maxSpeed=3.33)
    with pytest.raises(ValueError):
        eng.push_vehicle(bad, roads)


def test_ring_engine_replay_log(tmp_path):
    cfg = json.load(open(_fix("config_4x4.json")))
    cfg["saveReplay"] = True
    cfg["roadnetLogFile"] = str(tmp_path / "rn.json")
    cfg["replayLogFile"] = str(tmp_path / "rp.txt")
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps(cfg))
    from cityflow_tpu.engine import Engine
    eng = Engine(str(p), exact=False)
    assert eng._ring is not None
    for _ in range(12):
        eng.next_step()
    lines = open(str(tmp_path / "rp.txt")).read().strip().split("\n")
    assert len(lines) == 12
    veh_part, tl_part = lines[-1].split(";")
    n_logged = len([x for x in veh_part.split(",") if x.strip()])
    assert n_logged == eng.get_vehicle_count()
    for tok in veh_part.split(",")[:1]:
        assert len(tok.split()) == 7          # x y angle id lcDir len width
    assert json.load(open(str(tmp_path / "rn.json")))["static"]["nodes"]


def test_ring_engine_cross_drivable_leader():
    """`get_leader` on the ring backend answers the reference's forward
    walk (vehicle.cpp:157-196) INCLUDING across the drivable boundary:
    compare against the gen-1 backend (whose leader field is the
    transcribed reference computation) for every vehicle, and require
    that at least one agreeing pair actually spans a lane->lanelink or
    lanelink->lane boundary so the check is non-vacuous."""
    r = _mk()
    g = _mk(backend="gen1")
    cross_pairs = 0
    checked = 0
    for t in range(90):
        r.next_step()
        g.next_step()
        if t < 20 or t % 5 != 4:
            continue
        dist_g = g.get_vehicle_distance()
        ids = sorted(set(r.get_vehicles()) & set(g.get_vehicles()))
        lane_of_r = {}
        for ln, vs in r.get_lane_vehicles().items():
            for v in vs:
                lane_of_r[v] = ln
        for vid in ids:
            lr, lg = r.get_leader(vid), g.get_leader(vid)
            checked += 1
            assert lr == lg, (t, vid, lr, lg, dist_g.get(vid))
            if lr and lane_of_r.get(vid) != lane_of_r.get(lr):
                cross_pairs += 1
    assert checked > 50
    assert cross_pairs > 0, "no cross-drivable leader pair exercised"
