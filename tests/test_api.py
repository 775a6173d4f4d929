"""API surface tests — the reference's tests/python/test_api.py contract
(every getter exercised each step, running <= total invariant), plus the
control surface (set_tl_phase, set_vehicle_speed, push_vehicle,
set_vehicle_route)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HERE = os.path.dirname(os.path.abspath(__file__))
CONFIG = os.path.join(HERE, "fixtures", "config_example.json")


def _mk(**kw):
    from cityflow_tpu.engine import Engine
    return Engine(CONFIG, **kw)


def test_getters_every_step():
    eng = _mk()
    for t in range(100):
        eng.next_step()
        running = eng.get_vehicle_count()
        total = len(eng.get_vehicles(include_waiting=True))
        assert running <= total
        assert len(eng.get_vehicles()) == running
        lc = eng.get_lane_vehicle_count()
        lw = eng.get_lane_waiting_vehicle_count()
        lv = eng.get_lane_vehicles()
        assert sum(lc.values()) <= running  # rest are on lanelinks
        assert all(lw[k] <= lc[k] for k in lc)
        assert all(len(lv[k]) == lc[k] for k in lc)
        sp = eng.get_vehicle_speed()
        ds = eng.get_vehicle_distance()
        assert set(sp) == set(ds)
        assert eng.get_current_time() == (t + 1) * eng.interval
        assert eng.get_average_travel_time() >= 0
    vid = eng.get_vehicles()[0]
    info = eng.get_vehicle_info(vid)
    assert info["running"] == "1"
    assert "drivable" in info and "route" in info
    assert isinstance(eng.get_leader(vid), str)


def test_set_vehicle_speed():
    """customSpeed is clamped by braking limits (vehicle.cpp:214-221), so it
    converges over a few steps; the buffer is one-step (Vehicle::update)."""
    eng = _mk()
    for _ in range(30):
        eng.next_step()
    vid = eng.get_vehicles()[0]
    for _ in range(6):
        eng.set_vehicle_speed(vid, 1.0)
        eng.next_step()
        if vid not in eng.get_vehicle_speed():
            return  # finished its route
    assert eng.get_vehicle_speed()[vid] <= 1.0 + 1e-9


def test_set_tl_phase_guard(capsys):
    eng = _mk()
    inter = next(i.id for i in eng.net.host.net.intersections if not i.virtual)
    eng.set_tl_phase(inter, 1)  # rlTrafficLight false -> warning, no-op
    out = capsys.readouterr().out
    assert "rlTrafficLight" in out


def test_push_vehicle_and_route():
    eng = _mk()
    for _ in range(5):
        eng.next_step()
    eng.push_vehicle({"maxSpeed": 10.0}, ["road_0_1_0", "road_1_1_0"])
    for _ in range(8):
        eng.next_step()
    vs = eng.get_vehicles(include_waiting=True)
    assert "manually_pushed_0" in vs
    info = eng.get_vehicle_info("manually_pushed_0")
    assert info["route"].split() == ["road_0_1_0", "road_1_1_0"]
    # reroute: setRoute succeeds only when the CURRENT lane reaches the new
    # route (Router::setRoute onValidLane check, router.cpp:254-257) — try
    # vehicle/target pairs until one is compatible
    cands = [v for v, i in ((v, eng.get_vehicle_info(v))
                            for v in eng.get_vehicles())
             if i.get("road") == "road_0_1_0"]
    assert cands
    hit = None
    for v in cands:
        for target in ("road_1_1_0", "road_1_1_1", "road_1_1_3"):
            if eng.set_vehicle_route(v, [target]):
                hit = (v, target)
                break
        if hit:
            break
    assert hit, "no reroute-compatible vehicle found"
    v, target = hit
    assert eng.set_vehicle_route(v, ["no_such_road"]) is False
    assert eng.get_vehicle_info(v)["route"].split()[-1] == target
    for _ in range(10):
        eng.next_step()


def test_bad_vehicle_id():
    eng = _mk()
    eng.next_step()
    with pytest.raises(RuntimeError):
        eng.get_leader("nope_1")
    with pytest.raises(RuntimeError):
        eng.get_vehicle_info("nope_1")
    with pytest.raises(RuntimeError):
        eng.set_vehicle_speed("nope_1", 1.0)


def test_reset_reproducibility():
    """reference tests/cpp/basic_test.cpp:36-53 (reset true)."""
    eng = _mk()
    for _ in range(60):
        eng.next_step()
    a = (eng.get_current_time(), eng.get_vehicle_count(),
         eng.get_average_travel_time())
    eng.reset(seed=True)
    for _ in range(60):
        eng.next_step()
    b = (eng.get_current_time(), eng.get_vehicle_count(),
         eng.get_average_travel_time())
    assert a == b
