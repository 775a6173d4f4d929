"""Snapshot / restore determinism — the reference's test_archive.py contract
(reference: tests/python/test_archive.py:25-118): run, snapshot, run N steps
recording metrics, load, run N steps again — trajectories must be identical.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HERE = os.path.dirname(os.path.abspath(__file__))
CONFIG = os.path.join(HERE, "fixtures", "config_example.json")


def _metrics(eng):
    return (eng.get_lane_vehicle_count(), eng.get_average_travel_time(),
            eng.get_vehicle_count())


def _run_and_record(eng, n):
    rec = []
    for _ in range(n):
        eng.next_step()
        rec.append(_metrics(eng))
    return rec


def test_snapshot_load_reproduces():
    from cityflow_tpu.engine import Engine
    eng = Engine(CONFIG)
    for _ in range(50):
        eng.next_step()
    a = eng.snapshot()
    rec1 = _run_and_record(eng, 50)
    eng.load(a)
    rec2 = _run_and_record(eng, 50)
    assert rec1 == rec2


def test_multiple_loads():
    from cityflow_tpu.engine import Engine
    eng = Engine(CONFIG)
    for _ in range(30):
        eng.next_step()
    a = eng.snapshot()
    recs = []
    for _ in range(3):
        eng.load(a)
        recs.append(_run_and_record(eng, 30))
    assert recs[0] == recs[1] == recs[2]


def test_disk_roundtrip(tmp_path):
    from cityflow_tpu.engine import Engine
    eng = Engine(CONFIG)
    for _ in range(30):
        eng.next_step()
    a = eng.snapshot()
    path = str(tmp_path / "archive.json")
    a.dump(path)
    rec1 = _run_and_record(eng, 30)
    eng.load_from_file(path)
    rec2 = _run_and_record(eng, 30)
    assert rec1 == rec2


def test_cross_engine_restore_after_reseed_and_push(tmp_path):
    """A dump taken after a mid-run set_random_seed + push_vehicle must
    restore into a FRESH engine and replay the exact same future stream
    (reference archive.cpp:153-177 serializes the mt19937 so archives are
    engine-independent)."""
    from cityflow_tpu.engine import Engine
    eng = Engine(CONFIG)
    for _ in range(20):
        eng.next_step()
    eng.set_random_seed(2023)           # kills the original seed basis
    for _ in range(10):
        eng.next_step()
    eng.push_vehicle({"maxSpeed": 12.0},
                     ["road_0_1_0", "road_1_1_0"])
    for _ in range(5):
        eng.next_step()
    path = str(tmp_path / "arch_cross.json")
    eng.snapshot().dump(path)
    rec1 = _run_and_record(eng, 40)
    ids1 = eng.get_vehicles(include_waiting=True)

    fresh = Engine(CONFIG)
    fresh.load_from_file(path)
    rec2 = _run_and_record(fresh, 40)
    ids2 = fresh.get_vehicles(include_waiting=True)
    assert rec1 == rec2
    assert ids1 == ids2


def test_push_after_continuing_reset(tmp_path):
    """push_vehicle after reset(resetRnd=false): the RNG stream continues
    across the reset (engine.cpp:744-760) and manual pushes interleave into
    that continued stream — previously a NotImplementedError."""
    from cityflow_tpu.engine import Engine
    eng = Engine(CONFIG)
    for _ in range(25):
        eng.next_step()
    eng.reset(False)
    eng.push_vehicle({}, ["road_0_1_0", "road_1_1_0"])
    rec1 = _run_and_record(eng, 30)
    ids1 = eng.get_vehicles(include_waiting=True)
    path = str(tmp_path / "arch_reset.json")
    eng.snapshot().dump(path)

    fresh = Engine(CONFIG)
    fresh.load_from_file(path)
    rec2 = _run_and_record(fresh, 20)
    assert _run_and_record(eng, 20) == rec2
    assert "manually_pushed_0" in ids1
