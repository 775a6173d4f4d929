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
