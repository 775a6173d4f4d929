"""Replay log format test: the per-step text line and roadnet log must match
the reference's frontend contract (engine.cpp:518-554; frontend/script.js
parsing: "x y angle id lcDir len width,...;roadId g/r...,")."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HERE = os.path.dirname(os.path.abspath(__file__))


def test_replay_files(tmp_path):
    cfg = {
        "interval": 1.0, "seed": 0, "dir": str(tmp_path) + "/",
        "roadnetFile": "roadnet.json", "flowFile": "flow.json",
        "rlTrafficLight": False, "laneChange": False, "saveReplay": True,
        "roadnetLogFile": "replay_roadnet.json", "replayLogFile": "replay.txt",
    }
    import shutil
    shutil.copy("/root/reference/examples/roadnet.json",
                tmp_path / "roadnet.json")
    shutil.copy("/root/reference/examples/flow.json", tmp_path / "flow.json")
    json.dump(cfg, open(tmp_path / "config.json", "w"))

    from cityflow_tpu.engine import Engine
    eng = Engine(str(tmp_path / "config.json"))
    for _ in range(20):
        eng.next_step()

    static = json.load(open(tmp_path / "replay_roadnet.json"))
    assert "static" in static
    assert {"nodes", "edges"} <= set(static["static"])
    assert all({"id", "points", "nLane", "laneWidths"} <= set(e)
               for e in static["static"]["edges"])

    lines = open(tmp_path / "replay.txt").read().splitlines()
    assert len(lines) == 20
    # later steps have vehicles; check the record grammar
    veh_part, signal_part = lines[-1].split(";", 1)
    recs = [r for r in veh_part.split(",") if r.strip()]
    assert recs, "no vehicles in replay at step 20"
    for r in recs:
        f = r.split()
        assert len(f) == 7, f
        float(f[0]); float(f[1]); float(f[2])   # x y angle
        int(f[4]); float(f[5]); float(f[6])     # lcDir len width
    for seg in [s for s in signal_part.split(",") if s.strip()]:
        toks = seg.split()
        assert toks[0].startswith("road_")
        assert all(t in ("g", "r", "i") for t in toks[1:])

    # switching files mid-run (reference test_api.py:29-41)
    eng.set_replay_file("replay2.txt")
    eng.next_step()
    assert (tmp_path / "replay2.txt").exists()
    eng.set_save_replay(False)
    eng.next_step()
    assert len(open(tmp_path / "replay2.txt").read().splitlines()) == 1


def test_outline_matches_reference_hull():
    """Intersection outlines equal the reference convex hull
    (Intersection::getOutline, roadnet.cpp:750-818; golden extracted from
    the unmodified reference's roadnetLogFile on the 2x2 fixture)."""
    import json
    import numpy as np
    from cityflow_tpu.compiler.net import compile_scenario
    from cityflow_tpu.replay import _outline

    net = compile_scenario(os.path.join(HERE, "fixtures", "config_2x2.json"))
    with open(os.path.join(HERE, "goldens", "outline_2x2.json")) as f:
        gold = json.load(f)
    for inter in net.host.net.intersections:
        ours = [c for p in _outline(inter) for c in p]
        ref = gold[inter.id]
        assert len(ours) == len(ref), (inter.id, len(ours), len(ref))
        # same polygon up to cyclic rotation (pivot ties may rotate it)
        ours_pts = [tuple(ours[i:i+2]) for i in range(0, len(ours), 2)]
        ref_pts = [tuple(ref[i:i+2]) for i in range(0, len(ref), 2)]
        ok = False
        for r in range(len(ref_pts)):
            rot = ref_pts[r:] + ref_pts[:r]
            if np.allclose(np.asarray(rot), np.asarray(ours_pts), atol=1e-6):
                ok = True
                break
        assert ok, (inter.id, ours_pts[:3], ref_pts[:3])
