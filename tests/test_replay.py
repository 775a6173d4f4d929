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


def test_replay_lines_match_reference():
    """Our replay text lines vs the unmodified reference's replayLogFile on
    the 2x2 fixture (exact mode): same vehicles, positions/angles to 1e-6,
    identical per-road signal sections (Engine::updateLog,
    engine.cpp:518-554)."""
    import gzip
    cfg = {
        "interval": 1.0, "seed": 0,
        "dir": os.path.join(HERE, "fixtures") + "/",
        "roadnetFile": "roadnet_2x2.json", "flowFile": "flow_2x2.json",
        "rlTrafficLight": False, "laneChange": False, "saveReplay": True,
    }
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        cfg["roadnetLogFile"] = os.path.join(td, "rlog.json")
        cfg["replayLogFile"] = os.path.join(td, "replay.txt")
        cp = os.path.join(td, "config.json")
        json.dump(cfg, open(cp, "w"))
        from cityflow_tpu.engine import Engine
        eng = Engine(cp)
        for _ in range(60):
            eng.next_step()
        eng.set_save_replay(False)   # flush
        mine = open(cfg["replayLogFile"]).read().splitlines()
    ref = gzip.open(os.path.join(HERE, "goldens", "replay_2x2_60.txt.gz"),
                    "rt").read().splitlines()
    assert len(mine) == len(ref) == 60

    def parse(line):
        veh_part, road_part = line.split(";", 1)
        vehs = {}
        for rec in veh_part.split(","):
            if not rec.strip():
                continue
            x, y, ang, vid, lc, ln, w = rec.split()
            vehs[vid] = (float(x), float(y), float(ang), int(lc),
                         float(ln), float(w))
        roads = {}
        for rec in road_part.split(","):
            if not rec.strip():
                continue
            parts = rec.split()
            roads[parts[0]] = parts[1:]
        return vehs, roads

    for t, (lm, lr) in enumerate(zip(mine, ref), 1):
        vm, rm = parse(lm)
        vr, rr = parse(lr)
        assert set(vm) == set(vr), (t, set(vm) ^ set(vr))
        for vid in vr:
            a, b = vm[vid], vr[vid]
            assert all(abs(x - y) <= 1e-6 for x, y in
                       zip(a[:3], b[:3])), (t, vid, a, b)
            assert a[3:] == b[3:], (t, vid, a, b)
        assert rm == rr, (t, {k: (rm.get(k), rr.get(k))
                              for k in set(rm) | set(rr)
                              if rm.get(k) != rr.get(k)})
