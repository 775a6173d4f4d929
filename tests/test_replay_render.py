"""The player renders our logs (VERDICT r02 item 10): generate a real
(roadnet log, replay log) pair through the Engine, then render frames
with tools/render_replay.py — the headless twin of the bundled canvas
viewer (frontend/index.html) — and assert roads and vehicles actually
appear at the logged positions, plus the metric-chart overlay of the
reference player (docs/source/replay.rst:37-55 format)."""

import json
import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

HERE = os.path.dirname(os.path.abspath(__file__))

VEHICLE_RGB = (80, 180, 250)
ROAD_RGB = (70, 70, 75)


def _generate_logs(tmp_path, steps=25):
    cfg = json.load(open(os.path.join(HERE, "fixtures", "config_4x4.json")))
    cfg["saveReplay"] = True
    cfg["roadnetLogFile"] = str(tmp_path / "rn.json")
    cfg["replayLogFile"] = str(tmp_path / "rp.txt")
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps(cfg))
    from cityflow_tpu.engine import Engine
    eng = Engine(str(p), exact=False)
    waits = []
    for _ in range(steps):
        eng.next_step()
        w = eng.get_lane_waiting_vehicle_count()
        waits.append((sum(w.values()), eng.get_vehicle_count()))
    chart = tmp_path / "chart.txt"
    chart.write_text("waiting vs running\n" + "\n".join(
        f"{a} {b}" for a, b in waits))
    return (str(tmp_path / "rn.json"), str(tmp_path / "rp.txt"),
            str(chart), eng)


def test_render_frames_show_roads_vehicles_chart(tmp_path):
    import render_replay as rr
    rn, rp, chart_path, eng = _generate_logs(tmp_path)
    net_doc = json.load(open(rn))
    frames = rr.load_replay(rp)
    assert len(frames) == 25
    chart = rr.load_chart(chart_path)
    assert chart["title"] == "waiting vs running"
    assert len(chart["rows"]) == 25 and len(chart["rows"][0]) == 2

    r = rr.Renderer(net_doc, size=700)
    # position checks on the chart-free frame (the overlay box covers the
    # bottom-right corner, including any vehicles under it)
    img = r.frame(frames[-1])
    a = np.asarray(img)
    assert a.shape == (700, 700, 3)
    n_road = int(np.sum(np.all(a == ROAD_RGB, axis=-1)))
    n_veh = int(np.sum(np.all(a == VEHICLE_RGB, axis=-1)))
    assert n_road > 5000, "road network not drawn"
    assert n_veh > 50, "vehicles not drawn"
    # the number of drawn vehicles equals the engine's running count
    assert len(frames[-1]) == eng.get_vehicle_count()

    # vehicle pixels are AT the logged world positions (projection sanity)
    hit = 0
    lc_rgb = (250, 160, 80)
    for c in frames[-1][:20]:
        x, y = r.xy(c["x"], c["y"])
        xi, yi = int(round(x)), int(round(y))
        patch = a[max(yi - 3, 0):yi + 4, max(xi - 3, 0):xi + 4]
        if patch.size and (np.any(np.all(patch == VEHICLE_RGB, axis=-1))
                           or np.any(np.all(patch == lc_rgb, axis=-1))):
            hit += 1
    assert hit >= 18, f"only {hit}/20 vehicles rendered at logged positions"

    # chart overlay drew its polyline colors in the chart box region
    a2 = np.asarray(r.frame(frames[-1], chart, 24))
    box = a2[-150:, -240:]
    n_line = int(np.sum(np.all(box == (250, 160, 80), axis=-1)))
    assert n_line > 10, "chart polyline not drawn"


def test_render_cli(tmp_path):
    import subprocess
    rn, rp, chart_path, _ = _generate_logs(tmp_path, steps=6)
    out = tmp_path / "out"
    res = subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(HERE), "tools", "render_replay.py"),
         rn, rp, str(out), "--frames", "0,5", "--chart", chart_path],
        capture_output=True, text=True)
    assert res.returncode == 0, res.stderr[-1500:]
    assert (out / "frame_00000.png").exists()
    assert (out / "frame_00005.png").exists()
