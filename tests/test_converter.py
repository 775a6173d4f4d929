"""SUMO converter: tlLogic conversion + round trips (reference
tools/converter/converter_v2.py equivalents; VERDICT r1 item 7)."""

import json
import os
import sys
import xml.etree.ElementTree as ET

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))), "tools", "converter"))

import converter

HERE = os.path.dirname(os.path.abspath(__file__))
NET_XML = os.path.join(HERE, "fixtures", "sumo_corridor.net.xml")


def _convert(tmp_path):
    out = str(tmp_path / "roadnet_sumo.json")
    converter.sumo_to_cityflow(NET_XML, out)
    return json.load(open(out)), out


def test_tl_program_conversion(tmp_path):
    doc, _ = _convert(tmp_path)
    inters = {i["id"]: i for i in doc["intersections"]}
    n1 = inters["intersection_n1"]
    n2 = inters["intersection_n2"]
    assert not n1["virtual"] and not n2["virtual"]
    ph1 = n1["trafficLight"]["lightphases"]
    ph2 = n2["trafficLight"]["lightphases"]
    assert len(ph1) == 4 and len(ph2) == 2      # not collapsed to all-green
    rls = n1["roadLinks"]
    # phase 0 "GGGrrr": the west-approach movements move, the south ones don't
    avail0 = set(ph1[0]["availableRoadLinks"])
    avail2 = set(ph1[2]["availableRoadLinks"])
    west = {i for i, rl in enumerate(rls) if rl["startRoad"].endswith("we1")}
    south = {i for i, rl in enumerate(rls) if rl["startRoad"].endswith("s1n")}
    assert west and south
    assert west <= avail0 and not (south & avail0)
    assert south <= avail2 and not (west & avail2)
    # yellow phases are restrictive
    assert ph1[1]["availableRoadLinks"] == []
    assert ph1[3]["availableRoadLinks"] == []


def test_converted_net_compiles_and_runs(tmp_path):
    doc, out = _convert(tmp_path)
    flow = [{
        "vehicle": {"length": 5.0, "width": 2.0, "maxPosAcc": 2.0,
                    "maxNegAcc": 4.5, "usualPosAcc": 2.0, "usualNegAcc": 4.5,
                    "minGap": 2.5, "maxSpeed": 11.0, "headwayTime": 1.5},
        "route": [r["id"] for r in doc["roads"]
                  if r["id"].startswith("road_we1")]
        + [r["id"] for r in doc["roads"] if r["id"].startswith("road_e12")],
        "interval": 5.0, "startTime": 0, "endTime": -1}]
    fp = tmp_path / "flow_sumo.json"
    json.dump(flow, open(fp, "w"))
    cfg = {"interval": 1.0, "seed": 0, "dir": str(tmp_path) + "/",
           "roadnetFile": "roadnet_sumo.json", "flowFile": "flow_sumo.json",
           "rlTrafficLight": False, "laneChange": False, "saveReplay": False}
    cp = tmp_path / "config_sumo.json"
    json.dump(cfg, open(cp, "w"))
    from cityflow_tpu.engine import Engine
    eng = Engine(str(cp))
    for _ in range(30):
        eng.next_step()
    assert eng.get_vehicle_count() > 0


def test_cityflow_to_sumo_round_trip(tmp_path):
    # cityflow 2x2 (signalized grid) -> plain XML -> counts + phases survive
    src = os.path.join(HERE, "fixtures", "roadnet_2x2.json")
    doc = json.load(open(src))
    paths = converter.cityflow_to_sumo(src, str(tmp_path / "out"))
    nod, edg, con, tll = [ET.parse(p).getroot() for p in paths]
    assert len(nod.findall("node")) == len(doc["intersections"])
    assert len(edg.findall("edge")) == len(doc["roads"])
    n_ll = sum(len(rl["laneLinks"]) for i in doc["intersections"]
               for rl in i.get("roadLinks", []))
    assert len(con.findall("connection")) == n_ll
    tl_by_id = {t.get("id"): t for t in tll.findall("tlLogic")}
    for i in doc["intersections"]:
        phases = i.get("trafficLight", {}).get("lightphases", [])
        if not i["virtual"] and len(phases) > 1:
            t = tl_by_id[i["id"]]
            assert len(t.findall("phase")) == len(phases)
            # green sets must match availableRoadLinks exactly
            conn_link = []
            for ri, rl in enumerate(i["roadLinks"]):
                conn_link += [ri] * len(rl["laneLinks"])
            for ph, row in zip(phases, t.findall("phase")):
                state = row.get("state")
                avail = set(ph["availableRoadLinks"])
                for c, ri in enumerate(conn_link):
                    assert (state[c] == "G") == (ri in avail)


def test_flow_round_trip(tmp_path):
    # cityflow flow -> .rou.xml -> cityflow flow: route, interval, window,
    # and the FULL vehicle template survive (the reference's
    # cityflow2sumo_flow, converter_v2.py:774-830, collapses everything to
    # one hardcoded vType and per-vehicle rows; ours is lossless)
    tpl_a = {"length": 5.0, "width": 2.0, "maxPosAcc": 2.0,
             "maxNegAcc": 4.5, "usualPosAcc": 1.5, "usualNegAcc": 3.0,
             "minGap": 2.5, "maxSpeed": 11.11, "headwayTime": 1.5}
    tpl_b = dict(tpl_a, maxSpeed=16.67, length=7.5)
    flows = [
        {"vehicle": tpl_a, "route": ["road_a", "road_b"], "interval": 4.0,
         "startTime": 0, "endTime": -1},
        {"vehicle": tpl_b, "route": ["road_b", "road_c", "road_d"],
         "interval": 2.5, "startTime": 10, "endTime": 90},
        {"vehicle": tpl_a, "route": ["road_a", "road_d"], "interval": 1.0,
         "startTime": 7, "endTime": 7},          # one-shot -> <vehicle>
    ]
    src = tmp_path / "flow_src.json"
    json.dump(flows, open(src, "w"))
    rou = str(tmp_path / "flow.rou.xml")
    converter.cityflow_flow_to_sumo(str(src), rou)

    root = ET.parse(rou).getroot()
    assert len(root.findall("flow")) == 2
    assert len(root.findall("vehicle")) == 1
    assert len(root.findall("vType")) == 2       # templates deduplicated

    back = str(tmp_path / "flow_back.json")
    ident = {f"road_{s}": f"road_{s}" for s in "abcd"}
    converter.sumo_flow_to_cityflow(rou, ident, back)
    got = json.load(open(back))
    got = sorted(got, key=lambda f: f["startTime"])
    want = sorted(flows, key=lambda f: f["startTime"])
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g["route"] == w["route"]
        assert g["startTime"] == w["startTime"]
        assert g["endTime"] == w["endTime"]
        if w["startTime"] != w["endTime"]:       # one-shots spawn once;
            assert g["interval"] == w["interval"]  # interval is moot
        for k, v in w["vehicle"].items():
            assert abs(g["vehicle"][k] - v) < 1e-9, (k, g["vehicle"][k], v)


ROUNDABOUT_XML = os.path.join(HERE, "fixtures", "sumo_roundabout.net.xml")


def _convert_roundabout(tmp_path, **kw):
    out = str(tmp_path / "roadnet_roundabout.json")
    converter.sumo_to_cityflow(ROUNDABOUT_XML, out, **kw)
    return json.load(open(out)), out


def test_roundabout_pedestrian_lane_remap(tmp_path):
    # inE has a sidewalk (allow="pedestrian") at SUMO index 0 and a car
    # lane at index 1; the sidewalk must be dropped and connections
    # remapped onto the kept car lane (reference nets from netconvert
    # routinely carry sidewalks; converter_v2 relies on sumolib for this)
    doc, _ = _convert_roundabout(tmp_path)
    roads = {r["id"]: r for r in doc["roads"]}
    assert len(roads["road_inE"]["lanes"]) == 1
    r0 = {i["id"]: i for i in doc["intersections"]}["intersection_r0"]
    entry = [rl for rl in r0["roadLinks"]
             if rl["startRoad"] == "road_inE" and rl["endRoad"] == "road_ring01"]
    assert len(entry) == 1
    ll = entry[0]["laneLinks"]
    assert len(ll) == 1 and ll[0]["startLaneIndex"] == 0
    # the pedestrian-only u-turn connection (fromLane=0) was dropped; the
    # car u-turn (dir="t") survives as U_TURN_AS = turn_left
    # (converter_v2.py:149,467-468)
    uturn = [rl for rl in r0["roadLinks"]
             if rl["startRoad"] == "road_inE" and rl["endRoad"] == "road_outE"]
    assert len(uturn) == 1 and uturn[0]["type"] == "turn_left"
    assert len(uturn[0]["laneLinks"]) == 1
    # partial-left (dir="L") maps to turn_left (converter_v2.py:168)
    ring = [rl for rl in r0["roadLinks"]
            if rl["startRoad"] == "road_ring30" and rl["endRoad"] == "road_ring01"]
    assert ring and ring[0]["type"] == "turn_left"


def test_roundabout_internal_lane_geometry(tmp_path):
    # the inE->ring01 connection goes via=":r0_0_0" which chains into
    # ":r0_2_0"; the laneLink must carry the full internal curve between
    # the reference's 2 "flight mode" endpoints (converter_v2.py:476-486)
    doc, _ = _convert_roundabout(tmp_path)
    r0 = {i["id"]: i for i in doc["intersections"]}["intersection_r0"]
    entry = [rl for rl in r0["roadLinks"]
             if rl["startRoad"] == "road_inE"
             and rl["endRoad"] == "road_ring01"][0]
    pts = entry["laneLinks"][0]["points"]
    # endpoints: start-lane end (12,-1.6), end-lane start (12,0);
    # middle: 3 points of :r0_0_0 then 3 points of :r0_2_0
    assert len(pts) == 8
    assert pts[0] == {"x": 12.0, "y": -1.6}
    assert pts[1] == {"x": 12.0, "y": -1.6}      # :r0_0_0 starts there
    assert {"x": 10.4, "y": 2.6} in pts          # chain joint
    assert pts[-2] == {"x": 8.49, "y": 5.9}      # end of :r0_2_0
    assert pts[-1] == {"x": 12.0, "y": 0.0}      # ring01 lane start


def test_roundabout_joined_tls_multi_program(tmp_path):
    # the TLS id is "GS_r0" (joined TLS; converter_v2.py:521-522 name
    # convention) and carries programID 0 AND 1; default conversion must
    # pick program 0 (converter_v2.py:526) resolved via the connections'
    # tl= attribute, and 's' must count as green (converter_v2.py:530)
    doc, _ = _convert_roundabout(tmp_path)
    inters = {i["id"]: i for i in doc["intersections"]}
    r0 = inters["intersection_r0"]
    assert not r0["virtual"]
    phases = r0["trafficLight"]["lightphases"]
    assert len(phases) == 4
    rls = r0["roadLinks"]
    ring_links = {i for i, rl in enumerate(rls)
                  if rl["startRoad"] == "road_ring30"}
    entry_links = {i for i, rl in enumerate(rls)
                   if rl["startRoad"] == "road_inE"}
    assert ring_links and entry_links
    # phase 0 "GGrr": ring movements only
    assert set(phases[0]["availableRoadLinks"]) == ring_links
    # phase 2 "rrGs": both entry movements (the u-turn's 's' is green)
    assert set(phases[2]["availableRoadLinks"]) == entry_links
    assert phases[1]["availableRoadLinks"] == []
    assert phases[3]["availableRoadLinks"] == []
    # program 1 ("GGGG"/"rrrr") selected explicitly
    doc1, _ = _convert_roundabout(tmp_path, tl_program="1")
    r0p1 = {i["id"]: i for i in doc1["intersections"]}["intersection_r0"]
    ph1 = r0p1["trafficLight"]["lightphases"]
    assert len(ph1) == 2
    assert set(ph1[0]["availableRoadLinks"]) == set(range(len(rls)))
    assert ph1[1]["availableRoadLinks"] == []
    # unsignalized ring junctions keep a single all-green phase
    r1 = inters["intersection_r1"]
    assert len(r1["trafficLight"]["lightphases"]) == 1


def test_roundabout_compiles_and_runs(tmp_path):
    doc, out = _convert_roundabout(tmp_path)
    flow = [{
        "vehicle": {"length": 5.0, "width": 2.0, "maxPosAcc": 2.0,
                    "maxNegAcc": 4.5, "usualPosAcc": 2.0, "usualNegAcc": 4.5,
                    "minGap": 2.5, "maxSpeed": 8.0, "headwayTime": 1.5},
        "route": ["road_inE", "road_ring01", "road_ring12", "road_outW"],
        "interval": 6.0, "startTime": 0, "endTime": -1}, {
        "vehicle": {"length": 5.0, "width": 2.0, "maxPosAcc": 2.0,
                    "maxNegAcc": 4.5, "usualPosAcc": 2.0, "usualNegAcc": 4.5,
                    "minGap": 2.5, "maxSpeed": 8.0, "headwayTime": 1.5},
        "route": ["road_inS", "road_ring30", "road_outE"],
        "interval": 7.0, "startTime": 2, "endTime": -1}]
    fp = tmp_path / "flow_roundabout.json"
    json.dump(flow, open(fp, "w"))
    cfg = {"interval": 1.0, "seed": 0, "dir": str(tmp_path) + "/",
           "roadnetFile": "roadnet_roundabout.json",
           "flowFile": "flow_roundabout.json",
           "rlTrafficLight": False, "laneChange": False,
           "saveReplay": False}
    cp = tmp_path / "config_roundabout.json"
    json.dump(cfg, open(cp, "w"))
    from cityflow_tpu.engine import Engine
    eng = Engine(str(cp))
    for _ in range(60):
        eng.next_step()
    assert eng.get_vehicle_count() > 0
    # circulating traffic reaches the ring: some vehicle is on a ring road
    on_ring = sum(n for lane, n in eng.get_lane_vehicle_count().items()
                  if "ring" in lane)
    assert on_ring > 0


def test_sumo_round_trip_preserves_phases(tmp_path):
    # sumo -> cityflow -> sumo: tlLogic phase structure preserved
    doc, out = _convert(tmp_path)
    paths = converter.cityflow_to_sumo(out, str(tmp_path / "rt"))
    tll = ET.parse(paths[3]).getroot()
    tl_by_id = {t.get("id"): t for t in tll.findall("tlLogic")}
    assert len(tl_by_id["intersection_n1"].findall("phase")) == 4
    assert len(tl_by_id["intersection_n2"].findall("phase")) == 2
