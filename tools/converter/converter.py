#!/usr/bin/env python3
"""SUMO <-> CityFlow scenario converter (self-contained, no sumolib).

Equivalent of the reference tools/converter (converter.py / converter_v2.py),
reimplemented on xml.etree so it runs without SUMO's python tools:

  sumo -> cityflow:  --sumonet net.xml --cityflownet roadnet.json
                     [--sumoflow routes.rou.xml --cityflowflow flow.json]
  cityflow -> sumo:  --cityflownet roadnet.json --sumonet out.net.xml
                     (plain-node skeleton; import into netconvert/netedit)

Parity notes vs the reference converter_v2.py:
- pedestrian/bike-only lanes are dropped with a per-edge original->kept
  index map, so connections on real-world nets (sidewalks, bike lanes)
  keep pointing at the right car lanes;
- connection directions map s/l/r/L/R as the reference does
  (LINKDIR_PARTLEFT/PARTRIGHT -> their main direction,
  converter_v2.py:163-170) and "t" (u-turn) becomes U_TURN_AS
  (default turn_left, converter_v2.py:149,467-468; --u-turn-as);
- laneLink geometry: the reference emits a 2-point "flight mode" path
  (start-lane end, end-lane start; converter_v2.py:476-486); we emit
  that pair and, when the connection has a `via` internal lane, the
  internal lane's real shape in between (following internal-to-internal
  chains), so curves survive the conversion;
- tlLogic: programs are collected per (tls id, programID); the program
  picked is --tl-program (default "0", the reference's hardcoded choice,
  converter_v2.py:526), falling back to the first defined. Joined TLS
  ("GS_"-prefixed ids, converter_v2.py:521-522) resolve through the
  connections' own tl= attribute. Green chars are G/g/s as in the
  reference (converter_v2.py:530). A roadLink is available in a phase
  iff ALL its connections are green (stricter than the reference's
  any-connection-from-the-start-lane rule, which over-opens turn lanes
  sharing a head lane with a green through movement).
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


def _is_car_lane(ln):
    allow = ln.get("allow", "")
    disallow = ln.get("disallow", "")
    if allow:
        return "passenger" in allow or "private" in allow or "all" in allow
    return "all" not in disallow and "passenger" not in disallow


def sumo_to_cityflow(net_xml, out_json, u_turn_as="turn_left",
                     tl_program="0"):
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

    # edges -> roads; internal edges -> lane-shape table for laneLink
    # geometry (the reference's sumolib keeps them as net internals)
    roads = {}
    kept_lane_idx = {}      # edge id -> {sumo lane index -> kept position}
    internal_shape = {}     # internal lane id -> [point dict]
    for e in root.iter("edge"):
        if e.get("function") == "internal":
            for ln in e.findall("lane"):
                if ln.get("shape"):
                    internal_shape[ln.get("id")] = _parse_shape(
                        ln.get("shape"))
            continue
        frm, to = e.get("from"), e.get("to")
        if frm not in junctions or to not in junctions:
            continue
        lanes = []
        keep = {}
        lane_shapes = []
        for ln in e.findall("lane"):
            if not _is_car_lane(ln):
                continue        # sidewalk / bike lane: drop + remap below
            keep[int(ln.get("index", len(keep)))] = len(lanes)
            lanes.append({
                "width": float(ln.get("width", DEFAULT_LANE_WIDTH)),
                "maxSpeed": float(ln.get("speed", 13.89))})
            lane_shapes.append(_parse_shape(ln.get("shape", "")) or None)
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
            "_lane_shapes": lane_shapes,     # kept order, stripped below
        }
        kept_lane_idx[e.get("id")] = keep
        junctions[frm]["roads"].append(rid)
        junctions[to]["roads"].append(rid)

    # connections -> roadLinks grouped by (from edge, to edge, direction),
    # the reference's group_connections_by_start_end
    # (converter_v2.py:261-270); keep each connection's tl id + link index
    # for phase conversion and its via lane for geometry
    # "t" keeps its own group key so a u-turn roadLink stays separate
    # from a real left turn between the same edge pair (the reference
    # groups by raw direction, then renames turn_u -> U_TURN_AS,
    # converter_v2.py:459-468)
    DIRMAP = {"s": "go_straight", "t": "turn_u", "l": "turn_left",
              "r": "turn_right", "L": "turn_left", "R": "turn_right"}
    via_of = {}             # (from lane id, to edge) -> via internal lane
    next_via = {}           # internal lane id -> next internal lane id
    for c in root.iter("connection"):
        via = c.get("via")
        fe = c.get("from", "")
        key_lane = f'{fe}_{c.get("fromLane")}'
        if via:
            if fe.startswith(":"):
                next_via[key_lane] = via
            else:
                via_of[(key_lane, c.get("to"))] = via
    groups = defaultdict(list)
    for c in root.iter("connection"):
        fe, te = c.get("from"), c.get("to")
        if fe not in roads or te not in roads:
            continue
        d = DIRMAP.get(c.get("dir", "s"), "go_straight")
        li = c.get("linkIndex")
        fl, tl = int(c.get("fromLane")), int(c.get("toLane"))
        if fl not in kept_lane_idx[fe] or tl not in kept_lane_idx[te]:
            continue        # connection from/to a dropped non-car lane
        groups[(fe, te, d)].append(
            (kept_lane_idx[fe][fl], kept_lane_idx[te][tl],
             c.get("tl"), int(li) if li is not None else -1,
             via_of.get((f"{fe}_{fl}", te))))

    def _via_points(via):
        """Follow an internal-lane chain and concatenate its shapes."""
        pts, seen = [], set()
        while via and via in internal_shape and via not in seen:
            seen.add(via)
            pts.extend(internal_shape[via])
            via = next_via.get(via)
        return pts

    rl_tl_links = defaultdict(list)     # junction id -> [set((tl, idx))]
    for (fe, te, d), pairs in groups.items():
        frm_j = roads[fe]["endIntersection"][len("intersection_"):]
        j = junctions.get(frm_j)
        if j is None:
            continue
        n_from = len(roads[fe]["lanes"])
        n_to = len(roads[te]["lanes"])
        from_shapes = roads[fe]["_lane_shapes"]
        to_shapes = roads[te]["_lane_shapes"]
        lls = []
        link_idx = set()
        for fl, tl, tlid, li, via in pairs:
            # reverse lane indexing (see above)
            sfl, stl = n_from - 1 - fl, n_to - 1 - tl
            if not (0 <= sfl < n_from and 0 <= stl < n_to):
                continue
            # geometry: reference "flight mode" endpoints
            # (converter_v2.py:476-486) + the via internal-lane shape
            pts = []
            if from_shapes[fl]:
                pts.append(from_shapes[fl][-1])
            pts.extend(_via_points(via))
            if to_shapes[tl]:
                pts.append(to_shapes[tl][0])
            lls.append({"startLaneIndex": sfl, "endLaneIndex": stl,
                        "points": pts})
            if li >= 0:
                link_idx.add((tlid, li))
        if not lls:
            continue
        j["trafficLight"]["roadLinkIndices"].append(len(j["roadLinks"]))
        j["roadLinks"].append({
            "type": u_turn_as if d == "turn_u" else d,
            "startRoad": roads[fe]["id"],
            "endRoad": roads[te]["id"], "laneLinks": lls})
        rl_tl_links[frm_j].append(link_idx)
        j["virtual"] = False

    # traffic lights: convert tlLogic programs (reference
    # converter_v2.py:513-554). Programs are grouped per tls id; the
    # program of record is `tl_program` ("0" in the reference,
    # converter_v2.py:526), else the first defined. The tls that controls
    # a junction is resolved through its connections' tl= attributes, so
    # joined TLS ("GS_" ids) and shared programs both work. A roadLink is
    # available in a phase iff every one of its connections shows G/g/s
    # (converter_v2.py:530); yellow/red phases become restrictive phases.
    # Junctions without a tlLogic keep a single all-green phase.
    tls_programs = defaultdict(dict)    # tls id -> {programID: element}
    for t in root.iter("tlLogic"):
        tls_programs[t.get("id")][t.get("programID", "0")] = t

    def _pick_program(tlid):
        progs = tls_programs.get(tlid)
        if not progs:
            return None
        if tl_program in progs:
            return progs[tl_program]
        return next(iter(progs.values()))

    for jid, j in junctions.items():
        n = len(j["roadLinks"])
        if not n:
            continue
        phases = []
        # tls ids actually referenced by this junction's connections
        # (handles GS_-joined ids without name guessing)
        tl_ids = {tlid for links in rl_tl_links.get(jid, [])
                  for tlid, _ in links if tlid}
        tl = None
        if tl_ids:
            tl = _pick_program(sorted(tl_ids)[0])
        if tl is None:      # fall back to name match as the reference does
            tl = _pick_program(jid) or _pick_program("GS_" + jid)
        if tl is not None and any(rl_tl_links.get(jid, [])):
            for ph in tl.findall("phase"):
                state = ph.get("state", "")
                avail = []
                for ri, links in enumerate(rl_tl_links[jid]):
                    if links and all(li < len(state) and state[li] in "Ggs"
                                     for _, li in links):
                        avail.append(ri)
                phases.append({"time": float(ph.get("duration", 30)),
                               "availableRoadLinks": avail})
        if not phases:
            phases = [{"time": 30, "availableRoadLinks": list(range(n))}]
        j["trafficLight"]["lightphases"] = phases
        for rl in j["roadLinks"]:
            for ll in rl["laneLinks"]:
                if not ll["points"]:
                    del ll["points"]

    for r in roads.values():
        del r["_lane_shapes"]
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
        # usualPosAcc/usualNegAcc: our cityflow->sumo extension attributes
        # (SUMO has no usual-accel concept); fall back to accel/decel
        return {"length": g("length", 5.0), "width": g("width", 2.0),
                "maxPosAcc": g("accel", 2.0), "maxNegAcc": g("decel", 4.5),
                "usualPosAcc": g("usualPosAcc", g("accel", 2.0)),
                "usualNegAcc": g("usualNegAcc", g("decel", 4.5)),
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


def cityflow_flow_to_sumo(flow_json, out_rou_xml):
    """CityFlow flow.json -> SUMO .rou.xml. Counterpart of the reference
    cityflow2sumo_flow (converter_v2.py:774-830) but lossless: the
    reference emits one <vehicle> per entry under a single hardcoded
    'pkw' vType; we emit deduplicated vTypes carrying the full template
    (length/width/accel/decel/minGap/maxSpeed/tau, plus usualPosAcc /
    usualNegAcc as extension attributes so a round trip through
    sumo_flow_to_cityflow preserves them), <flow> elements with
    begin/end/period for repeating flows, and <vehicle> elements for
    one-shot entries (startTime == endTime)."""
    data = json.load(open(flow_json))
    data = sorted(enumerate(data), key=lambda kv: kv[1]["startTime"])

    vtypes = {}      # param tuple -> vType id

    def vtype_id(veh):
        key = tuple(sorted(veh.items()))
        if key not in vtypes:
            vtypes[key] = f"vt{len(vtypes)}"
        return vtypes[key]

    rows = []
    for idx, fl in data:
        veh = fl.get("vehicle", {})
        vt = vtype_id(veh)
        edges = " ".join(fl["route"])
        begin = fl.get("startTime", 0)
        end = fl.get("endTime", -1)
        if end != -1 and end <= begin:
            rows.append(f'  <vehicle id="cf_{idx}" type="{vt}" '
                        f'depart="{begin}">\n'
                        f'    <route edges="{edges}"/>\n  </vehicle>')
        else:
            end_attr = "" if end == -1 else f' end="{end}"'
            rows.append(f'  <flow id="cf_{idx}" type="{vt}" begin="{begin}"'
                        f'{end_attr} period="{fl.get("interval", 2.0)}">\n'
                        f'    <route edges="{edges}"/>\n  </flow>')

    vt_rows = []
    for key, vt in vtypes.items():
        veh = dict(key)
        vt_rows.append(
            f'  <vType id="{vt}" length="{veh.get("length", 5.0)}" '
            f'width="{veh.get("width", 2.0)}" '
            f'accel="{veh.get("maxPosAcc", 2.0)}" '
            f'decel="{veh.get("maxNegAcc", 4.5)}" '
            f'minGap="{veh.get("minGap", 2.5)}" '
            f'maxSpeed="{veh.get("maxSpeed", 16.67)}" '
            f'tau="{veh.get("headwayTime", 1.5)}" '
            f'usualPosAcc="{veh.get("usualPosAcc", 2.0)}" '
            f'usualNegAcc="{veh.get("usualNegAcc", 4.5)}"/>')

    with open(out_rou_xml, "w") as fh:
        fh.write('<routes xmlns:xsi="http://www.w3.org/2001/XMLSchema-'
                 'instance">\n' + "\n".join(vt_rows + rows) + "\n</routes>\n")
    print(f"wrote {out_rou_xml}: {len(rows)} flow entries, "
          f"{len(vtypes)} vehicle types")


def cityflow_to_sumo(roadnet_json, out_prefix):
    """CityFlow roadnet -> netconvert plain-XML set: <prefix>.nod.xml,
    .edg.xml (with per-lane shapes/speeds), .con.xml, .tll.xml (tlLogic
    rebuilt from lightphases). Equivalent of the reference
    converter_v2.cityflow2sumo_net (converter_v2.py:935-1117), without the
    sumolib/sympy dependencies. Finish with:
      netconvert --node-files p.nod.xml --edge-files p.edg.xml \\
                 --connection-files p.con.xml --tllogic-files p.tll.xml"""
    doc = json.load(open(roadnet_json))
    if out_prefix.endswith(".xml"):
        out_prefix = out_prefix[:-4]
    nodes, edges, cons, tlls = [], [], [], []
    inters = {i["id"]: i for i in doc["intersections"]}
    roads = {r["id"]: r for r in doc["roads"]}
    for i in doc["intersections"]:
        signal = (not i["virtual"]
                  and len(i.get("trafficLight", {})
                          .get("lightphases", [])) > 1)
        typ = "traffic_light" if signal else (
            "priority" if not i["virtual"] else "unregulated")
        nodes.append(f'  <node id="{i["id"]}" x="{i["point"]["x"]}" '
                     f'y="{i["point"]["y"]}" type="{typ}"/>')
    for r in doc["roads"]:
        n = len(r["lanes"])
        shape = " ".join(f'{p["x"]},{p["y"]}' for p in r["points"])
        lane_rows = []
        # CityFlow lane 0 innermost -> SUMO lane 0 rightmost
        for si, lane in enumerate(reversed(r["lanes"])):
            lane_rows.append(
                f'    <lane index="{si}" speed="{lane["maxSpeed"]}" '
                f'width="{lane.get("width", 3.2)}"/>')
        edges.append(
            f'  <edge id="{r["id"]}" from="{r["startIntersection"]}" '
            f'to="{r["endIntersection"]}" numLanes="{n}" '
            f'shape="{shape}" spreadType="center">\n'
            + "\n".join(lane_rows) + "\n  </edge>")
    TYPE2DIR = {"go_straight": "s", "turn_left": "l", "turn_right": "r"}
    for i in doc["intersections"]:
        rls = i.get("roadLinks", [])
        link_index = 0
        states = None
        phases = i.get("trafficLight", {}).get("lightphases", [])
        signal = not i["virtual"] and len(phases) > 1
        conn_link = []           # per connection: roadlink idx
        for ri, rl in enumerate(rls):
            n_from = len(roads[rl["startRoad"]]["lanes"])
            n_to = len(roads[rl["endRoad"]]["lanes"])
            for ll in rl["laneLinks"]:
                fl = n_from - 1 - ll["startLaneIndex"]
                tl = n_to - 1 - ll["endLaneIndex"]
                extra = (f' tl="{i["id"]}" linkIndex="{link_index}"'
                         if signal else "")
                cons.append(
                    f'  <connection from="{rl["startRoad"]}" '
                    f'to="{rl["endRoad"]}" fromLane="{fl}" toLane="{tl}" '
                    f'dir="{TYPE2DIR.get(rl["type"], "s")}"{extra}/>')
                conn_link.append(ri)
                link_index += 1
        if signal and link_index:
            rows = []
            for ph in phases:
                avail = set(ph.get("availableRoadLinks", []))
                state = "".join("G" if conn_link[c] in avail else "r"
                                for c in range(link_index))
                rows.append(f'    <phase duration="{ph["time"]}" '
                            f'state="{state}"/>')
            tlls.append(f'  <tlLogic id="{i["id"]}" type="static" '
                        f'programID="0" offset="0">\n'
                        + "\n".join(rows) + "\n  </tlLogic>")
    def w(suffix, tag, rows):
        path = f"{out_prefix}.{suffix}"
        with open(path, "w") as fh:
            fh.write(f"<{tag}>\n" + "\n".join(rows) + f"\n</{tag}>\n")
        return path
    paths = [w("nod.xml", "nodes", nodes), w("edg.xml", "edges", edges),
             w("con.xml", "connections", cons),
             w("tll.xml", "tlLogics", tlls)]
    print("wrote", ", ".join(paths))
    return paths


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sumonet")
    ap.add_argument("--cityflownet")
    ap.add_argument("--sumoflow")
    ap.add_argument("--cityflowflow")
    ap.add_argument("--reverse", action="store_true",
                    help="cityflow -> sumo plain XML")
    ap.add_argument("--u-turn-as", default="turn_left",
                    choices=["turn_left", "go_straight", "turn_right"],
                    help="roadLink type for dir='t' connections "
                         "(reference U_TURN_AS, converter_v2.py:149)")
    ap.add_argument("--tl-program", default="0",
                    help="tlLogic programID to convert (reference "
                         "hardcodes '0', converter_v2.py:526)")
    args = ap.parse_args()
    if args.reverse:
        if args.cityflownet and args.sumonet:
            cityflow_to_sumo(args.cityflownet, args.sumonet)
        if args.cityflowflow and args.sumoflow:
            cityflow_flow_to_sumo(args.cityflowflow, args.sumoflow)
        return
    edge_map = sumo_to_cityflow(args.sumonet, args.cityflownet,
                                u_turn_as=args.u_turn_as,
                                tl_program=args.tl_program)
    if args.sumoflow and args.cityflowflow:
        sumo_flow_to_cityflow(args.sumoflow, edge_map, args.cityflowflow)


if __name__ == "__main__":
    main()
