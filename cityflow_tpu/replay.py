"""Replay log writer (frontend-compatible).

Formats match the reference (engine.cpp:518-554 updateLog and
RoadNet::convertToJson, roadnet.cpp:327-394) so the bundled PIXI.js frontend
can play our logs. Placeholder until the render-position kernel lands.
"""

import json


def write_roadnet_log(net, path: str):
    host = net.host
    doc = {"static": {
        "nodes": [
            {"id": i.id,
             "point": [i.point[0], i.point[1]],
             "virtual": i.virtual,
             **({"width": i.width} if not i.virtual else {}),
             "outline": []}
            for i in host.net.intersections
        ],
        "edges": [
            {"id": r.id,
             "from": r.start_intersection.id,
             "to": r.end_intersection.id,
             "points": [[p[0], p[1]] for p in r.points],
             "nLane": len(r.lanes),
             "laneWidths": [l.width for l in r.lanes]}
            for r in host.net.roads
        ],
    }}
    with open(path, "w") as f:
        json.dump(doc, f)


def step_line(engine, cache) -> str:
    """Per-step replay text line: vehicles then light states. Vehicle render
    positions (polyline interpolation) land with the observation kernels;
    until then we emit the signal part, which the metrics pipeline uses."""
    parts = [";"]
    host = engine.net.host
    # per-road light state g/r/i (engine.cpp:532-552)
    # computed host-side from the current phase masks
    import numpy as np
    phase = np.asarray(engine.state.phase)
    net = engine.net
    for road in host.net.roads:
        if road.end_intersection.virtual:
            continue
        seg = [road.id]
        for lane in road.lanes:
            inter = road.end_intersection
            if inter.is_implicit():
                seg.append("i")
                continue
            can_go = True
            for ll in lane.lane_links:
                rl = ll.road_link
                ph = inter.phases[phase[inter.index]]
                if not ph.road_link_available[rl.index]:
                    can_go = False
                    break
            seg.append("g" if can_go else "r")
        parts.append(" ".join(seg) + ",")
    return "".join(parts)
