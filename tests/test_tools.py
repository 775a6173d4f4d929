"""Host tooling tests (no jax): grid generator fixture parity, SUMO
converter smoke, mt19937 replica vs recorded std::mt19937 draws."""

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)


def _norm(doc):
    for i in doc["intersections"]:
        for ph in i["trafficLight"]["lightphases"]:
            ph["availableRoadLinks"] = sorted(ph["availableRoadLinks"])
        i["trafficLight"].pop("roadLinkIndices", None)
        for rl in i.get("roadLinks", []):
            rl.pop("direction", None)
    return doc


def test_generator_matches_reference_fixture(tmp_path):
    gen = os.path.join(REPO, "tools", "generator",
                       "generate_grid_scenario.py")
    subprocess.run([sys.executable, gen, "2", "2", "--dir", str(tmp_path)],
                   check=True, capture_output=True)
    a = _norm(json.load(open(tmp_path / "roadnet_2_2.json")))
    b = _norm(json.load(open(os.path.join(HERE, "fixtures",
                                          "roadnet_2x2.json"))))
    assert a["roads"] == b["roads"]
    assert a["intersections"] == b["intersections"]
    fa = json.load(open(tmp_path / "flow_2_2.json"))
    fb = json.load(open(os.path.join(HERE, "fixtures", "flow_2x2.json")))
    assert fa == fb


def test_generator_tlplan_matches_fixture(tmp_path):
    gen = os.path.join(REPO, "tools", "generator",
                       "generate_grid_scenario.py")
    subprocess.run([sys.executable, gen, "4", "4", "--tlPlan",
                    "--dir", str(tmp_path)], check=True, capture_output=True)
    a = _norm(json.load(open(tmp_path / "roadnet_4_4.json")))
    b = _norm(json.load(open(os.path.join(HERE, "fixtures",
                                          "roadnet_4x4.json"))))
    assert a == b


SUMO_NET = """<?xml version="1.0"?>
<net>
  <junction id="A" type="priority" x="0" y="0"/>
  <junction id="B" type="priority" x="100" y="0"/>
  <junction id="C" type="priority" x="200" y="0"/>
  <edge id="e1" from="A" to="B">
    <lane id="e1_0" index="0" speed="13.9" length="100" width="3.2"/>
    <lane id="e1_1" index="1" speed="13.9" length="100" width="3.2"/>
  </edge>
  <edge id="e2" from="B" to="C">
    <lane id="e2_0" index="0" speed="13.9" length="100" width="3.2"/>
  </edge>
  <connection from="e1" to="e2" fromLane="0" toLane="0" dir="s"/>
</net>
"""

SUMO_ROU = """<?xml version="1.0"?>
<routes>
  <vType id="car" accel="2.0" decel="4.5" length="5" maxSpeed="15"/>
  <flow id="f0" type="car" begin="0" end="100" period="5">
    <route edges="e1 e2"/>
  </flow>
</routes>
"""


def test_sumo_converter(tmp_path):
    (tmp_path / "net.xml").write_text(SUMO_NET)
    (tmp_path / "rou.xml").write_text(SUMO_ROU)
    conv = os.path.join(REPO, "tools", "converter", "converter.py")
    subprocess.run(
        [sys.executable, conv, "--sumonet", str(tmp_path / "net.xml"),
         "--cityflownet", str(tmp_path / "roadnet.json"),
         "--sumoflow", str(tmp_path / "rou.xml"),
         "--cityflowflow", str(tmp_path / "flow.json")],
        check=True, capture_output=True)
    rn = json.load(open(tmp_path / "roadnet.json"))
    assert len(rn["roads"]) == 2
    b = next(i for i in rn["intersections"] if i["id"] == "intersection_B")
    assert b["roadLinks"] and b["roadLinks"][0]["type"] == "go_straight"
    fl = json.load(open(tmp_path / "flow.json"))
    assert fl and fl[0]["interval"] == 5.0
    assert fl[0]["route"] == ["road_e1", "road_e2"]
    # reverse direction produces the netconvert plain-XML set
    subprocess.run(
        [sys.executable, conv, "--reverse",
         "--cityflownet", str(tmp_path / "roadnet.json"),
         "--sumonet", str(tmp_path / "out")],
        check=True, capture_output=True)
    assert "<edge id=" in (tmp_path / "out.edg.xml").read_text()
    assert (tmp_path / "out.con.xml").exists()


def test_mt19937_matches_std():
    from cityflow_tpu.rng import MT19937
    path = os.path.join(HERE, "goldens", "mt19937_draws.txt")
    for line in open(path):
        parts = line.split()
        if not parts:
            continue
        seed = int(parts[0])
        rng = MT19937(seed)
        # line format: seed v1..v64 | v100000
        first = [int(x) for x in parts[1:65]]
        got = [rng() for _ in range(64)]
        assert got == first, f"seed {seed}"
        for _ in range(100000 - 65):
            rng()
        assert rng() == int(parts[66]), f"seed {seed} 100000th"
