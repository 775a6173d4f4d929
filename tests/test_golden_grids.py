"""Golden parity on generated grid scenarios (2x2, 4x4 with tlPlan) —
multi-intersection cross yielding, Dijkstra tie-breaking, turning flows."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from golden_util import golden_records, compare_step  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))


def _run_parity(config, golden, n_steps, atol=0.0):
    from cityflow_tpu.engine import Engine
    eng = Engine(config)
    gold = golden_records(golden)
    next(gold)
    errors = []
    for t in range(1, n_steps + 1):
        eng.next_step()
        g = next(gold)
        assert g["t"] == t
        errors += compare_step(eng, g, t, atol=atol)
        if len(errors) > 20:
            break
    assert not errors, "\n".join(errors[:20])


@pytest.mark.slow
def test_grid_2x2_1000_steps_exact():
    _run_parity(os.path.join(HERE, "fixtures", "config_2x2.json"),
                "grid2x2_1000.jsonl.gz", 1000)


@pytest.mark.slow
def test_grid_4x4_300_steps_exact():
    _run_parity(os.path.join(HERE, "fixtures", "config_4x4.json"),
                "grid4x4_1000.jsonl.gz", 300)


def test_grid_2x2_mixed_templates_200_steps_exact():
    """Non-uniform vehicle templates (3 per-flow templates differing in
    length/acc/minGap/maxSpeed/headway): per-vehicle VehicleInfo params
    (vehicle.h:31-45) incl. the leader's maxNegAcc/usualNegAcc/len in the
    car-following terms (vehicle.cpp:160,217,229), bit-exact vs the
    unmodified reference."""
    _run_parity(os.path.join(HERE, "fixtures", "config_2x2_mixed.json"),
                "grid2x2_mixed_1000.jsonl.gz", 200)


@pytest.mark.slow
def test_grid_2x2_mixed_templates_1000_steps_exact():
    _run_parity(os.path.join(HERE, "fixtures", "config_2x2_mixed.json"),
                "grid2x2_mixed_1000.jsonl.gz", 1000)
