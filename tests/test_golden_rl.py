"""RL-phase trajectory exactness (BASELINE config #2): the 4x4 grid
driven by explicit set_tl_phase calls must match the unmodified
reference bit-for-bit when the reference replays the same schedule via
setTrafficLightPhase (engine.cpp:719-725).

Golden: tests/goldens/grid4x4_rl_1000.jsonl.gz, dumped by
tools/oracle/dump_golden.cpp --phases <schedule> where the schedule file
is generated from golden_util.rl_phase_commands (the same rule used
here), see tools/oracle/README.md."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from golden_util import (golden_records, compare_step,
                         rl_phase_commands)  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))
GOLD = "grid4x4_rl_1000.jsonl.gz"
CONFIG = os.path.join(HERE, "fixtures", "config_4x4_rl.json")


def _real_inter_ids(eng):
    return sorted(i.id for i in eng.net.host.net.intersections
                  if not i.virtual)


def _run(n_steps):
    from cityflow_tpu.engine import Engine
    eng = Engine(CONFIG)
    ids = _real_inter_ids(eng)
    gold = golden_records(GOLD)
    next(gold)
    errors = []
    for t in range(n_steps):
        for iid, ph in rl_phase_commands(t, ids):
            eng.set_tl_phase(iid, ph)
        eng.next_step()
        g = next(gold)
        assert g["t"] == t + 1
        errors += compare_step(eng, g, t + 1)
        if len(errors) > 20:
            break
    assert not errors, "\n".join(errors[:20])


def test_rl_phase_200_steps_exact():
    _run(200)


@pytest.mark.slow
def test_rl_phase_1000_steps_exact():
    _run(1000)
