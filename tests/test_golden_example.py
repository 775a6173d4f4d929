"""Golden-trajectory parity vs the reference C++ engine on
examples/config.json (reference test strategy: SURVEY.md section 4 —
determinism is the oracle; goldens recorded by tools/oracle/dump_golden.cpp).
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from golden_util import golden_records, compare_step  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))
CONFIG = os.path.join(HERE, "fixtures", "config_example.json")


def _run_parity(config, golden, n_steps, atol=0.0):
    from cityflow_tpu.engine import Engine
    eng = Engine(config)
    gold = golden_records(golden)
    next(gold)  # static record
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
def test_example_3600_steps_exact():
    _run_parity(CONFIG, "example_3600.jsonl.gz", 3600)


def test_example_250_steps_exact():
    # the non-slow insurance window: long enough to cover spawn bursts,
    # multi-phase light wraps, and the first wave of lanelink transfers
    _run_parity(CONFIG, "example_3600.jsonl.gz", 250)
