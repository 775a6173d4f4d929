#!/usr/bin/env python3
"""Driver entry point: prints ONE JSON line with the metric of record
(30x30 grid env-steps/s vs the 8-thread reference proxy). The benchmark
itself lives in the installable package (cityflow_tpu/tools/bench.py;
console entry point `cityflow-tpu-bench`)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cityflow_tpu.tools.bench import main  # noqa: E402

if __name__ == "__main__":
    main()
