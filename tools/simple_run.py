#!/usr/bin/env python3
"""CLI shim (reference: tools/debug/simple_run.cpp); the runner lives in
the installable package at cityflow_tpu/tools/simple_run.py (console
entry point `cityflow-tpu-run`)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from cityflow_tpu.tools.simple_run import main  # noqa: E402

if __name__ == "__main__":
    main()
