#!/usr/bin/env python3
"""CLI shim at the reference-parity path (reference:
tools/generator/generate_grid_scenario.py); the generator itself lives in
the installable package at cityflow_tpu/tools/gridgen.py."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

from cityflow_tpu.tools.gridgen import main  # noqa: E402

if __name__ == "__main__":
    main()
