"""Native (C++) scenario-compile kernels, loaded via ctypes.

The simulation itself is JAX/XLA; these kernels accelerate the HOST compile
step (conflict-cross discovery is O(links^2 * segments^2) per intersection —
minutes in Python for 30x30 city grids, sub-second in C++). Results are
bit-identical to the Python implementation (same IEEE double op order;
compiled with -ffp-contract=off).
"""

import ctypes
import os
import subprocess
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "crosses.cpp")
_LIB = os.path.join(_HERE, "_crosses.so")

_lib = None
_tried = False


def _build():
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
           "-ffp-contract=off", _SRC, "-o", _LIB + ".tmp"]
    subprocess.run(cmd, check=True, capture_output=True)
    os.replace(_LIB + ".tmp", _LIB)


def get_lib():
    """Returns the ctypes lib or None (fallback to Python)."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get("CITYFLOW_TPU_NO_NATIVE"):
        return None
    try:
        if (not os.path.exists(_LIB)
                or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            _build()
        lib = ctypes.CDLL(_LIB)
        c = ctypes.c_longlong
        d = ctypes.POINTER(ctypes.c_double)
        l = ctypes.POINTER(ctypes.c_longlong)
        lib.find_crosses.restype = c
        lib.find_crosses.argtypes = [c, d, l, d, c, l, l, d, d, d, d, d]
        lib.sort_link_crosses.restype = None
        lib.sort_link_crosses.argtypes = [c, l, d]
        _lib = lib
    except Exception as e:  # missing toolchain etc -> Python fallback
        print(f"cityflow_tpu: native kernels unavailable ({e}); "
              "using Python fallback", file=sys.stderr)
        _lib = None
    return _lib
