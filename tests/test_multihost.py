"""Multi-host (multi-process) launch path: 2 `jax.distributed` processes
x 4 virtual CPU devices run the sharded ring env step on one global
8-device mesh and must match the single-process 8-device run BITWISE
(parallel/distributed.py; BASELINE multi-host scaling config).

The workers run the PRODUCT path (RingVecEnv with a global mesh +
MaxPressure actions) — not a toy collective."""

import json
import os
import socket
import subprocess
import sys


HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(HERE, "multihost_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def _run_workers(nproc, ndev_glob, tag, timeout=900):
    port = _free_port()
    outs = [os.path.join("/tmp", f"mh_{tag}_{r}.json") for r in range(nproc)]
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)           # workers set their own
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(r), str(nproc), str(port), outs[r],
         str(ndev_glob)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for r in range(nproc)]
    logs = []
    for p in procs:
        out, _ = p.communicate(timeout=timeout)
        logs.append(out.decode())
        assert p.returncode == 0, logs[-1][-2000:]
    return [json.load(open(o)) for o in outs]


def test_two_process_matches_single_process_bitwise():
    single = _run_workers(1, 8, "sp")[0]
    multi = _run_workers(2, 8, "mp")
    got = {}
    for d in multi:
        for i, row in enumerate(d["rows"]):
            got[row] = (d["dis"][i], d["spd"][i], d["n"][i])
    assert sorted(got) == list(range(8))
    for row in range(8):
        want = (single["dis"][row], single["spd"][row], single["n"][row])
        assert got[row] == want, (row, got[row], want)
    assert abs(sum(d["reward_sum"] for d in multi) / 2
               - single["reward_sum"]) < 1e-6
