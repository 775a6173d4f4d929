"""Worker process for tests/test_multihost.py: one rank of an N-process
`jax.distributed` run (virtual CPU devices), driving a sharded
RingVecEnv batch on the GLOBAL mesh and dumping a per-env state
fingerprint of this rank's local shard rows.

Also runs as the single-process baseline (nproc=1): same global device
count, no distributed init — the bitwise comparison target.

usage: multihost_worker.py <rank> <nproc> <port> <out.json> [<ndev_glob>]
"""

import json
import os
import sys


def main():
    rank = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = int(sys.argv[3])
    out = sys.argv[4]
    ndev_glob = int(sys.argv[5]) if len(sys.argv) > 5 else 8
    ndev_local = ndev_glob // nproc
    flags = os.environ.get("XLA_FLAGS", "")
    flags += f" --xla_force_host_platform_device_count={ndev_local}"
    if "xla_cpu_max_isa" not in flags:
        flags += " --xla_cpu_max_isa=SSE4_2"   # identical codegen across runs
    os.environ["XLA_FLAGS"] = flags

    import jax
    jax.config.update("jax_platforms", "cpu")
    here = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, os.path.dirname(here))

    from cityflow_tpu.parallel import distributed
    if nproc > 1:
        distributed.initialize(f"localhost:{port}", nproc, rank)
    assert len(jax.devices()) == ndev_glob

    from cityflow_tpu.rl.env import RingVecEnv
    mesh = distributed.global_env_mesh()
    cfg = os.path.join(here, "fixtures", "config_4x4.json")
    env = RingVecEnv(cfg, batch=ndev_glob, horizon=24, mesh=mesh)
    env.reset()
    reward = None
    for _ in range(5):
        acts = env.max_pressure_actions()
        obs, reward = env.step(acts)

    import jax.numpy as jnp

    @jax.jit
    def fingerprint(st):
        return (jnp.sum(st.l_dis, axis=(1, 2)),
                jnp.sum(st.l_speed, axis=(1, 2)),
                jnp.sum(st.n_l, axis=1))

    f = jax.block_until_ready(fingerprint(env.state))
    # global row indices owned by this process, in shard order
    shards = sorted((s for s in f[0].addressable_shards),
                    key=lambda s: s.index)
    idx = [int(s.index[0].start) for s in shards]
    loc = distributed.fetch_local(f)
    rsum = float(jax.device_get(jnp.sum(reward)))
    json.dump({"rank": rank, "rows": idx,
               "dis": [float(x) for x in loc[0]],
               "spd": [float(x) for x in loc[1]],
               "n": [int(x) for x in loc[2]],
               "reward_sum": rsum}, open(out, "w"))
    print(f"rank {rank}: rows {idx} ok", flush=True)


if __name__ == "__main__":
    main()
