"""Multi-host launch path: `jax.distributed` initialization + global-mesh
helpers for scaling the env batch across processes/hosts.

The simulation is env-parallel — no cross-host data dependence inside the
sim step — so the only collectives that cross DCN are fleet-metric
reductions and (in the DQN learner) gradient all-reduces, both
latency-tolerant.  Shardings are laid out so the env axis maps hosts ->
their local chips; per-chip traffic rides ICI.

Run recipe (N hosts, one process per host):

    # on every host, with RANK in 0..N-1:
    CITYFLOW_COORD=host0:7733 CITYFLOW_NPROC=N CITYFLOW_PID=$RANK \
        python your_train.py

    # your_train.py
    from cityflow_tpu.parallel import distributed
    distributed.initialize()              # reads the env vars above
    mesh = distributed.global_env_mesh()
    env = RingVecEnv(config, batch=B_global, mesh=mesh)  # B_global % n_devices == 0

Cross-process determinism: the sharded step is bitwise identical to the
single-process run on the same global mesh (tests/test_multihost.py
proves it on 2 processes x 4 virtual CPU devices)."""

import os
from typing import Optional

import numpy as np


def initialize(coordinator: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None):
    """`jax.distributed.initialize` with CITYFLOW_COORD / CITYFLOW_NPROC /
    CITYFLOW_PID environment fallbacks. Must run before first jax use."""
    import jax
    coordinator = coordinator or os.environ.get("CITYFLOW_COORD")
    if num_processes is None and "CITYFLOW_NPROC" in os.environ:
        num_processes = int(os.environ["CITYFLOW_NPROC"])
    if process_id is None and "CITYFLOW_PID" in os.environ:
        process_id = int(os.environ["CITYFLOW_PID"])
    if coordinator is None:
        return False                      # single-process run: no-op
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def global_env_mesh(axis: str = "env"):
    """1-D mesh over ALL global devices (every process must build the
    identical mesh — jax.devices() is globally consistent)."""
    import jax
    from jax.sharding import Mesh
    return Mesh(np.array(jax.devices()), axis_names=(axis,))


def replicate_to(mesh, tree):
    """Replicate a host-local pytree onto the (possibly multi-process)
    mesh. Every process must hold identical values."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    repl = NamedSharding(mesh, P())
    return jax.device_put(tree, repl)


def shard_batch(mesh, tree, axis: str = "env"):
    """Shard a replicated-on-host batched pytree (leading axis = env)
    over the mesh. Works across processes: each process contributes the
    rows its local devices own (values identical on all processes)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    shard = NamedSharding(mesh, P(axis))

    def put(x):
        if not hasattr(x, "shape") or x.ndim == 0:
            return jax.device_put(x, NamedSharding(mesh, P()))
        return jax.make_array_from_callback(
            x.shape, shard, lambda idx: np.asarray(x[idx]))
    return jax.tree_util.tree_map(put, tree)


def fetch_local(tree):
    """Per-process host view of a sharded pytree: the rows owned by this
    process's addressable devices, concatenated in shard order."""
    import jax

    def get(x):
        if not hasattr(x, "addressable_shards"):
            return np.asarray(x)
        shards = sorted(x.addressable_shards, key=lambda s: s.index)
        return np.concatenate([np.asarray(s.data) for s in shards])
    return jax.tree_util.tree_map(get, tree)
