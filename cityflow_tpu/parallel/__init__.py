"""Scale-out: vmap over env instances, shard over device meshes."""

from cityflow_tpu.parallel.batch import (  # noqa: F401
    make_batched_step, make_sharded_step, init_batch_state, batch_shardings)
