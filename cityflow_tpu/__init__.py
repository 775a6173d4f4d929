"""cityflow_tpu: a TPU-native (JAX/XLA) vectorized microscopic traffic simulator
and multi-agent RL environment with CityFlow semantics.

The simulation core is a pure jitted function ``step: State -> State`` over
dense padded arrays compiled from roadnet/flow JSON; thousands of environment
instances run in lockstep under ``vmap`` and shard over device meshes with
``shard_map``. The :class:`Engine` class reproduces the reference CityFlow
Python API (reference: /root/reference/src/cityflow.cpp:10-47).
"""

from cityflow_tpu.version import __version__

__all__ = ["Engine", "Archive", "__version__"]


def __getattr__(name):
    # lazy imports keep `import cityflow_tpu` light and avoid importing jax
    # for host-only tooling (generator, converter, rng tests)
    if name in ("Engine", "Archive"):
        from cityflow_tpu import engine
        return getattr(engine, name)
    raise AttributeError(name)
