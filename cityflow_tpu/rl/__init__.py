"""RL surface: on-device controllers and vectorized env wrappers."""

from cityflow_tpu.rl.policies import max_pressure_phases  # noqa: F401
