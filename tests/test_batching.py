"""Batched execution semantics: vmapped envs must evolve exactly like a
single env (per-env independence), and the fast (f32) path must track the
exact path within float tolerance."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HERE = os.path.dirname(os.path.abspath(__file__))
CONFIG = os.path.join(HERE, "fixtures", "config_example.json")


def _build(exact):
    import jax.numpy as jnp
    from cityflow_tpu.compiler.net import compile_scenario
    from cityflow_tpu.compiler.spawn import SpawnGenerator
    from cityflow_tpu.core.state import StepConfig, init_state
    from cityflow_tpu.engine import _net_device_arrays
    net = compile_scenario(CONFIG)
    gen = SpawnGenerator(net, 0, 1.0)
    gen.extend(64)
    t = gen.arrays()
    pad = max(gen.max_per_step, 1)
    spawn = {k: jnp.asarray(np.concatenate(
        [t[k], np.full(pad, -1 if k == "step" else 0, t[k].dtype)]))
        for k in ("step", "flow", "priority", "first_drv", "route")}
    cfg = StepConfig(interval=1.0, num_lanes=net.num_lanes,
                     num_drivables=net.num_lanes + net.num_links,
                     max_vehicles=512, max_spawn_per_step=gen.max_per_step,
                     k_out=max(net.host.ko, 1), k_cross=max(net.host.kc, 1),
                     exact=exact)
    nd = _net_device_arrays(net, np.float64 if exact else np.float32)
    st0 = init_state(cfg, net.num_inters, net.phase_time, net.n_phases,
                     net.phase_offset)
    return nd, cfg, st0, spawn


def test_vmap_matches_single():
    import jax
    import jax.numpy as jnp
    from cityflow_tpu.core import step as S
    from cityflow_tpu.parallel.batch import init_batch_state
    nd, cfg, st0, spawn = _build(exact=False)
    one = jax.jit(lambda s: S.step.__wrapped__(nd, cfg, s, spawn))
    many = jax.jit(jax.vmap(lambda s: S.step.__wrapped__(nd, cfg, s, spawn)))
    sts = st0
    stb = init_batch_state(cfg, st0, 4)
    for _ in range(40):
        sts = one(sts)
        stb = many(stb)
    for b in range(4):
        np.testing.assert_array_equal(np.asarray(stb.drv[b]),
                                      np.asarray(sts.drv))
        np.testing.assert_allclose(np.asarray(stb.dis[b]),
                                   np.asarray(sts.dis), rtol=0, atol=0)
    assert int(jnp.max(stb.overflow)) == 0


def test_fast_tracks_exact():
    import jax
    from cityflow_tpu.core import step as S
    nd_e, cfg_e, st_e, spawn_e = _build(exact=True)
    nd_f, cfg_f, st_f, spawn_f = _build(exact=False)
    one_e = jax.jit(lambda s: S.step.__wrapped__(nd_e, cfg_e, s, spawn_e))
    one_f = jax.jit(lambda s: S.step.__wrapped__(nd_f, cfg_f, s, spawn_f))
    for _ in range(40):
        st_e = one_e(st_e)
        st_f = one_f(st_f)
    run_e = np.asarray(st_e.running)
    run_f = np.asarray(st_f.running)
    # same vehicles running; positions within float32 drift
    assert (run_e == run_f).mean() > 0.98
    both = run_e & run_f
    d_e = np.asarray(st_e.dis)[both]
    d_f = np.asarray(st_f.dis)[both]
    assert np.median(np.abs(d_e - d_f)) < 0.5


def test_split_phases_equal_monolithic():
    import jax
    import numpy as np
    from cityflow_tpu.core import step as S
    nd, cfg, st0, spawn = _build(exact=False)
    a = b = st0
    for _ in range(40):
        a = S.step(nd, cfg, a, spawn)
        b = S.step_split(nd, cfg, b, spawn)
    for f in ("dis", "speed", "drv", "running", "leader", "gap", "phase"):
        np.testing.assert_array_equal(np.asarray(getattr(a, f)),
                                      np.asarray(getattr(b, f)), err_msg=f)
