"""Archive disk round-trip (reference: archive.cpp:153-550 dump/load).

Serializes the full SimState pytree plus host aux to JSON. The reference
format serializes C++ object graphs; ours serializes the array state — both
satisfy the same contract (dump -> load_from_file reproduces trajectories,
tests/python/test_archive.py semantics).
"""

import base64
import json

import numpy as np
import jax
import jax.numpy as jnp


def _enc(a):
    a = np.asarray(a)
    return {"d": base64.b64encode(a.tobytes()).decode(),
            "s": list(a.shape), "t": a.dtype.str}


def _dec(e):
    return np.frombuffer(base64.b64decode(e["d"]),
                         dtype=np.dtype(e["t"])).reshape(e["s"])


def _spawn_jsonable(snap: dict) -> dict:
    out = dict(snap)
    out["origin_fs"] = {k: np.asarray(v).tolist()
                        for k, v in snap["origin_fs"].items()}
    return out


def dump_archive(archive, path: str):
    leaves, treedef = jax.tree_util.tree_flatten(archive.state)
    doc = {
        "format": "cityflow_tpu/archive/v2",
        "leaves": [_enc(l) for l in leaves],
        "host_aux": {"pushed": {str(k): v for k, v in
                                archive.host_aux["pushed"].items()},
                     "manually_pushed": archive.host_aux["manually_pushed"]},
    }
    # v2.1: ring-backend dumps carry the layout tag + host step counter
    if "ring_step" in archive.host_aux:
        doc["ring"] = {"step": int(archive.host_aux["ring_step"]),
                       "ov": int(archive.host_aux.get("ring_ov", 0))}
    # v2: the spawn/RNG stream state (reference archive.cpp:161-165 dumps the
    # mt19937 via operator<<; origin_rng below is that same text format), so
    # a dump restores into a FRESH engine even after mid-run reseeds/pushes
    if "spawn" in archive.host_aux:
        doc["spawn"] = _spawn_jsonable(archive.host_aux["spawn"])
    with open(path, "w") as f:
        json.dump(doc, f)


def load_archive_into(engine, path: str):
    from cityflow_tpu.engine import Archive
    from dataclasses import replace as dc_replace
    with open(path) as f:
        doc = json.load(f)
    assert doc["format"] in ("cityflow_tpu/archive/v1",
                             "cityflow_tpu/archive/v2")
    ring = doc.get("ring")
    if (ring is not None) != (engine._ring is not None):
        raise RuntimeError(
            "archive layout mismatch: dumped from a "
            f"{'ring' if ring else 'gen1'}-backend engine, loading into a "
            f"{'ring' if engine._ring else 'gen1'}-backend engine")
    template = engine._ring.sim.state if engine._ring is not None \
        else engine.state
    leaves, treedef = jax.tree_util.tree_flatten(template)
    new_leaves = [jnp.asarray(_dec(e)) for e in doc["leaves"]]
    state = jax.tree_util.tree_unflatten(treedef, new_leaves)
    aux = {"pushed": {int(k): v for k, v in doc["host_aux"]["pushed"].items()},
           "manually_pushed": doc["host_aux"]["manually_pushed"]}
    if ring is not None:
        # the dump may come from an engine whose slot rings had grown
        sl, sk = state.l_dis.shape[0], state.k_dis.shape[0]
        if (sl, sk) != (engine._ring.sim.cfg.SL, engine._ring.sim.cfg.SK):
            engine._ring.sim.cfg = dc_replace(
                engine._ring.sim.cfg, SL=sl, SK=sk)
        aux["ring_step"] = ring["step"]
        aux["ring_ov"] = ring["ov"]
    else:
        # the dump may come from an engine whose slot pool had grown
        v_loaded = state.active.shape[0]
        if v_loaded != engine.cfg.max_vehicles:
            engine.cfg = dc_replace(engine.cfg, max_vehicles=v_loaded)
    if "spawn" in doc:
        aux["spawn"] = doc["spawn"]
    engine.load(Archive(state, aux))
