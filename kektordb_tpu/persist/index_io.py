"""Index (de)serialization for checkpoints — one place for every index kind.

Reference analogue: IndexSnapshot inside the gob .kdb (core.go:94-106 —
config, nodes, ID maps, counter, entrypoint, quantizer, arena state). Here
device arrays go into the checkpoint's arrays dict under "<name>/<leaf>"
keys and host state into a msgpack-able dict. Kinds: "hnsw" (dense-array
GraphState), "flat" (brute-force arena), "sharded" (recursive per-shard
hnsw + the global gid map).
"""

from __future__ import annotations

from dataclasses import asdict
from typing import Any

import numpy as np


def dump_index(idx, name: str, arrays: dict[str, np.ndarray]
               ) -> dict[str, Any]:
    from ..index.bruteforce import BruteForceIndex
    from ..index.hnsw import HNSWIndex
    from ..parallel.sharded import ShardedHNSW

    if isinstance(idx, ShardedHNSW):
        shard_states = []
        for j, sh in enumerate(idx.shards):
            shard_states.append(dump_index(sh, f"{name}/s{j}", arrays))
        return {
            "kind": "sharded",
            "metric": idx.metric, "precision": idx.precision,
            "dim": idx.dim, "config": asdict(idx.config),
            "n_shards": idx.n_shards,
            "shards": shard_states,
            "ext_to_gid": dict(idx.ids.ext_to_row),
            "gid_rows": len(idx.ids.row_to_ext),
            "gid_free": list(idx.ids.free),
            "loc_shard": [int(x) for x in idx._loc_shard],
            "loc_row": [int(x) for x in idx._loc_row],
        }
    from ..index.hostarena import HostArenaIndex
    if isinstance(idx, HostArenaIndex):
        arrays[f"{name}/vectors"] = idx._vectors
        arrays[f"{name}/norms"] = idx._norms
        arrays[f"{name}/valid"] = idx._valid
        return {
            "kind": "host",
            "metric": idx.metric, "precision": idx.precision,
            "dim": idx.dim,
            "proj_dim": idx.proj_dim, "proj_rerank": idx.proj_rerank,
            "proj_auto": idx._proj_auto,
            "ext_to_row": dict(idx.ids.ext_to_row),
            "free": list(idx.ids.free),
            "rows": len(idx.ids.row_to_ext),
            "quantizer": {"abs_max": float(idx.quantizer.abs_max),
                          "trained": bool(idx.quantizer.trained)},
        }
    if isinstance(idx, BruteForceIndex):
        arrays[f"{name}/vectors"] = np.asarray(idx._vectors)
        arrays[f"{name}/norms"] = np.asarray(idx._norms)
        arrays[f"{name}/valid"] = idx._valid
        return {
            "kind": "flat",
            "metric": idx.metric, "precision": idx.precision,
            "dim": idx.dim,
            "ext_to_row": dict(idx.ids.ext_to_row),
            "free": list(idx.ids.free),
            "rows": len(idx.ids.row_to_ext),
            "quantizer": {"abs_max": float(idx.quantizer.abs_max),
                          "trained": bool(idx.quantizer.trained)},
        }
    assert isinstance(idx, HNSWIndex), type(idx)
    idx._stage_pending()
    for leaf, val in idx.state._asdict().items():
        arrays[f"{name}/{leaf}"] = np.asarray(val)
    return {
        "kind": "hnsw",
        "metric": idx.metric, "precision": idx.precision,
        "dim": idx.dim, "config": asdict(idx.config),
        "ext_to_row": dict(idx.ids.ext_to_row),
        "free": list(idx.ids.free),
        "rows": len(idx.ids.row_to_ext),
        "deleted_rows": list(idx._deleted_rows),
        "up_free": list(idx._up_free),
        "up_next": idx._up_next,
        "max_level": idx._max_level,
        "needs_refine": idx.needs_refine,
        "serve_quantized": idx._serve_quantized,
        "refine_cursor": idx._refine_cursor,
        "unlinked": [[int(r), int(l)] for r, l in idx._unlinked],
        "quantizer": {"abs_max": float(idx.quantizer.abs_max),
                      "trained": bool(idx.quantizer.trained)},
    }


def _cfg_from(st: dict[str, Any]):
    """HNSWConfig from a checkpoint, dropping keys a newer build added
    (forward compat: an old binary must still open a new checkpoint)."""
    import dataclasses

    from ..index.hnsw import HNSWConfig
    known = {f.name for f in dataclasses.fields(HNSWConfig)}
    raw = st.get("config") or {}
    unknown = set(raw) - known
    if unknown:
        import logging
        logging.getLogger("kektordb.persist").warning(
            "checkpoint: ignoring unknown index config keys %s",
            sorted(unknown))
    return HNSWConfig(**{k: v for k, v in raw.items() if k in known})


def load_index(st: dict[str, Any], arrays: dict[str, np.ndarray],
               name: str):
    import jax.numpy as jnp

    from ..index import hnsw_kernels as K
    from ..index.bruteforce import BruteForceIndex
    from ..index.hnsw import HNSWConfig, HNSWIndex
    from ..ops import quantize as quant

    kind = st.get("kind", "hnsw")
    if kind == "sharded":
        from ..parallel.sharded import ShardedHNSW, make_mesh
        cfg = _cfg_from(st)
        try:
            mesh = make_mesh(st["n_shards"])
        except ValueError:
            # checkpoint was written on a bigger mesh than this host has:
            # degrade to one unsharded index, same as the AOF-replay path
            # (engine.py replay shards-downgrade) — startup must not fail
            import logging
            logging.getLogger("kektordb.persist").warning(
                "checkpoint index %s was saved with shards=%s but only "
                "%d devices are visible; loading as a single unsharded "
                "index (relink cost applies once)", name, st["n_shards"],
                len(__import__("jax").devices()))
            return _merge_sharded_to_single(st, arrays, name)
        idx = ShardedHNSW(st["dim"], st["metric"], st["precision"], cfg,
                          mesh=mesh)
        idx.shards = [load_index(sst, arrays, f"{name}/s{j}")
                      for j, sst in enumerate(st["shards"])]
        for sh, dev in zip(idx.shards, idx.mesh.devices.flat):
            sh.pin_device(dev)     # shard s resident on mesh device s
        idx._stacked = None
        idx._stacked_key = None
        idx._rev_dirty = True
        idx.ids.ext_to_row = dict(st["ext_to_gid"])
        idx.ids.row_to_ext = [None] * st["gid_rows"]
        for e, g in idx.ids.ext_to_row.items():
            idx.ids.row_to_ext[g] = e
        idx.ids.free = list(st["gid_free"])
        idx.ids.rebuild_mask()
        idx._loc_shard = np.array(st["loc_shard"], np.int8)
        idx._loc_row = np.array(st["loc_row"], np.int32)
        # rebuild the (shard, row) -> gid inverse used by vectorized
        # result translation
        max_row = int(idx._loc_row.max(initial=0))
        n = 4096
        while n <= max_row:
            n *= 2
        idx._rev = np.full((idx.n_shards, n), -1, np.int32)
        gids = np.nonzero(idx._loc_shard >= 0)[0]
        idx._rev[idx._loc_shard[gids], idx._loc_row[gids]] = gids
        return idx
    if kind == "host":
        from ..index.hostarena import HostArenaIndex
        idx = HostArenaIndex(st["dim"], st["metric"], st["precision"],
                             proj_dim="auto" if st.get("proj_auto")
                             else int(st.get("proj_dim", 0)),
                             proj_rerank=int(st.get("proj_rerank", 128)))
        idx._vectors = np.asarray(arrays[f"{name}/vectors"],
                                  idx._store_dtype)
        idx._norms = np.asarray(arrays[f"{name}/norms"], np.float32)
        idx._valid = np.asarray(arrays[f"{name}/valid"], bool)
        idx._cap = idx._vectors.shape[0]
        _restore_ids(idx, st)
        idx.quantizer = quant.QuantizerState(
            abs_max=jnp.float32(st["quantizer"]["abs_max"]),
            trained=jnp.asarray(bool(st["quantizer"]["trained"])))
        return idx
    if kind == "flat":
        idx = BruteForceIndex(st["dim"], st["metric"], st["precision"])
        idx._vectors = jnp.asarray(arrays[f"{name}/vectors"])
        idx._norms = jnp.asarray(arrays[f"{name}/norms"])
        idx._valid = np.asarray(arrays[f"{name}/valid"])
        idx._cap = idx._vectors.shape[0]
        _restore_ids(idx, st)
        idx.quantizer = quant.QuantizerState(
            abs_max=jnp.float32(st["quantizer"]["abs_max"]),
            trained=jnp.asarray(bool(st["quantizer"]["trained"])))
        return idx
    cfg = _cfg_from(st)
    idx = HNSWIndex(st["dim"], st["metric"], st["precision"], cfg)
    leaves = {leaf: jnp.asarray(arrays[f"{name}/{leaf}"])
              for leaf in K.GraphState._fields}
    idx.state = K.GraphState(**leaves)
    if st["metric"] == "euclidean" and idx.state.vectors.dtype != jnp.int8 \
            and not st.get("serve_quantized", False):
        # norms hold |x|^2 for L2 serving bias; recompute on load so
        # checkpoints written before this convention stay valid
        idx.state = idx.state._replace(norms=jnp.sum(
            idx.state.vectors.astype(jnp.float32) ** 2, axis=-1))
    idx._cap = idx.state.vectors.shape[0]
    idx._ucap = idx.state.up_node.shape[0]
    _restore_ids(idx, st)
    idx._deleted_rows = set(int(r) for r in st["deleted_rows"])
    idx._up_free = list(st["up_free"])
    idx._up_next = int(st["up_next"])
    idx._max_level = int(st["max_level"])
    idx.needs_refine = bool(st["needs_refine"])
    idx._serve_quantized = bool(st.get("serve_quantized", False))
    idx._refine_cursor = int(st.get("refine_cursor", 0))
    idx._unlinked = [(int(r), int(l)) for r, l in st.get("unlinked") or []]
    idx.quantizer = quant.QuantizerState(
        abs_max=jnp.float32(st["quantizer"]["abs_max"]),
        trained=jnp.asarray(bool(st["quantizer"]["trained"]))) \
        if "quantizer" in st else idx.quantizer
    return idx


def _merge_sharded_to_single(st: dict[str, Any],
                             arrays: dict[str, np.ndarray], name: str):
    """Fold a sharded checkpoint into one unsharded HNSWIndex by re-adding
    every live vector (data lives in the per-shard arenas, so nothing is
    lost; the graph is rebuilt, which is the one-time degrade cost)."""
    from ..index.hnsw import HNSWConfig, HNSWIndex

    cfg = _cfg_from(st)
    idx = HNSWIndex(st["dim"], st["metric"], st["precision"], cfg)
    serve_q = False
    for j, sst in enumerate(st["shards"]):
        sh = load_index(sst, arrays, f"{name}/s{j}")
        serve_q = serve_q or sh._serve_quantized
        ids, vecs = [], []
        for ext, row in sh.ids.ext_to_row.items():
            v = sh.get_vector(ext)   # dequantized f32 for int8/compressed
            if v is None:
                continue
            ids.append(ext)
            vecs.append(v)
        if ids:
            idx.add_batch(ids, np.stack(vecs))
    if serve_q and idx.precision != "int8":
        idx.compress_serving("int8")
    return idx


def _restore_ids(idx, st: dict[str, Any]) -> None:
    idx.ids.ext_to_row = dict(st["ext_to_row"])
    idx.ids.row_to_ext = [None] * st["rows"]
    for e, r in idx.ids.ext_to_row.items():
        idx.ids.row_to_ext[r] = e
    idx.ids.free = list(st["free"])
    idx.ids.rebuild_mask()
