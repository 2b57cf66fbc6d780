"""Checkpoint store: atomic snapshots of dense arrays + host state.

Reference analogue: the gob-encoded `.kdb` snapshot of the entire DB —
HNSW adjacency, quantizer, arena slot tables, graph shards, KV
(core.go:85-302, SaveSnapshot recovery.go:459-558). The TPU rebuild
"collapses persistence to checkpointing dense vector/adjacency arrays"
(SURVEY §5): device arrays go to one .npz, host state (ID maps, metadata,
graph, KV) to msgpack. A `CURRENT` pointer file is swapped atomically after
the checkpoint directory is fully written, so a crash mid-save leaves the
previous checkpoint intact (the reference's tmp→rename dance).
"""

from __future__ import annotations

import io
import logging
import os
import shutil
import time
from typing import Any, Optional

import msgpack
import numpy as np

log = logging.getLogger("kektordb.checkpoint")

CURRENT = "CURRENT"


def _pack_default(o):
    if isinstance(o, (set, frozenset)):
        return {"__set__": list(o)}
    if isinstance(o, tuple):
        return list(o)
    if isinstance(o, np.integer):
        return int(o)
    if isinstance(o, np.floating):
        return float(o)
    raise TypeError(f"cannot pack {type(o)}")


def _unpack_hook(o):
    if "__set__" in o and len(o) == 1:
        return set(o["__set__"])
    return o


def _fsync_dir(path: str) -> None:
    fd = os.open(path, os.O_RDONLY)
    try:
        os.fsync(fd)
    finally:
        os.close(fd)


def save(root: str, arrays: dict[str, np.ndarray], state: dict[str, Any]
         ) -> str:
    """Write a new checkpoint generation and swap CURRENT atomically.

    Both data files and the generation/root directories are fsynced before
    CURRENT is swapped, so after power loss CURRENT never points at a torn
    generation."""
    os.makedirs(root, exist_ok=True)
    gen = f"ckpt-{int(time.time() * 1000):016d}"
    tmp = os.path.join(root, gen + ".tmp")
    os.makedirs(tmp, exist_ok=True)
    with open(os.path.join(tmp, "arrays.npz"), "wb") as f:
        np.savez(f, **_encode_arrays(arrays))
        f.flush()
        os.fsync(f.fileno())
    with open(os.path.join(tmp, "state.msgpack"), "wb") as f:
        f.write(msgpack.packb(state, default=_pack_default, use_bin_type=True))
        f.flush()
        os.fsync(f.fileno())
    _fsync_dir(tmp)
    final = os.path.join(root, gen)
    os.replace(tmp, final)
    _fsync_dir(root)
    # atomic CURRENT swap
    cur_tmp = os.path.join(root, CURRENT + ".tmp")
    with open(cur_tmp, "w") as f:
        f.write(gen)
        f.flush()
        os.fsync(f.fileno())
    os.replace(cur_tmp, os.path.join(root, CURRENT))
    _fsync_dir(root)
    _gc(root, keep=2)
    return final


_BF16 = "::bf16"


def _encode_arrays(arrays: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """npz cannot represent ml_dtypes.bfloat16 (it round-trips as raw
    '|V2' with no cast back) — store bf16 arrays as uint16 views under a
    tagged key and view them back on load."""
    import ml_dtypes
    out = {}
    for k, a in arrays.items():
        a = np.asarray(a)
        if a.dtype == ml_dtypes.bfloat16:
            out[k + _BF16] = np.ascontiguousarray(a).view(np.uint16)
        else:
            out[k] = a
    return out


def _decode_arrays(arrays: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    import ml_dtypes
    out = {}
    for k, a in arrays.items():
        if k.endswith(_BF16):
            out[k[: -len(_BF16)]] = a.view(ml_dtypes.bfloat16)
        elif a.dtype.kind == "V" and a.dtype.itemsize == 2:
            # pre-codec checkpoint that saved bf16 raw: only bf16 arrays
            # ever had this dtype here
            out[k] = a.view(ml_dtypes.bfloat16)
        else:
            out[k] = a
    return out


def _load_gen(root: str, gen: str
              ) -> tuple[dict[str, np.ndarray], dict[str, Any]]:
    path = os.path.join(root, gen)
    with np.load(os.path.join(path, "arrays.npz")) as z:
        arrays = _decode_arrays({k: z[k] for k in z.files})
    with open(os.path.join(path, "state.msgpack"), "rb") as f:
        state = msgpack.unpackb(f.read(), raw=False, strict_map_key=False,
                                object_hook=_unpack_hook)
    return arrays, state


def load(root: str) -> Optional[tuple[dict[str, np.ndarray], dict[str, Any]]]:
    """Load the CURRENT generation; on a torn/corrupt one, fall back to the
    newest older generation that parses."""
    cur = os.path.join(root, CURRENT)
    if not os.path.exists(cur):
        return None
    with open(cur) as f:
        gen = f.read().strip()
    tried = [gen]
    older = sorted((d for d in os.listdir(root)
                    if d.startswith("ckpt-") and not d.endswith(".tmp")
                    and d != gen), reverse=True)
    for g in tried + older:
        try:
            return _load_gen(root, g)
        except Exception as exc:
            # falling through to an OLDER generation silently would be a
            # silent time-rollback of the database — make it loud
            log.warning("checkpoint generation %s failed to load (%s); "
                        "falling back to an older generation", g, exc)
            continue
    return None


def _gc(root: str, keep: int) -> None:
    """Drop all but the newest `keep` generations (never the CURRENT one)."""
    try:
        with open(os.path.join(root, CURRENT)) as f:
            current = f.read().strip()
    except FileNotFoundError:
        return
    gens = sorted(d for d in os.listdir(root)
                  if d.startswith("ckpt-") and not d.endswith(".tmp"))
    for d in gens[:-keep]:
        if d != current:
            shutil.rmtree(os.path.join(root, d), ignore_errors=True)
