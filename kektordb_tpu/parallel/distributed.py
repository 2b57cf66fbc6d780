"""Multi-host / multi-slice distribution: jax.distributed + DCN replication.

SURVEY §5 "Distributed communication backend" and §2.7 commit this rebuild
to two parallelism surfaces the single-node reference never had
(reference: one Go process, pkg/server — n/a there):

  * INTRA-slice: the shard axis. ShardedHNSW row-shards arenas over the
    devices of ONE process/slice; per-batch merges (`all_gather` of the
    [B, k] tops) ride ICI (parallel/sharded.py).
  * INTER-slice: the replica axis. Each process (= slice in a multislice
    deployment, = host in a CPU cluster) holds a FULL copy of the stacked
    serving state; a query batch is split over replicas, each replica
    scans only its local shard axis, and one `all_gather` over the
    replica axis reassembles the [B, k] answers — so the only bytes that
    ever cross DCN are final tops ([B/R, k] per replica), never arenas.

Topology choice follows the scaling-book recipe: put the
bandwidth-hungry axis (shard merges, ~S*[B,k] per batch) on ICI, the
skinny axis (replica reassembly) on DCN.

The same code runs three ways:
  * single process, virtual devices (tests/dryrun): a (R, S) mesh
    factored from the visible devices; replication is a device_put.
  * multi-process CPU (2+ spawned processes, gloo collectives): the
    integration test — a REAL process-spanning mesh with cross-process
    collectives (tests/test_distributed.py).
  * multi-slice TPU: one process per slice; jax.distributed.initialize
    wires the coordination service; DCN carries the replica axis.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..index import hnsw_kernels as K
from ..ops import distance as dist
from ..ops import scan as scanlib
from . import sharded as shlib

REPLICA_AXIS = "replica"
SHARD_AXIS = "shards"


# boot half lives in a leaf module importing ONLY jax (config flags must
# precede backend init; importing this package traces jits) — re-exported
# here for discoverability
from ..distboot import init_distributed  # noqa: F401


def local_devices_for_mesh() -> list:
    """The devices a ShardedHNSW on this process should span: the
    process-local ones. In a multi-process world `jax.devices()` is
    GLOBAL — arenas can only be staged onto addressable devices, so the
    shard axis is always local; the replica axis spans processes."""
    return list(jax.local_devices())


def replica_mesh(n_replicas: Optional[int] = None,
                 replica_axis: str = REPLICA_AXIS,
                 shard_axis: str = SHARD_AXIS) -> Mesh:
    """The (R, S) serving mesh: row r = replica r's devices.

    Multi-process: R = process_count, S = per-process device count, and
    row r holds process r's local devices (so each process's stacked
    state lands on its own row — replication never moves arena bytes at
    assembly time). Single-process: factor the visible devices into
    (n_replicas, rest) for tests and dryruns.
    """
    if jax.process_count() > 1:
        if n_replicas not in (None, jax.process_count()):
            raise ValueError("multi-process replica count is fixed at "
                             f"process_count={jax.process_count()}")
        # group by process, preserving jax.devices() order WITHIN each
        # group — jax.devices() is globally consistent, so every process
        # constructs the identical mesh (an SPMD requirement); sorting by
        # device id instead can disagree with local_devices() order and
        # scramble the zero-copy replicate_stacked lift (measured: wrong
        # answers on replica 1 under forced host device counts)
        R = jax.process_count()
        rows = [[] for _ in range(R)]
        for d in jax.devices():
            rows[d.process_index].append(d)
        S = len(rows[0])
        if any(len(r) != S for r in rows):
            raise ValueError("uneven per-process device counts: "
                             f"{[len(r) for r in rows]}")
        grid = np.array(rows, dtype=object).reshape(R, S)
        return Mesh(grid, (replica_axis, shard_axis))
    devs = jax.devices()
    R = n_replicas or 1
    if len(devs) % R:
        raise ValueError(f"{len(devs)} devices don't factor into "
                         f"{R} replicas")
    S = len(devs) // R
    return Mesh(np.array(devs).reshape(R, S), (replica_axis, shard_axis))


def local_shard_mesh(mesh: Mesh, axis: str = SHARD_AXIS) -> Mesh:
    """This process's ROW of the (R, S) mesh as a 1-axis shard mesh — the
    mesh a ShardedHNSW must be built on so its shard order and the
    replica mesh's column order agree (replicate_stacked lifts the local
    buffers zero-copy, so the orders must match by construction)."""
    if jax.process_count() > 1:
        row = [d for d in mesh.devices.flat
               if d.process_index == jax.process_index()]
    else:
        # single-process simulation: row 0 plays the local slice
        row = list(mesh.devices[0])
    return Mesh(np.array(row, dtype=object), (axis,))


def replicate_stacked(stacked: K.GraphState, mesh: Mesh,
                      shard_axis: str = SHARD_AXIS) -> K.GraphState:
    """Lift a process-local [S, ...] stacked state onto the (R, S) mesh,
    sharded over the shard axis and REPLICATED over the replica axis.

    Multi-process: every process already holds its full copy on its own
    row of the mesh, so the global array is assembled from the local
    device buffers with zero data movement
    (make_array_from_single_device_arrays). Single-process: device_put
    materializes the R copies (tests / dryrun).
    """
    sharding = NamedSharding(mesh, P(shard_axis))

    def lift(leaf: jax.Array) -> jax.Array:
        if jax.process_count() == 1:
            return jax.device_put(leaf, sharding)
        pieces = [s.data for s in leaf.addressable_shards]
        return jax.make_array_from_single_device_arrays(
            leaf.shape, sharding, pieces)

    return jax.tree.map(lift, stacked)


@jax.jit
def _fingerprint(stacked):
    """Per-shard checksum of every leaf of a [S, ...] stacked state:
    (sum, sum-of-squares) in f32 — deterministic for identical buffers,
    so replica divergence (missed write, bit rot, desynced journal)
    shows up as a fingerprint mismatch. Returns [S, n_leaves, 2]."""
    outs = []
    for leaf in jax.tree.leaves(stacked):
        if leaf.ndim == 0:        # true scalar (not per-shard): skip
            continue
        x = leaf.astype(jnp.float32)
        axes = tuple(range(1, x.ndim))
        outs.append(jnp.stack(
            [jnp.sum(x, axes), jnp.sum(x * x, axes)], axis=-1))
    return jnp.stack(outs, axis=1)


@functools.lru_cache(maxsize=64)
def _fanout_program(mesh: Mesh, replica_axis: str, shard_axis: str,
                    *, k: int, metric: str, mode: str, fast: bool,
                    quantum: Optional[float]):
    """One SPMD program: replica-local shard scan + ICI merge, then a DCN
    all_gather of final tops reassembles the full batch on every device.

    Memoized on (mesh, axes, k, metric, mode, fast, quantum): jax's
    dispatch cache is keyed on function identity, so returning a fresh
    `body` closure per call would retrace + relower the scan program on
    every distributed search (the hot path of the replicated backend)."""

    def body(state_blk, q, qn):
        state = jax.tree.map(lambda x: x[0], state_blk)
        d, rows = scanlib.scan_search(
            state.vectors, state.norms, state.levels, state.deleted, None,
            q, qn, k, metric=metric, mode=mode, has_allow=False, fast=fast,
            quantum=None if quantum is None else jnp.float32(quantum))
        d, sh, rw = shlib._merge_tops(shard_axis, d, rows, k)   # ICI
        # DCN: [R, B/R, k] final tops only — reassemble the global batch
        d_all = jax.lax.all_gather(d, replica_axis)
        sh_all = jax.lax.all_gather(sh, replica_axis)
        rw_all = jax.lax.all_gather(rw, replica_axis)
        flat = lambda a: a.reshape((-1,) + a.shape[2:])
        return flat(d_all), flat(sh_all), flat(rw_all)

    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(shard_axis), P(replica_axis), P(replica_axis)),
        out_specs=(P(), P(), P()),
        check_vma=False)


class ReplicatedServing:
    """DCN-replicated serving head over a local ShardedHNSW.

    Wraps a ShardedHNSW whose shard mesh is THIS process's devices and
    serves queries over the (replica, shard) mesh: the batch splits over
    replicas, each replica answers its slice of the batch from its local
    copy, and every process gets the full [B, k] result. All processes
    must call search() collectively with the same arguments (standard
    multi-controller SPMD). Writes go to the underlying index on every
    process identically (deterministic replication — same journal, same
    state); see DOCUMENTATION.md "Multi-host deployment".
    """

    def __init__(self, sharded: "shlib.ShardedHNSW",
                 mesh: Optional[Mesh] = None,
                 n_replicas: Optional[int] = None):
        self.sharded = sharded
        self.mesh = mesh or replica_mesh(n_replicas)
        self.replica_axis, self.shard_axis = self.mesh.axis_names
        R, S = self.mesh.devices.shape
        if S != sharded.n_shards:
            raise ValueError(
                f"mesh shard axis {S} != sharded.n_shards "
                f"{sharded.n_shards}")
        if jax.process_count() > 1:
            # the zero-copy lift requires shard s's arena to sit on the
            # device at COLUMN s of this process's mesh row — build the
            # ShardedHNSW on local_shard_mesh(mesh) to guarantee it
            row = list(local_shard_mesh(self.mesh).devices.flat)
            got = list(sharded.mesh.devices.flat)
            if row != got:
                raise ValueError(
                    "sharded.mesh device order does not match this "
                    "process's replica-mesh row; build the ShardedHNSW "
                    "with mesh=local_shard_mesh(replica_mesh(...))")
        self._lifted = None
        self._lifted_key = None

    @property
    def n_replicas(self) -> int:
        return self.mesh.devices.shape[0]

    def _state(self) -> K.GraphState:
        self.sharded.settle_for_serving()
        stacked = self.sharded._get_stacked()
        key = self.sharded._stacked_key
        if self._lifted is None or self._lifted_key != key:
            self._lifted = replicate_stacked(stacked, self.mesh,
                                             self.shard_axis)
            self._lifted_key = key
        return self._lifted

    def search(self, queries: np.ndarray, k: int
               ) -> tuple[np.ndarray, np.ndarray]:
        """(dists [B, k], global rows [B, k]); batch fanned over replicas.
        B pads up so every replica gets an aligned sub-batch."""
        sh = self.sharded
        queries = np.atleast_2d(np.asarray(queries, np.float32))
        B = queries.shape[0]
        if len(sh.ids) == 0:
            return (np.full((B, k), np.inf, np.float32),
                    np.full((B, k), -1, np.int32))
        state = self._state()
        R = self.n_replicas
        min_b = 32 if state.vectors.dtype == jnp.int8 else 16
        Bp = R * min_b
        while Bp < B:
            Bp *= 2
        qp = queries
        if Bp != B:
            qp = np.concatenate(
                [queries, np.zeros((Bp - B, queries.shape[1]), np.float32)])
        q, qn = sh.shards[0]._encode_query(qp, True)
        qsh = NamedSharding(self.mesh, P(self.replica_axis))
        q_g = jax.make_array_from_process_local_data(qsh, np.asarray(q))
        qn_g = jax.make_array_from_process_local_data(qsh, np.asarray(qn))
        fn = _fanout_program(
            self.mesh, self.replica_axis, self.shard_axis,
            k=k, metric=sh.metric,
            mode="exact" if sh.config.scan_exact else "approx",
            fast=sh.config.scan_precision == "fast",
            quantum=sh._shared_quantum())
        d, sid, row = fn(state, q_g, qn_g)
        d = np.asarray(jax.device_get(d))[:B]
        sid = np.asarray(jax.device_get(sid))[:B]
        row = np.asarray(jax.device_get(row))[:B]
        valid = (row >= 0) & (row < sh._rev.shape[1])
        gids = np.where(valid,
                        sh._rev[np.where(valid, sid, 0),
                                np.where(valid, row, 0)],
                        -1).astype(np.int32)
        return d, gids

    def search_ids(self, queries: np.ndarray, k: int):
        """(ext_id, dist) per query — the engine-facing form."""
        d, gids = self.search(queries, k)
        sh = self.sharded
        out = []
        for b in range(gids.shape[0]):
            hits = []
            for j in range(gids.shape[1]):
                g = int(gids[b, j])
                if g >= 0:
                    ext = sh.ids.row_to_ext[g]
                    if ext is not None:
                        hits.append((ext, float(d[b, j])))
            out.append(hits)
        return out

    # ------------------------------------------------- lifecycle / health

    def search_local(self, queries: np.ndarray, k: int
                     ) -> tuple[np.ndarray, np.ndarray]:
        """Replica-local serving — NO cross-process collectives. Every
        replica holds a FULL copy, so local answers ARE the global
        answers; this is the degraded-mode path when a peer replica dies
        (an SPMD collective would hang on the dead participant). Callers
        fall back here on peer failure and return to search() once the
        cluster re-forms (tests/test_distributed.py lifecycle test)."""
        return self.sharded.search(queries, k)

    def local_fingerprint(self) -> np.ndarray:
        """This replica's [S, n_leaves, 2] state checksum (host numpy) —
        computed from the LOCAL stacked state, before any replication."""
        self.sharded.settle_for_serving()
        return np.asarray(
            jax.device_get(_fingerprint(self.sharded._get_stacked())))

    def verify_replicas(self) -> dict:
        """Cross-replica divergence check (VERDICT r4 #4): every process
        contributes its local state fingerprint; one all-gather over the
        replica axis gives each process the full [R, ...] matrix to
        compare. Collective — all processes must call it together.
        Returns {"equal", "replicas", "fingerprint_crc32"} (the crc is
        THIS replica's digest, loggable/exposable via /system/stats)."""
        import zlib
        fp = self.local_fingerprint()
        flat = np.ascontiguousarray(fp, np.float32).reshape(1, -1)
        R = self.n_replicas
        if jax.process_count() == 1:
            all_fp = np.repeat(flat, R, axis=0)     # replicas share state
        else:
            sh = NamedSharding(self.mesh, P(self.replica_axis))
            g = jax.make_array_from_process_local_data(sh, flat)
            rep = jax.jit(lambda x: x,
                          out_shardings=NamedSharding(self.mesh, P()))(g)
            all_fp = np.asarray(jax.device_get(rep))
        return {
            "equal": bool(np.all(all_fp == all_fp[0])),
            "replicas": R,
            "fingerprint_crc32": zlib.crc32(flat.tobytes()) & 0xffffffff,
        }
