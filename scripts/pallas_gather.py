"""Prototype: Pallas fused gather+L2-distance kernel vs XLA gather.

Status (round 1): compiles up to the final Mosaic constraint — a 1D bf16
HBM slice must be 1024-element aligned, so per-row (128-element) DMAs are
rejected. Next step (round 2): DMA the aligned 8-row GROUP containing each
candidate (1024 bf16) and select the row in VMEM (8x bytes, still ~4x less
than XLA's effective waste), or keep the arena pre-grouped [N/8, 1024].

Mosaic constraints learned (v5e, jax 0.9):
  * dynamic row index into a VMEM ref must be sublane-aligned → compute
    against all TB queries + mask-write instead
  * lane-dim slices must be 128-aligned (pl.ds starts need
    pl.multiple_of(.., 128))
  * single rows of a (8,128)-tiled HBM memref cannot be DMA'd; 1D views
    need 1024-element (bf16) alignment
  * dynamic leading index into scratch (vbuf[slot]) needs static slots →
    unroll the wave loop in Python

Per program = one query tile: candidate rows are fetched from HBM with
hand-issued double-buffered async DMAs (ids via scalar prefetch), distances
computed in VMEM. Measures effective row rate vs the XLA gather baseline
(~26 Mrows/s for [4096x256] rows from a 1M-row table).
"""
import functools
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, C, D = 4096, 256, 128
TB = 8           # queries per program
CHUNK = 128      # rows per DMA wave (lane-dim slice must be 128-aligned)


def kernel(ids_ref,            # SMEM scalar prefetch [B*C]
           q_ref,              # VMEM [TB, D]
           qsq_ref,            # VMEM [TB, 1] — |q|^2
           vec_ref,            # ANY/HBM [N, D]
           out_ref,            # VMEM [TB, C]
           vbuf, sem):         # scratch: VMEM [2, CHUNK, D], DMA sems [2, CHUNK]
    prog = pl.program_id(0)
    base = prog * TB * C

    n_waves = (TB * C) // CHUNK

    def issue(wave, slot):
        off = wave * CHUNK

        def issue_one(j, _):
            row = ids_ref[base + off + j]
            src = vec_ref.at[pl.ds(pl.multiple_of(row * D, 128), D)]
            pltpu.make_async_copy(
                src, vbuf.at[slot, pl.ds(j * D, D)],
                sem.at[slot, j]).start()
            return 0

        jax.lax.fori_loop(0, CHUNK, issue_one, 0)

    issue(0, 0)

    def make_wave(wave):
        slot = wave % 2
        if wave + 1 < n_waves:
            issue(wave + 1, (wave + 1) % 2)

        def wait_one(j, _):
            row = ids_ref[base + wave * CHUNK + j]
            src = vec_ref.at[pl.ds(pl.multiple_of(row * D, 128), D)]
            pltpu.make_async_copy(
                src, vbuf.at[slot, pl.ds(j * D, D)],
                sem.at[slot, j]).wait()
            return 0

        jax.lax.fori_loop(0, CHUNK, wait_one, 0)

        # all CHUNK rows belong to query (wave*CHUNK)//C within the tile;
        # Mosaic cannot index a VMEM row dynamically, so compute against all
        # TB queries (tiny MACs) and mask-write the owning row
        qi = (wave * CHUNK) // C
        rows = vbuf[slot].reshape(CHUNK, D).astype(jnp.float32)
        dots = jnp.dot(q_ref[:].astype(jnp.float32), rows.T,
                       preferred_element_type=jnp.float32)  # [TB, CHUNK]
        vsq = jnp.sum(rows * rows, axis=1)[None, :]         # [1, CHUNK]
        dist = qsq_ref[:] - 2.0 * dots + vsq                # [TB, CHUNK]
        cstart = pl.multiple_of((wave * CHUNK) % C, 128)
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (TB, CHUNK), 0)
        cur = out_ref[:, pl.ds(cstart, CHUNK)]
        out_ref[:, pl.ds(cstart, CHUNK)] = jnp.where(row_iota == qi,
                                                     dist, cur)

    for wave in range(n_waves):       # static unroll: slots/sections static
        make_wave(wave)


@functools.partial(jax.jit, static_argnames=())
def pallas_gather_dist(ids, q, vectors):
    qsq = jnp.sum(q.astype(jnp.float32) ** 2, axis=1, keepdims=True)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // TB,),
        in_specs=[
            pl.BlockSpec((TB, D), lambda i, ids: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 1), lambda i, ids: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((TB, C), lambda i, ids: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, CHUNK * D), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2, CHUNK)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, C), jnp.float32),
    )(ids.reshape(-1), q, qsq, vectors.reshape(-1))


@jax.jit
def xla_gather_dist(ids, q, vectors):
    vecs = vectors[ids.reshape(B, C)].astype(jnp.float32)
    q32 = q.astype(jnp.float32)
    dots = jnp.einsum("bcd,bd->bc", vecs, q32)
    vsq = jnp.sum(vecs * vecs, axis=-1)
    qsq = jnp.sum(q32 * q32, axis=1, keepdims=True)
    return qsq - 2.0 * dots + vsq


if __name__ == "__main__":
    N = int(os.environ.get("PG_N", 1_048_576))
    rng = np.random.default_rng(0)
    vectors = jnp.asarray(
        rng.normal(size=(N, D)).astype(np.float32)).astype(jnp.bfloat16)
    q = jnp.asarray(
        rng.normal(size=(B, D)).astype(np.float32)).astype(jnp.bfloat16)
    ids = jnp.asarray(rng.integers(0, N, size=(B, C)).astype(np.int32))

    ref = xla_gather_dist(ids, q, vectors)
    _ = float(ref[0, 0])
    t0 = time.time()
    for _i in range(5):
        ref = xla_gather_dist(ids, q, vectors)
        _ = float(ref[0, 0])
    t_xla = (time.time() - t0) / 5
    print(f"xla:    {t_xla*1000:6.1f} ms  {B*C/t_xla/1e6:6.1f} Mrows/s",
          flush=True)

    out = pallas_gather_dist(ids, q, vectors)
    _ = float(out[0, 0])
    t0 = time.time()
    for _i in range(5):
        out = pallas_gather_dist(ids, q, vectors)
        _ = float(out[0, 0])
    t_pl = (time.time() - t0) / 5
    err = float(jnp.max(jnp.abs(out - ref)))
    rel = err / float(jnp.max(jnp.abs(ref)))
    print(f"pallas: {t_pl*1000:6.1f} ms  {B*C/t_pl/1e6:6.1f} Mrows/s  "
          f"max_rel_err={rel:.2e}", flush=True)
