"""Pallas gather+distance, take 2: aligned 8-row-group DMAs.

Mosaic forbids single-row DMAs from tiled HBM; a 1D bf16 view needs
1024-element alignment. So each candidate fetches the aligned 8-row GROUP
containing it (1024 bf16 = 2 KB), the owning row is selected in VMEM with a
lane mask + a group-sum matmul, and DMAs for dedup-masked ids (-1) are
skipped entirely — something XLA's gather cannot do.

Status (end of round 1): COMPILES AND RUNS — first working hand-DMA gather.
Measured: 10.3 Mrows/s vs XLA's ~26 Mrows/s, i.e. the per-row DMA issue rate
on the scalar core is the binding limit (2048 sequential issues/program),
and there is a residual correctness bug in the HBM->SMEM id-slice path
(max_rel_err ~4 on a subset of entries; inf placement correct).

Round-2 directions (in order of expected value):
  1. keep XLA's gather but gather FEWER rows: a separate narrow nav table
     nbrs_nav [cap, 16] (full-row gathers stay on the fast path — slicing
     [.., :16] of the 32-wide table is catastrophically slow, a separate
     array is not)
  2. coalesce DMAs: sort candidate ids per wave and fetch contiguous RANGES
     (BFS layout makes neighbor ids cluster) — fewer, larger copies
  3. multiple DMA queues / deeper pipelining to raise the issue rate

Layout tricks that Mosaic accepts (TB=8 queries/program):
  * no dynamic VMEM row indexing anywhere — compute all rows, mask-write
  * the 16-way remainder select is `pltpu.repeat` + lane-iota mask
  * the per-group reduction is a matmul with a static 0/1 matrix (MXU)
  * aligned GROUP=16-row (bf16 sublane tile) 2D slices for HBM->VMEM DMAs
  * ids arrive via a per-program HBM->SMEM DMA (SMEM holds 1 MB total —
    whole-array scalar prefetch of B*C ids does not fit)
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
TB = 8            # queries per program (sublane-aligned block)
CHUNK = 128       # candidates per DMA wave (=> lane slices 128-aligned)
GROUP = 16        # rows per aligned group (bf16 sublane tile = 16)
GD = GROUP * D


def kernel(q_ref,          # VMEM [TB, D]
           qsq_ref,        # VMEM [TB, 1]
           idv_ref,        # VMEM [TB, C] int32
           ids_any_ref,    # ANY [B, C] int32 (scalar source)
           vec_ref,        # ANY [N, D] bf16
           out_ref,        # VMEM [TB, C] f32
           ids_ref,        # SMEM scratch [TB, C] int32
           ids_sem,
           vbuf0, vbuf1, sem0, sem1):   # two single-buffer scratches
    prog = pl.program_id(0)
    n_waves = (TB * C) // CHUNK
    bufs = (vbuf0, vbuf1)
    sems = (sem0, sem1)
    # SMEM can't hold all B*C ids (1 MB cap); DMA this program's slice
    cp = pltpu.make_async_copy(
        ids_any_ref.at[pl.ds(pl.multiple_of(prog * TB, TB), TB), :],
        ids_ref, ids_sem)
    cp.start()
    cp.wait()

    def sid(flat):
        return ids_ref[flat // C, flat % C]

    def issue(wave):
        buf, sm = bufs[wave % 2], sems[wave % 2]
        off = wave * CHUNK

        def issue_one(j, _):
            row = sid(off + j)

            @pl.when(row >= 0)
            def _():
                g = (row // GROUP) * GROUP
                src = vec_ref.at[pl.ds(pl.multiple_of(g, GROUP), GROUP), :]
                pltpu.make_async_copy(
                    src, buf.at[pl.ds(j * GROUP, GROUP), :],
                    sm.at[j]).start()
            return 0

        jax.lax.fori_loop(0, CHUNK, issue_one, 0)

    def wait_wave(wave):
        buf, sm = bufs[wave % 2], sems[wave % 2]

        def wait_one(j, _):
            row = sid(wave * CHUNK + j)

            @pl.when(row >= 0)
            def _():
                g = (row // GROUP) * GROUP
                src = vec_ref.at[pl.ds(pl.multiple_of(g, GROUP), GROUP), :]
                pltpu.make_async_copy(
                    src, buf.at[pl.ds(j * GROUP, GROUP), :],
                    sm.at[j]).wait()
            return 0

        jax.lax.fori_loop(0, CHUNK, wait_one, 0)

    issue(0)

    for wave in range(n_waves):
        if wave + 1 < n_waves:
            issue(wave + 1)
        wait_wave(wave)

        W = CHUNK * GROUP                                   # 1024
        qi = (wave * CHUNK) // C                            # owning query
        rows = bufs[wave % 2][:].astype(jnp.float32)        # [W, D]
        dots = jnp.dot(q_ref[:].astype(jnp.float32), rows.T,
                       preferred_element_type=jnp.float32)   # [TB, W]
        vsq = jnp.sum(rows * rows, axis=1)[None, :]          # [1, W]
        dall = qsq_ref[:] - 2.0 * dots + vsq                 # [TB, W]

        cstart = pl.multiple_of((wave * CHUNK) % C, 128)
        ids_w = idv_ref[:, pl.ds(cstart, CHUNK)]             # [TB, CHUNK]
        rem = jnp.where(ids_w >= 0, ids_w % GROUP, -1)
        rem_rep = pltpu.repeat(rem, GROUP, axis=1)           # [TB, W]
        lane = jax.lax.broadcasted_iota(jnp.int32, (TB, W), 1)
        picked = jnp.where(lane % GROUP == rem_rep, dall, 0.0)
        # group-sum via a static 0/1 reduction matrix on the MXU; rows other
        # than qi compute with their own rem and are discarded at the write
        gsum = (jax.lax.broadcasted_iota(jnp.int32, (W, CHUNK), 0) // GROUP
                == jax.lax.broadcasted_iota(jnp.int32, (W, CHUNK), 1)
                ).astype(jnp.float32)
        dist = jnp.dot(picked, gsum,
                       preferred_element_type=jnp.float32)   # [TB, CHUNK]
        dist = jnp.where(ids_w >= 0, dist, jnp.inf)
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (TB, CHUNK), 0)
        cur = out_ref[:, pl.ds(cstart, CHUNK)]
        out_ref[:, pl.ds(cstart, CHUNK)] = jnp.where(row_iota == qi,
                                                     dist, cur)


@jax.jit
def pallas_gather_dist(ids, q, vectors_2d):
    qsq = jnp.sum(q.astype(jnp.float32) ** 2, axis=1, keepdims=True)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(B // TB,),
        in_specs=[
            pl.BlockSpec((TB, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((TB, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.SMEM((TB, C), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.VMEM((CHUNK * GROUP, D), jnp.bfloat16),
            pltpu.VMEM((CHUNK * GROUP, D), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((CHUNK,)),
            pltpu.SemaphoreType.DMA((CHUNK,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, C), jnp.float32),
    )(q, qsq, ids, ids, vectors_2d)


@jax.jit
def xla_gather_dist(ids, q, vectors):
    safe = jnp.maximum(ids, 0)
    vecs = vectors[safe].astype(jnp.float32)
    q32 = q.astype(jnp.float32)
    dots = jnp.einsum("bcd,bd->bc", vecs, q32)
    vsq = jnp.sum(vecs * vecs, axis=-1)
    qsq = jnp.sum(q32 * q32, axis=1, keepdims=True)
    d = qsq - 2.0 * dots + vsq
    return jnp.where(ids < 0, jnp.inf, d)


if __name__ == "__main__":
    N = int(os.environ.get("PG_N", 1_048_576))
    frac_invalid = float(os.environ.get("PG_INVALID", 0.4))
    rng = np.random.default_rng(0)
    vectors = jnp.asarray(
        rng.normal(size=(N, D)).astype(np.float32)).astype(jnp.bfloat16)
    q = jnp.asarray(
        rng.normal(size=(B, D)).astype(np.float32)).astype(jnp.bfloat16)
    ids_np = rng.integers(0, N, size=(B, C)).astype(np.int32)
    ids_np[rng.random(size=(B, C)) < frac_invalid] = -1   # dedup-masked
    ids = jnp.asarray(ids_np)

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
    finite = jnp.isfinite(ref)
    err = float(jnp.max(jnp.where(finite, jnp.abs(out - ref), 0.0)))
    rel = err / float(jnp.max(jnp.where(finite, jnp.abs(ref), 1.0)))
    inf_ok = bool(jnp.all(jnp.isinf(out) == jnp.isinf(ref)))
    print(f"pallas: {t_pl*1000:6.1f} ms  {B*C/t_pl/1e6:6.1f} Mrows/s  "
          f"max_rel_err={rel:.2e} inf_match={inf_ok}", flush=True)
