"""Bare random-row gather throughput across table sizes/dtypes (dev tool)."""
import time
import numpy as np
import jax
import jax.numpy as jnp
import functools

B, C, D = 4096, 256, 128
n_ids = B * C


@functools.partial(jax.jit, static_argnames=())
def g(table, ids):
    return table[ids].sum(axis=-1)


@jax.jit
def g_sum(table, ids, q):
    # gather + distance-like reduce (mimics the beam inner op)
    vecs = table[ids.reshape(B, C)]
    return jnp.einsum("bcd,bd->bc", vecs.astype(jnp.float32),
                      q.astype(jnp.float32))


rng = np.random.default_rng(0)
q = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
for N in (262_144, 1_048_576, 2_097_152):
    ids = jnp.asarray(rng.integers(0, N, size=n_ids).astype(np.int32))
    for dt in (jnp.bfloat16, jnp.float32, jnp.int8):
        table = jnp.zeros((N, D), dt)
        out = g_sum(table, ids, q)
        _ = float(out[0, 0])              # force full host sync
        t0 = time.time()
        for _ in range(5):
            out = g_sum(table, ids, q)
            _ = float(out[0, 0])          # sync each call (axon tunnel:
                                          # block_until_ready is unreliable)
        dt_s = (time.time() - t0) / 5
        bytes_moved = n_ids * D * np.dtype(
            {jnp.bfloat16: np.float16, jnp.float32: np.float32,
             jnp.int8: np.int8}[dt]).itemsize
        print(f"N={N:8d} dtype={np.dtype(jnp.dtype(dt)).name:8s} "
              f"{dt_s*1000:6.1f} ms  {bytes_moved/dt_s/1e9:6.1f} GB/s",
              flush=True)
