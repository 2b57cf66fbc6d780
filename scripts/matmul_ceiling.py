"""Establish matmul TF/s ceilings on this chip/tunnel.
1. square bf16 matmul (true peak check)
2. K=128 skinny matmul (the scan's shape)
3. Pallas scan kernel with vT [D, N] layout
"""
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(f, *args, n=10, warm=2):
    for _ in range(warm):
        out = f(*args)
        jax.tree.map(lambda x: np.asarray(x[..., :1]), out)
    t0 = time.time()
    for _ in range(n):
        out = f(*args)
        jax.tree.map(lambda x: np.asarray(x[..., :1]), out)
    return (time.time() - t0) / n


rng = np.random.default_rng(0)

# 1. square
M = 8192
a = jnp.asarray(rng.normal(size=(M, M)).astype(np.float32)).astype(jnp.bfloat16)
b = jnp.asarray(rng.normal(size=(M, M)).astype(np.float32)).astype(jnp.bfloat16)


@jax.jit
def square(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32).astype(jnp.bfloat16)


t = timeit(square, a, b)
print(f"square {M}: {t*1000:7.2f} ms  {2*M**3/t/1e12:6.1f} TF/s", flush=True)

# 2. K=128 skinny: [B,128] @ [128, Nc] -> bf16 out
B, D, Nc = 4096, 128, 131072
q = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32)).astype(jnp.bfloat16)
w = jnp.asarray(rng.normal(size=(D, Nc)).astype(np.float32)).astype(jnp.bfloat16)


@jax.jit
def skinny(q, w):
    return jnp.dot(q, w, preferred_element_type=jnp.float32).astype(jnp.bfloat16)


t = timeit(skinny, q, w)
print(f"skinny K=128 out[{B},{Nc}]: {t*1000:7.2f} ms  "
      f"{2*B*Nc*D/t/1e12:6.1f} TF/s", flush=True)

# 2b. fat K: [B, 4096] @ [4096, Nc/32]
K2, N2 = 4096, 4096
qa = jnp.asarray(rng.normal(size=(B, K2)).astype(np.float32)).astype(jnp.bfloat16)
wa = jnp.asarray(rng.normal(size=(K2, N2)).astype(np.float32)).astype(jnp.bfloat16)
t = timeit(jax.jit(lambda x, y: jnp.dot(x, y, preferred_element_type=jnp.float32
                                        ).astype(jnp.bfloat16)), qa, wa)
print(f"fat K=4096 out[{B},{N2}]: {t*1000:7.2f} ms  "
      f"{2*B*N2*K2/t/1e12:6.1f} TF/s", flush=True)

# 3. Pallas vT layout scan
N = 1 << 20
BT, ST, G = 512, 4096, 8
W = ST // G
v32 = rng.normal(size=(N, D)).astype(np.float32)
vT = jnp.asarray(v32.T).astype(jnp.bfloat16)
bias = jnp.asarray((v32 ** 2).sum(1, dtype=np.float32))[None, :]


def kernel(q_ref, vT_ref, bias_ref, gmin_ref, garg_ref):
    dots = jnp.dot(q_ref[:], vT_ref[:], preferred_element_type=jnp.float32)
    scores = bias_ref[:] - 2.0 * dots
    gmin = scores[:, 0:W]
    for m in range(1, G):
        gmin = jnp.minimum(gmin, scores[:, m * W:(m + 1) * W])
    gmin_ref[:] = gmin
    garg = jnp.zeros((BT, W), jnp.int32)
    for m in range(1, G):
        garg = jnp.where(scores[:, m * W:(m + 1) * W] == gmin, m, garg)
    garg_ref[:] = garg


@jax.jit
def scan_vT(q, vT, bias):
    return pl.pallas_call(
        kernel,
        grid=(B // BT, N // ST),
        in_specs=[
            pl.BlockSpec((BT, D), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, ST), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ST), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((BT, W), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((BT, W), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, N // G), jnp.float32),
            jax.ShapeDtypeStruct((B, N // G), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * D,
            bytes_accessed=N * D * 2 + 2 * B * (N // G) * 4,
            transcendentals=0),
    )(q, vT, bias)


t = timeit(scan_vT, q.astype(jnp.bfloat16), vT, bias)
print(f"pallas vT: {t*1000:7.2f} ms  {2*B*N*D/t/1e12:6.1f} TF/s", flush=True)
