"""Measure MXU exact-scan top-k variants on the real TPU.

Hypothesis: at B=4096 and N=1M, a blocked brute-force matmul scan with
fused top-k beats the beam-search gather path by >10x while giving exact
recall. This script measures:
  0. raw matmul ceiling [B,D]x[D,N]
  1. blocked scan + lax.top_k per block + final merge
  2. blocked scan + approx_min_k per block + final merge
  3. blocked scan + variadic-sort merge of a running pool
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

N, D, B, K = 1 << 20, 128, 4096, 16


def timeit(f, *args, n=5, warm=2):
    for _ in range(warm):
        out = f(*args)
        jax.tree.map(lambda x: np.asarray(x[..., :1]), out)
    t0 = time.time()
    for _ in range(n):
        out = f(*args)
        jax.tree.map(lambda x: np.asarray(x[..., :1]), out)
    return (time.time() - t0) / n


@jax.jit
def raw_matmul(q, v):
    return jnp.einsum("bd,nd->bn", q, v[: N // 8],
                      preferred_element_type=jnp.float32)


def make_blocked(S, mode):
    nb = N // S

    @jax.jit
    def f(q, v, v2):
        def body(j, carry):
            cd, ci = carry
            blk = jax.lax.dynamic_slice(v, (j * S, 0), (S, D))
            b2 = jax.lax.dynamic_slice(v2, (j * S,), (S,))
            dots = jnp.einsum("bd,nd->bn", q, blk,
                              preferred_element_type=jnp.float32)
            scores = b2[None, :] - 2.0 * dots          # rank-equiv L2
            if mode == "topk":
                bd, bi = jax.lax.top_k(-scores, K)
                bd = -bd
            elif mode == "approx":
                bd, bi = jax.lax.approx_min_k(scores, K,
                                              recall_target=0.99)
            gi = bi + j * S
            md = jnp.concatenate([cd, bd], axis=1)
            mi = jnp.concatenate([ci, gi], axis=1)
            sd, si = jax.lax.sort((md, mi), num_keys=1)
            return sd[:, :K], si[:, :K]

        cd = jnp.full((B, K), jnp.inf, jnp.float32)
        ci = jnp.full((B, K), -1, jnp.int32)
        return jax.lax.fori_loop(0, nb, body, (cd, ci))

    return f


def make_pool(S):
    """No per-block topk: merge the whole [B,S] block into a pool via sort?
    S too big; instead reshape S into R rows of 1024 and take min over
    sub-rows first (two-stage reduce)."""
    nb = N // S

    @jax.jit
    def f(q, v, v2):
        def body(j, carry):
            cd, ci = carry
            blk = jax.lax.dynamic_slice(v, (j * S, 0), (S, D))
            b2 = jax.lax.dynamic_slice(v2, (j * S,), (S,))
            dots = jnp.einsum("bd,nd->bn", q, blk,
                              preferred_element_type=jnp.float32)
            scores = b2[None, :] - 2.0 * dots
            # stage 1: min over groups of G
            G = 8
            s3 = scores.reshape(B, S // G, G)
            gmin = jnp.min(s3, axis=2)
            garg = jnp.argmin(s3, axis=2)
            bd, bi = jax.lax.top_k(-gmin, K)
            bd = -bd
            sub = jnp.take_along_axis(garg, bi, axis=1)
            gi = bi * G + sub + j * S
            md = jnp.concatenate([cd, bd], axis=1)
            mi = jnp.concatenate([ci, gi], axis=1)
            sd, si = jax.lax.sort((md, mi), num_keys=1)
            return sd[:, :K], si[:, :K]

        cd = jnp.full((B, K), jnp.inf, jnp.float32)
        ci = jnp.full((B, K), -1, jnp.int32)
        return jax.lax.fori_loop(0, nb, body, (cd, ci))

    return f


if __name__ == "__main__":
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    v2 = jnp.sum(v.astype(jnp.float32) ** 2, axis=1)
    q = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32)
                    ).astype(jnp.bfloat16)

    t = timeit(raw_matmul, q, v)
    tf = 2 * B * (N // 8) * D / t / 1e12
    print(f"raw matmul (N/8): {t*1000:7.2f} ms  {tf:6.1f} TFLOP/s "
          f"-> full-N est {t*8*1000:7.2f} ms", flush=True)

    for S in (32768, 65536, 131072):
        for mode in ("topk", "approx"):
            f = make_blocked(S, mode)
            t = timeit(f, q, v, v2)
            print(f"blocked S={S:6d} {mode:6s}: {t*1000:7.2f} ms  "
                  f"{B/t:9.0f} qps", flush=True)
        f = make_pool(S)
        t = timeit(f, q, v, v2)
        print(f"blocked S={S:6d} 2stage: {t*1000:7.2f} ms  "
              f"{B/t:9.0f} qps", flush=True)

    # correctness spot-check of the approx variant vs exact topk
    f1 = make_blocked(65536, "topk")
    f2 = make_blocked(65536, "approx")
    d1, i1 = f1(q, v, v2)
    d2, i2 = f2(q, v, v2)
    match = np.mean([len(set(np.asarray(i1)[b, :10]) &
                         set(np.asarray(i2)[b, :10])) / 10
                     for b in range(256)])
    print(f"approx vs exact top-10 overlap: {match:.4f}", flush=True)
