"""Scan variants round 2: [D,N] pre-transposed table, int8, matmul-only
cost isolation, bigger blocks."""
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


def make_dn(S, mode, in_dtype=jnp.bfloat16):
    nb = N // S

    @jax.jit
    def f(q, vT, v2):
        def body(j, carry):
            cd, ci = carry
            blk = jax.lax.dynamic_slice(vT, (0, j * S), (D, S))   # [D, S]
            b2 = jax.lax.dynamic_slice(v2, (j * S,), (S,))
            if in_dtype == jnp.int8:
                dots = jax.lax.dot_general(
                    q, blk, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32).astype(jnp.float32)
            else:
                dots = jnp.dot(q, blk, preferred_element_type=jnp.float32)
            scores = b2[None, :] - 2.0 * dots
            if mode == "approx":
                bd, bi = jax.lax.approx_min_k(scores, K, recall_target=0.99)
            elif mode == "sum":     # matmul-cost isolation: cheap reduce
                bd = jnp.min(scores, axis=1, keepdims=True)
                bd = jnp.broadcast_to(bd, (B, K))
                bi = jnp.zeros((B, K), jnp.int32)
                return (jnp.minimum(cd, bd), bi)
            gi = bi + j * S
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
    v32 = rng.normal(size=(N, D)).astype(np.float32)
    vT = jnp.asarray(v32.T).astype(jnp.bfloat16)          # [D, N]
    v2 = jnp.asarray((v32.astype(np.float64) ** 2).sum(1).astype(np.float32))
    q = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32)
                    ).astype(jnp.bfloat16)

    for S in (131072, 262144, 524288):
        for mode in ("sum", "approx"):
            f = make_dn(S, mode)
            t = timeit(f, q, vT, v2)
            tf = 2 * B * N * D / t / 1e12
            print(f"dn S={S:6d} {mode:6s}: {t*1000:7.2f} ms "
                  f"{B/t:9.0f} qps  {tf:5.1f} TF/s", flush=True)

    # int8 variant
    scale = np.abs(v32).max() / 127.0
    v8 = np.clip(np.round(v32 / scale), -127, 127).astype(np.int8)
    vT8 = jnp.asarray(v8.T)                                # [D, N] int8
    v28 = jnp.asarray((v8.astype(np.float32) ** 2).sum(1))
    q8 = jnp.asarray(np.clip(np.round(
        np.asarray(q, np.float32) / scale), -127, 127).astype(np.int8))
    for S in (262144, 524288):
        f = make_dn(S, "approx", jnp.int8)
        t = timeit(f, q8, vT8, v28)
        print(f"i8 S={S:6d} approx: {t*1000:7.2f} ms {B/t:9.0f} qps",
              flush=True)
