"""Distance-kernel parity vs numpy (reference distance_test.go: pure-Go vs
optimized kernel parity)."""

import numpy as np
import jax.numpy as jnp
import pytest

from kektordb_tpu.ops import distance as dist
from kektordb_tpu.ops import quantize as quant


def np_l2(q, x):
    return ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)


def np_cos(q, x):
    qn = q / np.linalg.norm(q, axis=-1, keepdims=True)
    xn = x / np.linalg.norm(x, axis=-1, keepdims=True)
    return 1.0 - qn @ xn.T


@pytest.fixture
def data():
    rng = np.random.default_rng(0)
    q = rng.normal(size=(7, 33)).astype(np.float32)
    x = rng.normal(size=(50, 33)).astype(np.float32)
    return q, x


def test_pairwise_l2(data):
    q, x = data
    got = np.asarray(dist.pairwise(jnp.asarray(q), jnp.asarray(x), dist.L2))
    np.testing.assert_allclose(got, np_l2(q, x), rtol=1e-4, atol=1e-4)


def test_pairwise_cosine(data):
    q, x = data
    qn = np.asarray(dist.normalize(jnp.asarray(q)))
    xn = np.asarray(dist.normalize(jnp.asarray(x)))
    got = np.asarray(dist.pairwise(jnp.asarray(qn), jnp.asarray(xn), dist.COSINE))
    np.testing.assert_allclose(got, np_cos(q, x), rtol=1e-4, atol=1e-4)


def test_pairwise_int8_cosine(data):
    q, x = data
    st = quant.train(jnp.asarray(x))
    xq, xn = quant.quantize(st, jnp.asarray(x / np.linalg.norm(x, axis=1, keepdims=True)))
    qq, qn = quant.quantize(st, jnp.asarray(q / np.linalg.norm(q, axis=1, keepdims=True)))
    got = np.asarray(dist.pairwise(qq, xq, dist.COSINE,
                                   corpus_norms=xn, query_norms=qn))
    want = np_cos(q, x)
    assert np.abs(got - want).max() < 0.05  # quantization tolerance


def test_gathered_matches_pairwise(data):
    q, x = data
    ids = np.array([[0, 3, 5, -1], [7, 7, 2, 49]], dtype=np.int32)
    got = np.asarray(dist.gathered(jnp.asarray(x), jnp.asarray(ids),
                                   jnp.asarray(q[:2]), dist.L2))
    full = np_l2(q[:2], x)
    for b in range(2):
        for j, i in enumerate(ids[b]):
            if i < 0:
                assert np.isinf(got[b, j])
            else:
                np.testing.assert_allclose(got[b, j], full[b, i], rtol=1e-4)


def test_brute_force_topk(data):
    q, x = data
    d, i = dist.brute_force_topk(jnp.asarray(q), jnp.asarray(x), 5, dist.L2)
    want = np.argsort(np_l2(q, x), axis=1)[:, :5]
    np.testing.assert_array_equal(np.asarray(i), want)


def test_brute_force_topk_masked(data):
    q, x = data
    valid = np.zeros(50, bool)
    valid[10:20] = True
    d, i = dist.brute_force_topk(jnp.asarray(q), jnp.asarray(x), 5, dist.L2,
                                 valid=jnp.asarray(valid))
    i = np.asarray(i)
    assert ((i >= 10) & (i < 20)).all()
    want = 10 + np.argsort(np_l2(q, x)[:, 10:20], axis=1)[:, :5]
    np.testing.assert_array_equal(i, want)


def test_brute_force_topk_blocked(data):
    """Multiple blocks exercise the scan merge."""
    q, x = data
    d, i = dist.brute_force_topk(jnp.asarray(q), jnp.asarray(x), 5, dist.L2,
                                 block=16)
    want = np.argsort(np_l2(q, x), axis=1)[:, :5]
    np.testing.assert_array_equal(np.asarray(i), want)


def test_brute_force_k_exceeds_valid(data):
    q, x = data
    valid = np.zeros(50, bool)
    valid[3] = True
    d, i = dist.brute_force_topk(jnp.asarray(q), jnp.asarray(x), 5, dist.L2,
                                 valid=jnp.asarray(valid))
    i, d = np.asarray(i), np.asarray(d)
    assert (i[:, 0] == 3).all()
    assert (i[:, 1:] == -1).all()
    assert np.isinf(d[:, 1:]).all()


def test_quantize_roundtrip():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1000, 16)).astype(np.float32)
    st = quant.train(jnp.asarray(x))
    codes, norms = quant.quantize(st, jnp.asarray(x))
    back = np.asarray(quant.dequantize(st, codes))
    # 8-bit symmetric quantization: error bounded by one quantum
    quantum = float(st.abs_max) / 127.0
    inliers = np.abs(x) <= float(st.abs_max)
    assert np.abs((back - x) * inliers).max() <= quantum * 0.51 + 1e-6
    np.testing.assert_allclose(
        np.asarray(norms), np.linalg.norm(np.asarray(codes, np.float32), axis=1),
        rtol=1e-5)


def test_quantize_outlier_robust():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(5000, 8)).astype(np.float32)
    x[0, 0] = 1e6  # single outlier must not blow up the scale
    st = quant.train(jnp.asarray(x))
    assert float(st.abs_max) < 100.0
