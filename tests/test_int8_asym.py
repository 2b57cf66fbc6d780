"""Asymmetric int8 serving: float query × int8 codes.

The symmetric path (reference parity: hnsw_index.go:2396-2443 scores in
the int domain, query quantized too) loses ~2-3 recall points to query
quantization on clustered data. The scan path now keeps the query float
and folds the quantizer's quantum into the serving bias (ops/scan.py
serving_bias), so the corpus's quantization is the only error source and
L2 distances come out in the real domain with no host rescale.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from kektordb_tpu.index import HNSWConfig, HNSWIndex
from kektordb_tpu.ops import distance as dist
from kektordb_tpu.ops import quantize as quant
from kektordb_tpu.ops import scan as scanlib


def clustered(n, d, seed=3, ncent=64, spread=0.25):
    rng = np.random.default_rng(seed)
    cents = rng.normal(size=(ncent, d)).astype(np.float32)
    which = rng.integers(0, ncent, size=n)
    X = cents[which] + spread * rng.normal(size=(n, d)).astype(np.float32)
    return X.astype(np.float32)


def recall_at(got_rows, gt_rows, k=10):
    return float(np.mean([
        len(set(map(int, got_rows[b, :k])) & set(map(int, gt_rows[b, :k])))
        / k for b in range(got_rows.shape[0])]))


class TestAsymmetricScan:
    def _setup(self, metric, n=4096, d=64, nq=64):
        X = clustered(n + nq, d)
        base, q = X[:n], X[n:]
        if metric == dist.COSINE:
            base = base / np.linalg.norm(base, axis=1, keepdims=True)
            q = q / np.linalg.norm(q, axis=1, keepdims=True)
        qz = quant.train(jnp.asarray(base))
        codes, cnorms = quant.quantize(qz, jnp.asarray(base))
        levels = jnp.zeros((n,), jnp.int32)
        deleted = jnp.zeros((n,), bool)
        gt_d, gt_rows = dist.brute_force_topk(
            jnp.asarray(q), jnp.asarray(base), 10, metric)
        return base, q, qz, codes, cnorms, levels, deleted, \
            np.asarray(gt_rows), np.asarray(gt_d)

    def test_asym_beats_symmetric_cosine(self):
        base, q, qz, codes, cnorms, levels, deleted, gt_rows, _ = \
            self._setup(dist.COSINE)
        # symmetric: quantized query
        qc, qn_int = quant.quantize(qz, jnp.asarray(q))
        _, sym_rows = scanlib.scan_search(
            codes, cnorms, levels, deleted, None, qc, qn_int, 10,
            metric=dist.COSINE)
        # asymmetric: float query (pre-normalized), quantum for L2 only
        qf = jnp.asarray(q)
        _, asym_rows = scanlib.scan_search(
            codes, cnorms, levels, deleted, None, qf,
            jnp.ones((q.shape[0],), jnp.float32), 10, metric=dist.COSINE,
            quantum=qz.abs_max / 127.0)
        r_sym = recall_at(np.asarray(sym_rows), gt_rows)
        r_asym = recall_at(np.asarray(asym_rows), gt_rows)
        assert r_asym >= r_sym - 1e-9
        assert r_asym >= 0.97

    def test_asym_l2_distances_real_domain(self):
        base, q, qz, codes, cnorms, levels, deleted, gt_rows, gt_d = \
            self._setup(dist.L2)
        qf = jnp.asarray(q)
        d_asym, rows = scanlib.scan_search(
            codes, cnorms, levels, deleted, None, qf,
            jnp.zeros((q.shape[0],), jnp.float32), 10, metric=dist.L2,
            quantum=qz.abs_max / 127.0)
        d_asym, rows = np.asarray(d_asym), np.asarray(rows)
        # distances must approximate REAL-domain squared L2 (no rescale):
        # compare the top hit's distance against the exact value for the
        # same row — error bounded by corpus quantization only
        v = base[rows[:, 0]]
        exact = np.sum((q - v) ** 2, axis=1)
        denom = np.maximum(exact, 1e-3)
        assert np.median(np.abs(d_asym[:, 0] - exact) / denom) < 0.05
        assert recall_at(rows, gt_rows) >= 0.95

    def test_index_level_int8_compress_asym(self):
        """compress_serving('int8') on a cosine index: search distances in
        [0, 2], recall vs f32 GT >= 0.95, and search_device scale == 1."""
        n, d = 2048, 48
        X = clustered(n + 32, d)
        X /= np.linalg.norm(X, axis=1, keepdims=True)
        base, q = X[:n], X[n:]
        idx = HNSWIndex(d, dist.COSINE,
                        config=HNSWConfig(m=8, serve_mode="scan"))
        idx.add_batch([f"v{i}" for i in range(n)], base, link=False)
        _, gt_rows = dist.brute_force_topk(
            jnp.asarray(q), jnp.asarray(base), 10, dist.COSINE)
        idx.compress_serving("int8")
        dd, rr = idx.search(q, 10)
        assert recall_at(np.asarray(rr), np.asarray(gt_rows)) >= 0.95
        assert float(np.nanmax(np.where(np.isfinite(dd), dd, 0))) <= 2.01
        res = idx.search_device(q, 10)
        assert res is not None and res[2] == 1.0

    def test_int8_symmetric_knob(self):
        """config.int8_symmetric=True restores the reference's symmetric
        int-domain scoring (the max-QPS operating point): scan results
        stay sane on cosine, and an L2 compress_serving('int8') index
        returns REAL-domain distances under both modes (symmetric scan
        rescales; search_device hands the fuser the scale)."""
        n, d = 2048, 48
        X = clustered(n + 32, d)
        Xc = X / np.linalg.norm(X, axis=1, keepdims=True)
        base, q = Xc[:n], Xc[n:]
        idx = HNSWIndex(d, dist.COSINE, precision=dist.INT8,
                        config=HNSWConfig(m=8, serve_mode="scan"))
        idx.add_batch([f"v{i}" for i in range(n)], base, link=False)
        _, gt_rows = dist.brute_force_topk(
            jnp.asarray(q), jnp.asarray(base), 10, dist.COSINE)
        d_a, r_a = idx.search(q, 10)               # asym (default)
        idx.config.int8_symmetric = True
        d_s, r_s = idx.search(q, 10)               # symmetric
        idx.config.int8_symmetric = False
        rec_a = recall_at(np.asarray(r_a), np.asarray(gt_rows))
        rec_s = recall_at(np.asarray(r_s), np.asarray(gt_rows))
        assert rec_s >= 0.85                        # sane, reference-like
        assert rec_a >= rec_s - 0.02                # asym never worse

        # L2 via compress_serving: symmetric distances rescale to real
        base2, q2 = X[:n], X[n:]
        idx2 = HNSWIndex(d, dist.L2,
                         config=HNSWConfig(m=8, serve_mode="scan"))
        idx2.add_batch([f"w{i}" for i in range(n)], base2, link=False)
        idx2.compress_serving("int8")
        d_a2, _ = idx2.search(q2, 5)
        idx2.config.int8_symmetric = True
        d_s2, _ = idx2.search(q2, 5)
        res = idx2.search_device(q2, 5)
        assert res is not None and res[2] != 1.0    # fuser gets the scale
        idx2.config.int8_symmetric = False
        # same domain: top-1 distances agree to quantization error
        a, s = np.asarray(d_a2)[:, 0], np.asarray(d_s2)[:, 0]
        fin = np.isfinite(a) & np.isfinite(s)
        assert np.allclose(a[fin], s[fin],
                           rtol=0.25, atol=0.05 * float(a[fin].mean()))

    def test_sharded_search_device_symmetric_rescale(self):
        """ShardedHNSW.search_device must hand the fuser the quantum^2
        L2 rescale under int8_symmetric, matching both its own search()
        and HNSWIndex.search_device — otherwise the device-fused
        hybrid/decay path reports quantized-domain distances (~60x off)."""
        from kektordb_tpu.parallel import ShardedHNSW
        from kektordb_tpu.parallel.sharded import make_mesh
        n, d = 1024, 32
        X = clustered(n + 16, d)
        base, q = X[:n], X[n:]
        sh = ShardedHNSW(d, dist.L2,
                         config=HNSWConfig(m=8, serve_mode="scan",
                                           chunk=256),
                         mesh=make_mesh(8))
        sh.add_batch([f"v{i}" for i in range(n)], base, link=False)
        sh.compress_serving("int8")
        sh.config.int8_symmetric = True
        try:
            d_host, _, _ = sh._search_raw(q, 5)        # rescaled on host
            res = sh.search_device(q, 5)
            assert res is not None
            d_dev, _, scale = res
            assert scale != 1.0                        # fuser gets quantum^2
            d_dev = np.asarray(d_dev) * scale
            a, b = np.asarray(d_host)[:, 0], d_dev[:, 0]
            fin = np.isfinite(a) & np.isfinite(b)
            assert fin.any()
            assert np.allclose(a[fin], b[fin], rtol=1e-4, atol=1e-4)
        finally:
            sh.config.int8_symmetric = False

    def test_beam_mode_stays_symmetric(self):
        """serve_mode beam on an int8-precision index must still work
        (int-domain gather scoring, rescale-on-search for L2 n/a here)."""
        n, d = 512, 32
        X = clustered(n + 8, d)
        X /= np.linalg.norm(X, axis=1, keepdims=True)
        idx = HNSWIndex(d, dist.COSINE, precision=dist.INT8,
                        config=HNSWConfig(m=8, serve_mode="beam"))
        idx.add_batch([f"v{i}" for i in range(n)], X[:n])
        dd, rr = idx.search(X[n:], 5, mode="beam")
        assert (rr[:, 0] >= 0).all()
        assert np.isfinite(dd[:, 0]).all()


if __name__ == "__main__":
    import sys
    sys.exit(pytest.main([__file__, "-q"]))
