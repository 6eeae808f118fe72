"""PQ quantization tests: training, encoding, ADC forms, recall vs oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from deepreadmapper_tpu.index.flat import FlatIndex
from deepreadmapper_tpu.index.pq_flat import PQFlatIndex
from deepreadmapper_tpu.ops import pq as pq_ops


@pytest.fixture(scope="module")
def clustered_data():
    rng = np.random.default_rng(7)
    centers = rng.standard_normal((32, 128)).astype(np.float32) * 3
    assign = rng.integers(0, 32, size=4000)
    x = centers[assign] + rng.standard_normal((4000, 128)).astype(np.float32) * 0.3
    return x.astype(np.float32)


def test_sample_training_set():
    x = np.arange(100, dtype=np.float32)[:, None]
    t = pq_ops.sample_training_set(x, 0.5)
    assert t.shape == (50, 1)
    # Every 2nd vector, evenly spaced (reference stride semantics).
    np.testing.assert_array_equal(t[:, 0], np.arange(0, 100, 2, dtype=np.float32))


def test_train_encode_reconstruct(clustered_data):
    train = pq_ops.sample_training_set(clustered_data, 0.5)
    cb = pq_ops.train_pq(train, m=8, nbits=8, iters=15)
    assert np.asarray(cb.centroids).shape == (8, 256, 16)
    codes = pq_ops.encode_pq(clustered_data, cb)
    assert codes.shape == (4000, 8) and codes.dtype == np.uint8
    recon = pq_ops.pq_reconstruct(codes, cb)
    rel = np.linalg.norm(recon - clustered_data) / np.linalg.norm(clustered_data)
    assert rel < 0.25, f"PQ reconstruction too lossy: {rel:.3f}"


def test_training_deterministic(clustered_data):
    train = pq_ops.sample_training_set(clustered_data, 0.25)
    cb1 = pq_ops.train_pq(train, iters=5, seed=42)
    cb2 = pq_ops.train_pq(train, iters=5, seed=42)
    np.testing.assert_array_equal(
        np.asarray(cb1.centroids), np.asarray(cb2.centroids)
    )


def test_adc_gather_equals_exact_reconstruction(clustered_data):
    cb = pq_ops.train_pq(clustered_data[:1000], iters=10)
    codes = pq_ops.encode_pq(clustered_data[:100], cb)
    q = clustered_data[200:216]
    tables = pq_ops.adc_tables(jnp.asarray(q), cb.centroids)
    d_adc = np.asarray(pq_ops.adc_distances_gather(tables, jnp.asarray(codes)))
    recon = pq_ops.pq_reconstruct(codes, cb)
    d_exact = ((q[:, None, :] - recon[None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(d_adc, d_exact, rtol=1e-3, atol=1e-2)


def test_adc_onehot_matches_gather(clustered_data):
    cb = pq_ops.train_pq(clustered_data[:1000], iters=10)
    codes = pq_ops.encode_pq(clustered_data[:256], cb)
    q = clustered_data[300:332]
    tables = pq_ops.adc_tables(jnp.asarray(q), cb.centroids)
    d_g = np.asarray(pq_ops.adc_distances_gather(tables, jnp.asarray(codes)))
    oh = pq_ops.codes_to_onehot(jnp.asarray(codes))
    d_o = np.asarray(pq_ops.adc_distances_onehot(tables, oh))
    # Only the table's bf16 rounding separates the two forms.
    np.testing.assert_allclose(d_o, d_g, rtol=1.5e-2, atol=0.5)


def test_pqflat_recall_on_real_embeddings(ecoli_embeddings):
    """Recall gate on the REAL embedding distribution (ecoli windows/reads):
    PQ 8x8 must place >75% of the true top-10 in its top-10 and >95% in its
    top-30 (the pipeline then exact-reranks, so candidate recall is what
    matters)."""
    ref, q = ecoli_embeddings
    oracle = FlatIndex(ref)
    ids_o, _ = oracle.search(q, 10)
    pqi = PQFlatIndex.build(ref)
    ids_p, d_p = pqi.search(q, 30)
    r10 = np.mean([len(set(ids_o[i]) & set(ids_p[i][:10])) / 10 for i in range(len(q))])
    r30 = np.mean([len(set(ids_o[i]) & set(ids_p[i][:30])) / 10 for i in range(len(q))])
    assert r10 > 0.75, f"recall@10 {r10:.2f}"
    assert r30 > 0.95, f"top10-in-top30 {r30:.2f}"
    assert np.all(np.diff(d_p, axis=1) >= -1e-3)


def test_pqflat_synthetic_candidate_recall(clustered_data):
    """On adversarial data (in-cluster separations below quantization error)
    PQ still keeps the true top-10 inside a modest candidate list."""
    x = clustered_data
    q = x[:64] + 0.01
    oracle = FlatIndex(x)
    ids_o, _ = oracle.search(q, 10)
    pqi = PQFlatIndex.build(x)
    ids_p, _ = pqi.search(q, 200)
    recall = np.mean([
        len(set(ids_o[i]) & set(ids_p[i])) / 10 for i in range(len(q))
    ])
    assert recall > 0.8, f"top10-in-top200 {recall:.2f} too low"


def test_pqflat_save_load_roundtrip(clustered_data, tmp_path):
    pqi = PQFlatIndex.build(clustered_data[:500])
    pqi.save(str(tmp_path))
    loaded = PQFlatIndex.load(str(tmp_path))
    q = clustered_data[600:608]
    i1, d1 = pqi.search(q, 5)
    i2, d2 = loaded.search(q, 5)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(d1, d2, rtol=1e-6)


def test_pqflat_small_n_padding():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((37, 128)).astype(np.float32)
    pqi = PQFlatIndex.build(x)
    ids, d = pqi.search(x[:3], 50)
    # k > ntotal: valid results then -1/inf padding.
    assert ids.shape == (3, 50)
    assert np.all(ids[:, :37] >= 0)
    assert np.all(ids[:, 37:] == -1)
    assert np.all(np.isinf(d[:, 37:]))


def test_pqflat_exact_matches_reconstruction_oracle(clustered_data):
    """search(exact=True) — the parity oracle — must order exactly like a
    brute-force L2 scan against the int8-quantized reconstructions, with
    bit-matching distances (all terms exact integers times scale^2)."""
    x = clustered_data[:1200]
    pqi = PQFlatIndex.build(x)
    q = clustered_data[1500:1532]
    ids, d = pqi.search(q, 10, exact=True)
    cb8 = pqi.cb8
    recon8 = np.concatenate(
        [cb8.cent8[j][pqi.codes[:, j].astype(np.int64)] for j in range(8)],
        axis=1,
    ).astype(np.float32)
    sq = max(np.float32(cb8.scale),
             np.float32(np.abs(q).max()) / np.float32(127))
    q8 = np.clip(np.round(q / sq), -127, 127).astype(np.float32)
    # oracle in the same mixed-scale quantized metric
    r = np.float32(sq / np.float32(cb8.scale))
    s = (r * r * (q8**2).sum(1)[:, None]
         + (recon8**2).sum(1)[None, :]
         - 2 * r * (q8 @ recon8.T))
    order = np.argsort(s, axis=1, kind="stable")[:, :10]
    np.testing.assert_array_equal(ids, order)
    np.testing.assert_allclose(
        d, np.take_along_axis(s, order, 1) * np.float32(cb8.scale) ** 2,
        rtol=1e-6,
    )


def test_pqflat_outlier_queries_not_clipped(clustered_data):
    """Queries far outside the codebook range must still rank their true
    nearest reconstruction first (the old fixed-scale clipping destroyed
    the ordering for out-of-range dims)."""
    x = clustered_data[:1000]
    pqi = PQFlatIndex.build(x)
    # scale queries 8x beyond the data range: nearest row is preserved
    q = x[:16] * 8.0
    ids, _ = pqi.search(q, 5, exact=True)
    recon = pq_ops.pq_reconstruct(pqi.codes, pqi.codebook)
    oracle = np.argmin(
        ((q[:, None, :] - recon[None, :, :]) ** 2).sum(-1), axis=1
    )
    # top-1 must match the unquantized-query-vs-reconstruction oracle for
    # a clear majority (int8 granularity of the scaled queries allows a few
    # near-tie swaps; the broken clipping path got essentially none right)
    agree = (ids[:, 0] == oracle).mean()
    assert agree >= 0.75, f"top-1 agreement {agree:.2f}"


def test_opq_orthogonal_and_beats_pq_on_anisotropic_data():
    """OPQ's rotation must be orthogonal (metric-preserving), and on data
    whose variance is concentrated in a few correlated directions (where
    subspace-independent PQ is weakest) OPQ must cut reconstruction error
    and improve candidate recall."""
    rng = np.random.default_rng(3)
    # anisotropic: low-rank mixing concentrates variance across subspaces
    mix = rng.standard_normal((128, 128)).astype(np.float32)
    mix = mix @ np.diag(np.linspace(2.0, 0.05, 128)).astype(np.float32)
    x = (rng.standard_normal((4000, 128)).astype(np.float32) @ mix)
    x /= np.abs(x).max()

    from deepreadmapper_tpu.config import BuildConfig
    from deepreadmapper_tpu.index.flat import FlatIndex

    cb, rot = pq_ops.train_opq(x[:2000], iters=6, pq_iters=6)
    np.testing.assert_allclose(rot @ rot.T, np.eye(128), atol=1e-4)

    cb0 = pq_ops.train_pq(x[:2000], iters=12)
    err0 = np.linalg.norm(
        pq_ops.pq_reconstruct(pq_ops.encode_pq(x, cb0), cb0) - x
    )
    err1 = np.linalg.norm(
        pq_ops.pq_reconstruct(pq_ops.encode_pq(x @ rot, cb), cb) - x @ rot
    )
    assert err1 < err0 * 0.95, f"OPQ recon {err1:.1f} vs PQ {err0:.1f}"

    oracle = FlatIndex(x)
    ids_o, _ = oracle.search(x[:128] + 0.001, 10)
    pq_plain = PQFlatIndex.build(x)
    pq_opq = PQFlatIndex.build(x, BuildConfig(opq=True, opq_iters=6))
    assert pq_opq.rot is not None
    r_plain = np.mean([
        len(set(ids_o[i]) & set(pq_plain.search(x[:128] + 0.001, 30)[0][i]))
        for i in range(128)
    ]) / 10
    r_opq = np.mean([
        len(set(ids_o[i]) & set(pq_opq.search(x[:128] + 0.001, 30)[0][i]))
        for i in range(128)
    ]) / 10
    assert r_opq >= r_plain - 0.02, f"OPQ {r_opq:.3f} vs PQ {r_plain:.3f}"


def test_opq_save_load_roundtrip(clustered_data, tmp_path):
    from deepreadmapper_tpu.config import BuildConfig

    pqi = PQFlatIndex.build(clustered_data[:600],
                            BuildConfig(opq=True, opq_iters=3))
    pqi.save(str(tmp_path))
    loaded = PQFlatIndex.load(str(tmp_path))
    assert loaded.rot is not None
    np.testing.assert_array_equal(loaded.rot, pqi.rot)
    q = clustered_data[700:708]
    i1, d1 = pqi.search(q, 5)
    i2, d2 = loaded.search(q, 5)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(d1, d2, rtol=1e-6)


@pytest.mark.parametrize("m,nbits", [(8, 6), (16, 8), (4, 8)])
def test_pqflat_nondefault_configs(clustered_data, m, nbits):
    """Engine correctness for non-default (m_pq, nbits): ksub/dsub are
    derived from shapes everywhere (a hard-coded ksub=256 once crashed the
    oracle path for nbits != 8)."""
    from deepreadmapper_tpu.config import BuildConfig
    from deepreadmapper_tpu.index.flat import FlatIndex

    x = clustered_data[:1500]
    cfg = BuildConfig(m_pq=m, nbits=nbits, kmeans_iters=8)
    pqi = PQFlatIndex.build(x, cfg)
    assert pqi.codes.shape == (1500, m)
    assert np.asarray(pqi.codebook.centroids).shape == (m, 1 << nbits, 128 // m)
    q = clustered_data[1600:1624]
    ids, d = pqi.search(q, 10)
    ids_e, d_e = pqi.search(q, 10, exact=True)
    np.testing.assert_array_equal(ids, ids_e)  # CPU default == exact oracle
    assert np.all(np.diff(d, axis=1) >= -1e-3)
    # candidate quality sanity vs exact search
    oracle = FlatIndex(x)
    ids_o, _ = oracle.search(q, 5)
    rec = np.mean([len(set(ids_o[i]) & set(ids[i])) / 5 for i in range(len(q))])
    # mechanical-correctness gate only: nbits=6 is legitimately coarse on
    # this adversarial fixture (in-cluster separations below quant error)
    assert rec > 0.25, f"recall {rec:.2f}"
