"""HNSW engine tests: graph construction sanity + batched beam search recall."""

import numpy as np
import pytest

from deepreadmapper_tpu.index.flat import FlatIndex
from deepreadmapper_tpu.index.hnsw import HNSWFlatIndex, HNSWPQIndex
from deepreadmapper_tpu.index.hnsw_build import assign_levels, build_hnsw


@pytest.fixture(scope="module")
def small_data():
    rng = np.random.default_rng(11)
    return rng.standard_normal((2000, 64)).astype(np.float32)


def test_level_assignment_deterministic():
    a = assign_levels(1000, 16, seed=1)
    b = assign_levels(1000, 16, seed=1)
    np.testing.assert_array_equal(a, b)
    # Exponential decay: level 0 majority, few at >=2.
    assert (a == 0).mean() > 0.9
    assert a.max() <= 6


def test_centroid_levels(small_data):
    """hnswm's deterministic centroid-partition levels (hnsw.cpp:701-796):
    per-level counts follow the exponential CDF exactly, the assignment is
    RNG-free (same input -> same levels), and recall through the standard
    builder matches the RNG mode."""
    from deepreadmapper_tpu.config import BuildConfig
    from deepreadmapper_tpu.index.hnsw_build import (
        _layer_sizes,
        assign_levels_centroid,
    )

    x = small_data
    lv = assign_levels_centroid(x, m=16)
    np.testing.assert_array_equal(lv, assign_levels_centroid(x, m=16))
    sizes = _layer_sizes(x.shape[0], 16)
    assert sum(sizes) == x.shape[0]
    counts = np.bincount(lv, minlength=len(sizes))
    # level L in the nested scheme contains every node with level() >= L
    for layer in range(1, len(sizes)):
        assert counts[layer:].sum() == sum(sizes[layer:]), (
            f"layer {layer}: {counts} vs {sizes}"
        )
    # upper-level nodes are spread through the data order, not clustered
    upper = np.flatnonzero(lv >= 1)
    gaps = np.diff(upper)
    assert gaps.max() < 10 * (x.shape[0] / len(upper))

    q = x[:100] + np.float32(0.05)
    ids_o, _ = FlatIndex(x).search(q, 10)
    idx = HNSWFlatIndex.build(x, BuildConfig(level_mode="centroid"))
    ids_h, _ = idx.search(q, 10, ef=64)
    recall = np.mean([len(set(ids_o[i]) & set(ids_h[i])) / 10 for i in range(100)])
    assert recall > 0.9, f"centroid-levels recall@10 {recall:.2f}"


def test_graph_structure(small_data):
    g = build_hnsw(small_data[:500], m=8, efc=60)
    assert g.neighbors0.shape == (500, 16)
    counts = (g.neighbors0 >= 0).sum(axis=1)
    assert counts.min() >= 1, "isolated node in level-0 graph"
    assert g.entry_gid >= 0
    # Bidirectional-ish: most edges should have a reverse edge.
    fwd = {(i, int(j)) for i in range(500) for j in g.neighbors0[i] if j >= 0}
    rev_frac = np.mean([1 if (b, a) in fwd else 0 for a, b in fwd])
    assert rev_frac > 0.6


def test_hnswflat_recall(small_data):
    x = small_data
    q = x[:100] + np.float32(0.05)
    oracle = FlatIndex(x)
    ids_o, d_o = oracle.search(q, 10)
    idx = HNSWFlatIndex.build(x)
    ids_h, d_h = idx.search(q, 10, ef=64)
    recall = np.mean([len(set(ids_o[i]) & set(ids_h[i])) / 10 for i in range(100)])
    assert recall > 0.9, f"HNSW-flat recall@10 {recall:.2f}"
    # Exact distances along the way.
    row = ids_h[0, 0]
    np.testing.assert_allclose(
        d_h[0, 0], ((x[row] - q[0]) ** 2).sum(), rtol=1e-4
    )


def test_hnswpq_recall_on_real_embeddings(ecoli_embeddings):
    """Measured floors from scripts/eval_hnswpq.py: recall@10 vs the exact
    oracle is PQ8-capped at ~0.718 on this fixture (ADC ceiling 0.715); the
    graph itself must reproduce the same-codebook exhaustive-ADC candidate
    set — the FAISS-IndexHNSWPQ-equivalence measure."""
    from deepreadmapper_tpu.index.pq_flat import PQFlatIndex

    ref, q = ecoli_embeddings
    oracle = FlatIndex(ref)
    ids_o, _ = oracle.search(q, 10)
    idx = HNSWPQIndex.build(ref)
    ids_h, d_h = idx.search(q, 10, ef=128)
    recall = np.mean([len(set(ids_o[i]) & set(ids_h[i])) / 10 for i in range(len(q))])
    # ADC quantization bounds recall (measured 0.718; ceiling 0.715) — the
    # graph costs nothing.  0.68 allows build nondeterminism headroom.
    assert recall > 0.68, f"HNSWPQ recall@10 {recall:.2f}"
    assert np.all(np.diff(d_h, axis=1) >= -1e-3)
    # Candidate-set overlap vs the exhaustive ADC scan over the SAME
    # codes/codebook (measured 0.976 at ef=128, k=128).
    adc = PQFlatIndex(idx.codes, idx.codebook, idx.ntotal)
    ids_a, _ = adc.search(q, 64, exact=True)
    ids_g, _ = idx.search(q, 64, ef=128)
    overlap = np.mean(
        [len(set(ids_a[i].tolist()) & set(ids_g[i].tolist())) / 64
         for i in range(len(q))]
    )
    assert overlap > 0.9, f"HNSWPQ vs ADC-ceiling overlap@64 {overlap:.3f}"


def test_hnsw_save_load_roundtrip(small_data, tmp_path):
    x = small_data[:300]
    idx = HNSWFlatIndex.build(x)
    idx.save(str(tmp_path))
    loaded = HNSWFlatIndex.load(str(tmp_path))
    q = x[:5]
    i1, d1 = idx.search(q, 5, ef=32)
    i2, d2 = loaded.search(q, 5, ef=32)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(d1, d2, rtol=1e-6)


def test_hnsw_search_finds_self(small_data):
    """Query = database point: the point itself must be the top hit."""
    x = small_data[:800]
    idx = HNSWFlatIndex.build(x)
    probe = np.arange(0, 800, 37)
    ids, d = idx.search(x[probe], 1, ef=48)
    hit = (ids[:, 0] == probe).mean()
    assert hit > 0.95, f"self-hit rate {hit:.2f}"
    assert np.allclose(d[ids[:, 0] == probe, 0], 0.0, atol=1e-4)


def test_hnsw_effort_counters(small_data):
    """The beam search fills SEARCH-EFFORT counters (the hnswm
    distance-call profiling parity row): deterministic fixed-shape work
    per query, computed from graph shape."""
    x = small_data[:600]
    idx = HNSWFlatIndex.build(x)
    stats = {}
    ids, _ = idx.search(x[:32], 5, ef=48, stats=stats)
    assert stats["queries"] == 32
    assert stats["beam_expansions_per_query"] == 48
    assert stats["graph_degree"] == 2 * idx.graph.m
    assert (stats["neighbor_slots_scored_per_query"]
            == 48 * 2 * idx.graph.m)
    assert stats["ntotal"] == 600
    assert 0 < stats["coverage"] <= max(1.0, 48 * 2 * idx.graph.m / 600)
    # search results are unaffected by stats collection
    ids2, _ = idx.search(x[:32], 5, ef=48)
    np.testing.assert_array_equal(ids, ids2)
