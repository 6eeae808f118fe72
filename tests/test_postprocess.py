"""Post-processing unit tests: expansion/dedup semantics + rerank paths."""

import numpy as np
import pytest

from deepreadmapper_tpu.pipeline import postprocess as pp


def _reference_expand(sparse_ids, stride, bound):
    """Transliteration of find_sequences' expansion loop
    (post_processor.cpp:115-136): per sparse id, dense ids
    [max(ap-s+1,0), min(ap+s, bound)) with ap = id*stride."""
    out = []
    for sid in sparse_ids:
        ap = sid * stride
        if ap >= bound:
            continue
        start = ap - stride + 1 if ap >= stride - 1 else 0
        out.extend(range(start, min(ap + stride, bound)))
    return out


def test_expand_matches_reference_semantics():
    neighbors = np.array([[3, 7, 2], [0, 1, 5]])
    stride, bound = 4, 40
    cand, valid = pp.expand_candidates(neighbors, stride, bound, k_clusters=3)
    assert cand.shape == (2, 3 * (2 * 4 - 1))
    for q in range(2):
        got = [int(x) for x in cand[q] if x >= 0]
        want = _reference_expand(neighbors[q], stride, bound)
        assert got == want


def test_expand_clips_at_bounds():
    neighbors = np.array([[0, 9]])
    cand, _ = pp.expand_candidates(neighbors, stride=4, bound=38, k_clusters=2)
    got = [int(x) for x in cand[0] if x >= 0]
    # id 0 -> ap 0 -> [0, 4); id 9 -> ap 36 -> [33, 38) clipped at bound.
    assert got == [0, 1, 2, 3, 33, 34, 35, 36, 37]


def test_unique_pool_mapping():
    cand = np.array([[3, 5, 3, -1], [5, 0, -1, 3]])
    uniq, pool_idx = pp.unique_pool(cand)
    np.testing.assert_array_equal(uniq, [0, 3, 5])
    np.testing.assert_array_equal(pool_idx, [[1, 2, 1, -1], [2, 0, -1, 1]])


def test_invariant_raises():
    with pytest.raises(ValueError, match="Final k"):
        pp.check_invariant(k=128, k_clusters=5, stride=2)
    # The REAL candidate count is k_clusters*(2s-1): the reference's
    # k <= kc*2s bound admits ks that crash downstream; stride=13 gives
    # 5*25=125 < 128 and must now raise, stride=14 gives 135 and passes.
    with pytest.raises(ValueError, match="Final k"):
        pp.check_invariant(k=128, k_clusters=5, stride=13)
    pp.check_invariant(k=128, k_clusters=5, stride=14)
    pp.check_invariant(k=128, k_clusters=5, stride=1)  # dense: no check


def test_dense_passthrough():
    nb = np.arange(12).reshape(2, 6)
    ds = np.arange(12, dtype=np.float32).reshape(2, 6)
    ids, dist = pp.post_process_l2(nb, ds, None, None, stride=1, k=4, k_clusters=4, bound=100)
    np.testing.assert_array_equal(ids, nb[:, :4])
    np.testing.assert_array_equal(dist, ds[:, :4])


def test_sparse_l2_rerank_exact():
    """Hand-built geometry: sparse rerank must pick the truly closest dense
    windows by sqrt L2 against the pool embeddings."""
    rng = np.random.default_rng(0)
    dim = 16
    pool = rng.standard_normal((64, dim)).astype(np.float32)

    def embed_windows(ids):
        return pool[ids]

    q_emb = pool[10][None, :] + 0.01  # query sits next to window 10
    stride = 3
    neighbors = np.array([[3, 5]])  # ap 9 -> [7..11], ap 15 -> [13..17]
    ids, dists = pp.post_process_l2(
        neighbors, None, q_emb, embed_windows, stride, k=4, k_clusters=2, bound=64
    )
    # Expanded candidates: 7..11 and 13..17; closest must be window 10.
    assert ids[0, 0] == 10
    expected = sorted(
        range(7, 12), key=lambda w: np.linalg.norm(pool[w] - q_emb[0])
    )
    assert ids[0, 0] == expected[0]
    # Distances ascending, sqrt'd L2 (reference reranker convention).
    assert np.all(np.diff(dists[0]) >= 0)
    assert dists[0, 0] == pytest.approx(
        np.linalg.norm(pool[10] - q_emb[0]), rel=1e-5
    )


def test_sparse_sw_rerank():
    """SW rerank picks the candidate window whose sequence matches the query."""
    genome = np.frombuffer(
        b"AAAAAAAAAATTTTCCCGTACAAGAGAAGATGGTAGAAAAAAAAAACCCC", np.uint8
    ).copy()
    from deepreadmapper_tpu.io import fasta as fasta_io
    from deepreadmapper_tpu.tokenizer import strings_to_bytes

    ref_len = 20
    bound = 2 * (genome.size - ref_len + 1)

    def fetch(ids):
        return fasta_io.fetch_windows_by_id(genome, ids, ref_len, max_len=ref_len)

    # Query = exact window at pos 10 (dense id 20), wrapped like a read.
    true_window = genome[10:30].tobytes().decode()
    q_mat, q_lens = strings_to_bytes(["<" + true_window + ">"])
    # Sparse neighbors around it at stride 4: sparse id 5 -> ap 20.
    neighbors = np.array([[5, 2]])
    ids, scores = pp.post_process_sw(
        neighbors, q_mat, q_lens, fetch, stride=4, k=3, k_clusters=2, bound=bound
    )
    assert ids[0, 0] == 20  # the true window wins
    assert scores[0, 0] == ref_len  # perfect match = +1 * ref_len
