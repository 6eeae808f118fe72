"""Sparse-index (stride > 1) pipeline: expansion + dedup + re-embed + rerank.

Reference semantics (src/main.cpp + post_processor.cpp): the ANN index holds
every stride-th window; hits expand to their 2*stride-1 dense neighbors, only
unique windows are re-embedded, and each query reranks its expanded candidates
by sqrt L2.  indices.npy keeps the RAW sparse hits (k_clusters columns).
"""

import numpy as np
import pytest

from deepreadmapper_tpu.models.encoder import Vectorizer


STRIDE = 4


@pytest.fixture(scope="module")
def vec():
    return Vectorizer(device_batch=2048)


@pytest.fixture(scope="module")
def sparse_index(tmp_path_factory, data_dir, vec):
    from deepreadmapper_tpu.pipeline.build import build_index

    prefix = str(tmp_path_factory.mktemp("idx") / "sparse")
    config = build_index(
        str(data_dir / "ecoli_150.fna"),
        prefix,
        ref_len=150,
        stride=STRIDE,
        index_type="FLAT",  # exact ANN isolates the post-processing logic
        vectorizer=vec,
    )
    return prefix, config


def test_sparse_vector_count(sparse_index):
    _, config = sparse_index
    # (1000 - 150)//4 + 1 = 213 windows x 2 strands.
    assert config["n_vects"] == 426
    assert config["stride"] == STRIDE


def test_sparse_pipeline_l2(sparse_index, data_dir, tmp_path, vec):
    from deepreadmapper_tpu.pipeline.search import run_pipeline

    prefix, _ = sparse_index
    k, kc = 16, 5
    res = run_pipeline(
        prefix,
        str(data_dir / "test_data.fastq"),
        str(data_dir / "ecoli_150.fna"),
        ef=64,
        k=k,
        k_clusters=kc,
        output_dir=str(tmp_path),
        vectorizer=vec,
    )
    # Raw sparse hits saved with k_clusters columns.
    idx = np.load(tmp_path / "indices.npy")
    assert idx.shape == (150, kc)
    assert idx.max() < 426

    final = res["final_ids"]
    assert final.shape == (150, k)
    # Every final id must lie in the expansion set of some sparse hit.
    for qi in range(150):
        expansions = set()
        for sid in idx[qi]:
            ap = int(sid) * STRIDE
            expansions.update(range(max(ap - STRIDE + 1, 0), ap + STRIDE))
        assert set(final[qi].tolist()) <= expansions

    # Rerank quality: embeddings of windows shifted by a couple of bases are
    # nearly identical, so L2 rerank resolves position to ~5bp, not 1bp
    # (inherent to the embed->rerank method, not an implementation artifact).
    from deepreadmapper_tpu.io.fastq import parse_fastq

    _, ids = parse_fastq(str(data_dir / "test_data.fastq"))
    true_pos = np.array([int(s.split("_")[1]) for s in ids])
    got_pos = (final[:, 0] // 2) + 1
    close = np.abs(got_pos - true_pos) <= 5
    assert close.mean() > 0.6, f"only {close.mean():.0%} map within 5bp after rerank"


def test_sparse_rerank_is_exact_l2(sparse_index, data_dir, tmp_path, vec):
    """Rerank correctness: each query's final candidates must be ITS expanded
    candidates ordered by true sqrt-L2 between the query embedding and the
    re-embedded (WRAPPED — the index's embedding space, a documented
    divergence from the reference) candidate windows — verified independently
    here by recomputing those distances from scratch for a few queries."""
    from deepreadmapper_tpu import tokenizer as tok
    from deepreadmapper_tpu.io import fasta as fasta_io
    from deepreadmapper_tpu.pipeline.search import run_pipeline

    prefix, _ = sparse_index
    res = run_pipeline(
        prefix,
        str(data_dir / "test_data.fastq"),
        str(data_dir / "ecoli_150.fna"),
        k=8,
        k_clusters=5,
        output_dir=str(tmp_path),
        write_sam=False,
        vectorizer=vec,
    )
    genome = fasta_io.extract_fasta_sequence(str(data_dir / "ecoli_150.fna"))
    from deepreadmapper_tpu.io.fastq import parse_fastq

    seqs, _ = parse_fastq(str(data_dir / "test_data.fastq"))
    q_emb = vec.vectorize(seqs)
    for qi in (0, 17, 149):
        # Recompute the full expansion independently.
        expansions = []
        for sid in res["neighbors"][qi][:5]:
            ap = int(sid) * STRIDE
            expansions.extend(
                range(max(ap - STRIDE + 1, 0), min(ap + STRIDE, 1702))
            )
        cand = np.unique(expansions)
        mat, lens = fasta_io.fetch_windows_by_id(genome, cand, 150, wrap=True)
        emb = vec.vectorize_tokens(tok.tokenize_bytes(mat, lens))
        d = np.sqrt(((emb - q_emb[qi]) ** 2).sum(1))
        dist_of = dict(zip(cand.tolist(), d.tolist()))
        got = res["final_ids"][qi]
        got_d = np.array([dist_of[int(g)] for g in got])  # raises if not in cand
        # Ascending by true distance, and the top-1 is the true argmin.
        # (Duplicate slots are possible — overlapping expansions rerank the
        # same window twice, exactly like the reference's batch_reranker.)
        assert np.all(np.diff(got_d) >= -1e-5)
        assert got_d[0] <= d.min() + 1e-5


def test_sparse_streaming_sam(sparse_index, data_dir, tmp_path, vec):
    from deepreadmapper_tpu.config import SearchConfig
    from deepreadmapper_tpu.pipeline.search import run_pipeline

    prefix, _ = sparse_index
    cfg = SearchConfig(query_batch_size=64)  # force several batches
    run_pipeline(
        prefix,
        str(data_dir / "test_data.fastq"),
        str(data_dir / "ecoli_150.fna"),
        k=8,
        k_clusters=5,
        output_dir=str(tmp_path),
        use_streaming=True,
        search_cfg=cfg,
        vectorizer=vec,
    )
    sam = (tmp_path / "results.sam").read_text().splitlines()
    n_hdr = sum(1 for line in sam if line.startswith("@"))
    assert len(sam) == n_hdr + 150 * 8
    assert n_hdr == 3  # ONE header (@HD + @SQ + @PG), not one per batch
    # Batch 2 starts at query 64; its QNAME must match read 64.
    from deepreadmapper_tpu.io.fastq import parse_fastq

    _, ids = parse_fastq(str(data_dir / "test_data.fastq"))
    assert sam[n_hdr + 64 * 8].split("\t")[0] == ids[64]


def test_streaming_equals_batch(sparse_index, data_dir, tmp_path, vec):
    """Streaming and one-shot post-processing must produce identical SAM."""
    from deepreadmapper_tpu.config import SearchConfig
    from deepreadmapper_tpu.pipeline.search import run_pipeline

    prefix, _ = sparse_index
    common = dict(
        ef=64, k=8, k_clusters=5, vectorizer=vec,
    )
    run_pipeline(
        prefix, str(data_dir / "test_data.fastq"), str(data_dir / "ecoli_150.fna"),
        output_dir=str(tmp_path / "a"), **common,
    )
    run_pipeline(
        prefix, str(data_dir / "test_data.fastq"), str(data_dir / "ecoli_150.fna"),
        output_dir=str(tmp_path / "b"), use_streaming=True,
        search_cfg=SearchConfig(query_batch_size=33), **common,
    )
    a = (tmp_path / "a" / "results.sam").read_text()
    b = (tmp_path / "b" / "results.sam").read_text()
    assert a == b
