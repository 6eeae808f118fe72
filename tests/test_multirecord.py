"""Multi-record (multi-chromosome) reference support.

Window ids are assigned record-by-record at build time, but candidate
fetching/rerank addresses a concatenated base stream — the per-record window
tables (io.fasta.record_window_table) translate between the two and confine
sparse expansion to each hit's record.  These tests build a 3-chromosome
reference and verify the id algebra end-to-end (raw ANN ids, reranked sparse
results, per-chromosome SAM output).
"""

import numpy as np
import pytest

from deepreadmapper_tpu.io import fasta as fasta_io


@pytest.fixture(scope="module")
def multiref(tmp_path_factory):
    rng = np.random.default_rng(21)
    bases = np.array(list("ACGT"))
    lens = [1500, 1200, 2000]
    seqs = ["".join(bases[rng.integers(0, 4, n)]) for n in lens]
    path = tmp_path_factory.mktemp("mr") / "multi.fna"
    with open(path, "w") as f:
        for i, s in enumerate(seqs):
            f.write(f">chr{i+1} synthetic record {i+1}\n")
            for j in range(0, len(s), 70):
                f.write(s[j : j + 70] + "\n")
    return str(path), seqs


def _simulate(seqs, n_reads, read_len, rng):
    comp = str.maketrans("ACGT", "TGCA")
    reads, truth = [], []
    for i in range(n_reads):
        r = rng.integers(0, len(seqs))
        s = int(rng.integers(0, len(seqs[r]) - read_len + 1))
        st = int(rng.integers(0, 2))
        rd = seqs[r][s : s + read_len]
        if st:
            rd = rd.translate(comp)[::-1]
        reads.append(rd)
        truth.append((r, s, st))
    return reads, truth


def test_record_window_table_and_translation(multiref):
    path, seqs = multiref
    records = fasta_io.parse_fasta_records(path)
    assert [len(r) for r in records] == [1500, 1200, 2000]
    assert fasta_io.parse_fasta_names(path) == ["chr1", "chr2", "chr3"]
    win_off, base_off = fasta_io.record_window_table(records, 150, 1)
    assert list(win_off) == [0, 1351, 1351 + 1051, 1351 + 1051 + 1851]
    assert list(base_off) == [0, 1500, 2700, 4700]
    # a window id in chr2 translates to the concatenated position
    wid = win_off[1] + 100  # chr2, local window 100
    ids = np.array([2 * wid + 1, -1], dtype=np.int64)
    t = fasta_io.translate_window_ids(ids, win_off, base_off)
    assert t[0] == 2 * (1500 + 100) + 1
    assert t[1] == -1


def test_multirecord_dense_pipeline(multiref, tmp_path):
    from deepreadmapper_tpu.models.encoder import Vectorizer
    from deepreadmapper_tpu.pipeline.build import build_index
    from deepreadmapper_tpu.pipeline.search import run_pipeline

    path, seqs = multiref
    rng = np.random.default_rng(5)
    reads, truth = _simulate(seqs, 60, 150, rng)
    fq = str(tmp_path / "reads.fastq")
    with open(fq, "w") as f:
        for i, r in enumerate(reads):
            f.write(f"@r{i}\n{r}\n+\n{'I'*150}\n")

    vec = Vectorizer(device_batch=2048)
    prefix = str(tmp_path / "idx")
    config = build_index(path, prefix, 150, stride=1, index_type="FLAT",
                         vectorizer=vec)
    records = fasta_io.parse_fasta_records(path)
    win_off, _ = fasta_io.record_window_table(records, 150, 1)
    assert config["n_vects"] == 2 * win_off[-1]

    out = str(tmp_path / "out")
    run_pipeline(prefix, fq, path, k=4, output_dir=out, vectorizer=vec)
    ids = np.load(f"{out}/indices.npy")
    hits = 0
    for i, (r, s, st) in enumerate(truth):
        want = 2 * (win_off[r] + s) + st
        if ids[i, 0] == want:
            hits += 1
    assert hits >= 55, f"{hits}/60 exact dense hits"

    # SAM: per-chromosome RNAME + record-local POS
    sam = open(f"{out}/results.sam").read().splitlines()
    sq = [l for l in sam if l.startswith("@SQ")]
    assert [l.split("\t")[1] for l in sq] == ["SN:chr1", "SN:chr2", "SN:chr3"]
    assert [l.split("\t")[2] for l in sq] == ["LN:1500", "LN:1200", "LN:2000"]
    aligns = [l for l in sam if not l.startswith("@")]
    ok = 0
    for i, (r, s, st) in enumerate(truth):
        fields = aligns[i * 4].split("\t")  # primary line for read i
        if fields[2] == f"chr{r+1}" and int(fields[3]) == s + 1:
            ok += 1
    assert ok >= 55, f"{ok}/60 SAM records on the right chromosome/position"


def test_multirecord_sparse_rerank(multiref, tmp_path):
    """Sparse (stride 4) pipeline on 3 chromosomes: expansion must stay
    within each record and reranked ids must land on the true record."""
    from deepreadmapper_tpu.models.encoder import Vectorizer
    from deepreadmapper_tpu.pipeline.build import build_index
    from deepreadmapper_tpu.pipeline.search import run_pipeline

    path, seqs = multiref
    rng = np.random.default_rng(9)
    reads, truth = _simulate(seqs, 60, 150, rng)
    fq = str(tmp_path / "reads.fastq")
    with open(fq, "w") as f:
        for i, r in enumerate(reads):
            f.write(f"@r{i}\n{r}\n+\n{'I'*150}\n")

    vec = Vectorizer(device_batch=2048)
    prefix = str(tmp_path / "idx4")
    build_index(path, prefix, 150, stride=4, index_type="FLAT",
                vectorizer=vec)
    out = str(tmp_path / "out4")
    res = run_pipeline(prefix, fq, path, k=8, k_clusters=8, output_dir=out,
                       vectorizer=vec, write_sam=False)
    records = fasta_io.parse_fasta_records(path)
    win_off, _ = fasta_io.record_window_table(records, 150, 1)
    fid = res["final_ids"]
    assert np.all(fid[:, 0] >= 0)
    assert np.all(fid[:, 0] < 2 * win_off[-1])
    hits = 0
    for i, (r, s, st) in enumerate(truth):
        wid = int(fid[i, 0]) // 2
        rr = int(np.searchsorted(win_off, wid, side="right")) - 1
        pos = wid - win_off[rr]
        if rr == r and abs(pos - s) <= 2 and int(fid[i, 0]) % 2 == st:
            hits += 1
    assert hits >= 48, f"{hits}/60 sparse reranked hits on the right record"
