"""Long-read mapping (chunk -> search -> chain, pipeline/longread.py).

The reference truncates every read to ~121 bases (preprocess.cpp:20-42);
these tests prove reads 10-100x the window length map to their true locus
by chaining per-chunk window hits — including reverse-strand geometry and
error-bearing reads."""

import numpy as np
import pytest

from deepreadmapper_tpu.pipeline.longread import (
    PAD_ID,
    chain_votes,
    chunk_read,
    map_long_reads,
)

REF_LEN = 150


def test_chunk_read_covers_tail():
    assert chunk_read(150, REF_LEN) == [0]
    assert chunk_read(100, REF_LEN) == [0]
    offs = chunk_read(400, REF_LEN)
    assert offs[0] == 0 and offs[-1] == 400 - REF_LEN
    assert all(b - a <= REF_LEN // 2 for a, b in zip(offs, offs[1:]))


def test_chain_votes_forward_consensus():
    # three chunks of a forward read starting at genome pos 1000
    offs = np.array([0, 75, 150])
    ids = np.array([
        [2 * 1000, 2 * 5000],        # chunk 0: truth + noise
        [2 * 1075, 2 * 7000],        # chunk 1: truth + noise
        [2 * 1150, 2 * 1150],        # chunk 2: truth
    ])
    d = np.ones_like(ids, dtype=np.float64)
    cids, sup, n, _cov = chain_votes(ids, d, offs, 150, 300, k=4, tol=75)
    assert n == 3
    assert cids[0] == 2 * 1000  # consensus start, forward strand
    assert sup[0] == 3.0        # every chunk's top vote agrees


def test_chain_votes_reverse_geometry():
    # read of length L=300 is revcomp(genome[500:800]): chunk at read
    # offset o (len c=150) matches the REVERSE window at 500 + 300 - o - 150
    offs = np.array([0, 150])
    L, c, s = 300, 150, 500
    ids = np.array([
        [2 * (s + L - 0 - c) + 1],
        [2 * (s + L - 150 - c) + 1],
    ])
    d = np.zeros_like(ids, dtype=np.float64)
    cids, sup, _, _cov = chain_votes(ids, d, offs, c, L, k=2, tol=75)
    assert cids[0] == 2 * s + 1
    assert sup[0] == 2.0


def test_chain_votes_repeat_splits_support():
    # an exact repeat: both loci at IDENTICAL distance must split support
    # evenly (distance-tied candidates share the top rank weight) — the
    # arbitrary ANN ordering must not forge a confident majority
    offs = np.array([0, 75])
    ids = np.array([[2 * 1000, 2 * 5000], [2 * 1075, 2 * 5075]])
    d = np.ones_like(ids, dtype=np.float64)
    cids, sup, _, _cov = chain_votes(ids, d, offs, 150, 225, k=4, tol=75)
    starts = sorted(int(c) >> 1 for c in cids[:2])
    assert starts == [1000, 5000]
    assert sup[0] == sup[1] == 2.0
    # distinct distances restore the ranked weighting
    d2 = np.array([[1.0, 2.0], [1.0, 2.0]])
    _cids, sup2, _, _ = chain_votes(ids, d2, offs, 150, 225, k=4, tol=75)
    assert sup2[0] == 2.0 and sup2[1] == 1.0


def test_chain_votes_empty():
    cids, sup, n, _cov = chain_votes(
        np.full((2, 3), -1), np.zeros((2, 3)), np.array([0, 75]), 150, 225,
        k=4, tol=75,
    )
    assert np.all(cids == PAD_ID) and sup.sum() == 0


@pytest.fixture(scope="module")
def lr_setup(tmp_path_factory):
    from deepreadmapper_tpu.index.registry import load_index
    from deepreadmapper_tpu.models.encoder import Vectorizer
    from deepreadmapper_tpu.pipeline.build import build_index

    rng = np.random.default_rng(3)
    genome = "".join(rng.choice(list("ACGT"), size=20_000))
    d = tmp_path_factory.mktemp("lr")
    ref = str(d / "ref.fna")
    with open(ref, "w") as f:
        f.write("> lr\n")
        for i in range(0, len(genome), 80):
            f.write(genome[i:i + 80] + "\n")
    vec = Vectorizer(device_batch=2048)
    prefix = str(d / "idx")
    build_index(ref, prefix, REF_LEN, index_type="INT8FLAT", vectorizer=vec)
    engine, _cfg = load_index(prefix)
    return genome, vec, engine


_COMP = str.maketrans("ACGT", "TGCA")


def _mutate(seq, rate, rng):
    out = list(seq)
    for i in rng.choice(len(out), int(len(out) * rate), replace=False):
        out[i] = rng.choice([b for b in "ACGT" if b != out[i]])
    return "".join(out)


def _write_fastq(path, reads):
    with open(path, "w") as f:
        for name, seq in reads:
            f.write(f"@{name}\n{seq}\n+\n{'I' * len(seq)}\n")


def test_pipeline_long_reads_sparse_index(lr_setup, tmp_path):
    """--long-reads end-to-end on a STRIDE-4 sparse index: sparse hit ids
    translate into base coordinates before chaining, SAM carries the
    chained start + support MAPQ."""
    import os

    from deepreadmapper_tpu.pipeline.build import build_index
    from deepreadmapper_tpu.pipeline.search import run_pipeline

    genome, vec, _engine = lr_setup
    rng = np.random.default_rng(9)
    ref = str(tmp_path / "ref.fna")
    with open(ref, "w") as f:
        f.write("> lr\n")
        for i in range(0, len(genome), 80):
            f.write(genome[i:i + 80] + "\n")
    prefix = str(tmp_path / "idx4")
    build_index(ref, prefix, REF_LEN, stride=4, index_type="INT8FLAT",
                vectorizer=vec)
    truth = [(300, 0), (8_000, 1), (14_000, 0)]
    reads = []
    for i, (s, strand) in enumerate(truth):
        seq = _mutate(genome[s:s + 1200], 0.01, rng)
        if strand:
            seq = seq.translate(_COMP)[::-1]
        reads.append((f"lr{i}", seq))
    fq = str(tmp_path / "reads.fastq")
    _write_fastq(fq, reads)
    out = str(tmp_path / "out")
    run_pipeline(prefix, fq, ref, k=4, output_dir=out, long_reads=True,
                 mapq=True, vectorizer=vec)
    ids = np.load(os.path.join(out, "indices.npy"))
    for i, (s, strand) in enumerate(truth):
        assert ids[i, 0] % 2 == strand
        assert abs(int(ids[i, 0]) // 2 - s) <= 8, (i, ids[i, 0] // 2, s)
    sam = [l.split("\t") for l in open(os.path.join(out, "results.sam"))
           if not l.startswith("@")]
    primaries = {f[0]: f for f in sam if int(f[1]) & 0x100 == 0}
    for i, (s, strand) in enumerate(truth):
        f = primaries[f"lr{i}"]
        assert (int(f[1]) & 16 == 16) == bool(strand)
        assert abs(int(f[3]) - (s + 1)) <= 8
        assert int(f[4]) >= 40  # unique locus, strong chunk consensus


def test_pipeline_long_reads_multirecord(lr_setup, tmp_path):
    """Chained placements resolve to per-chromosome RNAME/POS."""
    import os

    from deepreadmapper_tpu.pipeline.build import build_index
    from deepreadmapper_tpu.pipeline.search import run_pipeline

    genome, vec, _engine = lr_setup
    recs = [("chrA", genome[:9_000]), ("chrB", genome[9_000:])]
    ref = str(tmp_path / "multi.fna")
    with open(ref, "w") as f:
        for name, seq in recs:
            f.write(f"> {name}\n")
            for i in range(0, len(seq), 80):
                f.write(seq[i:i + 80] + "\n")
    prefix = str(tmp_path / "idxm")
    build_index(ref, prefix, REF_LEN, index_type="INT8FLAT", vectorizer=vec)
    rng = np.random.default_rng(13)
    # one read per chromosome (local starts), forward strand
    reads = [
        ("ra", _mutate(recs[0][1][2_000:3_200], 0.01, rng)),
        ("rb", _mutate(recs[1][1][4_000:5_200], 0.01, rng)),
    ]
    fq = str(tmp_path / "m.fastq")
    _write_fastq(fq, reads)
    out = str(tmp_path / "outm")
    run_pipeline(prefix, fq, ref, k=4, output_dir=out, long_reads=True,
                 vectorizer=vec)
    sam = [l.split("\t") for l in open(os.path.join(out, "results.sam"))
           if not l.startswith("@")]
    primaries = {f[0]: f for f in sam if int(f[1]) & 0x100 == 0}
    assert primaries["ra"][2] == "chrA"
    assert abs(int(primaries["ra"][3]) - 2_001) <= 5
    assert primaries["rb"][2] == "chrB"
    assert abs(int(primaries["rb"][3]) - 4_001) <= 5


def test_long_reads_on_sharded_engine(lr_setup, tmp_path):
    """The chunk batch rides the SPMD sharded search unchanged: a 2-shard
    index must chain to the same placements as the single-shard engine."""
    import os

    from deepreadmapper_tpu.pipeline.build import build_index
    from deepreadmapper_tpu.pipeline.search import run_pipeline

    genome, vec, _engine = lr_setup
    rng = np.random.default_rng(17)
    ref = str(tmp_path / "ref.fna")
    with open(ref, "w") as f:
        f.write("> lr\n")
        for i in range(0, len(genome), 80):
            f.write(genome[i:i + 80] + "\n")
    prefix = str(tmp_path / "idx_sh")
    build_index(ref, prefix, REF_LEN, index_type="INT8FLAT",
                vectorizer=vec, n_shards=2)
    truth = [(1_000, 0), (15_000, 1)]
    reads = []
    for i, (s, strand) in enumerate(truth):
        seq = _mutate(genome[s:s + 1200], 0.01, rng)
        if strand:
            seq = seq.translate(_COMP)[::-1]
        reads.append((f"s{i}", seq))
    fq = str(tmp_path / "s.fastq")
    _write_fastq(fq, reads)
    out = str(tmp_path / "out_sh")
    run_pipeline(prefix, fq, ref, k=4, output_dir=out, long_reads=True,
                 vectorizer=vec)
    ids = np.load(os.path.join(out, "indices.npy"))
    for i, (s, strand) in enumerate(truth):
        assert ids[i, 0] % 2 == strand
        assert abs(int(ids[i, 0]) // 2 - s) <= 5, (i, ids[i, 0] // 2, s)


def test_chimeric_read_gets_supplementary_alignment(lr_setup, tmp_path):
    """A chimera (two genome loci fused in one read) must yield a primary
    line for the larger segment AND a FLAG-2048 supplementary for the
    other segment, with soft-clip CIGARs marking which read interval maps
    where — and the primary's MAPQ must NOT be destroyed by its own other
    half (disjoint coverage is excluded from the competitor set)."""
    import os
    import re

    from deepreadmapper_tpu.pipeline.build import build_index
    from deepreadmapper_tpu.pipeline.search import run_pipeline

    genome, vec, _engine = lr_setup
    rng = np.random.default_rng(21)
    ref = str(tmp_path / "ref.fna")
    with open(ref, "w") as f:
        f.write("> lr\n")
        for i in range(0, len(genome), 80):
            f.write(genome[i:i + 80] + "\n")
    prefix = str(tmp_path / "idx")
    build_index(ref, prefix, REF_LEN, index_type="INT8FLAT", vectorizer=vec)
    # 900 bp from locus 2000  +  600 bp from locus 12000
    chimera = _mutate(genome[2000:2900] + genome[12_000:12_600], 0.005, rng)
    normal = _mutate(genome[6_000:7_200], 0.005, rng)
    fq = str(tmp_path / "c.fastq")
    _write_fastq(fq, [("chim", chimera), ("norm", normal)])
    out = str(tmp_path / "outc")
    run_pipeline(prefix, fq, ref, k=4, output_dir=out, long_reads=True,
                 mapq=True, vectorizer=vec)
    sam = [l.split("\t") for l in open(os.path.join(out, "results.sam"))
           if not l.startswith("@")]
    prim = {f[0]: f for f in sam if int(f[1]) & 0x900 == 0}
    supp = [f for f in sam if int(f[1]) & 0x800]
    # primary: the larger (first) segment, with its chimera half excluded
    # from the MAPQ competitor set
    assert abs(int(prim["chim"][3]) - 2_001) <= 5
    assert int(prim["chim"][4]) >= 40, prim["chim"][4]
    # supplementary: the 600 bp tail at locus 12000, soft clips ~900/0
    assert len(supp) == 1 and supp[0][0] == "chim"
    assert abs(int(supp[0][3]) - 12_001) <= 80
    m = re.fullmatch(r"(\d+)S(\d+)M(?:(\d+)S)?", supp[0][5])
    assert m, supp[0][5]
    assert abs(int(m.group(1)) - 900) <= 80   # leading clip = segment 1
    # the normal read stays clean: one primary, no supplementary
    assert prim["norm"] and not any(f[0] == "norm" for f in supp)
    # SA:Z cross-references: primary lists the supplementary and vice versa
    prim_sa = [t for t in prim["chim"] if t.startswith("SA:Z:")]
    supp_sa = [t.rstrip("\n") for t in supp[0] if t.startswith("SA:Z:")]
    assert prim_sa and supp_sa
    assert prim_sa[0].split(":")[2].split(",")[0] == supp[0][2]  # rname
    assert supp_sa[0].split(":")[2].split(",")[1] == prim["chim"][3]  # pos
    # no SA tag on the clean read's primary
    assert not any(t.startswith("SA:Z:") for t in prim["norm"])
    # @PG provenance line in the header
    hdr = [l for l in open(os.path.join(out, "results.sam"))
           if l.startswith("@")]
    assert any(l.startswith("@PG\tID:deepreadmapper_tpu") for l in hdr)


def test_long_read_banded_cigar_roundtrip(lr_setup, tmp_path):
    """--long-reads --cigar: the banded native aligner emits a real CIGAR
    whose M/I/D walk reconstructs the genome exactly, for a 1.2 kb read
    with planted indels on BOTH strands (the reference cannot align
    anything past ~121 bases)."""
    import os
    import re

    from deepreadmapper_tpu.pipeline.build import build_index
    from deepreadmapper_tpu.pipeline.search import run_pipeline

    genome, vec, _engine = lr_setup
    ref = str(tmp_path / "ref.fna")
    with open(ref, "w") as f:
        f.write("> lr\n")
        for i in range(0, len(genome), 80):
            f.write(genome[i:i + 80] + "\n")
    prefix = str(tmp_path / "idx")
    build_index(ref, prefix, REF_LEN, index_type="INT8FLAT", vectorizer=vec)

    src = genome[3000:4200]  # 1200 bases
    fwd = src[:400] + "TT" + src[400:900] + src[903:]  # 2I + 3D
    rev = fwd.translate(_COMP)[::-1]
    fq = str(tmp_path / "c.fastq")
    _write_fastq(fq, [("f", fwd), ("r", rev)])
    out = str(tmp_path / "outc")
    run_pipeline(prefix, fq, ref, k=4, output_dir=out, long_reads=True,
                 cigar=True, vectorizer=vec)
    prim = {f[0]: f for f in (
        l.rstrip("\n").split("\t") for l in open(f"{out}/results.sam")
        if not l.startswith("@"))
        if int(f[1]) & 0x900 == 0}
    for name in ("f", "r"):
        flag, pos, cigar, seq = (
            int(prim[name][1]), int(prim[name][3]), prim[name][5],
            prim[name][9],
        )
        assert (flag & 16 == 16) == (name == "r")
        tot = {"M": 0, "I": 0, "D": 0, "S": 0}
        for ln, op in re.findall(r"(\d+)([MIDS])", cigar):
            tot[op] += int(ln)
        assert tot["I"] == 2 and tot["D"] == 3, (name, cigar)
        # SEQ is reference-orientation; walk M runs against the genome
        assert seq == fwd, name
        gi, si = pos - 1, 0
        matches = total_m = 0
        for ln, op in re.findall(r"(\d+)([MIDS])", cigar):
            ln = int(ln)
            if op == "M":
                matches += sum(
                    seq[si + t] == genome[gi + t] for t in range(ln)
                )
                total_m += ln
                gi += ln
                si += ln
            elif op in ("I", "S"):
                si += ln
            else:
                gi += ln
        assert matches == total_m, (name, matches, total_m)


def test_map_long_reads_finds_true_locus(lr_setup):
    genome, vec, engine = lr_setup
    rng = np.random.default_rng(5)
    L = 1500
    starts = [200, 5_000, 11_111, 17_000]
    reads, truth = [], []
    for i, s in enumerate(starts):
        seq = _mutate(genome[s:s + L], 0.01, rng)
        if i % 2:  # odd reads map to the reverse strand
            seq = seq.translate(_COMP)[::-1]
        reads.append(seq)
        truth.append((s, i % 2))
    ids, dists, mapq, _supp = map_long_reads(
        reads, vec, engine, REF_LEN, k=4, ef=128
    )
    for i, (s, strand) in enumerate(truth):
        got = int(ids[i, 0])
        assert got != PAD_ID
        assert got & 1 == strand, (i, got)
        assert abs((got >> 1) - s) <= 5, (i, got >> 1, s)
        assert mapq[i] >= 40, (i, mapq[i])
        assert dists[i, 0] < 0.5  # majority of chunks support the call


def test_chain_votes_matches_dict_oracle():
    """The vectorized chain (lexsort+reduceat) must reproduce the dict
    formulation bit-exactly — including tie order (first-seen per-chunk
    slots, shift-0 merge precedence, stable final ranking) — across
    randomized grids, adversarial exact-ties, and degenerate shapes."""
    from deepreadmapper_tpu.pipeline.longread import _chain_votes_ref

    rng = np.random.default_rng(3)
    cases = []
    for trial in range(40):
        n_ch = int(rng.integers(1, 30))
        kc = int(rng.integers(1, 9))
        c = 150
        L = 150 + 75 * (n_ch - 1)
        offs = np.arange(n_ch) * 75
        true_start = int(rng.integers(0, 5000))
        ids = 2 * (
            true_start + offs[:, None] + rng.integers(-4, 5, (n_ch, kc))
        ) + rng.integers(0, 2, (n_ch, kc))
        noise = rng.random((n_ch, kc)) < 0.4
        ids = np.where(noise, 2 * rng.integers(0, 5000, (n_ch, kc)), ids)
        ids[rng.random((n_ch, kc)) < 0.1] = PAD_ID
        if trial % 3 == 0:
            # adversarial: quantized distances force exact rank/weight ties
            d = rng.integers(0, 3, (n_ch, kc)).astype(np.float64)
        else:
            d = rng.random((n_ch, kc))
        cases.append((ids, d, offs, c, L, int(rng.integers(1, 5)),
                      int(rng.choice([1, 20, 75]))))
    # degenerate: all-PAD, single entry
    cases.append((np.full((3, 4), PAD_ID), np.ones((3, 4)),
                  np.arange(3) * 75, 150, 300, 4, 75))
    cases.append((np.array([[2000]]), np.array([[0.5]]),
                  np.zeros(1, np.int64), 150, 150, 4, 75))
    for ids, d, offs, c, L, k, tol in cases:
        got = chain_votes(ids, d, offs, c, L, k, tol)
        want = _chain_votes_ref(ids, d, offs, c, L, k, tol)
        # float summation ORDER differs (reduceat segments vs dict-value
        # iteration): a weighted mean landing exactly on .5 may round one
        # base apart — strand + support must match, starts within 1
        g_pad, w_pad = got[0] == PAD_ID, want[0] == PAD_ID
        np.testing.assert_array_equal(g_pad, w_pad)
        np.testing.assert_array_equal(got[0][~g_pad] & 1,
                                      want[0][~w_pad] & 1)
        assert np.all(np.abs(
            (got[0][~g_pad] >> 1) - (want[0][~w_pad] >> 1)) <= 1)
        np.testing.assert_allclose(got[1], want[1], rtol=0, atol=1e-12)
        assert got[2] == want[2]
        np.testing.assert_array_equal(got[3], want[3])
