"""Paired-end mapping (pipeline/paired.py + run_pipeline_paired).

The reference maps every read independently (its fixture reads even carry
wgsim /1 suffixes it ignores).  Proper-pair resolution fixes orientation,
fills the paired SAM vocabulary, and disambiguates repeats through the
mate."""

import os

import numpy as np
import pytest

from deepreadmapper_tpu.pipeline.paired import resolve_pairs

REF_LEN = 150
_COMP = str.maketrans("ACGT", "TGCA")


def test_resolve_picks_proper_fr_pair_over_better_noise():
    # R1's best single-end hit (distance 1) has no FR mate; the pair at
    # distance 2+2 is proper and must win the primary slot
    ids1 = np.array([[2 * 9000, 2 * 1000]])          # fwd@9000, fwd@1000
    d1 = np.array([[1.0, 2.0]])
    ids2 = np.array([[2 * 1300 + 1, 2 * 5000]])      # rev@1300, fwd@5000
    d2 = np.array([[2.0, 1.5]])
    out = resolve_pairs(ids1, d1, ids2, d2, [150], [150], max_isize=1000,
                        ref_len=REF_LEN)
    assert out["proper"][0]
    assert out["a_id"][0] == 2 * 1000 and out["b_id"][0] == 2 * 1300 + 1
    assert out["tlen"][0] == 1300 + 150 - 1000  # outer span, R1 positive


def test_resolve_rejects_wrong_orientation_and_distance():
    # same strand / too far -> no proper pair; fall back to each end's top
    ids1 = np.array([[2 * 1000], [2 * 1000]])
    d1 = np.array([[1.0], [1.0]])
    ids2 = np.array([[2 * 1300], [2 * 90000 + 1]])
    d2 = np.array([[1.0], [1.0]])
    out = resolve_pairs(ids1, d1, ids2, d2, [150, 150], [150, 150],
                        max_isize=1000, ref_len=REF_LEN)
    assert not out["proper"].any()
    assert (out["tlen"] == 0).all()
    assert out["a_id"][0] == 2 * 1000


def test_pair_mapq_disambiguates_repeat():
    # R1 ties two loci exactly (a repeat) but only locus 1000 has an FR
    # mate: the pair is unique -> high pair MAPQ where single-end gives 0
    ids1 = np.array([[2 * 1000, 2 * 7000]])
    d1 = np.array([[1.0, 1.0]])
    ids2 = np.array([[2 * 1400 + 1]])
    d2 = np.array([[1.0]])
    out = resolve_pairs(ids1, d1, ids2, d2, [150], [150], max_isize=1000,
                        ref_len=REF_LEN)
    assert out["proper"][0] and out["a_id"][0] == 2 * 1000
    assert out["mapq1"][0] == 60 and out["mapq2"][0] == 60


def test_dovetail_rf_pairs_are_not_proper():
    # reverse mate LEFT of the forward read ("outie"): must not be proper
    ids1 = np.array([[2 * 1000]])
    d1 = np.array([[1.0]])
    ids2 = np.array([[2 * 900 + 1]])
    d2 = np.array([[1.0]])
    out = resolve_pairs(ids1, d1, ids2, d2, [150], [150], max_isize=1000,
                        ref_len=REF_LEN)
    assert not out["proper"][0]


def test_per_end_mapq_tandem_repeat_mate():
    # R1 unique; R2 exact-ties two tandem loci both within max_isize:
    # R1 keeps 60, R2 drops to 0 — per-end margins, not one shared value
    ids1 = np.array([[2 * 1000]])
    d1 = np.array([[1.0]])
    ids2 = np.array([[2 * 1300 + 1, 2 * 1600 + 1]])
    d2 = np.array([[1.0, 1.0]])
    out = resolve_pairs(ids1, d1, ids2, d2, [150], [150], max_isize=1000,
                        ref_len=REF_LEN)
    assert out["proper"][0]
    assert out["mapq1"][0] == 60
    assert out["mapq2"][0] == 0


def test_cross_record_pairs_are_not_proper():
    dense_off = np.array([0, 1200, 3000])  # record boundary at window 1200
    ids1 = np.array([[2 * 1150]])          # end of record 0
    d1 = np.array([[1.0]])
    ids2 = np.array([[2 * 1250 + 1]])      # start of record 1, FR-plausible
    d2 = np.array([[1.0]])
    out = resolve_pairs(ids1, d1, ids2, d2, [150], [150], max_isize=1000,
                        ref_len=REF_LEN, dense_off=dense_off)
    assert not out["proper"][0]


@pytest.fixture(scope="module")
def pe_setup(tmp_path_factory):
    from deepreadmapper_tpu.models.encoder import Vectorizer
    from deepreadmapper_tpu.pipeline.build import build_index

    rng = np.random.default_rng(7)
    g = rng.choice(list("ACGT"), size=20_000)
    g[15_000:15_150] = g[2_000:2_150]  # repeat copy of R1 site for pair 1
    genome = "".join(g)
    d = tmp_path_factory.mktemp("pe")
    ref = str(d / "ref.fna")
    with open(ref, "w") as f:
        f.write("> pe\n")
        for i in range(0, len(genome), 80):
            f.write(genome[i:i + 80] + "\n")
    vec = Vectorizer(device_batch=2048)
    prefix = str(d / "idx")
    build_index(ref, prefix, REF_LEN, index_type="FLAT", vectorizer=vec)
    return genome, vec, prefix, ref


def _fq(path, reads):
    with open(path, "w") as f:
        for name, seq in reads:
            f.write(f"@{name}\n{seq}\n+\n{'I' * len(seq)}\n")


def test_paired_with_sw_rerank(pe_setup, tmp_path):
    """--paired2 --rerank sw: pairing must run on NEGATED SW scores
    (ascending-better) — the proper pair still wins and MAPQ stays sane."""
    from deepreadmapper_tpu.pipeline.search import run_pipeline_paired

    genome, vec, prefix, ref = pe_setup
    isize, s = 500, 6_000
    f1 = str(tmp_path / "r1.fastq")
    f2 = str(tmp_path / "r2.fastq")
    _fq(f1, [("p0", genome[s:s + REF_LEN])])
    _fq(f2, [("p0", genome[s + isize - REF_LEN:s + isize]
              .translate(_COMP)[::-1])])
    out = str(tmp_path / "out")
    res = run_pipeline_paired(
        prefix, f1, f2, ref, k=8, output_dir=out, mapq=True,
        rerank="sw", vectorizer=vec, max_isize=800,
    )
    assert res["n_proper"] == 1
    prim = [l.split("\t") for l in open(os.path.join(out, "results.sam"))
            if not l.startswith("@") and int(l.split("\t")[1]) & 0x900 == 0]
    poss = sorted(int(f[3]) for f in prim)
    assert poss == [s + 1, s + isize - REF_LEN + 1]
    assert all(int(f[4]) >= 40 for f in prim)


def test_cli_interleaved_paired(pe_setup, tmp_path):
    """--paired-interleaved splits an interleaved FASTQ and maps as pairs."""
    from deepreadmapper_tpu import cli

    genome, _vec, prefix, ref = pe_setup
    isize = 500
    s = 6_000
    r1 = genome[s:s + REF_LEN]
    r2 = genome[s + isize - REF_LEN:s + isize].translate(_COMP)[::-1]
    inter = str(tmp_path / "inter.fastq")
    with open(inter, "w") as f:
        f.write(f"@p0\n{r1}\n+\n{'I' * REF_LEN}\n")
        f.write(f"@p0\n{r2}\n+\n{'I' * REF_LEN}\n")
    out = str(tmp_path / "out")
    rc = cli.main(["pipeline", prefix, inter, ref, "64", "8", "5", out,
                   "--paired-interleaved"])
    assert rc == 0
    flags = sorted(
        int(l.split("\t")[1])
        for l in open(os.path.join(out, "results.sam"))
        if not l.startswith("@") and int(l.split("\t")[1]) & 0x900 == 0
    )
    assert flags == [99, 147]


def test_rescue_mates_unit(pe_setup):
    from deepreadmapper_tpu.pipeline.paired import PAD_ID, rescue_mates

    genome, _vec, _prefix, _ref = pe_setup
    g = np.frombuffer(genome.encode(), np.uint8)
    anchor = np.array([2 * 6000])            # R1 fwd @ 6000
    mate = genome[6350:6500].translate(_COMP)[::-1]
    ids, scores = rescue_mates(anchor, [mate], np.array([150]), g,
                               max_isize=800)
    assert ids[0] != PAD_ID
    assert ids[0] & 1 == 1
    assert abs((ids[0] >> 1) - 6350) <= 2
    assert scores[0] >= 140  # near-perfect SW identity

    # junk mate: nothing reaches the identity threshold
    rng = np.random.default_rng(0)
    junk = "".join(rng.choice(list("ACGT"), size=150))
    ids2, _ = rescue_mates(anchor, [junk], np.array([150]), g,
                           max_isize=800)
    assert ids2[0] == PAD_ID

    # reverse anchor: mate expected FORWARD to the LEFT
    anchor_r = np.array([2 * 6000 + 1])
    mate_f = genome[5500:5650]
    ids3, _ = rescue_mates(anchor_r, [mate_f], np.array([150]), g,
                           max_isize=800)
    assert ids3[0] != PAD_ID and ids3[0] & 1 == 0
    assert abs((ids3[0] >> 1) - 5500) <= 2


def test_pipeline_mate_rescue_recovers_embedding_miss(pe_setup, tmp_path):
    """A mate whose EMBEDDED prefix is garbage (100 junk bases before the
    real sequence — the encoder only sees ~121 bases) cannot be found by
    the vector search, but the SW scan next to its anchored mate recovers
    the placement and the pair goes proper."""
    from deepreadmapper_tpu.pipeline.search import run_pipeline_paired

    genome, vec, prefix, ref = pe_setup
    rng = np.random.default_rng(3)
    junk = "".join(rng.choice(list("ACGT"), size=100))
    r1 = [("m0", genome[6000:6150])]
    r2 = [("m0", junk + genome[6350:6500].translate(_COMP)[::-1])]
    f1 = str(tmp_path / "r1.fastq")
    f2 = str(tmp_path / "r2.fastq")
    _fq(f1, r1)
    _fq(f2, r2)
    out = str(tmp_path / "out")
    res = run_pipeline_paired(
        prefix, f1, f2, ref, k=4, output_dir=out, mapq=True,
        vectorizer=vec, max_isize=800,
    )
    assert res["n_proper"] == 1
    lines = [l.split("\t") for l in open(os.path.join(out, "results.sam"))
             if not l.startswith("@")]
    prim = {bool(int(f[1]) & 0x80): f for f in lines
            if int(f[1]) & 0x900 == 0}
    a, b = prim[False], prim[True]
    assert int(a[1]) & 0x2 and int(b[1]) & 0x2
    assert int(b[1]) & 0x10  # rescued mate on the reverse strand
    assert abs(int(b[3]) - 6351) <= 110  # within the soft-clip tolerance
    assert 1 <= int(b[4]) <= 40  # rescued MAPQ is SW-identity-scaled

    # without rescue the pair stays improper
    res2 = run_pipeline_paired(
        prefix, f1, f2, ref, k=4, output_dir=str(tmp_path / "out2"),
        vectorizer=vec, max_isize=800, rescue=False, write_sam=False,
    )
    assert res2["n_proper"] == 0


def test_paired_pipeline_end_to_end(pe_setup, tmp_path):
    from deepreadmapper_tpu.pipeline.search import run_pipeline_paired

    genome, vec, prefix, ref = pe_setup
    isize = 500
    # pair 0: unique site; pair 1: R1 from a REPEATED site, mate unique
    starts = [6_000, 2_000]
    r1, r2 = [], []
    for i, s in enumerate(starts):
        r1.append((f"p{i}", genome[s:s + REF_LEN]))
        mate = genome[s + isize - REF_LEN:s + isize]
        r2.append((f"p{i}", mate.translate(_COMP)[::-1]))
    f1 = str(tmp_path / "r1.fastq")
    f2 = str(tmp_path / "r2.fastq")
    _fq(f1, r1)
    _fq(f2, r2)
    out = str(tmp_path / "out")
    res = run_pipeline_paired(
        prefix, f1, f2, ref, k=8, output_dir=out, mapq=True,
        vectorizer=vec, max_isize=800,
    )
    assert res["n_proper"] == 2
    lines = [l.rstrip("\n").split("\t")
             for l in open(os.path.join(out, "results.sam"))
             if not l.startswith("@")]
    prim = {}
    for f in lines:
        flag = int(f[1])
        if flag & 0x900 == 0:
            prim[(f[0], bool(flag & 0x80))] = f
    for i, s in enumerate(starts):
        a = prim[(f"p{i}", False)]
        b = prim[(f"p{i}", True)]
        af, bf = int(a[1]), int(b[1])
        # R1 fwd proper paired; R2 reverse, second-in-pair
        assert af & 0x1 and af & 0x2 and af & 0x40 and not af & 0x10
        assert af & 0x20  # mate reverse
        assert bf & 0x1 and bf & 0x2 and bf & 0x80 and bf & 0x10
        assert int(a[3]) == s + 1
        assert int(b[3]) == s + isize - REF_LEN + 1
        assert a[6] == "=" and int(a[7]) == int(b[3])
        assert int(a[8]) == isize and int(b[8]) == -isize
    # the repeat pair keeps a confident MAPQ through its mate
    assert int(prim[("p1", False)][4]) >= 40
    # indices.npy stacks R1 rows then R2 rows
    ids = np.load(os.path.join(out, "indices.npy"))
    assert ids.shape[0] == 4
    assert ids[1, 0] // 2 == starts[1]
