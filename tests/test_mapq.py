"""Margin-based MAPQ (--mapq): repeats get 0, unique placements ~60.

The reference hardcodes MAPQ 60 on every line (utils.cpp:373); downstream
SAM consumers (variant callers, IGV) filter on MAPQ, so the framework
computes the standard uniqueness margin — best placement vs best placement
at a DIFFERENT locus (candidates within ref_len are overlapping windows of
the same alignment, not competitors)."""

import os

import numpy as np
import pytest

from deepreadmapper_tpu.io import sam as sam_io
from deepreadmapper_tpu.pipeline.search import compute_mapq, run_pipeline

REF_LEN = 150


def test_unique_hit_is_60_when_no_competing_locus():
    ids = np.array([[2000, 2002, 2004]])  # all within ref_len of each other
    vals = np.array([[1.0, 1.1, 1.2]])
    assert compute_mapq(ids, vals, REF_LEN).tolist() == [60]


def test_distant_competitor_scales_with_margin():
    ids = np.array([
        [2000, 2002, 9000],   # competitor at a distant locus, 50x worse
        [2000, 9000, 9002],   # exact tie at a distant locus: a true repeat
    ])
    vals = np.array([
        [1.0, 1.05, 50.0],
        [1.0, 1.0, 1.2],
    ])
    q = compute_mapq(ids, vals, REF_LEN)
    assert q[0] >= 55
    assert q[1] == 0


def test_higher_is_better_for_sw_scores():
    ids = np.array([[2000, 9000], [2000, 9000]])
    vals = np.array([[150.0, 20.0], [150.0, 150.0]])
    q = compute_mapq(ids, vals, REF_LEN, higher_is_better=True)
    assert q[0] >= 50 and q[1] == 0


def test_invalid_primary_and_k1():
    assert compute_mapq(
        np.array([[-1, 100]]), np.array([[0.0, 1.0]]), REF_LEN
    ).tolist() == [0]
    q = compute_mapq(np.array([[4], [-1]]), np.array([[1.0], [0.0]]), REF_LEN)
    assert q.tolist() == [60, 0]


def test_sam_lines_carry_primary_mapq_and_zero_secondaries():
    lines = list(sam_io.format_sam_records(
        ["<" + "A" * 20 + ">"], ["q1"], [10, 13], k=2, ref_name="ref",
        mapq=np.array([37]),
    ))
    fields = [l.split("\t") for l in lines]
    assert fields[0][4] == "37" and fields[1][4] == "0"
    # default stays reference-parity 60
    lines60 = list(sam_io.format_sam_records(
        ["<" + "A" * 20 + ">"], ["q1"], [10, 13], k=2, ref_name="ref",
    ))
    assert all(l.split("\t")[4] == "60" for l in lines60)


@pytest.fixture(scope="module")
def repeat_genome(tmp_path_factory):
    rng = np.random.default_rng(11)
    g = rng.choice(list("ACGT"), size=3000)
    g[2000:2200] = g[500:700]  # plant an exact 200 bp repeat
    genome = "".join(g)
    d = tmp_path_factory.mktemp("mapqref")
    ref = str(d / "ref.fna")
    with open(ref, "w") as f:
        f.write("> repeatref\n")
        for i in range(0, len(genome), 80):
            f.write(genome[i:i + 80] + "\n")
    fq = str(d / "reads.fastq")
    reads = {
        "rep": genome[520:670],      # entirely inside the repeat: ambiguous
        "uniq": genome[1000:1150],   # unique locus
    }
    with open(fq, "w") as f:
        for name, seq in reads.items():
            f.write(f"@{name}\n{seq}\n+\n{'I' * len(seq)}\n")
    return ref, fq


def test_pipeline_qual_passthrough(repeat_genome, tmp_path):
    """--qual emits the FASTQ base qualities (as-sequenced orientation on
    pseudo-CIGAR lines, reference-parity); default stays '*'."""
    from deepreadmapper_tpu.pipeline.build import build_index
    from deepreadmapper_tpu.pipeline.search import run_pipeline

    ref, fq = repeat_genome
    quals = {}
    lines = open(fq).read().splitlines()
    for i in range(0, len(lines), 4):
        quals[lines[i][1:]] = lines[i + 3]
    prefix = str(tmp_path / "idx")
    build_index(ref, prefix, REF_LEN, index_type="FLAT")
    out = str(tmp_path / "outq")
    run_pipeline(prefix, fq, ref, k=4, output_dir=out, qual=True)
    for line in open(os.path.join(out, "results.sam")):
        if line.startswith("@"):
            continue
        f = line.rstrip("\n").split("\t")
        assert f[10] == quals[f[0]], f[0]
    out2 = str(tmp_path / "outnoq")
    run_pipeline(prefix, fq, ref, k=4, output_dir=out2)
    assert all(
        l.rstrip("\n").split("\t")[10] == "*"
        for l in open(os.path.join(out2, "results.sam"))
        if not l.startswith("@")
    )


def test_mark_duplicates_unit(tmp_path):
    from deepreadmapper_tpu.io.sam import mark_duplicates

    sam = str(tmp_path / "d.sam")
    with open(sam, "w") as f:
        f.write("@HD\tVN:1.0\tSO:unsorted\n@SQ\tSN:ref\tLN:1000\n")
        # three copies of one molecule (MAPQ 60/40/50), one distinct, one
        # secondary at the same spot (untouched)
        f.write("a\t0\tref\t100\t60\t50M\t*\t0\t0\t" + "A" * 50 + "\t*\n")
        f.write("b\t0\tref\t100\t40\t50M\t*\t0\t0\t" + "A" * 50 + "\t*\n")
        f.write("c\t0\tref\t100\t50\t50M\t*\t0\t0\t" + "A" * 50 + "\t*\n")
        f.write("d\t16\tref\t100\t60\t50M\t*\t0\t0\t" + "A" * 50 + "\t*\n")
        f.write("e\t256\tref\t100\t0\t50M\t*\t0\t0\t" + "A" * 50 + "\t*\n")
    assert mark_duplicates(sam) == 2
    flags = {l.split("\t")[0]: int(l.split("\t")[1])
             for l in open(sam) if not l.startswith("@")}
    assert flags["a"] == 0          # best MAPQ survives
    assert flags["b"] & 0x400 and flags["c"] & 0x400
    assert flags["d"] == 16         # opposite strand: different molecule
    assert flags["e"] == 256        # secondary untouched


def test_pipeline_mark_duplicates(repeat_genome, tmp_path):
    """--mark-duplicates end-to-end: a FASTQ with the same read twice
    yields one unmarked and one FLAG-0x400 primary."""
    from deepreadmapper_tpu.pipeline.build import build_index
    from deepreadmapper_tpu.pipeline.search import run_pipeline

    ref, fq = repeat_genome
    dup_fq = str(tmp_path / "dup.fastq")
    lines = open(fq).read().splitlines()
    with open(dup_fq, "w") as f:
        f.write("\n".join(lines[:4]) + "\n")   # uniq read once
        f.write("\n".join(lines[:4]) + "\n")   # and again (PCR duplicate)
    prefix = str(tmp_path / "idx")
    build_index(ref, prefix, REF_LEN, index_type="FLAT")
    out = str(tmp_path / "outd")
    run_pipeline(prefix, dup_fq, ref, k=4, output_dir=out, sort=True,
                 mark_dups=True)
    prim = [int(l.split("\t")[1])
            for l in open(os.path.join(out, "results.sam"))
            if not l.startswith("@") and int(l.split("\t")[1]) & 0x100 == 0]
    assert len(prim) == 2
    assert sum(1 for f in prim if f & 0x400) == 1


def test_pipeline_sort(repeat_genome, tmp_path):
    """--sort: coordinate order (POS ascending within @SQ order), header
    stamped SO:coordinate."""
    from deepreadmapper_tpu.pipeline.build import build_index
    from deepreadmapper_tpu.pipeline.search import run_pipeline

    ref, fq = repeat_genome
    prefix = str(tmp_path / "idx")
    build_index(ref, prefix, REF_LEN, index_type="FLAT")
    out = str(tmp_path / "outs")
    run_pipeline(prefix, fq, ref, k=8, output_dir=out, sort=True)
    lines = open(os.path.join(out, "results.sam")).read().splitlines()
    assert any("SO:coordinate" in l for l in lines if l.startswith("@HD"))
    pos = [int(l.split("\t")[3]) for l in lines if not l.startswith("@")]
    assert pos == sorted(pos)
    assert len(pos) == 2 * 8


@pytest.mark.parametrize("streaming", [False, True])
def test_pipeline_mapq_separates_repeat_from_unique(
    repeat_genome, tmp_path, streaming
):
    from deepreadmapper_tpu.pipeline.build import build_index

    ref, fq = repeat_genome
    prefix = str(tmp_path / f"idx{streaming}")
    build_index(ref, prefix, REF_LEN, index_type="FLAT")
    out = str(tmp_path / f"out{streaming}")
    run_pipeline(
        prefix, fq, ref, k=16, output_dir=out, mapq=True,
        use_streaming=streaming,
    )
    mapqs = {}
    for line in open(os.path.join(out, "results.sam")):
        if line.startswith("@"):
            continue
        f = line.split("\t")
        if int(f[1]) & 0x100 == 0:  # primary
            mapqs[f[0]] = int(f[4])
    assert mapqs["rep"] <= 3, mapqs
    assert mapqs["uniq"] >= 40, mapqs


def test_calibrate_mapq_monotone_and_bounded():
    """The empirical recalibration table must be monotone in the raw
    margin quality, bounded to [0, 60], and keep raw 0 at 0 (exact-tie
    repeats stay MAPQ 0)."""
    from deepreadmapper_tpu.pipeline.search import calibrate_mapq

    raw = np.arange(0, 61)
    cal = calibrate_mapq(raw)
    assert cal.dtype == np.int32 and cal.shape == raw.shape
    assert np.all(np.diff(cal) >= 0), "calibration must be monotone"
    assert cal[0] == 0 and cal.min() >= 0 and cal.max() <= 60
    # calibrated is strictly more conservative than raw above the floor
    assert np.all(cal[10:] < raw[10:])


def test_pipeline_mapq_calibrated_flag(repeat_genome, tmp_path):
    """--mapq-calibrated maps the SAM MAPQ column through the table while
    preserving the repeat-vs-unique separation."""
    from deepreadmapper_tpu.pipeline.build import build_index
    from deepreadmapper_tpu.pipeline.search import run_pipeline

    ref, fq = repeat_genome
    idx = str(tmp_path / "idx")
    build_index(ref, idx, 150)
    run_pipeline(idx, fq, ref, k=8,
                 output_dir=str(tmp_path / "o"), mapq=True,
                 mapq_calibrated=True)
    mapqs = {}
    for line in open(tmp_path / "o" / "results.sam"):
        if line.startswith("@"):
            continue
        f = line.split("\t")
        if int(f[1]) & 0x100 == 0:
            mapqs[f[0]] = int(f[4])
    assert mapqs["rep"] <= 3, mapqs
    # unique read: raw ~60 -> calibrated ceiling (>= 20, < 40)
    assert 15 <= mapqs["uniq"] < 40, mapqs
