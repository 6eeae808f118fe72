"""Real CIGAR emission (--cigar): native SW traceback -> SAM M/I/D + soft
clips + alignment-exact POS.  Beyond-reference (the reference writes a
pseudo <len>M, utils.cpp:336-404); scoring parity with calc_sw_score is
covered in test_sw*, these tests cover the traceback and SAM plumbing."""

import numpy as np
import pytest

from deepreadmapper_tpu import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


def _pair(a: bytes, b: bytes):
    return (
        np.frombuffer(a, np.uint8)[None, :].copy(),
        np.array([len(a)], np.int64),
        np.frombuffer(b, np.uint8)[None, :].copy(),
        np.array([len(b)], np.int64),
    )


def test_sw_cigar_exact_substring():
    sc, aspan, bspan, cig = native.sw_cigar(*_pair(b"CCCGGG", b"TTCCCGGGTT"))
    assert sc[0] == 6 and cig[0] == "6M"
    assert list(aspan[0]) == [0, 6] and list(bspan[0]) == [2, 8]


def test_sw_cigar_insertion_and_deletion():
    # read has an extra A (insertion) relative to the window
    sc, _, _, cig = native.sw_cigar(*_pair(b"ACGTAACGT", b"ACGTACGT"))
    assert cig[0] in ("4M1I4M", "5M1I3M")  # tie between adjacent A columns
    # read lacks one base (deletion)
    sc, _, _, cig = native.sw_cigar(*_pair(b"ACGTCGT", b"ACGTACGT"))
    assert "1D" in cig[0] and cig[0].count("D") == 1


def test_sw_cigar_score_matches_dp_oracle():
    rng = np.random.default_rng(1)
    for _ in range(10):
        la, lb = int(rng.integers(5, 60)), int(rng.integers(5, 60))
        a = rng.integers(65, 69, la).astype(np.uint8)
        b = rng.integers(65, 69, lb).astype(np.uint8)
        h = np.zeros((la + 1, lb + 1), np.int32)
        for r in range(1, la + 1):
            for c in range(1, lb + 1):
                h[r, c] = max(
                    0,
                    h[r - 1, c - 1] + (1 if a[r - 1] == b[c - 1] else -1),
                    h[r - 1, c] - 1,
                    h[r, c - 1] - 1,
                )
        sc, _, _, _ = native.sw_cigar(
            a[None, :].copy(), np.array([la]), b[None, :].copy(), np.array([lb])
        )
        assert sc[0] == h.max()


def test_pipeline_cigar_indel_read(tmp_path):
    """Planted insertion + deletion surface as 1I/1D at the right offsets
    with alignment-exact POS; reverse-strand primary lines carry
    reference-orientation CIGARs."""
    from deepreadmapper_tpu.io import fasta as fasta_io
    from deepreadmapper_tpu.models.encoder import Vectorizer
    from deepreadmapper_tpu.pipeline.build import build_index
    from deepreadmapper_tpu.pipeline.search import run_pipeline

    ref = "tests/data/ecoli_150.fna"
    genome = fasta_io.extract_fasta_sequence(ref).tobytes().decode()
    src = genome[100 : 100 + 151]
    read = (src[:30] + "A" + src[30:60] + src[61:150])[:150]
    comp = str.maketrans("ACGT", "TGCA")
    rev_read = genome[300 : 300 + 150].translate(comp)[::-1]
    fq = str(tmp_path / "r.fastq")
    with open(fq, "w") as f:
        f.write(f"@ins_del\n{read}\n+\n{'I' * len(read)}\n")
        f.write(f"@rev\n{rev_read}\n+\n{'I' * 150}\n")

    vec = Vectorizer(device_batch=2048)
    prefix = str(tmp_path / "idx")
    build_index(ref, prefix, 150, stride=1, index_type="FLAT", vectorizer=vec)
    out = str(tmp_path / "out")
    run_pipeline(prefix, fq, ref, k=4, output_dir=out, vectorizer=vec,
                 cigar=True)
    sam = [l.split("\t") for l in open(f"{out}/results.sam")
           if not l.startswith("@")]
    prim = sam[0]
    assert prim[5] == "30M1I30M1D89M"
    assert int(prim[3]) == 101
    rev = sam[4]
    assert int(rev[1]) & 16
    assert rev[5] == "150M" and int(rev[3]) == 301
    # FLAG-16 + real CIGAR -> SEQ is reverse-complemented (the
    # reference-orientation CIGAR must describe the emitted bases)
    assert rev[9] == genome[300 : 300 + 150]


def test_pipeline_cigar_reverse_indel_consistency(tmp_path):
    """A reverse-strand read with planted indels round-trips: the emitted
    (SEQ, CIGAR, POS) triple reconstructs the genome exactly — every M base
    matches, walking SEQ and the reference in SAM (forward) orientation."""
    import re

    from deepreadmapper_tpu.io import fasta as fasta_io
    from deepreadmapper_tpu.models.encoder import Vectorizer
    from deepreadmapper_tpu.pipeline.build import build_index
    from deepreadmapper_tpu.pipeline.search import run_pipeline

    ref = "tests/data/ecoli_150.fna"
    genome = fasta_io.extract_fasta_sequence(ref).tobytes().decode()
    src = genome[300:451]
    # forward-sense alignment: 40M 1I 40M 1D 69M consuming genome[300:450)
    fwd = src[:40] + "A" + src[40:80] + src[81:150]
    assert len(fwd) == 150
    comp = str.maketrans("ACGT", "TGCA")
    read = fwd.translate(comp)[::-1]  # as-sequenced reverse read
    qual_in = "".join(chr(33 + i % 40) for i in range(150))  # non-uniform
    fq = str(tmp_path / "r.fastq")
    with open(fq, "w") as f:
        f.write(f"@rev_indel\n{read}\n+\n{qual_in}\n")

    vec = Vectorizer(device_batch=2048)
    prefix = str(tmp_path / "idx")
    build_index(ref, prefix, 150, stride=1, index_type="FLAT", vectorizer=vec)
    out = str(tmp_path / "out")
    run_pipeline(prefix, fq, ref, k=4, output_dir=out, vectorizer=vec,
                 cigar=True, qual=True)
    prim = [
        l.split("\t") for l in open(f"{out}/results.sam")
        if not l.startswith("@")
    ][0]
    flag, pos, cigar, seq = int(prim[1]), int(prim[3]), prim[5], prim[9]
    assert flag & 16
    assert "1I" in cigar and "1D" in cigar
    # SEQ must be the reference-orientation read for the CIGAR to apply
    assert seq == fwd
    # --qual: QUAL reverses together with SEQ on FLAG-16 real-CIGAR lines
    assert prim[10].rstrip("\n") == qual_in[::-1]
    # walk the CIGAR: every M base of SEQ must equal the genome base
    gi = pos - 1
    si = 0
    for n, op in re.findall(r"(\d+)([MIDS])", cigar):
        n = int(n)
        if op == "M":
            assert seq[si : si + n] == genome[gi : gi + n]
            si += n
            gi += n
        elif op in ("I", "S"):
            si += n
        else:  # D
            gi += n
    assert si == len(seq)
