"""NM:i / MD:Z / AS:i tags on real-CIGAR primary lines (--cigar).

Beyond-reference (the reference emits no tags, utils.cpp:336-404): these
are what let samtools calmd / variant callers consume the alignments
without re-reading the genome.  The strong property under test: for every
emitted line, SEQ + CIGAR + MD must reconstruct the reference substring
EXACTLY (the samtools-calmd identity), and NM must equal
mismatches + inserted + deleted bases.
"""

import re

import numpy as np
import pytest

from deepreadmapper_tpu import native
from deepreadmapper_tpu.io.sam import alignment_tags


def _tags(a: bytes, b: bytes, a0, b0, runs, reverse=False):
    return alignment_tags(
        np.frombuffer(a, np.uint8), np.frombuffer(b, np.uint8),
        a0, b0, runs, reverse,
    )


def test_alignment_tags_perfect_match():
    nm, md, as_ = _tags(b"ACGTACGT", b"ACGTACGT", 0, 0, [(8, "M")])
    assert (nm, md, as_) == (0, "8", 8)


def test_alignment_tags_mismatch():
    nm, md, as_ = _tags(b"ACGTACGT", b"ACGAACGT", 0, 0, [(8, "M")])
    assert (nm, md, as_) == (1, "3A4", 6)  # ref base A at offset 3


def test_alignment_tags_indels():
    # 3M 1I 2M 2D 3M: query ACG T AC GTA vs ref ACG AC TT GTA
    a = b"ACGTACGTA"
    b = b"ACGACTTGTA"
    runs = [(3, "M"), (1, "I"), (2, "M"), (2, "D"), (3, "M")]
    nm, md, as_ = _tags(a, b, 0, 0, runs)
    assert nm == 3  # 1 ins + 2 del
    assert md == "5^TT3"
    assert as_ == 8 - 3  # 8 matches - 3 gap bases


def test_alignment_tags_reverse_orientation():
    """reverse=True re-expresses MD in the opposite orientation: event
    order flips and ref bases complement."""
    # native orientation: mismatch ref G at offset 1 of 4
    nm, md, _ = _tags(b"AATT", b"AGTT", 0, 0, [(4, "M")])
    assert (nm, md) == (1, "1G2")
    nm, md, _ = _tags(b"AATT", b"AGTT", 0, 0, [(4, "M")], reverse=True)
    assert (nm, md) == (1, "2C1")  # offset mirrors, base complements


def _reconstruct_ref(seq: str, cigar: str, md: str) -> str:
    """samtools-calmd identity: SEQ + CIGAR + MD -> reference substring."""
    aligned = []  # query bases consumed by M, in ref order
    si = 0
    for n, op in re.findall(r"(\d+)([MIDSH])", cigar):
        n = int(n)
        if op == "M":
            aligned.append(seq[si:si + n])
            si += n
        elif op in ("I", "S"):
            si += n
    qa = "".join(aligned)
    ref = []
    qi = 0
    for tok in re.findall(r"(\d+|\^[A-Z]+|[A-Z])", md):
        if tok.isdigit():
            n = int(tok)
            ref.append(qa[qi:qi + n])
            qi += n
        elif tok.startswith("^"):
            ref.append(tok[1:])
        else:
            ref.append(tok)
            qi += 1
    return "".join(ref)


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_pipeline_tags_reconstruct_reference(tmp_path):
    """Planted SNV + indel reads (both strands): every primary line's
    SEQ+CIGAR+MD reconstructs the genome exactly, and NM is the true edit
    count."""
    from deepreadmapper_tpu.io import fasta as fasta_io
    from deepreadmapper_tpu.models.encoder import Vectorizer
    from deepreadmapper_tpu.pipeline.build import build_index
    from deepreadmapper_tpu.pipeline.search import run_pipeline

    ref = "tests/data/ecoli_150.fna"
    genome = fasta_io.extract_fasta_sequence(ref).tobytes().decode()
    comp = str.maketrans("ACGT", "TGCA")

    src = genome[100:251]
    snv = "A" if src[70] != "A" else "C"
    fwd = (src[:30] + "A" + src[30:70] + snv + src[71:90] + src[91:150])[:150]
    rsrc = genome[300:450]
    rsnv = "G" if rsrc[40] != "G" else "T"
    rev_fwd = rsrc[:40] + rsnv + rsrc[41:]
    rev_read = rev_fwd.translate(comp)[::-1]

    fq = str(tmp_path / "r.fastq")
    with open(fq, "w") as f:
        f.write(f"@fwd_indel_snv\n{fwd}\n+\n{'I' * len(fwd)}\n")
        f.write(f"@rev_snv\n{rev_read}\n+\n{'I' * len(rev_read)}\n")

    vec = Vectorizer(device_batch=2048)
    prefix = str(tmp_path / "idx")
    build_index(ref, prefix, 150, stride=1, index_type="FLAT", vectorizer=vec)
    out = str(tmp_path / "out")
    run_pipeline(prefix, fq, ref, k=4, output_dir=out, vectorizer=vec,
                 cigar=True)

    lines = [l.rstrip("\n").split("\t") for l in open(f"{out}/results.sam")
             if not l.startswith("@")]
    prims = [f for f in lines if not int(f[1]) & 256]
    assert len(prims) == 2
    for f in prims:
        pos, cigar, seq = int(f[3]), f[5], f[9]
        tags = {t.split(":", 2)[0]: t.split(":", 2)[2] for t in f[11:]}
        assert "NM" in tags and "MD" in tags and "AS" in tags, f
        recon = _reconstruct_ref(seq, cigar, tags["MD"])
        assert recon == genome[pos - 1 : pos - 1 + len(recon)], f[0]
        # NM == mismatches (MD letters outside deletions) + I/D bases
        md_mm = len(re.findall(r"(?<!\^)[A-Z]", re.sub(r"\^[A-Z]+", "^", tags["MD"])))
        indel = sum(int(n) for n, op in re.findall(r"(\d+)([ID])", cigar))
        assert int(tags["NM"]) == md_mm + indel, f[0]
    # the reverse primary really is reverse-strand with the planted SNV
    rev = [f for f in prims if f[0] == "rev_snv"][0]
    assert int(rev[1]) & 16 and int(rev[3]) == 301


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_longread_tags_reconstruct_reference(tmp_path):
    """--long-reads --cigar: banded-aligner primaries carry NM/MD/AS that
    reconstruct the genome (forward-reference orientation by
    construction)."""
    from deepreadmapper_tpu.io import fasta as fasta_io
    from deepreadmapper_tpu.models.encoder import Vectorizer
    from deepreadmapper_tpu.pipeline.build import build_index
    from deepreadmapper_tpu.pipeline.search import run_pipeline

    rng = np.random.default_rng(5)
    genome = "".join(rng.choice(list("ACGT"), 6000))
    ref = str(tmp_path / "g.fna")
    with open(ref, "w") as f:
        f.write("> g\n")
        for i in range(0, len(genome), 80):
            f.write(genome[i:i + 80] + "\n")
    # 1.2 kb read with one SNV and one deletion
    src = genome[2000:3201]
    read = src[:400] + ("A" if src[400] != "A" else "C") + src[401:800] + src[801:1200]
    fq = str(tmp_path / "lr.fastq")
    with open(fq, "w") as f:
        f.write(f"@lr\n{read}\n+\n{'I' * len(read)}\n")

    vec = Vectorizer(device_batch=2048)
    prefix = str(tmp_path / "idx")
    build_index(ref, prefix, 150, stride=1, index_type="FLAT", vectorizer=vec)
    out = str(tmp_path / "out")
    run_pipeline(prefix, fq, ref, k=4, output_dir=out, vectorizer=vec,
                 long_reads=True, cigar=True)
    prim = [l.rstrip("\n").split("\t") for l in open(f"{out}/results.sam")
            if not l.startswith("@") and not int(l.split("\t")[1]) & 0x900][0]
    pos, cigar, seq = int(prim[3]), prim[5], prim[9]
    tags = {t.split(":", 2)[0]: t.split(":", 2)[2] for t in prim[11:]}
    assert "NM" in tags and "MD" in tags
    recon = _reconstruct_ref(seq, cigar, tags["MD"])
    assert recon == genome[pos - 1 : pos - 1 + len(recon)]
    assert int(tags["NM"]) >= 2  # the planted SNV + deletion at least


def test_read_group_header_and_tags(tmp_path):
    """--read-group: @RG in the header and RG:Z on every alignment line
    (primary, secondary, unmapped), matching IDs."""
    from deepreadmapper_tpu.io.sam import parse_read_group, write_sam

    hdr, rid = parse_read_group("ID:run1,SM:sampleA,PL:ONT")
    assert hdr == "@RG\tID:run1\tSM:sampleA\tPL:ONT\n" and rid == "run1"
    with pytest.raises(ValueError):
        parse_read_group("SM:no_id")

    out = str(tmp_path / "o.sam")
    write_sam(["ACGT", "GGGG"], ["q1", "q2"], [0, 2, -1, -1], "ref", 4, 2,
              out, rg="ID:run1,SM:sampleA")
    lines = open(out).read().splitlines()
    assert any(l.startswith("@RG\tID:run1\tSM:sampleA") for l in lines)
    body = [l for l in lines if not l.startswith("@")]
    assert body and all(l.endswith("RG:Z:run1") for l in body), body


def test_pipeline_read_group_e2e(tmp_path, data_dir):
    from deepreadmapper_tpu.models.encoder import Vectorizer
    from deepreadmapper_tpu.pipeline.build import build_index
    from deepreadmapper_tpu.pipeline.search import run_pipeline

    vec = Vectorizer(device_batch=2048)
    prefix = str(tmp_path / "idx")
    build_index(str(data_dir / "ecoli_150.fna"), prefix, 150,
                index_type="FLAT", vectorizer=vec)
    out = str(tmp_path / "out")
    run_pipeline(prefix, str(data_dir / "test_data.fastq"),
                 str(data_dir / "ecoli_150.fna"), k=4, output_dir=out,
                 vectorizer=vec, read_group="ID:lane7,SM:ecoli")
    lines = open(f"{out}/results.sam").read().splitlines()
    assert any(l.startswith("@RG\tID:lane7") for l in lines)
    body = [l for l in lines if not l.startswith("@")]
    assert all("RG:Z:lane7" in l for l in body)
