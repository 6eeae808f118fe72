"""Data-layer golden tests against the reference fixtures.

tests/data/test_data_ref.txt holds the exact windows gen_ref produced from
ecoli_150.fna (1,702 lines = 851 windows x 2 strands, unwrapped);
test_data_quer.txt holds the 150 reads.  Our windowing must reproduce them
byte for byte, in the reference's interleaved fwd/rev emission order.
"""

import numpy as np

from deepreadmapper_tpu.io import fasta, fastq, readers
from deepreadmapper_tpu import tokenizer as tok


def test_parse_fasta_records(data_dir):
    recs = fasta.parse_fasta_records(str(data_dir / "ecoli_150.fna"))
    assert len(recs) == 1
    assert len(recs[0]) == 1000
    assert set(np.unique(recs[0])) <= set(b"ACGTN")


def test_windows_match_golden(data_dir):
    recs = fasta.parse_fasta_records(str(data_dir / "ecoli_150.fna"))
    seqs, labels = fasta.windows_as_strings(recs, ref_len=150, stride=1, lookup_mode=True)
    golden = readers.read_txt(str(data_dir / "test_data_ref.txt"))
    assert len(seqs) == 1702 == len(golden)
    assert seqs == golden
    # Label semantics: (pos << 1) | strand, interleaved.
    assert labels[0] == 0 and labels[1] == 1
    assert labels[2] == 2 and labels[3] == 3
    assert labels[-1] == ((850 << 1) | 1)


def test_window_byte_matrix_matches_strings(data_dir):
    recs = fasta.parse_fasta_records(str(data_dir / "ecoli_150.fna"))
    genome = recs[0]
    positions = np.arange(0, 1000 - 150 + 1, dtype=np.int64)
    mat, lengths = fasta.window_byte_matrix(genome, positions, ref_len=150)
    wrapped, _ = fasta.windows_as_strings(recs, 150, 1, lookup_mode=False)
    # The matrix holds the first 124 chars of each wrapped window.
    for i in [0, 1, 2, 3, 1700, 1701]:
        assert mat[i].tobytes().decode() == wrapped[i][:124]
        assert lengths[i] == 152


def test_window_tokens_match_string_tokens(data_dir):
    recs = fasta.parse_fasta_records(str(data_dir / "ecoli_150.fna"))
    genome = recs[0]
    positions = np.arange(0, 851, dtype=np.int64)
    mat, lengths = fasta.window_byte_matrix(genome, positions, ref_len=150)
    fast = tok.tokenize_bytes(mat, lengths)
    wrapped, _ = fasta.windows_as_strings(recs, 150, 1, lookup_mode=False)
    slow = tok.tokenize_strings(wrapped)
    np.testing.assert_array_equal(fast, slow)


def test_short_ref_len_windows():
    genome = np.frombuffer(b"ACGTACGTACGTACGT", dtype=np.uint8).copy()
    mat, lengths = fasta.window_byte_matrix(genome, np.array([0, 4]), ref_len=10)
    assert lengths[0] == 12
    assert mat[0].tobytes() == b"<ACGTACGTAC>"
    assert mat[1].tobytes() == b"<GTACGTACGT>"  # revcomp of ACGTACGTAC
    ids = tok.tokenize_bytes(mat, lengths)
    want = tok.tokenize_reference("<ACGTACGTAC>")
    np.testing.assert_array_equal(ids[0, : len(want)], want)


def test_fastq_matches_golden(data_dir):
    seqs, ids = fastq.parse_fastq(str(data_dir / "test_data.fastq"))
    golden = readers.read_txt(str(data_dir / "test_data_quer.txt"))
    assert len(seqs) == 150
    # The shipped golden txt predates the fastq slightly: it is an ordered
    # subsequence holding 145 of the 150 reads.
    inner = [s[1:-1] for s in seqs]
    it = iter(inner)
    assert all(any(g == x for x in it) for g in golden)
    assert len(golden) == 145
    assert ids[0] == "_281_1_1_0_0_0_6:0:0_0:0:0_0"
    assert all(s.startswith("<") and s.endswith(">") for s in seqs)


def test_reverse_complement():
    rc = fasta.reverse_complement(b"ACGTN")
    assert rc.tobytes() == b"NACGT"


def test_extract_fasta_sequence(data_dir):
    g = fasta.extract_fasta_sequence(str(data_dir / "ecoli_150.fna"))
    recs = fasta.parse_fasta_records(str(data_dir / "ecoli_150.fna"))
    np.testing.assert_array_equal(g, recs[0])


def test_config_roundtrip(tmp_path):
    from deepreadmapper_tpu.io import configstore

    cfg = {
        "index_type": "HNSWPQ",
        "stride": 1,
        "ref_len": 150,
        "n_vects": 1702,
        "dim": 128,
        "M_hnsw": 16,
        "EFC": 200,
        "M_pq": 8,
        "nbits": 8,
        "index_file": "idx/idx.index",
    }
    configstore.save_config(cfg, str(tmp_path / "idx"))
    got = configstore.load_config(str(tmp_path / "idx" / "config.txt"))
    assert got == cfg


def test_sam_output(tmp_path):
    from deepreadmapper_tpu.io import sam

    sam.write_sam(
        query_seqs=["<ACGT>"],
        query_ids=["read1"],
        cand_ids=[4, 7],
        ref_name="ref",
        ref_len=1000,
        k=2,
        output_file=str(tmp_path / "out.sam"),
    )
    lines = (tmp_path / "out.sam").read_text().splitlines()
    assert lines[0] == "@HD\tVN:1.0\tSO:unsorted"
    assert lines[1] == "@SQ\tSN:ref\tLN:1000"
    # id 4 -> pos 3, forward, primary.
    assert lines[2].split("\t") == [
        "read1", "0", "ref", "3", "60", "4M", "*", "0", "0", "ACGT", "*",
    ]
    # id 7 -> pos 4, reverse (16) + secondary (256) = 272.
    assert lines[3].split("\t")[1] == "272"
    assert lines[3].split("\t")[3] == "4"


def test_sam_invalid_ids_flag4_and_dropped_secondaries(tmp_path):
    """-1 candidate ids (padded/starved lists): primary -> FLAG 4 unmapped
    record, -1 secondaries dropped — never POS-0 garbage lines (the
    reference throws instead, reranker.cpp:26-29)."""
    from deepreadmapper_tpu.io import sam

    out = str(tmp_path / "out.sam")
    sam.write_sam(
        query_seqs=["<ACGT>", "<TTTT>"],
        query_ids=["starved", "ok"],
        cand_ids=[-1, -1, 4, -1],  # q0: no hits at all; q1: one real hit
        ref_name="ref",
        ref_len=1000,
        k=2,
        output_file=out,
    )
    lines = [l for l in open(out) if not l.startswith("@")]
    assert len(lines) == 2  # 2 unmapped-or-real primaries, 0 -1 secondaries
    f0 = lines[0].split("\t")
    assert f0[0] == "starved" and f0[1] == "4"
    assert f0[2] == "*" and f0[3] == "0" and f0[4] == "0" and f0[5] == "*"
    assert f0[9] == "ACGT"
    f1 = lines[1].split("\t")
    assert f1[0] == "ok" and f1[1] == "0" and f1[3] == "3"


def test_sam_real_cigar_revcomps_reverse_seq():
    """A real CIGAR on a FLAG-16 primary reverse-complements SEQ so the
    reference-orientation CIGAR describes the emitted bases; pseudo-CIGAR
    lines keep the as-sequenced SEQ (reference-parity quirk)."""
    from deepreadmapper_tpu.io import sam

    recs = list(
        sam.format_sam_records(
            query_seqs=["<ACGTT>"],
            query_ids=["r"],
            cand_ids=[7],  # odd id -> reverse strand
            k=1,
            ref_name="ref",
            primary_cigars=["2S3M"],
            primary_pos_off=np.array([1], np.int64),
        )
    )
    f = recs[0].split("\t")
    assert int(f[1]) & 16
    assert f[5] == "2S3M"
    assert f[9] == "AACGT"  # revcomp(ACGTT)
    assert f[3] == "5"  # pos = 7//2 + 1 + off 1
    # pseudo path: SEQ stays as sequenced
    recs = list(
        sam.format_sam_records(
            query_seqs=["<ACGTT>"], query_ids=["r"], cand_ids=[7], k=1,
            ref_name="ref",
        )
    )
    assert recs[0].split("\t")[9] == "ACGTT"
