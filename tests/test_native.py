"""Native C++ data loader: exact parity with the numpy reference paths."""

import numpy as np
import pytest

from deepreadmapper_tpu import native
from deepreadmapper_tpu import tokenizer as tok
from deepreadmapper_tpu.io import fasta as fio

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (g++ missing?)"
)


def test_clean_fasta_parity(data_dir):
    data = np.fromfile(str(data_dir / "ecoli_150.fna"), dtype=np.uint8)
    got = native.clean_fasta(data)
    want = fio.parse_fasta_records(str(data_dir / "ecoli_150.fna"))
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)


def test_clean_fasta_multirecord():
    raw = np.frombuffer(
        b"junk\n>r1 desc\nACGTn\nacg\n>r2\nNNTT\n", dtype=np.uint8
    )
    recs = native.clean_fasta(raw.copy())
    assert [r.tobytes() for r in recs] == [b"ACGTNACG", b"NNTT"]


def test_tokenize_windows_parity(data_dir):
    recs = fio.parse_fasta_records(str(data_dir / "ecoli_150.fna"))
    genome = recs[0]
    for ref_len, stride in [(150, 1), (150, 4), (10, 3), (121, 1), (122, 1), (123, 1)]:
        nw = fio.num_windows(len(genome), ref_len, stride)
        got = native.tokenize_windows(genome, ref_len, stride, 0, nw)
        positions = np.arange(nw, dtype=np.int64) * stride
        mat, lengths = fio.window_byte_matrix(genome, positions, ref_len)
        want = tok.tokenize_bytes(mat, lengths)
        np.testing.assert_array_equal(got, want, err_msg=f"ref_len={ref_len} s={stride}")


def test_tokenize_windows_chunked(data_dir):
    recs = fio.parse_fasta_records(str(data_dir / "ecoli_150.fna"))
    genome = recs[0]
    full = native.tokenize_windows(genome, 150, 1, 0, 851)
    part = np.concatenate([
        native.tokenize_windows(genome, 150, 1, 0, 400),
        native.tokenize_windows(genome, 150, 1, 400, 451),
    ])
    np.testing.assert_array_equal(full, part)


def test_tokenize_seqs_parity(data_dir):
    from deepreadmapper_tpu.io.fastq import parse_fastq_bytes

    mat, lengths, _ = parse_fastq_bytes(str(data_dir / "test_data.fastq"))
    got = native.tokenize_seqs(mat, lengths)
    want = tok.tokenize_bytes(mat, lengths)
    np.testing.assert_array_equal(got, want)


def test_tokenize_seqs_with_n_and_short():
    seqs = ["<" + "N" * 150 + ">", "<ACGTNNNACA>", "ACG", "<A>"]
    mat, lengths = tok.strings_to_bytes(seqs, width=124)
    got = native.tokenize_seqs(mat, lengths)
    want = tok.tokenize_bytes(mat, lengths)
    np.testing.assert_array_equal(got, want)


def test_tokenize_by_id_parity(data_dir):
    recs = fio.parse_fasta_records(str(data_dir / "ecoli_150.fna"))
    genome = recs[0]
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 2 * (1000 - 150 + 1), size=200).astype(np.int64)
    for wrap in (False, True):
        got = native.tokenize_windows_by_id(genome, 150, ids, wrap=wrap)
        mat, lens = fio.fetch_windows_by_id(genome, ids, 150, wrap=wrap)
        want = tok.tokenize_bytes(mat, lens)
        np.testing.assert_array_equal(got, want, err_msg=f"wrap={wrap}")
