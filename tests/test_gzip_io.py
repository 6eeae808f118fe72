"""Transparent gzip input support (io/fileio.py).

Real-world FASTA/FASTQ ship gzipped; the reference rejects .gz outright
(read_file extension dispatch, utils.cpp:188-215).  Every reader funnels
through read_bytes (gunzip on magic) and dispatches on true_ext."""

import gzip
import os
import shutil

import numpy as np
import pytest

from deepreadmapper_tpu.io.fastq import parse_fastq, parse_fastq_quals
from deepreadmapper_tpu.io.fasta import parse_fasta_records
from deepreadmapper_tpu.io.fileio import true_ext
from deepreadmapper_tpu.utils.memory import estimate_window_count


def _gz(src, dst):
    with open(src, "rb") as fi, gzip.open(dst, "wb") as fo:
        shutil.copyfileobj(fi, fo)
    return dst


def test_true_ext():
    assert true_ext("a/b.fastq.gz") == ".fastq"
    assert true_ext("x.fna") == ".fna"
    assert true_ext("x.txt.gz") == ".txt"


def test_parsers_identical_through_gzip(data_dir, tmp_path):
    fna = str(data_dir / "ecoli_150.fna")
    fq = str(data_dir / "test_data.fastq")
    fna_gz = _gz(fna, str(tmp_path / "ref.fna.gz"))
    fq_gz = _gz(fq, str(tmp_path / "reads.fastq.gz"))
    for a, b in zip(parse_fasta_records(fna), parse_fasta_records(fna_gz)):
        np.testing.assert_array_equal(a, b)
    assert parse_fastq(fq) == parse_fastq(fq_gz)
    assert parse_fastq_quals(fq) == parse_fastq_quals(fq_gz)
    # window estimate streams the decompressed bytes, not the compressed
    # size or the (multi-member-useless) ISIZE footer
    est = estimate_window_count(fna_gz, 150)
    assert est == estimate_window_count(fna, 150)
    # multi-member gzip (BGZF/pigz/cat-of-gz style, whose LAST member is
    # tiny): reading only the footer would report the last member's size
    raw = open(fna, "rb").read()
    multi = str(tmp_path / "multi.fna.gz")
    with open(multi, "wb") as f:
        f.write(gzip.compress(raw[:300]))
        f.write(gzip.compress(raw[300:]))
        f.write(gzip.compress(b""))  # BGZF-style empty EOF member
    for a, b in zip(parse_fasta_records(fna), parse_fasta_records(multi)):
        np.testing.assert_array_equal(a, b)
    assert estimate_window_count(multi, 150) == est


def test_gz_pipeline_end_to_end(data_dir, tmp_path):
    """build-index from ref.fna.gz + pipeline on reads.fastq.gz — outputs
    equal the uncompressed run's exactly."""
    from deepreadmapper_tpu.models.encoder import Vectorizer
    from deepreadmapper_tpu.pipeline.build import build_index
    from deepreadmapper_tpu.pipeline.search import run_pipeline

    fna = str(data_dir / "ecoli_150.fna")
    fq = str(data_dir / "test_data.fastq")
    fna_gz = _gz(fna, str(tmp_path / "ref.fna.gz"))
    fq_gz = _gz(fq, str(tmp_path / "reads.fastq.gz"))
    vec = Vectorizer(device_batch=2048)

    p1 = str(tmp_path / "idx_plain")
    p2 = str(tmp_path / "idx_gz")
    build_index(fna, p1, 150, index_type="INT8FLAT", vectorizer=vec)
    build_index(fna_gz, p2, 150, index_type="INT8FLAT", vectorizer=vec)
    a = np.load(os.path.join(p1, "int8.npz"))
    b = np.load(os.path.join(p2, "int8.npz"))
    np.testing.assert_array_equal(a["codes"], b["codes"])

    o1 = str(tmp_path / "o1")
    o2 = str(tmp_path / "o2")
    run_pipeline(p1, fq, fna, k=8, output_dir=o1, vectorizer=vec, qual=True)
    run_pipeline(p2, fq_gz, fna_gz, k=8, output_dir=o2, vectorizer=vec,
                 qual=True)
    np.testing.assert_array_equal(
        np.load(os.path.join(o1, "indices.npy")),
        np.load(os.path.join(o2, "indices.npy")),
    )
    s1 = open(os.path.join(o1, "results.sam")).read()
    s2 = open(os.path.join(o2, "results.sam")).read()
    # headers differ only in the @PG CL (file names); alignment lines equal
    body = lambda s: [l for l in s.splitlines() if not l.startswith("@")]
    assert body(s1) == body(s2)
