"""Serving daemon (pipeline.serve): one resident engine, JSONL protocol.

Beyond the reference (which reloads the index every run, main.cpp:34-47):
steady-state requests reuse the loaded engine, its compiled search, and
the index-matched encoder."""

import io
import json
import os

import numpy as np
import pytest

from deepreadmapper_tpu.pipeline.build import build_index
from deepreadmapper_tpu.pipeline.serve import serve


@pytest.fixture(scope="module")
def idx(tmp_path_factory, data_dir):
    prefix = str(tmp_path_factory.mktemp("srv") / "idx")
    build_index(
        str(data_dir / "ecoli_150.fna"), prefix, 150, index_type="INT8FLAT"
    )
    return prefix


def _run(idx, data_dir, requests):
    out = io.StringIO()
    n = serve(
        idx,
        str(data_dir / "ecoli_150.fna"),
        in_stream=io.StringIO("".join(json.dumps(r) + "\n" for r in requests)),
        out_stream=out,
    )
    lines = [json.loads(l) for l in out.getvalue().splitlines()]
    return n, lines


def test_serve_answers_requests_and_quits(idx, data_dir, tmp_path):
    fq = str(data_dir / "test_data.fastq")
    o1, o2 = str(tmp_path / "o1"), str(tmp_path / "o2")
    n, lines = _run(idx, data_dir, [
        {"id": "a", "fastq": fq, "output_dir": o1, "k": 8},
        {"id": "b", "fastq": fq, "output_dir": o2, "k": 8,
         "write_sam": False},
        {"cmd": "quit"},
    ])
    assert n == 2
    ready, ra, rb, rq = lines
    assert ready["ready"] and ready["index_type"] == "INT8FLAT"
    assert ra == {**ra, "id": "a", "ok": True, "num_queries": 150}
    assert rb["ok"] and rq["quit"]
    assert os.path.exists(os.path.join(o1, "results.sam"))
    idx_np = np.load(os.path.join(o1, "indices.npy"))
    assert idx_np.shape == (150, 8)
    assert not os.path.exists(os.path.join(o2, "results.sam"))


def test_serve_survives_bad_requests(idx, data_dir, tmp_path):
    fq = str(data_dir / "test_data.fastq")
    out = str(tmp_path / "out")
    n, lines = _run(idx, data_dir, [
        {"id": "bad", "fastq": "/nonexistent.fastq", "output_dir": out},
        {"id": "nofq"},
        {"id": "ok", "fastq": fq, "output_dir": out, "k": 4},
    ])
    assert n == 1  # only the good request served; daemon never died
    _ready, bad, nofq, ok = lines
    assert bad["ok"] is False and bad["id"] == "bad"
    assert nofq["ok"] is False and "fastq" in nofq["error"]
    assert ok["ok"] and ok["num_queries"] == 150


def test_serve_paired_request(idx, data_dir, tmp_path):
    """A request carrying fastq2 routes through the paired driver on the
    RESIDENT engine and reports pair stats."""
    from deepreadmapper_tpu.io import fasta as fasta_io

    genome = fasta_io.parse_fasta_records(
        str(data_dir / "ecoli_150.fna")
    )[0].tobytes().decode()
    comp = str.maketrans("ACGT", "TGCA")
    isize, L = 400, 150
    f1 = str(tmp_path / "r1.fastq")
    f2 = str(tmp_path / "r2.fastq")
    with open(f1, "w") as a, open(f2, "w") as b:
        for i, s in enumerate((0, 150, 300)):
            a.write(f"@q{i}\n{genome[s:s+L]}\n+\n{'I'*L}\n")
            m = genome[s+isize-L:s+isize].translate(comp)[::-1]
            b.write(f"@q{i}\n{m}\n+\n{'I'*L}\n")
    out = str(tmp_path / "pe_out")
    n, lines = _run(idx, data_dir, [
        {"id": "pe", "fastq": f1, "fastq2": f2, "output_dir": out, "k": 8,
         "max_isize": 600, "mapq": True},
        {"cmd": "quit"},
    ])
    assert n == 1
    r = lines[1]
    assert r["ok"] and r["num_queries"] == 6
    flags = [int(l.split("\t")[1])
             for l in open(os.path.join(out, "results.sam"))
             if not l.startswith("@")]
    assert sum(1 for f in flags if f & 0x900 == 0 and f & 0x2) == 6


def test_cli_serve_dispatch(idx, data_dir, monkeypatch, capsys):
    from deepreadmapper_tpu import cli

    monkeypatch.setattr(
        "sys.stdin", io.StringIO(json.dumps({"cmd": "quit"}) + "\n")
    )
    rc = cli.main(["serve", idx, str(data_dir / "ecoli_150.fna")])
    assert rc == 0
    outs = [json.loads(l) for l in capsys.readouterr().out.splitlines()]
    assert outs[0]["ready"] and outs[1]["quit"]


def test_paired_request_keys_match_paired_signature():
    """The paired-path kwarg allowlist derives from _REQ_KEYS; every
    forwarded key must be a real run_pipeline_paired parameter (the
    hand-copied list drifted once — read_group was silently dropped)."""
    import inspect

    from deepreadmapper_tpu.pipeline.search import run_pipeline_paired
    from deepreadmapper_tpu.pipeline.serve import _REQ_KEYS

    params = set(inspect.signature(run_pipeline_paired).parameters)
    forwarded = set(_REQ_KEYS) - {"use_dynamic"}
    missing = forwarded - params
    assert not missing, f"keys with no paired parameter: {missing}"
    assert "read_group" in forwarded


def test_serve_search_stats(tmp_path_factory, data_dir, tmp_path):
    """search_stats=true returns IVF effort counters (probed rows /
    coverage) in the response — the nprobe-tuning surface."""
    prefix = str(tmp_path_factory.mktemp("srv_ivf") / "idx")
    build_index(
        str(data_dir / "ecoli_150.fna"), prefix, 150, index_type="IVFINT8"
    )
    fq = str(data_dir / "test_data.fastq")
    n, lines = _run(prefix, data_dir, [
        {"id": "s", "fastq": fq, "output_dir": str(tmp_path / "o"),
         "k": 8, "ef": 4, "search_stats": True},
        {"cmd": "quit"},
    ])
    assert n == 1
    st = lines[1]["search_stats"]
    assert st["queries"] == 150 and st["nprobe"] == 4
    assert 0 < st["probed_rows_per_query"] <= st["ntotal"]
    assert 0 < st["coverage"] <= 1.0
    assert st["centroid_evals_per_query"] == st["nlist"]
