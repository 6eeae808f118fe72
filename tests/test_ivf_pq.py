"""IVFPQ engine: cluster-pruned ADC scan over PQ codes (index/ivf_pq.py).

The >1B-row tier: coarse pruning (IVFINT8's slab machinery) at PQ memory
footprint (PQFLAT's codes).  Replaces the pruning role of the reference's
FAISS IndexHNSWPQ (src/hnswpq/index.cpp:86-193, search.cpp:6-57) with the
TPU-native coarse quantizer.  Correctness invariants under test: a full
probe equals the exhaustive PQ scan over the SAME codebook (the probe set
is the only approximation), the byte-packed code layout round-trips, the
distance convention matches PQFlatIndex, and OPQ rotations flow through.
"""

import numpy as np
import pytest

from deepreadmapper_tpu.config import BuildConfig
from deepreadmapper_tpu.index.ivf_pq import IVFPQIndex, pack_codes_t
from deepreadmapper_tpu.index.pq_flat import PQFlatIndex


@pytest.fixture(scope="module")
def clustered():
    rng = np.random.default_rng(11)
    centers = np.tanh(rng.standard_normal((64, 128))).astype(np.float32)
    assign = rng.integers(0, 64, 8000)
    x = centers[assign] + 0.05 * rng.standard_normal((8000, 128)).astype(
        np.float32
    )
    return np.clip(x, -1, 1)


def test_pack_codes_roundtrip():
    rng = np.random.default_rng(0)
    for m in (8, 16, 5):  # m % 4 != 0 exercises the pad words
        codes = rng.integers(0, 256, (37, m)).astype(np.uint8)
        packed = pack_codes_t(codes)
        assert packed.shape == (-(-m // 4), 37)
        u = packed.view(np.uint32)
        for j in range(m):
            got = (u[j // 4] >> (8 * (j % 4))) & 0xFF
            np.testing.assert_array_equal(got, codes[:, j].astype(np.uint32))


def test_layout_invariants(clustered):
    idx = IVFPQIndex.build(clustered)
    ids = idx.row_ids[idx.row_ids >= 0]
    assert len(ids) == idx.ntotal
    assert len(np.unique(ids)) == idx.ntotal
    slots = np.nonzero(idx.row_ids >= 0)[0]
    counts = np.bincount(slots // idx.cap, minlength=idx.nlist)
    assert counts.max() <= idx.cap


def test_full_probe_matches_pqflat(clustered):
    """nprobe == nlist scans everything -> must match the exhaustive ADC
    scan over the same codebook (exact=True oracle; the probe set is the
    only approximation in the engine)."""
    x = clustered
    q = x[:48] + np.float32(0.01)
    idx = IVFPQIndex.build(x)
    oracle = PQFlatIndex(
        # same codes, same codebook: IVFPQ's rows re-ordered into slabs
        # must not change the candidate set
        _codes_in_row_order(idx), idx.codebook, idx.ntotal, rot=idx.rot
    )
    oi, od = oracle.search(q, 10, exact=True)
    ii, dd = idx.search(q, 10, ef=idx.nlist)
    recall = np.mean(
        [len(set(oi[i]) & set(ii[i])) / 10 for i in range(len(q))]
    )
    assert recall >= 0.99, recall
    # distances share PQFlatIndex's squared-L2 ADC convention
    np.testing.assert_allclose(dd[:, 0], od[:, 0], rtol=1e-4, atol=1e-4)


def _codes_in_row_order(idx: IVFPQIndex) -> np.ndarray:
    filled = idx.row_ids >= 0
    codes = np.empty((idx.ntotal, idx.codes_cm.shape[1]), np.uint8)
    codes[idx.row_ids[filled]] = idx.codes_cm[filled]
    return codes


def test_pruned_recall_on_clustered(clustered):
    x = clustered
    q = x[:128] + np.float32(0.01)
    idx = IVFPQIndex.build(x)
    oracle = PQFlatIndex(
        _codes_in_row_order(idx), idx.codebook, idx.ntotal, rot=idx.rot
    )
    oi, _ = oracle.search(q, 10, exact=True)
    nprobe = max(4, idx.nlist // 8)
    ii, _ = idx.search(q, 10, ef=nprobe)
    recall = np.mean(
        [len(set(oi[i]) & set(ii[i])) / 10 for i in range(len(q))]
    )
    assert recall >= 0.9, f"recall {recall} at nprobe={nprobe}/{idx.nlist}"


def test_opq_build_and_search(clustered):
    x = clustered[:3000]
    q = x[:32] + np.float32(0.01)
    idx = IVFPQIndex.build(x, BuildConfig(opq=True, opq_iters=3))
    assert idx.rot is not None
    ii, dd = idx.search(q, 10, ef=idx.nlist)
    # self-neighbors must surface: queries are tiny perturbations of rows
    top1 = np.mean(ii[:, 0] == np.arange(32))
    assert top1 >= 0.9, top1


def test_save_load_roundtrip(tmp_path, clustered):
    idx = IVFPQIndex.build(clustered[:2000], BuildConfig(opq=True,
                                                         opq_iters=2))
    q = clustered[:16]
    i1, d1 = idx.search(q, 5, ef=8)
    idx.save(str(tmp_path))
    idx2 = IVFPQIndex.load(str(tmp_path))
    i2, d2 = idx2.search(q, 5, ef=8)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(d1, d2)


def test_edge_cases(clustered):
    x = clustered[:300]
    idx = IVFPQIndex.build(x, BuildConfig(nlist=8))
    ii, dd = idx.search(x[:4], 400, ef=8)
    assert ii.shape == (4, 400)
    assert (ii[:, 350:] == -1).all()
    assert np.isinf(dd[:, 350:]).all()
    ii, dd = idx.search(np.zeros((0, 128), np.float32), 5)
    assert ii.shape == (0, 5)
    ii, dd = idx.search(x[:4], 5, ef=10_000)
    assert (ii[:, 0] >= 0).all()


def test_e2e_pipeline_ecoli(tmp_path, data_dir):
    """FASTA -> IVFPQ streaming build (two-pass PQ stream-encode) -> FASTQ
    -> SAM pipeline on the ecoli fixture; top-1 must track the exact FLAT
    engine (ample nprobe)."""
    from deepreadmapper_tpu.models.encoder import Vectorizer
    from deepreadmapper_tpu.pipeline.build import build_index
    from deepreadmapper_tpu.pipeline.search import run_pipeline

    vec = Vectorizer(device_batch=2048)
    prefix = str(tmp_path / "idx")
    cfg = build_index(
        str(data_dir / "ecoli_150.fna"), prefix, ref_len=150, stride=1,
        index_type="IVFPQ", vectorizer=vec,
    )
    assert cfg["n_vects"] == 1702
    out = str(tmp_path / "out")
    run_pipeline(
        prefix, str(data_dir / "test_data.fastq"),
        str(data_dir / "ecoli_150.fna"), ef=1_000_000, k=16, output_dir=out,
        vectorizer=vec,
    )
    ids = np.load(tmp_path / "out" / "indices.npy")
    assert ids.shape == (150, 16)

    # PQFLAT with the same seed trains the identical codebook, so IVFPQ's
    # full probe must reproduce its top-1 (PQ8 quantization itself costs
    # ~1/3 of top-1 vs fp32 on this 1,702-window fixture — measured; the
    # engine's only approximation is the probe set, which a full probe
    # removes)
    fprefix = str(tmp_path / "fidx")
    build_index(
        str(data_dir / "ecoli_150.fna"), fprefix, ref_len=150, stride=1,
        index_type="PQFLAT", vectorizer=vec,
    )
    fout = str(tmp_path / "fout")
    run_pipeline(
        fprefix, str(data_dir / "test_data.fastq"),
        str(data_dir / "ecoli_150.fna"), ef=128, k=16, output_dir=fout,
        vectorizer=vec,
    )
    fids = np.load(tmp_path / "fout" / "indices.npy")
    agree = np.mean(ids[:, 0] == fids[:, 0])
    assert agree >= 0.95, agree


def test_kernel_path_matches_oracle(clustered, monkeypatch):
    """IVFPQ Pallas slab-scan (interpret mode on CPU): full probe at
    cap == KP reproduces the exhaustive same-codebook ADC scan exactly."""
    from deepreadmapper_tpu.ops import ivf_kernel as ik

    x = clustered[:4000]
    q = x[:24] + np.float32(0.01)
    monkeypatch.setattr(ik, "INTERPRET", True)
    idx = IVFPQIndex.build(x)
    assert idx._use_kernel() and idx.cap % ik.KP == 0
    oracle = PQFlatIndex(
        _codes_in_row_order(idx), idx.codebook, idx.ntotal, rot=idx.rot
    )
    oi, od = oracle.search(q, 10, exact=True)
    ii, dd = idx.search(q, 10, ef=idx.nlist)
    recall = np.mean(
        [len(set(oi[i]) & set(ii[i])) / 10 for i in range(len(q))]
    )
    assert recall >= 0.99, recall
    np.testing.assert_allclose(dd[:, 0], od[:, 0], rtol=1e-4, atol=1e-4)


def test_kernel_multi_chunk_visits_match_oracle(clustered, monkeypatch):
    """The cross-chunk accumulator (VMEM scratch ping-pong + _combine_top2
    — the genome-scale regime where a slab's fill spans several CHK-row
    chunks) must produce the SAME selection as single-chunk visits: force
    multi-chunk slabs on the small fixture by shrinking CHK and compare
    against the default-layout run of the identical build."""
    from deepreadmapper_tpu.config import BuildConfig
    from deepreadmapper_tpu.ops import ivf_kernel as ik

    x = clustered
    q = x[:24] + np.float32(0.01)
    monkeypatch.setattr(ik, "INTERPRET", True)
    idx = IVFPQIndex.build(x, BuildConfig(nlist=8))  # fill >> KP per slab
    assert idx._use_kernel() and idx.cap > 3 * ik.KP
    ii, dd = idx.search(q, 10, ef=idx.nlist)

    monkeypatch.setattr(ik, "CHK", 2 * ik.KP)  # force >=2 chunks per slab
    idx2 = IVFPQIndex.build(x, BuildConfig(nlist=8))  # same slab layout
    assert idx2.cap == idx.cap
    assert idx2._chunk_meta()[0][: idx2.n_slabs].max() >= 2
    i2, d2 = idx2.search(q, 10, ef=idx2.nlist)
    np.testing.assert_array_equal(ii, i2)
    np.testing.assert_allclose(dd, d2, rtol=1e-6, atol=1e-6)
