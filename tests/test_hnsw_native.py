"""Native HNSW builder: quality parity with the Python specification."""

import numpy as np
import pytest

from deepreadmapper_tpu import native
from deepreadmapper_tpu.index.flat import FlatIndex
from deepreadmapper_tpu.index.hnsw import HNSWFlatIndex
from deepreadmapper_tpu.index.hnsw_build import build_hnsw, build_hnsw_python

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


def test_native_and_python_builders_same_recall():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1500, 64)).astype(np.float32)
    q = x[:100] + np.float32(0.05)
    ids_o, _ = FlatIndex(x).search(q, 10)

    def recall(graph_builder):
        g = graph_builder(x, m=8, efc=60)
        idx = HNSWFlatIndex(g, None, None, x, x.shape[0])
        ids, _ = idx.search(q, 10, ef=64)
        return np.mean([len(set(ids_o[i]) & set(ids[i])) / 10 for i in range(100)])

    r_native = recall(lambda *a, **k: build_hnsw(*a, use_native=True, **k))
    r_python = recall(lambda *a, **k: build_hnsw(*a, use_native=False, **k))
    assert r_native > 0.85, f"native-built graph recall {r_native:.2f}"
    assert abs(r_native - r_python) < 0.1, (
        f"builders diverge: native {r_native:.2f} vs python {r_python:.2f}"
    )


def test_native_graph_structure():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2000, 32)).astype(np.float32)
    g = build_hnsw(x, m=8, efc=50, use_native=True)
    assert g.neighbors0.shape == (2000, 16)
    counts = (g.neighbors0 >= 0).sum(axis=1)
    assert counts.min() >= 1, "isolated node"
    assert (g.neighbors0 < 2000).all()
    # Upper levels reference only nodes that exist at that level.
    for gids, nbrs in zip(g.level_gids, g.level_nbrs):
        assert (nbrs < gids.size).all()
