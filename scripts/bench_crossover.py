"""Measure the exact-matmul vs HNSW-beam search crossover on one chip.

On TPU the brute-force top-k is pure MXU work while graph traversal is
gather-bound, so — unlike CPU FAISS — exhaustive search stays competitive to
surprisingly large N.  This script documents the crossover that motivates the
index_type choice (FLAT/PQFLAT for small-to-mid N, HNSW* beyond).
"""

import time

import numpy as np
import jax

from deepreadmapper_tpu.config import BuildConfig
from deepreadmapper_tpu.index.hnsw import HNSWFlatIndex, HNSWPQIndex
from deepreadmapper_tpu.ops.topk import l2_topk


def main():
    rng = np.random.default_rng(0)
    q_count = 4096
    q = rng.standard_normal((q_count, 128)).astype(np.float32)

    for n in (100_000, 200_000):
        x = rng.standard_normal((n, 128)).astype(np.float32)
        xj = jax.device_put(x)
        qj = jax.device_put(q)
        np.asarray(l2_topk(qj, xj, 128)[1][:1])
        t0 = time.time()
        for _ in range(3):
            np.asarray(l2_topk(qj, xj, 128)[1][:1, :1])
        dt = (time.time() - t0) / 3
        print(f"N={n}: exact matmul top-128: {dt*1000:6.0f} ms -> {q_count/dt:8.0f} q/s", flush=True)

        t0 = time.time()
        idx = HNSWFlatIndex.build(x, BuildConfig(build_mode="knn"))
        print(f"N={n}: knn build {time.time()-t0:.0f}s", flush=True)
        ids, _ = idx.search(q, 128, ef=128)
        t0 = time.time()
        for _ in range(3):
            idx.search(q, 128, ef=128)
        dt = (time.time() - t0) / 3
        print(f"N={n}: HNSWFLAT beam ef=128: {dt*1000:6.0f} ms -> {q_count/dt:8.0f} q/s", flush=True)
        io_ = np.asarray(l2_topk(qj, xj, 10)[1])
        rec = np.mean([len(set(io_[r]) & set(ids[r][:10])) / 10 for r in range(256)])
        print(f"N={n}: HNSWFLAT recall@10: {rec:.3f}", flush=True)

        pidx = HNSWPQIndex.build(x, BuildConfig(build_mode="knn"))
        pidx.search(q, 128, ef=128)
        t0 = time.time()
        for _ in range(3):
            pidx.search(q, 128, ef=128)
        dt = (time.time() - t0) / 3
        print(f"N={n}: HNSWPQ beam ef=128:  {dt*1000:6.0f} ms -> {q_count/dt:8.0f} q/s", flush=True)

        from deepreadmapper_tpu.index.pq_flat import PQFlatIndex

        fidx = PQFlatIndex.build(x, BuildConfig())
        fidx.search(q, 128)
        t0 = time.time()
        for _ in range(3):
            fidx.search(q, 128)
        dt = (time.time() - t0) / 3
        print(f"N={n}: PQFLAT ADC scan:     {dt*1000:6.0f} ms -> {q_count/dt:8.0f} q/s", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
