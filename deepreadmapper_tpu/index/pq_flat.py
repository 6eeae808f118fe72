"""Exhaustive PQ/ADC scan index.

The IVF-style fallback SURVEY.md §7 anticipates: instead of traversing a
graph, scan ALL PQ codes with ADC distances — on TPU the one-hot-matmul ADC
(ops/pq.py) turns the scan into MXU matmuls, and an exhaustive scan at 8
bytes/vector of HBM traffic is often faster (and recall-exact w.r.t. PQ) than
divergent graph descent.  Same quantization error as FAISS IndexHNSWPQ, none
of its graph recall loss.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from deepreadmapper_tpu.config import BuildConfig
from deepreadmapper_tpu.index.registry import register_index
from deepreadmapper_tpu.ops import pq as pq_ops

_BIG = jnp.float32(3.4e38)


@functools.partial(jax.jit, static_argnames=("k", "chunk", "exact"))
def _adc_topk(tables: jax.Array, codes: jax.Array, ntotal: jax.Array, k: int,
              chunk: int, exact: bool = True):
    """Streaming top-k over an exhaustive ADC scan.

    tables [Q, m, ksub], codes [N, m] (N padded to chunk multiple); rows with
    id >= ntotal are padding and masked to +inf inside the scan.
    """
    qn = tables.shape[0]
    n = codes.shape[0]
    n_chunks = n // chunk
    code_chunks = codes.reshape(n_chunks, chunk, codes.shape[1])

    def step(carry, inp):
        best_d, best_i = carry
        cc, c_idx = inp
        onehot = pq_ops.codes_to_onehot(cc)
        d = pq_ops.adc_distances_onehot(tables, onehot)  # [Q, chunk]
        ids = c_idx * chunk + jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
        d = jnp.where(ids < ntotal, d, _BIG)
        if exact:
            nd, pos = jax.lax.top_k(-d, k)
        else:
            # TPU-native partial reduction: ~15x faster than top_k at 2M rows
            nd, pos = jax.lax.approx_max_k(-d, k, recall_target=0.95)
        nid = jnp.take_along_axis(jnp.broadcast_to(ids, d.shape), pos, axis=1)
        cat_d = jnp.concatenate([best_d, -nd], axis=1)
        cat_i = jnp.concatenate([best_i, nid], axis=1)
        neg, pos2 = jax.lax.top_k(-cat_d, k)
        return (-neg, jnp.take_along_axis(cat_i, pos2, axis=1)), None

    init = (
        jnp.full((qn, k), _BIG, dtype=jnp.float32),
        jnp.zeros((qn, k), dtype=jnp.int32),
    )
    (d, i), _ = jax.lax.scan(
        step, init, (code_chunks, jnp.arange(n_chunks, dtype=jnp.int32))
    )
    return d, i


@register_index("PQFLAT")
class PQFlatIndex:
    def __init__(self, codes: np.ndarray, codebook: pq_ops.PQCodebook, ntotal: int):
        self.codes = codes
        self.codebook = codebook
        self.ntotal = ntotal

    @classmethod
    def build(cls, embeddings: np.ndarray, cfg: BuildConfig | None = None):
        cfg = cfg or BuildConfig()
        train = pq_ops.sample_training_set(embeddings, cfg.sample_rate)
        cb = pq_ops.train_pq(
            train, m=cfg.m_pq, nbits=cfg.nbits, iters=cfg.kmeans_iters, seed=cfg.seed
        )
        codes = pq_ops.encode_pq(embeddings, cb)
        return cls(codes, cb, embeddings.shape[0])

    def search(self, queries: np.ndarray, k: int, ef: int = 0,
               chunk: int = 131072, exact: bool = True):
        """ef accepted for interface parity; an exhaustive scan ignores it.
        exact=False swaps the per-chunk top_k for approx_max_k (faster at
        genome scale; default stays exact-in-PQ-space for parity)."""
        n = self.ntotal
        queries = np.asarray(queries, np.float32)
        if n == 0:
            return (
                np.full((queries.shape[0], k), -1, np.int64),
                np.full((queries.shape[0], k), np.inf, np.float32),
            )
        k_eff = min(k, n)
        codes = self.codes
        pad = (-n) % min(chunk, max(n, 1))
        eff_chunk = min(chunk, n + pad)
        if pad:
            codes = np.concatenate(
                [codes, np.zeros((pad, codes.shape[1]), np.uint8)], axis=0
            )
        codes_j = jnp.asarray(codes)
        nq = queries.shape[0]
        q_batch = 8192  # bound the [q_batch, chunk] score tensor
        pending = []
        for s in range(0, nq, q_batch):
            e = min(s + q_batch, nq)
            qb = queries[s:e]
            if e - s < q_batch and nq > q_batch:
                # pad the tail batch: one compiled program per shape signature
                qb = np.pad(qb, ((0, q_batch - (e - s)), (0, 0)))
            tables = pq_ops.adc_tables(jnp.asarray(qb), self.codebook.centroids)
            pending.append(
                (s, e, _adc_topk(tables, codes_j, jnp.int32(n), k_eff, eff_chunk, exact))
            )
        d = np.empty((nq, k_eff), np.float32)
        i = np.empty((nq, k_eff), np.int64)
        for s, e, (db, ib) in pending:
            d[s:e] = np.asarray(db)[: e - s]
            i[s:e] = np.asarray(ib, dtype=np.int64)[: e - s]
        if k_eff < k:
            d = np.pad(d, ((0, 0), (0, k - k_eff)), constant_values=np.inf)
            i = np.pad(i, ((0, 0), (0, k - k_eff)), constant_values=-1)
        return i, d

    def save(self, index_prefix: str) -> None:
        os.makedirs(index_prefix, exist_ok=True)
        np.savez(
            os.path.join(index_prefix, "pq.npz"),
            codes=self.codes,
            centroids=np.asarray(self.codebook.centroids),
            ntotal=self.ntotal,
        )

    @classmethod
    def load(cls, index_prefix: str, config: dict | None = None):
        z = np.load(os.path.join(index_prefix, "pq.npz"))
        return cls(
            z["codes"],
            pq_ops.PQCodebook(jnp.asarray(z["centroids"])),
            int(z["ntotal"]),
        )
