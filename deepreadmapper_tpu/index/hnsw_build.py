"""HNSW graph construction (host).

A from-scratch HNSW builder in the spirit of the reference's native engines
(FAISS IndexHNSWPQ, src/hnswpq/index.cpp:110-175; hand-written hnswm,
src/hnswm/hnsw.cpp:466-796): exponential level assignment (seeded,
deterministic), efConstruction beam search per insert, heuristic neighbor
selection with degree pruning M / 2M.

Construction is sequential by nature, so it runs on host over fp32 vectors
with vectorized numpy distance batches; the search side (hnsw.py) is the
TPU-vectorized part.  A native C++ builder can drop in behind the same arrays
for genome-scale builds.

Graph layout produced (device-friendly padded CSR):
  neighbors0  [N, 2M] int32, -1 padded              (level 0)
  levels[l>=1]: gids [nl] int64 ascending, nbr_rows [nl, M] int32 row indices
                within the SAME level, -1 padded
  entry_gid, max_level
"""

from __future__ import annotations

import heapq
from typing import NamedTuple

import numpy as np


class HNSWGraphData(NamedTuple):
    neighbors0: np.ndarray
    level_gids: list[np.ndarray]
    level_nbrs: list[np.ndarray]
    entry_gid: int
    max_level: int
    m: int


def assign_levels(n: int, m: int, seed: int = 5489) -> np.ndarray:
    """Exponential level assignment, deterministic by seed (hnswlib/FAISS
    use mult = 1/ln(M))."""
    rng = np.random.default_rng(seed)
    mult = 1.0 / np.log(m)
    u = rng.random(n)
    return np.floor(-np.log(u) * mult).astype(np.int32)


def _select_neighbors_heuristic(
    vectors: np.ndarray, q_idx: int, cand: list[tuple[float, int]], m: int
) -> list[int]:
    """FAISS/hnswlib shrink heuristic: keep a candidate only if it is closer
    to the query than to every already-selected neighbor."""
    cand = sorted(cand)
    selected: list[int] = []
    for dq, c in cand:
        if len(selected) >= m:
            break
        if not selected:
            selected.append(c)
            continue
        vc = vectors[c]
        dsel = ((vectors[selected] - vc) ** 2).sum(axis=1)
        if (dq < dsel).all():
            selected.append(c)
    return selected


class _Builder:
    def __init__(self, vectors: np.ndarray, m: int, efc: int, seed: int):
        self.v = vectors.astype(np.float32)
        n = vectors.shape[0]
        self.m = m
        self.m0 = 2 * m
        self.efc = efc
        self.levels = assign_levels(n, m, seed)
        self.max_level = int(self.levels.max(initial=0))
        # adjacency per level: arrays [N, cap] with counts
        self.nbrs = []
        self.cnt = []
        for lvl in range(self.max_level + 1):
            cap = self.m0 if lvl == 0 else self.m
            mask = self.levels >= lvl
            self.nbrs.append(np.full((n, cap), -1, dtype=np.int32))
            self.cnt.append(np.zeros(n, dtype=np.int32))
        self.entry = -1

    def _dist(self, q: np.ndarray, ids) -> np.ndarray:
        d = self.v[ids] - q
        return np.einsum("ij,ij->i", d, d)

    def _search_layer(self, q: np.ndarray, eps: list[int], ef: int, lvl: int):
        """Returns list of (dist, id), ascending, len <= ef."""
        visited = set(eps)
        cand = [(float(d), e) for d, e in zip(self._dist(q, eps), eps)]
        heapq.heapify(cand)  # min-heap on distance
        best = [(-d, e) for d, e in cand]
        heapq.heapify(best)  # max-heap via negation
        while len(best) > ef:
            heapq.heappop(best)
        while cand:
            d, c = heapq.heappop(cand)
            if len(best) >= ef and d > -best[0][0]:
                break
            nb = self.nbrs[lvl][c]
            nb = nb[nb >= 0]
            fresh = [x for x in nb if x not in visited]
            if not fresh:
                continue
            visited.update(fresh)
            ds = self._dist(q, fresh)
            for dn, x in zip(ds, fresh):
                if len(best) < ef or dn < -best[0][0]:
                    heapq.heappush(cand, (float(dn), int(x)))
                    heapq.heappush(best, (-float(dn), int(x)))
                    if len(best) > ef:
                        heapq.heappop(best)
        return sorted((-d, e) for d, e in best)

    def _connect(self, lvl: int, a: int, b: int, cap: int):
        """Add edge a->b, pruning with the heuristic when full."""
        row = self.nbrs[lvl][a]
        c = self.cnt[lvl][a]
        if c < cap:
            row[c] = b
            self.cnt[lvl][a] = c + 1
            return
        # prune: rank current neighbors + b by the selection heuristic
        ids = np.append(row[:c], b)
        dq = self._dist(self.v[a], ids)
        keep = _select_neighbors_heuristic(
            self.v, a, list(zip(dq.tolist(), ids.tolist())), cap
        )
        row[:] = -1
        row[: len(keep)] = keep
        self.cnt[lvl][a] = len(keep)

    def add(self, i: int):
        lvl = int(self.levels[i])
        if self.entry < 0:
            self.entry = i
            return
        q = self.v[i]
        ep = [self.entry]
        top = int(self.levels[self.entry])
        for l in range(top, lvl, -1):
            res = self._search_layer(q, ep, 1, l)
            ep = [res[0][1]]
        for l in range(min(top, lvl), -1, -1):
            res = self._search_layer(q, ep, self.efc, l)
            cap = self.m0 if l == 0 else self.m
            sel = _select_neighbors_heuristic(self.v, i, res, self.m)
            for s in sel:
                self._connect(l, i, s, cap)
                self._connect(l, s, i, cap)
            ep = [e for _, e in res]
        if lvl > top:
            self.entry = i

    def finish(self) -> HNSWGraphData:
        n = self.v.shape[0]
        level_gids: list[np.ndarray] = []
        level_nbrs: list[np.ndarray] = []
        for lvl in range(1, self.max_level + 1):
            gids = np.flatnonzero(self.levels >= lvl).astype(np.int64)
            rowmap = np.full(n, -1, dtype=np.int32)
            rowmap[gids] = np.arange(gids.size, dtype=np.int32)
            nb = self.nbrs[lvl][gids]
            nb_rows = np.where(nb >= 0, rowmap[np.maximum(nb, 0)], -1).astype(np.int32)
            level_gids.append(gids)
            level_nbrs.append(nb_rows)
        return HNSWGraphData(
            neighbors0=self.nbrs[0],
            level_gids=level_gids,
            level_nbrs=level_nbrs,
            entry_gid=int(self.entry),
            max_level=self.max_level,
            m=self.m,
        )


def build_hnsw_python(
    vectors: np.ndarray, m: int = 16, efc: int = 200, seed: int = 5489
) -> HNSWGraphData:
    """Pure-Python builder — the readable specification and fallback."""
    b = _Builder(vectors, m, efc, seed)
    for i in range(vectors.shape[0]):
        b.add(i)
    return b.finish()


def build_hnsw(
    vectors: np.ndarray,
    m: int = 16,
    efc: int = 200,
    seed: int = 5489,
    use_native: bool | None = None,
) -> HNSWGraphData:
    """HNSW construction: native C++ builder (native/drm_hnsw.cpp, ~1000x
    faster) when available, Python fallback.  Both run the same algorithm on
    the same deterministic level assignment."""
    from deepreadmapper_tpu import native

    if use_native is None:
        use_native = native.available()
    if not use_native:
        return build_hnsw_python(vectors, m, efc, seed)

    n = vectors.shape[0]
    levels = assign_levels(n, m, seed)
    max_level = int(levels.max(initial=0))
    neighbors0, upper, entry = native.hnsw_build(vectors, levels, m, efc)
    level_gids: list[np.ndarray] = []
    level_nbrs: list[np.ndarray] = []
    row = 0
    for lvl in range(1, max_level + 1):
        gids = np.flatnonzero(levels >= lvl).astype(np.int64)
        rowmap = np.full(n, -1, dtype=np.int32)
        rowmap[gids] = np.arange(gids.size, dtype=np.int32)
        nb = upper[row : row + gids.size]
        nb_rows = np.where(nb >= 0, rowmap[np.maximum(nb, 0)], -1).astype(np.int32)
        level_gids.append(gids)
        level_nbrs.append(nb_rows)
        row += gids.size
    return HNSWGraphData(
        neighbors0=neighbors0,
        level_gids=level_gids,
        level_nbrs=level_nbrs,
        entry_gid=entry,
        max_level=max_level,
        m=m,
    )
