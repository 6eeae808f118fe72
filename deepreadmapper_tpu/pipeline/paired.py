"""Paired-end resolution: pick the (R1, R2) candidate pair that forms a
proper FR pair, score it, and derive pair-aware MAPQ.

The reference has no pairing at all (single FASTQ in, independent reads
out) even though its fixture reads carry wgsim `/1` pair suffixes.  Here
both ends run the normal single-end pipeline (search + rerank) and the
pairing step then chooses, per pair, the candidate combination that is
FR-oriented within the insert-size bound — which both fixes orientation
errors and disambiguates repeats: a repeat locus that ties on one end
almost never ties TOGETHER with the mate's locus.

Conventions: candidate ids are dense window ids (2*pos + strand, pos in
the concatenated base stream for single-record refs / record-cumulative
window space for multi — pairing operates on the raw id>>1 coordinate,
which is monotone within a record either way).  Proper FR pair: ends on
opposite strands, forward end's position <= reverse end's position, and
outer distance (TLEN) within [min_isize, max_isize].
"""

from __future__ import annotations

import numpy as np

PAD_ID = -1


def resolve_pairs(
    ids1: np.ndarray,
    d1: np.ndarray,
    ids2: np.ndarray,
    d2: np.ndarray,
    read_len1: np.ndarray,
    read_len2: np.ndarray,
    max_isize: int,
    min_isize: int = 0,
    ref_len: int = 150,
    dense_off: np.ndarray | None = None,
) -> dict:
    """Choose the best proper pair per row from the two ends' candidate
    lists ([n, k] dense ids + ascending distances).

    Returns dict of arrays [n]: a_id / b_id (chosen primary per end —
    falls back to each end's own best when no proper pair exists),
    proper (bool), tlen (signed template length, R1's sign convention),
    mapq (pair-margin quality: margin between the best and the
    second-best proper pair at a DIFFERENT locus; single-end margins
    when improper)."""
    ids1 = np.asarray(ids1, np.int64)
    ids2 = np.asarray(ids2, np.int64)
    d1 = np.asarray(d1, np.float64)
    d2 = np.asarray(d2, np.float64)
    n, k1 = ids1.shape
    k2 = ids2.shape[1]

    pos1 = ids1 >> 1
    pos2 = ids2 >> 1
    rev1 = (ids1 & 1).astype(bool)
    rev2 = (ids2 & 1).astype(bool)
    v1 = ids1 >= 0
    v2 = ids2 >= 0

    # all candidate combinations per pair: [n, k1, k2]
    fwd_first = ~rev1[:, :, None] & rev2[:, None, :]
    fwd_second = rev1[:, :, None] & ~rev2[:, None, :]
    l1 = np.asarray(read_len1, np.int64)[:, None, None]
    l2 = np.asarray(read_len2, np.int64)[:, None, None]
    p1 = pos1[:, :, None]
    p2 = pos2[:, None, :]
    # outer span for the two FR orientations
    span12 = p2 + l2 - p1          # R1 forward, R2 reverse
    span21 = p1 + l1 - p2          # R2 forward, R1 reverse
    ok12 = fwd_first & (span12 >= max(min_isize, 1)) & (span12 <= max_isize)
    ok21 = fwd_second & (span21 >= max(min_isize, 1)) & (span21 <= max_isize)
    proper_mat = (ok12 | ok21) & v1[:, :, None] & v2[:, None, :]
    if dense_off is not None:
        # multi-record: both mates must sit on the same chromosome —
        # adjacency in the concatenated window-id space across a record
        # boundary is not physical proximity
        r1 = np.searchsorted(dense_off, pos1, side="right") - 1
        r2 = np.searchsorted(dense_off, pos2, side="right") - 1
        proper_mat &= r1[:, :, None] == r2[:, None, :]
    score = d1[:, :, None] + d2[:, None, :]
    score = np.where(proper_mat, score, np.inf)

    flat = score.reshape(n, k1 * k2)
    best_flat = np.argmin(flat, axis=1)
    best_score = flat[np.arange(n), best_flat]
    bi = best_flat // k2
    bj = best_flat % k2
    proper = np.isfinite(best_score)

    a_id = np.where(proper, ids1[np.arange(n), bi], ids1[:, 0])
    b_id = np.where(proper, ids2[np.arange(n), bj], ids2[:, 0])

    # signed TLEN from R1's perspective (0 when improper)
    ap = a_id >> 1
    bp = b_id >> 1
    a_rev = (a_id & 1).astype(bool)
    tlen_abs = np.where(
        a_rev,
        ap + np.asarray(read_len1, np.int64) - bp,
        bp + np.asarray(read_len2, np.int64) - ap,
    )
    tlen = np.where(proper, np.where(a_rev, -tlen_abs, tlen_abs), 0)

    # pair MAPQ: best proper pair vs best proper pair at a DIFFERENT locus
    mapq = np.zeros(n, np.int32)
    for i in range(n):
        if not proper[i]:
            continue
        s = flat[i]
        order = np.argsort(s)
        s0 = s[order[0]]
        second = np.inf
        a0 = int(pos1[i, order[0] // k2])
        for oi in order[1:]:
            if not np.isfinite(s[oi]):
                break
            if abs(int(pos1[i, oi // k2]) - a0) > ref_len:
                second = s[oi]
                break
        if not np.isfinite(second):
            mapq[i] = 60
        else:
            margin = (second - s0) / max(abs(second), 1e-9)
            mapq[i] = int(np.clip(np.rint(60.0 * margin), 0, 60))
    return {
        "a_id": a_id,
        "b_id": b_id,
        "proper": proper,
        "tlen": tlen.astype(np.int64),
        "mapq": mapq,
    }
