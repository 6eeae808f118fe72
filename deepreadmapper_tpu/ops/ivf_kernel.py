"""Pallas slab-scan kernel for the IVF engines (IVFINT8 / IVFPQ).

The XLA formulation (index/ivf_int8.scan_probed_slabs) runs the probed-slab
plan as one lax.scan: measured at 40M rows / nlist 10935 / 8192 queries it
spent ~0.5 ms PER STEP on loop machinery (gathers, dynamic slices, per-step
approx_max_k) against ~2 µs of real matmul+DMA work — the IVF engine came
out SLOWER than the exhaustive fused scan it prunes (BENCH r3: 0.7x).

This kernel runs the same plan as a Pallas grid (the fill-aware CHUNKED
form below — the r3/r4 cap-padded slab kernels it replaced are in git
history):

* step -> chunk DMA is driven by a SCALAR-PREFETCH index map
  (pltpu.PrefetchScalarGridSpec): the plan's step_chunk array lives in SMEM
  and block index maps read it, so Mosaic double-buffers each step's chunk
  block like any dense scan — the loop overhead disappears.
* QTILE drops 128 -> 32: the plan pads each slab's queries to a tile, and
  at genome-scale fan-out most slabs see only tens of queries — 32 lanes
  of padding waste ~25% instead of ~75%.
* Per-step selection is a STRIDED-window top-2 over the score tile's lane
  axis: survivor k of KP keeps min over columns {k, KP+k, 2KP+k, ...} — an
  unrolled VPU min/select ladder, no reshape of the lane axis (Mosaic) and
  no per-step approx_max_k.  Columns of the same window sit KP apart,
  so ADJACENT rows (shifted windows of one genome locus — the common
  near-duplicates) always land in different windows.
* ONE packed output stream ([V, QTK, 4*KP]: vals | vals2 | args | args2),
  stored once per visit on its last chunk — four separate dynamically-
  indexed output streams cost 7.0 us/step vs 2.2 us packed (the r5
  step-anatomy microbench); merge_packed unpacks it.

The IVFPQ variant reconstructs the chunk from byte-packed codes in-kernel
(per-subspace one-hot matmuls, the ops/scan_kernel.py PQ trick) instead of
DMA-ing int8 rows.  Distance math is identical to the XLA paths:
rn - 2*(sq/sc)*(q8 . r8), exact int32 values in fp32.

Reference role being replaced: FAISS IndexHNSWPQ's sub-linear search
(/root/reference/src/hnswpq/search.cpp:6-57) at TPU-native throughput.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

QTK = 32     # queries per step (sublane multiple; 4x less pad waste than 128)
KP = 128     # survivors per (query, probed slab): one per strided lane window
_BIG = 3.4e38


INTERPRET = False  # tests flip this to run the kernel path on CPU


def use_kernel() -> bool:
    return INTERPRET or jax.default_backend() == "tpu"


def merge_packed(packed, slot_of, nprobe: int, k: int, exact: bool = False):
    """Slot-gather + top-k over the kernels' PACKED [V, QTK, 4*KP] output
    (lane layout vals | vals2 | args | args2 — distances in the first
    half, fp32-bitcast ids in the second).

    ONE full-row slot gather, then slice VIEWS of the contiguous halves
    feed the top-k and the id resolve — the r4 interleaved layout needed
    two strided-slice CONCATS here (fresh [q, nprobe*2KP] distance AND id
    matrices, ~1 GB of extra HBM traffic at 8192 q / nprobe=32).

    Measured r5 A/B on the 40M-scale shapes (8192 q, nprobe 32, V 8192)
    before settling on this form: a distance-half-only gather + per-winner
    elementwise id resolve is SLOWER on this TPU (97 ms vs 86) — XLA's
    elementwise gather costs ~25 ms for [q, k] elements, and lax.gather
    with partial slice_sizes hits a ~440 ms pathological lowering.  The
    single row gather + take_along_axis is the fastest lowering available;
    fp32 top_k lowers to a full sort, so wide merges take approx_max_k
    (the windowed scan is already approximate) unless `exact`.

    Each (query, probe) pair contributes 2*KP candidate columns; unset
    second-best slots carry _BIG distances, rank last, and are masked by
    the callers' d < _BIG/2 validity check as before."""
    q = slot_of.shape[0]
    g = packed.reshape(-1, 4 * KP)[slot_of]   # [q, nprobe, 4KP]
    cat_d = g[:, :, :2 * KP].reshape(q, nprobe * 2 * KP)
    cat_i = jax.lax.bitcast_convert_type(
        g[:, :, 2 * KP:], jnp.int32
    ).reshape(q, nprobe * 2 * KP)
    if exact or nprobe * KP < 1024:
        neg, sel = jax.lax.top_k(-cat_d, k)
    else:
        neg, sel = jax.lax.approx_max_k(-cat_d, k, recall_target=0.99)
    return -neg, jnp.take_along_axis(cat_i, sel, axis=1)


def _fold_strided(blk, cand, state):
    """Fold one KP-wide lane window into the running (best, second-best)
    state — one VPU min/select ladder step, shared by the int8 and PQ
    chunk kernels so the selection semantics cannot drift.

    Two survivors per window because one is measurably lossy when a
    query's whole neighborhood lands in one slab (the common case for
    clustered genome data): 128 true neighbors thrown into 128 windows
    collide birthday-style, keeping only ~63% — measured as 0.67 top-128
    overlap vs the per-slab approx_max_k path.  The second slot lifts the
    single-slab ceiling to ~86% and the merge simply sees 2*KP columns
    per probe.  Unset second slots keep _BIG scores (the merge's callers
    mask them); best/second are distinct columns by construction, so the
    merge can never emit a duplicate row."""
    cur, arg, cur2, arg2 = state
    upd = blk < cur
    upd2 = jnp.logical_and(jnp.logical_not(upd), blk < cur2)
    arg2 = jnp.where(upd, arg, jnp.where(upd2, cand, arg2))
    cur2 = jnp.where(upd, cur, jnp.where(upd2, blk, cur2))
    arg = jnp.where(upd, cand, arg)
    cur = jnp.where(upd, blk, cur)
    return cur, arg, cur2, arg2


# --------------------------------------------------------------------------
# Chunked (fill-aware) slab scan — round-5 rewrite of the slab kernels.
#
# The slab kernels above DMA each probed slab at its full capacity `cap`
# (sized for the LARGEST cluster); measured slab fill is ~50-67%, so a third
# to a half of every byte moved — and of the int8->bf16 conversion the VPU
# pays per byte — is padding.  The same padding tax lives in HBM: 5.3 GB of
# PQ codes occupied 7.95 GB of device memory at the 500M-window tier.
#
# The chunked layout stores codes as a dense [n_chunks, CHK, D] array where
# each slab owns ceil(fill / CHK) consecutive chunks — padding shrinks from
# (cap - fill) per slab to (CHK-aligned) per slab.  The grid runs one step
# per (visit, chunk): a "visit" is one (query-tile, slab) pair, exactly the
# old kernel's step; its chunks are consecutive grid steps.  Selection state
# (best + second-best per strided lane window) accumulates in VMEM scratch
# across a visit's chunks (the incremental _fold_strided ladder), so the
# selection equals one sequential fold over the whole slab.  Outputs are
# VISIT-indexed (one packed [QTK, 4*KP] block per visit, stored only on
# the visit's final chunk), so the merge contract (merge_packed +
# slot_of) is unchanged.
#
# Candidate ids are GLOBAL CHUNK-SPACE row ids (chunk * CHK + offset); the
# engine translates via its chunk-space row_id map (built with the layout).
# --------------------------------------------------------------------------

CHK = 2048  # rows per chunk: block DMA granularity and per-slab alignment


def chunk_layout(fill: "np.ndarray", chk: int):
    """Per-slab fill counts [n_slabs] -> (nchunks [n_slabs+1] int32,
    chunk_base [n_slabs+1] int32, n_chunks_total incl. the trailing dump
    chunk).  Slab s owns chunks [chunk_base[s], chunk_base[s]+nchunks[s]);
    the dump slab (index n_slabs) owns the single all-empty trailing chunk.
    Host-side helper shared by the engines and the sharded layouts."""
    import numpy as np

    nch = np.maximum(1, -(-np.asarray(fill, np.int64) // chk))
    nch = np.concatenate([nch, [1]]).astype(np.int32)  # + dump slab
    base = np.concatenate([[0], np.cumsum(nch[:-1])]).astype(np.int32)
    return nch, base, int(nch.sum())


def _chunk_flags(visit_ref, s):
    """(first, last) chunk-of-visit flags from the prefetched visit map
    (visit_ref [S+1]; visit_ref[S] is a -1 sentinel so the final step is
    always `last`)."""
    vis = visit_ref[s]
    prev = visit_ref[jnp.maximum(s - 1, 0)]
    first = jnp.logical_or(s == 0, prev != vis)
    last = visit_ref[s + 1] != vis
    return vis, first, last


def _fold_scores(s, base, state, chk: int):
    """Fold a [QTK, chk] score tile's KP-wide lane windows into the running
    (best, arg, second, arg2) state; candidates are chunk-space row ids."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (QTK, KP), 1)
    for j in range(chk // KP):
        state = _fold_strided(
            s[:, j * KP:(j + 1) * KP], base + j * KP + lane, state
        )
    return state


def _pack_state(state):
    """(vals, args, vals2, args2) -> one [QTK, 4*KP] tile with lane layout
    vals | vals2 | args | args2 (args f32-bitcast).

    ONE packed output stream instead of four: the four separate
    dynamically-indexed output buffers were measured as the kernel's
    dominant per-step cost (7.0 us/step vs 2.2 us packed — the r5 step-
    anatomy microbench); Mosaic handles a single store-on-last packed
    block at DMA-floor speed.  Distances occupy the CONTIGUOUS first half
    so merge_packed's selection pass can gather 2*KP-wide distance
    sub-rows without touching the id half."""
    cur, arg, cur2, arg2 = state
    return jnp.concatenate([
        cur, cur2,
        jax.lax.bitcast_convert_type(arg, jnp.float32),
        jax.lax.bitcast_convert_type(arg2, jnp.float32),
    ], axis=1)


def _unpack_state(p):
    return (
        p[:, :KP],
        jax.lax.bitcast_convert_type(p[:, 2 * KP:3 * KP], jnp.int32),
        p[:, KP:2 * KP],
        jax.lax.bitcast_convert_type(p[:, 3 * KP:], jnp.int32),
    )


def _fresh_state():
    big = jnp.full((QTK, KP), _BIG, jnp.float32)
    zero = jnp.zeros((QTK, KP), jnp.int32)
    return (big, zero, big, zero)


def _combine_top2(prev, cur):
    """Merge two (best, second) window states, EXACTLY reproducing the
    sequential _fold_strided over [prev's columns..., cur's columns...]:
    strict-< updates mean ties keep the EARLIER candidate, so every
    comparison against prev uses <=.  O(KP) VPU work per step — the chunk
    ladder itself runs once, from fresh state, outside the pl.when
    predication (predicated sides both execute on the VPU)."""
    pv, pa, pv2, pa2 = prev
    cv, ca, cv2, ca2 = cur
    upd = cv < pv
    nv = jnp.where(upd, cv, pv)
    na = jnp.where(upd, ca, pa)
    # boolean algebra, not where-over-bools: Mosaic rejects i1 selects
    # ("unsupported target bitwidth for truncation")
    pfirst = jnp.logical_or(
        jnp.logical_and(upd, pv <= cv2),
        jnp.logical_and(jnp.logical_not(upd), pv2 <= cv),
    )
    nv2 = jnp.where(upd,
                    jnp.where(pfirst, pv, cv2),
                    jnp.where(pfirst, pv2, cv))
    na2 = jnp.where(upd,
                    jnp.where(pfirst, pa, ca2),
                    jnp.where(pfirst, pa2, ca))
    return nv, na, nv2, na2


def _int8_chunk_kernel(chunk_ref, visit_ref, rat_ref, q_ref, codes_ref,
                       rn_ref, out_ref, acc, *, chk: int, int8dot: bool):
    """One chunk step.  q_ref (1, QTK, D) int8 at visit_ref[s]; codes_ref
    (1, chk, D) int8 + rn_ref (1, 1, chk) fp32 at chunk_ref[s]; out_ref
    (1, QTK, 4*KP) packed (vals|args|vals2|args2) at visit_ref[s], stored
    only on the visit's last chunk (every visit stores exactly once,
    overwriting the whole block, so stale buffer contents can never leak).
    acc: packed VMEM scratch carrying the fold state across a visit's
    chunks.  int8dot routes the score matmul through the MXU's native
    s8xs8->s32 path — no per-byte bf16 convert."""
    s = pl.program_id(0)
    _vis, first, last = _chunk_flags(visit_ref, s)

    if int8dot:
        dot = jax.lax.dot_general(
            q_ref[0], codes_ref[0],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
    else:
        dot = jax.lax.dot_general(
            q_ref[0].astype(jnp.bfloat16),
            codes_ref[0].astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    scores = rn_ref[0, 0] - rat_ref[0, 0] * dot  # [QTK, chk]
    cur = _fold_scores(scores, chunk_ref[s] * chk, _fresh_state(), chk)

    @pl.when(first)
    def _():
        acc[...] = _pack_state(cur)

    @pl.when(jnp.logical_not(first))
    def _():
        acc[...] = _pack_state(_combine_top2(_unpack_state(acc[...]), cur))

    @pl.when(last)
    def _():
        out_ref[0] = acc[...]


@functools.partial(
    jax.jit, static_argnames=("chk", "n_visits", "interpret", "int8dot")
)
def ivf_chunk_scan_int8(step_chunk, step_visit, qsteps, codesC, rnC, ratio2,
                        chk: int, n_visits: int, interpret: bool = False,
                        int8dot: bool = True):
    """step_chunk [S] int32 global chunk ids; step_visit [S+1] int32 (visit
    id per step, consecutive per visit, trailing -1 sentinel); qsteps
    [n_visits, QTK, D] int8 per-visit query tiles; codesC [n_chunks, chk, D]
    int8 (trailing dump chunk all-zero); rnC [n_chunks, chk] fp32 (+inf on
    empty/padding rows) -> packed [n_visits, QTK, 4*KP] fp32
    (vals | vals2 | args bitcast | args2 bitcast): best and second-best per
    strided window over each visit's WHOLE slab, args in chunk-space row
    ids.  Unpack with merge_packed / unpack_scan."""
    out, = pl.pallas_call(
        functools.partial(_int8_chunk_kernel, chk=chk, int8dot=int8dot),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(step_chunk.shape[0],),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, QTK, qsteps.shape[-1]),
                             lambda s, cref, vref: (vref[s], 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, chk, codesC.shape[-1]),
                             lambda s, cref, vref: (cref[s], 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, chk),
                             lambda s, cref, vref: (cref[s], 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, QTK, 4 * KP),
                             lambda s, cref, vref: (vref[s], 0, 0),
                             memory_space=pltpu.VMEM)
            ],
            scratch_shapes=[
                pltpu.VMEM((QTK, 4 * KP), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((n_visits, QTK, 4 * KP), jnp.float32),
        ],
        interpret=interpret,
    )(
        step_chunk,
        step_visit,
        jnp.asarray(ratio2, jnp.float32).reshape(1, 1),
        qsteps,
        codesC,
        rnC.reshape(rnC.shape[0], 1, rnC.shape[-1]) if rnC.ndim == 2 else rnC,
    )
    return out


def unpack_scan(packed):
    """Packed [V, QTK, 4*KP] (vals | vals2 | args | args2 lane layout) ->
    (vals, args, vals2, args2), each [V, QTK, KP] (args int32 via
    same-width bitcast) — XLA-level slicing for tests/diagnostics."""
    return (
        packed[:, :, :KP],
        jax.lax.bitcast_convert_type(packed[:, :, 2 * KP:3 * KP], jnp.int32),
        packed[:, :, KP:2 * KP],
        jax.lax.bitcast_convert_type(packed[:, :, 3 * KP:], jnp.int32),
    )


# --------------------------------------------------------------------------
# Fold-mode scan (round-5): per-QUERY accumulator instead of per-visit output.
#
# The packed-output contract above still pays a [V, QTK, 4*KP] HBM stream
# (512 MB at 8192 q / nprobe 32) that the merge must then slot-GATHER back
# into query order (~35 ms at 14 GB/s — XLA's row gather) and reduce with a
# width-8192 approx_max_k (~50 ms): at 40M rows the merge costs MORE than
# the scan kernel it follows (63 ms vs 45).  Fold mode deletes both: the
# kernel keeps ONE top-FS-per-strided-window accumulator PER QUERY in a
# VMEM-resident output block (constant index map -> never written back until
# the grid ends; this v5e compiles 128 MB VMEM scratch, measured r5), and on
# each visit's last chunk folds the visit state into its queries' rows via
# the prefetched qidx map.  The merge collapses to one exact top-k over
# FS*KP = 512 columns.
#
# Recall contract: the global candidate pool per query changes from
# (top-2/window per probe, globally approx-top-k'd) to top-FS/window across
# ALL probes.  A true top-k member is lost only when >= FS better candidates
# share its window (id % KP); shifted windows of one locus spread across
# consecutive windows by construction, so collisions need >= FS distinct
# repeat loci aligned mod KP — rare at FS=4 (measured: tie-aware recall@128
# unchanged at the 40M bench point, see BASELINE r5).
# --------------------------------------------------------------------------

FS = 4  # fold-mode slots per strided window (sorted ascending per window)


def fold_rows(q: int) -> int:
    """Accumulator rows: q queries + 1 dump row, padded to a sublane
    multiple."""
    return -(-(q + 1) // 8) * 8


def _insert_sorted(sv, si, cv, ci):
    """Insert one candidate column set (cv, ci) into FS sorted-ascending
    slot lists; the overall max falls out.  Strict-< keeps earlier-seen
    candidates on ties, matching _fold_strided's semantics."""
    nv, ni = [], []
    for j in range(len(sv)):
        take = cv < sv[j]
        nv.append(jnp.where(take, cv, sv[j]))
        ni.append(jnp.where(take, ci, si[j]))
        cv = jnp.where(take, sv[j], cv)
        ci = jnp.where(take, si[j], ci)
    return nv, ni


def _fold_into_rows(facc_ref, qrow_ref, off, tmp, state, fs: int):
    """Visit-end: fold the visit's (best, second)/window state into its
    queries' accumulator rows.  Row traffic is batched through the tmp
    scratch tile so the insert ladder runs once, full-width: 2*QTK dynamic
    single-row copies + ~10*fs vector ops instead of QTK thin ladders.
    Rows of one visit are distinct queries (plan: dup slabs -> dump), so
    the gather/scatter cannot alias; padding rows all point at the dump
    row, where last-write-wins is harmless.

    qrow_ref is an 8-row SMEM block (Mosaic rejects 1-row blocks: the
    second-minor block dim must be 8-divisible or equal the array dim);
    `off` = visit % 8 selects the visit's row within it."""
    v1, a1, v2, a2 = state
    for r in range(QTK):
        tmp[r:r + 1, :] = facc_ref[pl.ds(qrow_ref[off, r], 1), :]
    sv = [tmp[:, j * KP:(j + 1) * KP] for j in range(fs)]
    si = [
        jax.lax.bitcast_convert_type(
            tmp[:, (fs + j) * KP:(fs + j + 1) * KP], jnp.int32
        )
        for j in range(fs)
    ]
    sv, si = _insert_sorted(sv, si, v1, a1)
    sv, si = _insert_sorted(sv, si, v2, a2)
    tmp[...] = jnp.concatenate(
        sv + [jax.lax.bitcast_convert_type(x, jnp.float32) for x in si],
        axis=1,
    )
    for r in range(QTK):
        facc_ref[pl.ds(qrow_ref[off, r], 1), :] = tmp[r:r + 1, :]


def merge_fold(facc, q: int, k: int, fs: int = FS):
    """Fold accumulator [rows, 2*fs*KP] (vals | ids bitcast) -> (d, ids)
    top-k per query: one exact top_k over fs*KP columns (512-wide fp32
    full sort ~3 ms at 8192 q — the gather and the wide approx_max_k are
    gone).  Unfilled slots carry _BIG and rank last; callers keep the
    d < _BIG/2 validity mask."""
    vals = facc[:q, :fs * KP]
    ids = jax.lax.bitcast_convert_type(facc[:q, fs * KP:], jnp.int32)
    neg, sel = jax.lax.top_k(-vals, k)
    return -neg, jnp.take_along_axis(ids, sel, axis=1)


def _int8_chunk_fold_kernel(chunk_ref, visit_ref, rat_ref, qrow_ref, q_ref,
                            codes_ref, rn_ref, facc_ref, acc, tmp, *,
                            chk: int, int8dot: bool, fs: int):
    """Fold-mode int8 chunk step: identical scan/fold to _int8_chunk_kernel,
    but visit results land in the per-query accumulator (facc_ref, VMEM-
    resident via its constant index map) instead of a per-visit output."""
    s = pl.program_id(0)
    vis, first, last = _chunk_flags(visit_ref, s)

    @pl.when(s == 0)
    def _():
        # vals -> _BIG (rank last, caller's d < _BIG/2 mask), ids -> 0
        # (0.0f bitcasts to int32 0 — a safe rmap index, unlike _BIG's)
        facc_ref[...] = jnp.full(facc_ref.shape, _BIG, jnp.float32)
        facc_ref[:, fs * KP:] = jnp.zeros(
            (facc_ref.shape[0], fs * KP), jnp.float32
        )

    if int8dot:
        dot = jax.lax.dot_general(
            q_ref[0], codes_ref[0],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
    else:
        dot = jax.lax.dot_general(
            q_ref[0].astype(jnp.bfloat16),
            codes_ref[0].astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    scores = rn_ref[0, 0] - rat_ref[0, 0] * dot
    cur = _fold_scores(scores, chunk_ref[s] * chk, _fresh_state(), chk)

    @pl.when(first)
    def _():
        acc[...] = _pack_state(cur)

    @pl.when(jnp.logical_not(first))
    def _():
        acc[...] = _pack_state(_combine_top2(_unpack_state(acc[...]), cur))

    @pl.when(last)
    def _():
        _fold_into_rows(
            facc_ref, qrow_ref, vis % 8, tmp, _unpack_state(acc[...]), fs
        )


@functools.partial(
    jax.jit,
    static_argnames=("chk", "nq", "interpret", "int8dot", "fs"),
)
def ivf_chunk_scan_int8_fold(step_chunk, step_visit, qidx, qsteps, codesC,
                             rnC, ratio2, chk: int, nq: int,
                             interpret: bool = False, int8dot: bool = True,
                             fs: int = FS):
    """Fold-mode scan: as ivf_chunk_scan_int8 plus qidx [n_visit_rows, QTK]
    int32 (query index per visit row; dump row = nq) -> fold accumulator
    [fold_rows(nq), 2*fs*KP] fp32 (vals | ids bitcast, chunk-space row
    ids).  Reduce with merge_fold."""
    rows = fold_rows(nq)
    out, = pl.pallas_call(
        functools.partial(
            _int8_chunk_fold_kernel, chk=chk, int8dot=int8dot, fs=fs
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(step_chunk.shape[0],),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((8, QTK),
                             lambda s, cref, vref: (vref[s] // 8, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, QTK, qsteps.shape[-1]),
                             lambda s, cref, vref: (vref[s], 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, chk, codesC.shape[-1]),
                             lambda s, cref, vref: (cref[s], 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, chk),
                             lambda s, cref, vref: (cref[s], 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((rows, 2 * fs * KP),
                             lambda s, cref, vref: (0, 0),
                             memory_space=pltpu.VMEM)
            ],
            scratch_shapes=[
                pltpu.VMEM((QTK, 4 * KP), jnp.float32),
                pltpu.VMEM((QTK, 2 * fs * KP), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((rows, 2 * fs * KP), jnp.float32),
        ],
        # the per-query accumulator block alone can exceed the default 16 MB
        # scoped-vmem cap (8192 q * 2*FS*KP * 4 B = 32 MB); this v5e runs
        # 128 MB VMEM scratch fine (probed r5), so raise the cap for the
        # fold kernels only
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        step_chunk,
        step_visit,
        jnp.asarray(ratio2, jnp.float32).reshape(1, 1),
        qidx,
        qsteps,
        codesC,
        rnC.reshape(rnC.shape[0], 1, rnC.shape[-1]) if rnC.ndim == 2 else rnC,
    )
    return out


def _pq_chunk_kernel(chunk_ref, visit_ref, rat_ref, q_ref, packed_ref,
                     rn_ref, cent_ref, out_ref, acc, recon_ref, *, chk: int,
                     m: int):
    """IVFPQ chunk step: reconstruct the chunk from byte-packed codes
    in-kernel (per-subspace one-hot contractions into the transposed
    [D, chk] recon scratch — the ops/scan_kernel.py trick), score, fold.
    packed_ref (1, mp, chk) int32 at chunk_ref[s]; cent_ref [m*ksub, dsub]
    bf16 int8-valued tables.  Output/scratch as _int8_chunk_kernel (one
    packed store-on-last stream)."""
    s = pl.program_id(0)
    _vis, first, last = _chunk_flags(visit_ref, s)

    ksub = cent_ref.shape[0] // m
    dsub = cent_ref.shape[1]
    for j in range(m):
        byte = jnp.bitwise_and(
            jax.lax.shift_right_logical(
                packed_ref[0, j // 4:j // 4 + 1, :], 8 * (j % 4)
            ),
            255,
        )  # [1, chk] int32
        oh_t = (
            jax.lax.broadcasted_iota(jnp.int32, (ksub, chk), 0) == byte
        ).astype(jnp.bfloat16)  # [ksub, chk]
        part = jax.lax.dot_general(
            cent_ref[j * ksub:(j + 1) * ksub, :], oh_t,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [dsub, chk] exact int8-valued
        recon_ref[j * dsub:(j + 1) * dsub, :] = part.astype(jnp.bfloat16)
    dot = jax.lax.dot_general(
        q_ref[0].astype(jnp.bfloat16), recon_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [QTK, chk] exact
    scores = rn_ref[0, 0] - rat_ref[0, 0] * dot
    cur = _fold_scores(scores, chunk_ref[s] * chk, _fresh_state(), chk)

    @pl.when(first)
    def _():
        acc[...] = _pack_state(cur)

    @pl.when(jnp.logical_not(first))
    def _():
        acc[...] = _pack_state(_combine_top2(_unpack_state(acc[...]), cur))

    @pl.when(last)
    def _():
        out_ref[0] = acc[...]


@functools.partial(
    jax.jit, static_argnames=("chk", "m", "n_visits", "interpret")
)
def ivf_chunk_scan_pq(step_chunk, step_visit, qsteps, packedC, rnC, cent2d,
                      ratio2, chk: int, m: int, n_visits: int,
                      interpret: bool = False):
    """packedC [n_chunks, mp, chk] int32 byte-packed PQ codes (chunk-major
    3D; trailing dump chunk), cent2d [m*ksub, dsub] bf16; rest as
    ivf_chunk_scan_int8."""
    d = qsteps.shape[-1]
    out, = pl.pallas_call(
        functools.partial(_pq_chunk_kernel, chk=chk, m=m),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(step_chunk.shape[0],),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, QTK, d),
                             lambda s, cref, vref: (vref[s], 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, packedC.shape[1], chk),
                             lambda s, cref, vref: (cref[s], 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, chk),
                             lambda s, cref, vref: (cref[s], 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(cent2d.shape,
                             lambda s, cref, vref: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, QTK, 4 * KP),
                             lambda s, cref, vref: (vref[s], 0, 0),
                             memory_space=pltpu.VMEM)
            ],
            scratch_shapes=[
                pltpu.VMEM((QTK, 4 * KP), jnp.float32),
                pltpu.VMEM((d, chk), jnp.bfloat16),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((n_visits, QTK, 4 * KP), jnp.float32),
        ],
        interpret=interpret,
    )(
        step_chunk,
        step_visit,
        jnp.asarray(ratio2, jnp.float32).reshape(1, 1),
        qsteps,
        packedC,
        rnC.reshape(rnC.shape[0], 1, rnC.shape[-1]) if rnC.ndim == 2 else rnC,
        cent2d,
    )
    return out


def _pq_chunk_fold_kernel(chunk_ref, visit_ref, rat_ref, qrow_ref, q_ref,
                          packed_ref, rn_ref, cent_ref, facc_ref, acc,
                          recon_ref, tmp, *, chk: int, m: int, fs: int):
    """Fold-mode IVFPQ chunk step: _pq_chunk_kernel's in-kernel
    reconstruction + scan, visit results folded into the per-query
    accumulator (see _int8_chunk_fold_kernel)."""
    s = pl.program_id(0)
    vis, first, last = _chunk_flags(visit_ref, s)

    @pl.when(s == 0)
    def _():
        facc_ref[...] = jnp.full(facc_ref.shape, _BIG, jnp.float32)
        facc_ref[:, fs * KP:] = jnp.zeros(
            (facc_ref.shape[0], fs * KP), jnp.float32
        )

    ksub = cent_ref.shape[0] // m
    dsub = cent_ref.shape[1]
    for j in range(m):
        byte = jnp.bitwise_and(
            jax.lax.shift_right_logical(
                packed_ref[0, j // 4:j // 4 + 1, :], 8 * (j % 4)
            ),
            255,
        )
        oh_t = (
            jax.lax.broadcasted_iota(jnp.int32, (ksub, chk), 0) == byte
        ).astype(jnp.bfloat16)
        part = jax.lax.dot_general(
            cent_ref[j * ksub:(j + 1) * ksub, :], oh_t,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        recon_ref[j * dsub:(j + 1) * dsub, :] = part.astype(jnp.bfloat16)
    dot = jax.lax.dot_general(
        q_ref[0].astype(jnp.bfloat16), recon_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    scores = rn_ref[0, 0] - rat_ref[0, 0] * dot
    cur = _fold_scores(scores, chunk_ref[s] * chk, _fresh_state(), chk)

    @pl.when(first)
    def _():
        acc[...] = _pack_state(cur)

    @pl.when(jnp.logical_not(first))
    def _():
        acc[...] = _pack_state(_combine_top2(_unpack_state(acc[...]), cur))

    @pl.when(last)
    def _():
        _fold_into_rows(
            facc_ref, qrow_ref, vis % 8, tmp, _unpack_state(acc[...]), fs
        )


@functools.partial(
    jax.jit, static_argnames=("chk", "m", "nq", "interpret", "fs")
)
def ivf_chunk_scan_pq_fold(step_chunk, step_visit, qidx, qsteps, packedC,
                           rnC, cent2d, ratio2, chk: int, m: int, nq: int,
                           interpret: bool = False, fs: int = FS):
    """Fold-mode IVFPQ scan: as ivf_chunk_scan_pq plus the qidx visit-row
    map -> fold accumulator [fold_rows(nq), 2*fs*KP]; reduce with
    merge_fold."""
    d = qsteps.shape[-1]
    rows = fold_rows(nq)
    out, = pl.pallas_call(
        functools.partial(_pq_chunk_fold_kernel, chk=chk, m=m, fs=fs),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(step_chunk.shape[0],),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((8, QTK),
                             lambda s, cref, vref: (vref[s] // 8, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, QTK, d),
                             lambda s, cref, vref: (vref[s], 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, packedC.shape[1], chk),
                             lambda s, cref, vref: (cref[s], 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, chk),
                             lambda s, cref, vref: (cref[s], 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(cent2d.shape,
                             lambda s, cref, vref: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((rows, 2 * fs * KP),
                             lambda s, cref, vref: (0, 0),
                             memory_space=pltpu.VMEM)
            ],
            scratch_shapes=[
                pltpu.VMEM((QTK, 4 * KP), jnp.float32),
                pltpu.VMEM((d, chk), jnp.bfloat16),
                pltpu.VMEM((QTK, 2 * fs * KP), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((rows, 2 * fs * KP), jnp.float32),
        ],
        # the per-query accumulator block alone can exceed the default 16 MB
        # scoped-vmem cap (8192 q * 2*FS*KP * 4 B = 32 MB); this v5e runs
        # 128 MB VMEM scratch fine (probed r5), so raise the cap for the
        # fold kernels only
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        step_chunk,
        step_visit,
        jnp.asarray(ratio2, jnp.float32).reshape(1, 1),
        qidx,
        qsteps,
        packedC,
        rnC.reshape(rnC.shape[0], 1, rnC.shape[-1]) if rnC.ndim == 2 else rnC,
        cent2d,
    )
    return out


