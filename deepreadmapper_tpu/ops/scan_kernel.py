"""Fused exhaustive-scan kernels: matmul + windowed top-1 in VMEM.

The INT8FLAT / PQFLAT scans were HBM-bound, not FLOP-bound: the [Q, chunk]
int32 score tensor (4-9 GB per chunk) was materialized to HBM just so
lax.approx_max_k could read it back — measured 469 ms for Q=8192 x N=2M
versus 48 ms for the same matmul with a fused reduction (10x headroom).

These Pallas kernels never let scores leave VMEM: each (candidate-tile,
query-tile) grid cell computes its score tile on the MXU and immediately
reduces every W=128-row window to (min score, argmin row) on the VPU.  The
HBM output is [N/W, Q] — 128x smaller than the score matrix — and the final
per-query top-k runs on that reduced array.

Layout rules learned the hard way (TPU arrays tile as (sublane=8, lane=128);
narrow trailing dims are PADDED to 128 lanes):
  * PQ codes live TRANSPOSED, [m, N] int32 — a [N, m] array would occupy
    128/m times its logical size (20 GB for 40M rows) and OOM the chip.
  * Row norms are never stored: each kernel recomputes ||row||^2 from its
    (reconstructed) candidate tile once per tile — exact in fp32 (< 2^21)
    — and folds the pad/ntotal mask into that per-tile norm column, so no
    [N, 1] array (which would also pad 128x) exists at all.
  * The PQ one-hot is built transposed, [ksub, CT], by comparing a sublane
    iota against the code row broadcast over sublanes; the decoder matmul
    then contracts over sublanes on both sides, so candidates land back on
    sublanes for the score matmul with zero in-kernel transposes.

Approximation: one candidate per W-row window.  With k=128 drawn from
N/W >= 16k windows the expected loss is ~C(k,2)/(N/W) candidates (<0.5% at
N=2M), tighter than the approx_max_k(recall_target=0.95) it replaces.

Numerics: all arithmetic is exact — int8 values are exact in bf16, products
are exact in the fp32 MXU accumulator, and |scores| < 2^24 so fp32 ordering
equals int32 ordering.  Scores are (rn - 2 q.r); the query norm is added by
the caller after the merge (constant per query, does not affect ordering).

Reference scoring being replaced: FAISS IndexHNSWPQ ADC
(src/hnswpq/search.cpp:6-57) and the exhaustive oracle
(src/hnswm/bruteforce.cpp:27-86).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

QT = 512      # query-tile (lanes of the score tile)
CT = 4096     # candidate rows per tile (sublanes of the score tile)
W = 128       # default reduction window: one (min, argmin) survivor per W
              # rows; W=512 shrinks the selection stage 4x at ~1.5% recall
              # cost at N=2M (collision probability ~k^2/(2*N/W))
_BIG = 3.4e38

MIN_FUSED_N = 1 << 18  # below this the scan is fast anyway; NW must exceed k
_PAD_BASE = 1 << 18    # pad codes to this multiple so chunks divide evenly
_MAX_CHUNK_UNITS = 8   # chunk <= 8 * 2^18 = 2^21 rows (1 GB of window output)


def use_fused_scan() -> bool:
    return jax.default_backend() == "tpu"


def can_fuse(n: int, n_padded: int, k: int) -> bool:
    """The single fused-scan eligibility predicate: TPU backend, enough
    rows for the window reduction to make sense (and NW >= k), padding laid
    out on the fused grid, and k within one chunk's window count."""
    return (
        use_fused_scan()
        and n >= MIN_FUSED_N
        and n_padded % _PAD_BASE == 0
        and k <= _PAD_BASE // W
    )


def query_scale_ratio_jnp(q, code_scale):
    """Device twin of index.int8_flat.query_scale_ratio: clip-free query
    quantization scale + the sq/sc ratio folded into the scan score
    (shared by every sharded body)."""
    import jax.numpy as jnp

    sq = jnp.maximum(code_scale, jnp.max(jnp.abs(q)) / 127.0)
    return sq, sq / code_scale


def choose_chunk(np_: int) -> int:
    """Largest chunk that divides np_ (a _PAD_BASE multiple), is a multiple
    of _PAD_BASE, and stays <= 2^21 rows (bounds the [chunk/W, Q] output at
    ~1 GB per pass)."""
    units = np_ // _PAD_BASE
    for d in range(min(_MAX_CHUNK_UNITS, units), 0, -1):
        if units % d == 0:
            return d * _PAD_BASE
    return _PAD_BASE


def _winmin(s: jax.Array, ct_idx, w: int) -> tuple[jax.Array, jax.Array]:
    """[CT, QT] scores -> per-w-window (min [CT/w, QT], global argmin)."""
    ct, qt = s.shape
    s3 = s.reshape(ct // w, w, qt)
    vmin = jnp.min(s3, axis=1)
    widx = jax.lax.broadcasted_iota(jnp.int32, (ct // w, w, qt), 1)
    amin = jnp.min(jnp.where(s3 == vmin[:, None, :], widx, 2**30), axis=1)
    base = ct_idx * ct + jax.lax.broadcasted_iota(
        jnp.int32, (ct // w, qt), 0
    ) * w
    return vmin, base + amin


def _int8_kernel(nt_ref, rat_ref, q_ref, r_ref, vals_ref, args_ref, rbf_ref,
                 rn_ref, *, w: int):
    """q_ref [D, QT] bf16, r_ref [CT, D] int8; per-tile scratch: rbf
    (bf16 candidate tile) and rn ([CT, 1] fp32 = row norms with the
    pad/ntotal mask folded in as +inf).  rat_ref holds 2*sq/sc — the query/
    code quantization-scale ratio folded into the dot term so queries may
    quantize with their own (clip-free) scale; 2.0 when scales match."""
    c_idx = pl.program_id(0)

    @pl.when(pl.program_id(1) == 0)
    def _():
        rbf = r_ref[...].astype(jnp.bfloat16)  # int8 values exact in bf16
        rbf_ref[...] = rbf
        rf = rbf.astype(jnp.float32)
        rn = jnp.sum(rf * rf, axis=1, keepdims=True)  # exact: ints < 2^21
        row = c_idx * r_ref.shape[0] + jax.lax.broadcasted_iota(
            jnp.int32, (r_ref.shape[0], 1), 0
        )
        rn_ref[...] = jnp.where(row < nt_ref[0, 0], rn, _BIG)

    dot = jax.lax.dot_general(
        rbf_ref[...], q_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [CT, QT] exact
    s = rn_ref[...] - rat_ref[0, 0] * dot
    vmin, amin = _winmin(s, c_idx, w)
    vals_ref[...] = vmin
    args_ref[...] = amin


def _pq_kernel(nt_ref, rat_ref, q_ref, codes_ref, cent_ref, vals_ref,
               args_ref, recon_ref, rn_ref, *, w: int):
    """PQ variant: reconstruct the candidate tile from its codes in VMEM.

    codes_ref [m, CT] int32 (transposed storage), cent_ref [m*ksub, dsub]
    bf16 (int8-valued).  Reconstruction runs once per candidate tile into
    recon_ref [D, CT] (transposed: the one-hot is built as [ksub, CT] so no
    big in-kernel transposes are needed); the lane-major norms relayout to a
    [CT, 1] column once per tile.
    """
    m, ct = codes_ref.shape
    ksub = cent_ref.shape[0] // m
    dsub = cent_ref.shape[1]
    c_idx = pl.program_id(0)

    @pl.when(pl.program_id(1) == 0)
    def _():
        for j in range(m):
            cj = codes_ref[j : j + 1, :]  # [1, CT] int32
            oh_t = (
                jax.lax.broadcasted_iota(jnp.int32, (ksub, ct), 0) == cj
            ).astype(jnp.bfloat16)  # [ksub, CT]
            part = jax.lax.dot_general(
                cent_ref[j * ksub : (j + 1) * ksub, :], oh_t,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [dsub, CT] exact int8-valued
            recon_ref[j * dsub : (j + 1) * dsub, :] = part.astype(jnp.bfloat16)
        rf = recon_ref[...].astype(jnp.float32)  # [D, CT]
        rn_row = jnp.sum(rf * rf, axis=0, keepdims=True)  # [1, CT] exact
        col = c_idx * ct + jax.lax.broadcasted_iota(jnp.int32, (1, ct), 1)
        rn_row = jnp.where(col < nt_ref[0, 0], rn_row, _BIG)
        rn_ref[...] = rn_row.T  # [CT, 1]

    dot = jax.lax.dot_general(
        recon_ref[...], q_ref[...],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [CT, QT]
    s = rn_ref[...] - rat_ref[0, 0] * dot
    vmin, amin = _winmin(s, c_idx, w)
    vals_ref[...] = vmin
    args_ref[...] = amin


@functools.partial(jax.jit, static_argnames=("w", "interpret"))
def _int8_winmin_call(qt_b, r8, ntotal, ratio2=2.0, w: int = W,
                      interpret: bool = False):
    """qt_b [D, Qp] bf16 (queries pre-transposed: the MXU consumes the rhs
    as [K, N] directly), r8 [Np, D] int8, ntotal scalar int32 (rows at or
    beyond it never win) -> (vals [Np/W, Qp] f32, args [Np/W, Qp] int32)."""
    d, qp = qt_b.shape
    np_ = r8.shape[0]
    grid = (np_ // CT, qp // QT)
    return pl.pallas_call(
        functools.partial(_int8_kernel, w=w),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((d, QT), lambda c, q: (0, q), memory_space=pltpu.VMEM),
            pl.BlockSpec((CT, d), lambda c, q: (c, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((CT // w, QT), lambda c, q: (c, q), memory_space=pltpu.VMEM),
            pl.BlockSpec((CT // w, QT), lambda c, q: (c, q), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((np_ // w, qp), jnp.float32),
            jax.ShapeDtypeStruct((np_ // w, qp), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((CT, d), jnp.bfloat16),
            pltpu.VMEM((CT, 1), jnp.float32),
        ],
        interpret=interpret,
    )(
        jnp.asarray(ntotal, jnp.int32).reshape(1, 1),
        jnp.asarray(ratio2, jnp.float32).reshape(1, 1),
        qt_b,
        r8,
    )


@functools.partial(jax.jit, static_argnames=("w", "interpret"))
def _pq_winmin_call(qt_b, codes_t, ntotal, cent2d, ratio2=2.0, w: int = W,
                    interpret: bool = False):
    """qt_b [D, Qp] bf16 (pre-transposed), codes_t [m, Np] int32 (transposed
    storage — lane-dense), cent2d [m*ksub, dsub] bf16 -> (vals, args)."""
    d, qp = qt_b.shape
    m, np_ = codes_t.shape
    grid = (np_ // CT, qp // QT)
    return pl.pallas_call(
        functools.partial(_pq_kernel, w=w),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((d, QT), lambda c, q: (0, q), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, CT), lambda c, q: (0, c), memory_space=pltpu.VMEM),
            pl.BlockSpec(cent2d.shape, lambda c, q: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((CT // w, QT), lambda c, q: (c, q), memory_space=pltpu.VMEM),
            pl.BlockSpec((CT // w, QT), lambda c, q: (c, q), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((np_ // w, qp), jnp.float32),
            jax.ShapeDtypeStruct((np_ // w, qp), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((d, CT), jnp.bfloat16),
            pltpu.VMEM((CT, 1), jnp.float32),
        ],
        interpret=interpret,
    )(
        jnp.asarray(ntotal, jnp.int32).reshape(1, 1),
        jnp.asarray(ratio2, jnp.float32).reshape(1, 1),
        qt_b,
        codes_t,
        cent2d,
    )


@functools.partial(
    jax.jit, static_argnames=("k", "chunk", "kind", "w", "exact", "interpret")
)
def fused_scan_topk(qt_b, store, ntotal, k: int, chunk: int,
                    kind: str = "int8", cent2d=None, ratio=1.0, w: int = W,
                    exact: bool = False, interpret: bool = False):
    """Chunked fused scan with exact cross-chunk merge.

    qt_b [D, Qp] bf16, queries pre-transposed (Qp % QT == 0); store =
    r8 [Np, D] int8 (kind='int8') or codes_t [m, Np] int32 (kind='pq', with
    cent2d [m*ksub, dsub] bf16); ntotal = count of real rows (the rest is
    padding, masked inside the kernel); Np % chunk == 0, chunk % CT == 0.
    Returns (scores [Qp, k] f32 = rn - 2 q.r ascending — caller adds the
    query norm — and ids [Qp, k] int32; all-padding windows surface as _BIG
    scores).  exact=True uses a full top_k over the window minima (measured
    100 ms vs approx_max_k's 22 ms on [8192, 16384]); the window reduction
    itself is the main approximation either way.
    """
    qp = qt_b.shape[1]
    np_ = store.shape[0] if kind == "int8" else store.shape[1]
    n_chunks = np_ // chunk
    nt = jnp.asarray(ntotal, jnp.int32)
    ratio2 = 2.0 * jnp.asarray(ratio, jnp.float32)

    def one_chunk(st, nt_c, c_idx):
        if kind == "int8":
            vals, args = _int8_winmin_call(qt_b, st, nt_c, ratio2, w, interpret)
        else:
            vals, args = _pq_winmin_call(
                qt_b, st, nt_c, cent2d, ratio2, w, interpret
            )
        # [chunk/W, Qp] -> [Qp, chunk/W]; 128x smaller than the score matrix
        vals_t = vals.T
        args_t = args.T + c_idx * chunk
        if exact:
            nd, pos = jax.lax.top_k(-vals_t, k)
        else:
            nd, pos = jax.lax.approx_max_k(-vals_t, k, recall_target=0.95)
        return -nd, jnp.take_along_axis(args_t, pos, axis=1)

    if n_chunks == 1:
        return one_chunk(store, nt, jnp.int32(0))

    def step(carry, c_idx):
        best_d, best_i = carry
        if kind == "int8":
            st = jax.lax.dynamic_slice(
                store, (c_idx * chunk, 0), (chunk, store.shape[1])
            )
        else:
            st = jax.lax.dynamic_slice(
                store, (0, c_idx * chunk), (store.shape[0], chunk)
            )
        d, i = one_chunk(st, nt - c_idx * chunk, c_idx)
        cat_d = jnp.concatenate([best_d, d], axis=1)
        cat_i = jnp.concatenate([best_i, i], axis=1)
        neg, pos = jax.lax.top_k(-cat_d, k)
        return (-neg, jnp.take_along_axis(cat_i, pos, axis=1)), None

    init = (
        jnp.full((qp, k), _BIG, dtype=jnp.float32),
        jnp.zeros((qp, k), dtype=jnp.int32),
    )
    (d, i), _ = jax.lax.scan(
        step, init, jnp.arange(n_chunks, dtype=jnp.int32)
    )
    return d, i


def pad_rows(n: int, chunk: int) -> int:
    """Rows of padding needed for the fused path (callers pass chunk with
    chunk % CT == 0; W divides CT)."""
    return (-n) % chunk
