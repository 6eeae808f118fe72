"""Smith-Waterman wavefront as a Pallas TPU kernel.

Same recurrence and sentinel-padding scheme as ops/sw.py (parity-tested
against it), but the whole anti-diagonal loop runs INSIDE one kernel with the
carried diagonals held in VMEM scratch — the lax.scan formulation rewrites
[P, L] arrays to HBM every step, which measured ~50x below VPU speed of light.

Layout: pairs ride the 128-wide lane axis, the diagonal index rides sublanes:
state arrays are [width8, TILE_P] int32 (sublane dim padded to a multiple of 8
with sentinel rows — they become permanent ghost cells).  The grid tiles the
pair batch.  The two previous diagonals live in VMEM scratch refs and the loop
ping-pongs between slots, avoiding large loop-carried vreg tuples (which this
Mosaic build aborts on).

The b-char gather per diagonal, b[d-i], is a dynamic sublane slice of a
REVERSED padded array (ops/sw.py has the index algebra).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Pairs per grid tile = one 128-lane register row; wider lane blocks crash
# this Mosaic build (512-lane blocks -> compiler abort, empirically bisected).
TILE_P = 128


def _round8(x: int) -> int:
    return -(-x // 8) * 8


def _sw_kernel(av_ref, bflip_ref, out_ref, lr: int, lc: int, width: int):
    p = av_ref.shape[1]

    # Single carried array [2*width + 8, P]: rows [0, W) = H_{d-2},
    # [W, 2W) = H_{d-1}, [2W, 2W+8) = running max (row 0 meaningful).
    def step(d, c):
        av = av_ref[:, :]
        h2 = c[0:width, :]
        h1 = c[width : 2 * width, :]
        best = c[2 * width : 2 * width + 8, :]
        bv = bflip_ref[pl.ds(lr + lc + 1 - d, width), :]
        s = jnp.where(av == bv, 1, -1)
        h2s = jnp.pad(h2[:-1, :], ((1, 0), (0, 0)))
        h1s = jnp.pad(h1[:-1, :], ((1, 0), (0, 0)))
        h = jnp.maximum(
            jnp.maximum(h2s + s, 0),
            jnp.maximum(h1s - 1, h1 - 1),
        )
        best = jnp.maximum(best, jnp.max(h, axis=0, keepdims=True))
        return jnp.concatenate([h1, h, best], axis=0)

    init = jnp.zeros((2 * width + 8, p), dtype=jnp.int32)
    final = jax.lax.fori_loop(2, lr + lc + 1, step, init)
    out_ref[:, :] = final[2 * width : 2 * width + 8, :]


@functools.partial(jax.jit, static_argnames=("lr", "lc", "interpret"))
def _sw_pallas_call(av_u8, bflip_u8, lr: int, lc: int, interpret: bool = False):
    """av [width8, P] uint8 (transposed!), bflip [rows8, P] uint8 — uploaded
    as bytes (4x cheaper host->HBM), widened to int32 on device."""
    av = av_u8.astype(jnp.int32)
    bflip = bflip_u8.astype(jnp.int32)
    p = av.shape[1]
    width = av.shape[0]
    n_tiles = p // TILE_P
    kernel = functools.partial(_sw_kernel, lr=lr, lc=lc, width=width)
    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((width, TILE_P), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (bflip.shape[0], TILE_P), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec((8, TILE_P), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, p), jnp.int32),
        interpret=interpret,
    )(av, bflip)


def sw_scores_pallas(
    a_mat: np.ndarray,
    a_lens: np.ndarray,
    b_mat: np.ndarray,
    b_lens: np.ndarray,
    interpret: bool = False,
) -> np.ndarray:
    """Drop-in for ops.sw.sw_scores on TPU.  Returns int32 [P]."""
    from deepreadmapper_tpu.ops.sw import _PAD_A, _PAD_B, _pack

    p = a_mat.shape[0]
    if p == 0:
        return np.zeros(0, dtype=np.int32)
    lr = int(a_mat.shape[1])
    lc = int(b_mat.shape[1])
    a = _pack(np.ascontiguousarray(a_mat), np.asarray(a_lens), _PAD_A)
    b = _pack(np.ascontiguousarray(b_mat), np.asarray(b_lens), _PAD_B)

    p_pad = -(-p // TILE_P) * TILE_P
    # Sublane dims padded to multiples of 8 with sentinels: extra state rows
    # are permanent ghost cells, extra bflip rows map to t < 0.
    width = _round8(lr + 1)
    rows = _round8(2 * lr + lc + 2)
    av = np.full((width, p_pad), _PAD_A, dtype=np.uint8)
    av[1 : lr + 1, :p] = a.T
    bflip = np.full((rows, p_pad), _PAD_B, dtype=np.uint8)
    bflip[lr + 1 : lr + lc + 1, :p] = b[:, ::-1].T
    out = np.asarray(
        _sw_pallas_call(jnp.asarray(av), jnp.asarray(bflip), lr, lc, interpret)
    )
    return out[0, :p].astype(np.int32)


_PALLAS_OK: dict[tuple, bool] = {}


def sw_scores_auto(a_mat, a_lens, b_mat, b_lens) -> np.ndarray:
    """Pallas kernel on TPU (with a one-time probe + fallback), lax.scan
    formulation elsewhere."""
    from deepreadmapper_tpu.ops.sw import sw_scores

    if jax.default_backend() != "tpu":
        return sw_scores(a_mat, a_lens, b_mat, b_lens)
    key = (a_mat.shape[1], b_mat.shape[1])
    if _PALLAS_OK.get(key, True):
        try:
            out = sw_scores_pallas(a_mat, a_lens, b_mat, b_lens)
            _PALLAS_OK[key] = True
            return out
        except Exception:
            _PALLAS_OK[key] = False
    return sw_scores(a_mat, a_lens, b_mat, b_lens)
