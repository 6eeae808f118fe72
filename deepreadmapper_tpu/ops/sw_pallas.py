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


def _sw_kernel(av_ref, bflip_ref, out_ref, h2_ref, h1_ref, best_ref,
               lr: int, lc: int, width: int):
    """Wavefront with in-place VMEM scratch (no loop-carried copies) and a
    2-diagonal unroll.  h2_ref/h1_ref ping-pong as H_{d-2}/H_{d-1}; scores
    stay int32 (this Mosaic build rejects int16 reductions and
    cross-bitwidth selects; bisected).

    One extra ghost diagonal may run past d = lr+lc when the count is odd;
    its scores can only decay (s = -1 against the sentinel rows, -1 gap
    penalties), so the running max is unaffected."""
    h2_ref[:, :] = jnp.zeros_like(h2_ref)
    h1_ref[:, :] = jnp.zeros_like(h1_ref)
    best_ref[:, :] = jnp.zeros_like(best_ref)
    one = jnp.int32(1)

    def diag(d, h_prev2, h_prev1):
        av = av_ref[:, :]
        bv = bflip_ref[pl.ds(lr + lc + 1 - d, width), :]
        s = jnp.where(av == bv, one, -one)
        h2s = jnp.pad(h_prev2[:-1, :], ((1, 0), (0, 0)))
        h1s = jnp.pad(h_prev1[:-1, :], ((1, 0), (0, 0)))
        return jnp.maximum(
            jnp.maximum(h2s + s, jnp.zeros_like(s)),
            jnp.maximum(h1s - one, h_prev1 - one),
        )

    def step2(i, _):
        d = 2 + 2 * i
        h2 = h2_ref[:, :]
        h1 = h1_ref[:, :]
        ha = diag(d, h2, h1)
        hb = diag(d + 1, h1, ha)
        h2_ref[:, :] = ha
        h1_ref[:, :] = hb
        # Elementwise running max over the full wavefront; the single
        # reduction happens once after the loop, not every step.
        best_ref[:, :] = jnp.maximum(best_ref[:, :], jnp.maximum(ha, hb))
        return 0

    n2 = (lr + lc - 1 + 1) // 2  # ceil of the diagonal count / 2
    jax.lax.fori_loop(0, n2, step2, 0)
    mx = jnp.max(best_ref[:, :], axis=0, keepdims=True)
    out_ref[:, :] = jnp.broadcast_to(mx, out_ref.shape)


@functools.partial(jax.jit, static_argnames=("lr", "lc", "interpret"))
def _sw_pallas_call(av_u8, bflip_u8, lr: int, lc: int, interpret: bool = False):
    """av [width8, P] uint8 (transposed!), bflip [rows8, P] uint8 — uploaded
    as bytes (4x cheaper host->HBM), widened on device."""
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
        scratch_shapes=[
            pltpu.VMEM((width, TILE_P), jnp.int32),
            pltpu.VMEM((width, TILE_P), jnp.int32),
            pltpu.VMEM((width, TILE_P), jnp.int32),
        ],
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
