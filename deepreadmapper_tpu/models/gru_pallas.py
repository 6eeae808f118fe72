"""Pallas TPU kernel for the GRU recurrence.

The encoder's hot loop is 123 sequential steps of
``h' = GRU(h, gx[t])`` per direction per layer (the reference runs this
inside OpenVINO's GRUSequence op, models/finetuned_sgn33-new-a-Apr6.xml
layers 49/70).  As a lax.scan, XLA re-reads/re-writes the carry and pipelines
poorly; this kernel keeps ``h`` resident in VMEM across the whole sequence
and streams only the per-step input gates from HBM — one [BT,64]x[64,192]
MXU matmul plus VPU gate math per step, with the grid's innermost dimension
walking time so Pallas double-buffers the gx DMA automatically.

Layout contract (chosen so no transposes are needed anywhere and all block
shapes satisfy the (8,128) tiling rule):
  gx   [T, B, 192] time-major  (last dim == array dim -> any block OK)
  hs   [T, B, 64]  hidden state after step t, in ORIGINAL time positions
                   for both directions (reverse handled by the index map,
                   zero-copy — no jnp flips)
  hT   [B, 64]     final carry (== hs[-1] fwd, hs[0] bwd)

Both entry points carry a custom_vjp whose backward re-runs the
differentiable lax.scan reference implementation, so fine-tuning
(parallel/train.py) can differentiate straight through the kernel.
fp32 numerics are bit-identical to the scan (same op order per step);
bf16 inputs keep fp32 gates/carry in BOTH the kernel and the scan
reference, so forward and gradient share one precision model.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H = 64
G = 3 * H

_DEF_BT = 1024


def use_pallas() -> bool:
    return jax.default_backend() == "tpu"


# ---------------------------------------------------------------- scan ref


def _scan_impl(gx, r_mat, rbh, reverse: bool):
    """Differentiable reference: returns hs [T,B,64] in original positions."""
    b_ = gx.shape[1]
    h0 = jnp.zeros((b_, H), dtype=gx.dtype)

    def step(h, gxt):
        gh = h @ r_mat
        z = jax.nn.sigmoid(gxt[:, :H] + gh[:, :H])
        r = jax.nn.sigmoid(gxt[:, H : 2 * H] + gh[:, H : 2 * H])
        n = jnp.tanh(gxt[:, 2 * H :] + r * (gh[:, 2 * H :] + rbh))
        h_new = (1.0 - z) * n + z * h
        return h_new, h_new

    _, hs = jax.lax.scan(step, h0, gx, reverse=reverse)
    return hs


# ------------------------------------------------------------- pallas impl


# ------------------------------------------- fused-projection pallas impl
#
# The hoisted input projection writes a [T,B,192] fp32 gate array to HBM that
# the recurrence immediately re-reads — 2.9 GB of round-trip traffic per
# direction at B=15k.  Fusing the projection INTO the kernel reads the 3x
# smaller layer input x instead: per step one [bt,din]x[din,192] projection
# matmul + one [bt,64]x[64,192] recurrence matmul on the MXU.


def _gru_proj_kernel(x_ref, w_ref, bzr_ref, r_ref, rbh_ref, out_ref, h_ref, *,
                     t_steps, last_only):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_ref[:] = jnp.zeros_like(h_ref)

    h = h_ref[:]
    x = x_ref[0]  # [BT, din]  (fp32 or bf16; gate math/carry stay fp32)
    gx = jnp.dot(x, w_ref[:], preferred_element_type=jnp.float32) + bzr_ref[
        :
    ].astype(jnp.float32)
    gh = jnp.dot(h, r_ref[:].astype(h.dtype),
                 preferred_element_type=jnp.float32)
    z = jax.nn.sigmoid(gx[:, :H] + gh[:, :H])
    r = jax.nn.sigmoid(gx[:, H : 2 * H] + gh[:, H : 2 * H])
    n = jnp.tanh(gx[:, 2 * H :] + r * (gh[:, 2 * H :] + rbh_ref[:].astype(jnp.float32)))
    hn = (1.0 - z) * n + z * h
    h_ref[:] = hn
    if last_only:
        @pl.when(t == t_steps - 1)
        def _():
            out_ref[:] = hn.astype(out_ref.dtype)
    else:
        out_ref[0] = hn.astype(out_ref.dtype)


def _pallas_proj_impl(x, w, bzr, r_mat, rbh, reverse: bool, last_only: bool,
                      bt: int = _DEF_BT):
    t_steps, b, din = x.shape
    bt = min(bt, max(8, b))
    pad = (-b) % bt
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    bp = b + pad
    if reverse:
        tmap = lambda i, t: (t_steps - 1 - t, i, 0)
    else:
        tmap = lambda i, t: (t, i, 0)
    fixed = lambda i, t: (0, 0)
    out = pl.pallas_call(
        functools.partial(_gru_proj_kernel, t_steps=t_steps, last_only=last_only),
        grid=(bp // bt, t_steps),
        in_specs=[
            pl.BlockSpec((1, bt, din), tmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((din, G), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, G), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), fixed, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((bt, H), lambda i, t: (i, 0), memory_space=pltpu.VMEM)
            if last_only
            else pl.BlockSpec((1, bt, H), tmap, memory_space=pltpu.VMEM)
        ),
        out_shape=(
            # final hidden stays fp32; per-step outputs match the input dtype
            # (bf16 halves the hs write+read traffic between layers)
            jax.ShapeDtypeStruct((bp, H), jnp.float32)
            if last_only
            else jax.ShapeDtypeStruct((t_steps, bp, H), x.dtype)
        ),
        scratch_shapes=[pltpu.VMEM((bt, H), jnp.float32)],
    )(x, w, bzr.reshape(1, G), r_mat, rbh.reshape(1, H))
    if pad:
        out = out[:b] if last_only else out[:, :b]
    return out


def _scan_proj_impl(x, w, bzr, r_mat, rbh, reverse: bool, last_only: bool):
    t_, b_, din = x.shape
    in_dt = x.dtype
    if in_dt == jnp.bfloat16:
        # Match the Pallas kernel's precision model: bf16 values, fp32 gate
        # math and carry (also what the custom_vjp backward differentiates).
        x = x.astype(jnp.float32)
        w = w.astype(jnp.float32)
        bzr = bzr.astype(jnp.float32)
        r_mat = r_mat.astype(jnp.float32)
        rbh = rbh.astype(jnp.float32)
    gx = (x.reshape(t_ * b_, din) @ w + bzr).reshape(t_, b_, G)
    hs = _scan_impl(gx, r_mat, rbh, reverse)
    if last_only:
        return hs[0] if reverse else hs[-1]  # fp32, like the kernel's hT
    return hs.astype(in_dt)  # per-step outputs match input dtype


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def gru_proj_seq(x, w, bzr, r_mat, rbh, reverse: bool):
    """Fused projection + recurrence, all hidden states.
    x [T,B,din] time-major -> hs [T,B,64] in original positions."""
    if use_pallas() and x.dtype in (jnp.float32, jnp.bfloat16):
        return _pallas_proj_impl(x, w, bzr, r_mat, rbh, reverse, last_only=False)
    return _scan_proj_impl(x, w, bzr, r_mat, rbh, reverse, last_only=False)


def _gps_fwd(x, w, bzr, r_mat, rbh, reverse):
    return gru_proj_seq(x, w, bzr, r_mat, rbh, reverse), (x, w, bzr, r_mat, rbh)


def _gps_bwd(reverse, res, ct):
    _, vjp = jax.vjp(
        lambda *a: _scan_proj_impl(*a, reverse, last_only=False), *res
    )
    return vjp(ct)


gru_proj_seq.defvjp(_gps_fwd, _gps_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def gru_proj_last(x, w, bzr, r_mat, rbh, reverse: bool):
    """Fused projection + recurrence, final hidden only: -> hT [B,64]."""
    if use_pallas() and x.dtype in (jnp.float32, jnp.bfloat16):
        return _pallas_proj_impl(x, w, bzr, r_mat, rbh, reverse, last_only=True)
    return _scan_proj_impl(x, w, bzr, r_mat, rbh, reverse, last_only=True)


def _gpl_fwd(x, w, bzr, r_mat, rbh, reverse):
    return gru_proj_last(x, w, bzr, r_mat, rbh, reverse), (x, w, bzr, r_mat, rbh)


def _gpl_bwd(reverse, res, ct):
    _, vjp = jax.vjp(
        lambda *a: _scan_proj_impl(*a, reverse, last_only=True), *res
    )
    return vjp(ct)


gru_proj_last.defvjp(_gpl_fwd, _gpl_bwd)
