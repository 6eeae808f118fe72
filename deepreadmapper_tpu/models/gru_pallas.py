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

Both entry points carry a custom_vjp with a MANUAL backward
(_bwd_manual): gates are recomputed in parallel from the saved hidden
states (three batched matmuls — no sequential forward re-run), and the
only sequential work is the light cotangent recurrence, itself a Pallas
kernel on TPU (_pallas_bwd_scan: lam carried in VMEM across the reversed
time walk) with a lax.scan fallback elsewhere.  fp32 numerics are
bit-identical to the scan reference (same op order per step); bf16
inputs keep fp32 gates/carry in BOTH the kernel and the scan reference,
so forward and gradient share one precision model.
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


# ------------------------------------------------------- manual backward
#
# The round-1 backward re-ran the whole forward as a lax.scan under jax.vjp —
# a sequential forward recompute plus XLA's autodiff scan, both carrying the
# full gate state through HBM every step.  The manual VJP below restructures
# the math so the ONLY sequential work is the cotangent recurrence
# (one [B,192]x[192,64] matmul + VPU elementwise per step); everything heavy
# is hoisted into big parallel MXU matmuls over all T steps at once:
#
#   recompute   gx = x@W, gh = h_prev@R        (z, r, n from saved states)
#   after scan  dx = dgx@W^T, dW = x^T dgx, dR = h_prev^T dgh
#
# gru_proj_seq saves its own output hs as the residual; gru_proj_last
# recomputes hs with the (fast, non-differentiated) forward kernel.
# Reverse-direction recurrences are handled by flipping time so one forward
# derivation serves both; weight grads are flip-invariant, dx flips back.


def _bwd_scan_kernel(hp_ref, z_ref, r_ref, n_ref, gnb_ref, ct_ref, rT_ref,
                     dgx_ref, dgh_ref, lam_ref, *, t_steps):
    """One backward time-step: cotangent recurrence with lam resident in
    VMEM (mirror of _gru_proj_kernel's forward carry).  The grid's minor
    dimension walks time REVERSED via the index map; per step one
    [bt,192]x[192,64] MXU matmul + VPU elementwise."""
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        lam_ref[:] = jnp.zeros_like(lam_ref)

    hp = hp_ref[0]
    z = z_ref[0]
    r = r_ref[0]
    n = n_ref[0]
    gnb = gnb_ref[0]
    d = lam_ref[:] + ct_ref[0]
    dz = d * (hp - n)
    dn = d * (1.0 - z)
    dgn = dn * (1.0 - n * n)
    dr = dgn * gnb
    dghn = dgn * r
    dgz = dz * z * (1.0 - z)
    dgr = dr * r * (1.0 - r)
    dgh = jnp.concatenate([dgz, dgr, dghn], axis=-1)
    dgx_ref[0] = jnp.concatenate([dgz, dgr, dgn], axis=-1)
    dgh_ref[0] = dgh
    lam_ref[:] = d * z + jnp.dot(dgh, rT_ref[:],
                                 preferred_element_type=jnp.float32)


def _pallas_bwd_scan(rT, h_prev, z, r, n, gnb, ct, bt: int = _DEF_BT,
                     interpret: bool = False):
    """Pallas cotangent recurrence: (h_prev, z, r, n, gnb, ct) [T,B,64] fp32
    -> (dgx, dgh) [T,B,192] fp32, iterating t = T-1 .. 0."""
    t_steps, b, _ = z.shape
    bt = min(bt, max(8, b))
    pad = (-b) % bt
    if pad:
        padded = []
        for a in (h_prev, z, r, n, gnb, ct):
            padded.append(jnp.pad(a, ((0, 0), (0, pad), (0, 0))))
        h_prev, z, r, n, gnb, ct = padded
    bp = b + pad
    tmap = lambda i, t: (t_steps - 1 - t, i, 0)  # reversed time walk
    fixed = lambda i, t: (0, 0)
    step_spec = pl.BlockSpec((1, bt, H), tmap, memory_space=pltpu.VMEM)
    dgx, dgh = pl.pallas_call(
        functools.partial(_bwd_scan_kernel, t_steps=t_steps),
        grid=(bp // bt, t_steps),
        in_specs=[step_spec] * 6 + [
            pl.BlockSpec((G, H), fixed, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, bt, G), tmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt, G), tmap, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((t_steps, bp, G), jnp.float32),
            jax.ShapeDtypeStruct((t_steps, bp, G), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((bt, H), jnp.float32)],
        interpret=interpret,
    )(h_prev, z, r, n, gnb, ct, rT)
    if pad:
        dgx, dgh = dgx[:, :b], dgh[:, :b]
    return dgx, dgh


def _bwd_manual(x, w, bzr, r_mat, rbh, reverse, hs, ct_seq):
    in_dts = (x.dtype, w.dtype, bzr.dtype, r_mat.dtype, rbh.dtype)
    f32 = jnp.float32
    xf, wf, bzrf, rf, rbhf, hsf, ct = (
        a.astype(f32) for a in (x, w, bzr, r_mat, rbh, hs, ct_seq)
    )
    if reverse:
        # reverse recurrence on original time == forward recurrence on
        # flipped time (hs is stored in original positions by contract)
        xf, hsf, ct = jnp.flip(xf, 0), jnp.flip(hsf, 0), jnp.flip(ct, 0)
    t_, b_, din = xf.shape

    # -- parallel gate recompute (exact same op order as the forward step)
    gx = (xf.reshape(t_ * b_, din) @ wf + bzrf).reshape(t_, b_, G)
    h_prev = jnp.concatenate([jnp.zeros_like(hsf[:1]), hsf[:-1]], axis=0)
    gh = h_prev @ rf
    z = jax.nn.sigmoid(gx[..., :H] + gh[..., :H])
    r = jax.nn.sigmoid(gx[..., H : 2 * H] + gh[..., H : 2 * H])
    gnb = gh[..., 2 * H :] + rbhf  # the r-gated recurrent term of n
    n = jnp.tanh(gx[..., 2 * H :] + r * gnb)

    # -- sequential cotangent recurrence (the only scan)
    rT = rf.T
    if use_pallas():
        dgx, dgh = _pallas_bwd_scan(rT, h_prev, z, r, n, gnb, ct)
    else:

        def step(lam, inp):
            hp, z_, r_, n_, gnb_, ct_ = inp
            d = lam + ct_  # total cotangent on h_t
            dz = d * (hp - n_)
            dn = d * (1.0 - z_)
            dgn = dn * (1.0 - n_ * n_)
            dr = dgn * gnb_
            dghn = dgn * r_
            dgz = dz * z_ * (1.0 - z_)
            dgr = dr * r_ * (1.0 - r_)
            dgh = jnp.concatenate([dgz, dgr, dghn], axis=-1)
            lam_prev = d * z_ + dgh @ rT
            dgx = jnp.concatenate([dgz, dgr, dgn], axis=-1)
            return lam_prev, (dgx, dgh)

        lam0 = jnp.zeros((b_, H), f32)
        _, (dgx, dgh) = jax.lax.scan(
            step, lam0, (h_prev, z, r, n, gnb, ct), reverse=True
        )

    # -- parallel gradient contractions
    dgx2 = dgx.reshape(t_ * b_, G)
    dgh2 = dgh.reshape(t_ * b_, G)
    dx = (dgx2 @ wf.T).reshape(t_, b_, din)
    if reverse:
        dx = jnp.flip(dx, 0)
    dw = xf.reshape(t_ * b_, din).T @ dgx2
    dbzr = dgx2.sum(0)
    dr_mat = h_prev.reshape(t_ * b_, H).T @ dgh2
    drbh = dgh2[:, 2 * H :].sum(0)
    grads = (dx, dw, dbzr, dr_mat, drbh)
    return tuple(g.astype(dt) for g, dt in zip(grads, in_dts))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def gru_proj_seq(x, w, bzr, r_mat, rbh, reverse: bool):
    """Fused projection + recurrence, all hidden states.
    x [T,B,din] time-major -> hs [T,B,64] in original positions."""
    if use_pallas() and x.dtype in (jnp.float32, jnp.bfloat16):
        return _pallas_proj_impl(x, w, bzr, r_mat, rbh, reverse, last_only=False)
    return _scan_proj_impl(x, w, bzr, r_mat, rbh, reverse, last_only=False)


def _gps_fwd(x, w, bzr, r_mat, rbh, reverse):
    hs = gru_proj_seq(x, w, bzr, r_mat, rbh, reverse)
    return hs, (x, w, bzr, r_mat, rbh, hs)


def _gps_bwd(reverse, res, ct):
    *primals, hs = res
    return _bwd_manual(*primals, reverse, hs, ct)


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
    x, w, bzr, r_mat, rbh = res
    # hs was not an output here: recompute with the fast forward primal
    # (Pallas when available — NOT re-differentiated, just evaluated).
    hs = gru_proj_seq(x, w, bzr, r_mat, rbh, reverse)
    # hT cotangent -> a seq cotangent that is zero except at the final step
    # of the recurrence (original position T-1 fwd, 0 reverse).
    ct_seq = jnp.zeros(hs.shape, ct.dtype)
    pos = 0 if reverse else hs.shape[0] - 1
    ct_seq = ct_seq.at[pos].set(ct)
    return _bwd_manual(x, w, bzr, r_mat, rbh, reverse, hs, ct_seq)


gru_proj_last.defvjp(_gpl_fwd, _gpl_bwd)
