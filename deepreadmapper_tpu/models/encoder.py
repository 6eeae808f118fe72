"""TPU-native 2-layer bidirectional GRU read encoder (JAX).

Replaces the reference's OpenVINO inference engine (src/inference/fast_model.cpp,
src/inference/vectorize.cpp) with a jitted JAX model.  Where the reference
pipelines 2048 concurrent CPU infer-requests of batch 100 at fixed shape
[123, 100], we run one large batch-major [B, 123] device batch and let the MXU
eat the gate matmuls.

Math (ONNX/OpenVINO GRU, gate order z,r,h, linear_before_reset=true — matching
PyTorch GRU semantics, models/finetuned_sgn33-new-a-Apr6.xml GRUSequence layers):

    z = sigmoid(x Wz^T + h Rz^T + bz)
    r = sigmoid(x Wr^T + h Rr^T + br)
    n = tanh(x Wh^T + Wbh + r * (h Rh^T + Rbh))
    h' = (1 - z) * n + z * h

with B = [bz(=Wbz+Rbz), br(=Wbr+Rbr), Wbh, Rbh] (shape 256 per direction).

TPU mapping:
  * The input-side gate projections for ALL timesteps are one big
    [B*T, in] @ [in, 192] matmul, hoisted out of the scan (MXU-bound).
  * The recurrence is a lax.scan over 123 steps; per step one
    [B, 64] @ [64, 192] matmul + VPU gate math.  With B in the thousands the
    MXU stays fed despite the small hidden size.
  * Both directions and both layers share this structure; the reverse
    direction scans the time-reversed sequence.
  * compute dtype bfloat16 (default float32 for parity testing); params are
    kept fp32 and cast at entry.

Output parity target: the reference model's [B, 128] fp32 embeddings (final
fwd || final bwd hidden of layer 2).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from deepreadmapper_tpu.models import ir_loader

HIDDEN = 64
OUT_SIZE = 2 * HIDDEN
MAX_LEN = 123


class GRULayerParams(NamedTuple):
    # Per direction d (0=fwd, 1=bwd):
    w: jax.Array  # [2, in, 192]   (transposed for x @ w)
    r: jax.Array  # [2, 64, 192]
    bzr: jax.Array  # [2, 192]     z,r summed biases + Wbh in one vector
    rbh: jax.Array  # [2, 64]      recurrent hidden bias (inside the r gate)


class EncoderParams(NamedTuple):
    embedding: jax.Array  # [7638, 64]
    layers: tuple[GRULayerParams, GRULayerParams]


def _layer_from_ir(w: np.ndarray, r: np.ndarray, b: np.ndarray) -> GRULayerParams:
    # IR layout: w [2, 192, in], r [2, 192, 64], b [2, 256].
    w = w.astype(np.float32)
    r = r.astype(np.float32)
    b = b.astype(np.float32)
    bzr = np.concatenate([b[:, :128], b[:, 128:192]], axis=1)  # [2,192]: bz,br,Wbh
    rbh = b[:, 192:256]
    return GRULayerParams(
        w=jnp.asarray(np.swapaxes(w, 1, 2)),
        r=jnp.asarray(np.swapaxes(r, 1, 2)),
        bzr=jnp.asarray(bzr),
        rbh=jnp.asarray(rbh),
    )


def load_params(npz_path: str = ir_loader.DEFAULT_NPZ) -> EncoderParams:
    z = ir_loader.load_npz_weights(npz_path)
    return EncoderParams(
        embedding=jnp.asarray(z["embedding"].astype(np.float32)),
        layers=(
            _layer_from_ir(z["gru1_W"], z["gru1_R"], z["gru1_B"]),
            _layer_from_ir(z["gru2_W"], z["gru2_R"], z["gru2_B"]),
        ),
    )


def _gru_direction(x_proj: jax.Array, r_mat: jax.Array, rbh: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Scan one direction.  x_proj: [T, B, 192] precomputed input gates (+bias).

    Returns (final hidden [B, 64], all hiddens [T, B, 64]).
    """
    t_, b_, _ = x_proj.shape
    h0 = jnp.zeros((b_, HIDDEN), dtype=x_proj.dtype)

    def step(h, gx):
        gh = h @ r_mat  # [B, 192]
        z = jax.nn.sigmoid(gx[:, :HIDDEN] + gh[:, :HIDDEN])
        r = jax.nn.sigmoid(gx[:, HIDDEN : 2 * HIDDEN] + gh[:, HIDDEN : 2 * HIDDEN])
        n = jnp.tanh(gx[:, 2 * HIDDEN :] + r * (gh[:, 2 * HIDDEN :] + rbh))
        h_new = (1.0 - z) * n + z * h
        return h_new, h_new

    hT, hs = jax.lax.scan(step, h0, x_proj)
    return hT, hs


def _bigru_layer(x: jax.Array, p: GRULayerParams):
    """x: [T, B, in] -> (outputs [T, B, 128], final fwd [B,64], final bwd [B,64])."""
    t_, b_, d_in = x.shape
    flat = x.reshape(t_ * b_, d_in)
    # Input projections for both directions, hoisted out of the scan.
    gx_f = (flat @ p.w[0] + p.bzr[0]).reshape(t_, b_, 3 * HIDDEN)
    gx_b = (flat @ p.w[1] + p.bzr[1]).reshape(t_, b_, 3 * HIDDEN)
    hf_T, hf = _gru_direction(gx_f, p.r[0], p.rbh[0])
    hb_T, hb = _gru_direction(gx_b[::-1], p.r[1], p.rbh[1])
    out = jnp.concatenate([hf, hb[::-1]], axis=-1)  # [T, B, 128]
    return out, hf_T, hb_T


@functools.partial(jax.jit, static_argnames=("dtype",))
def encode_tokens(params: EncoderParams, tokens: jax.Array, dtype: str = "float32") -> jax.Array:
    """tokens: int32 [B, T] (zero-padded) -> embeddings fp32 [B, 128]."""
    cdt = jnp.dtype(dtype)
    emb = params.embedding.astype(cdt)
    # Tokens travel host->HBM as uint16 (ids < 7638) to halve transfer cost.
    x = emb[tokens.astype(jnp.int32)]  # [B, T, 64]
    x = jnp.swapaxes(x, 0, 1)  # [T, B, 64] seq-major for the scan

    def cast_layer(p: GRULayerParams) -> GRULayerParams:
        return GRULayerParams(*(a.astype(cdt) for a in p))

    out1, _, _ = _bigru_layer(x, cast_layer(params.layers[0]))
    _, hf, hb = _bigru_layer(out1, cast_layer(params.layers[1]))
    return jnp.concatenate([hf, hb], axis=-1).astype(jnp.float32)


class Vectorizer:
    """String/bytes -> embeddings, the analog of the reference Vectorizer
    (src/inference/vectorize.cpp:34-141): tokenize on host, embed on device in
    large batches."""

    def __init__(
        self,
        params: EncoderParams | None = None,
        max_len: int = MAX_LEN,
        device_batch: int = 8192,
        dtype: str = "float32",
    ):
        self.params = params if params is not None else load_params()
        self.max_len = max_len
        self.device_batch = device_batch
        self.dtype = dtype

    def vectorize_tokens(self, tokens: np.ndarray) -> np.ndarray:
        """tokens int [N, T] -> fp32 [N, 128]; batches + pads to fixed shapes
        so XLA compiles once.  All device batches are dispatched before any
        result is fetched — jax's async dispatch overlaps host->HBM uploads
        with compute (the reference gets the same overlap from 2048 in-flight
        OpenVINO requests, fast_model.cpp:110-225)."""
        n = tokens.shape[0]
        out = np.empty((n, OUT_SIZE), dtype=np.float32)
        bs = self.device_batch
        pending = []
        for start in range(0, n, bs):
            chunk = tokens[start : start + bs]
            if chunk.shape[0] < bs:
                chunk = np.pad(chunk, ((0, bs - chunk.shape[0]), (0, 0)))
            chunk16 = np.ascontiguousarray(chunk.astype(np.uint16))
            pending.append(
                (start, encode_tokens(self.params, jnp.asarray(chunk16), dtype=self.dtype))
            )
        for start, emb in pending:
            out[start : start + bs] = np.asarray(emb)[: min(bs, n - start)]
        return out

    def vectorize(self, seqs: list[str]) -> np.ndarray:
        from deepreadmapper_tpu import tokenizer as tok

        tokens = tok.tokenize_strings(seqs, self.max_len)
        return self.vectorize_tokens(tokens)
