"""Compact device->host wire formats for search results.

Result downloads dominate the serving path once compute is on-chip (the
reference's analog is copying result tensors out of OpenVINO infer requests,
src/inference/fast_model.cpp:210-222).  Top-K indices into an N-vector index
need only ceil(log2(N)) bits each; packing them on device before download
cuts link bytes vs uint16/uint32.  Packing is NIBBLE-aligned (bits rounded up
to a multiple of 4): at most half a nibble of waste per id, and the host
unpack stays a handful of vectorized shifts instead of a bit-crawl.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def bits_needed(n: int) -> int:
    """Nibble-aligned bits to represent ids 0..n-1 (4, 8, 12, ...)."""
    raw = max(int(n - 1).bit_length(), 1)
    return (raw + 3) // 4 * 4


@functools.partial(jax.jit, static_argnames=("nbits",))
def pack_ids_device(ids: jax.Array, nbits: int) -> jax.Array:
    """[B, K] non-negative int ids (< 2^nbits, nbits multiple of 4) ->
    [B, K*nbits/8] uint8 (K*nbits/4 nibbles, little-endian nibble order;
    odd nibble counts are padded with one zero nibble)."""
    assert nbits % 4 == 0, "nbits must be nibble-aligned (use bits_needed)"
    b, k = ids.shape
    nnib = nbits // 4
    shifts = 4 * jnp.arange(nnib, dtype=jnp.int32)
    nib = (ids.astype(jnp.int32)[:, :, None] >> shifts) & 0xF  # [B, K, nnib]
    nib = nib.reshape(b, k * nnib)
    if (k * nnib) % 2:
        nib = jnp.pad(nib, ((0, 0), (0, 1)))
    nib = nib.reshape(b, -1, 2)
    return (nib[:, :, 0] | (nib[:, :, 1] << 4)).astype(jnp.uint8)


def unpack_ids_host(packed: np.ndarray, k: int, nbits: int) -> np.ndarray:
    """Inverse of pack_ids_device: [B, nbytes] uint8 -> [B, k] int64.
    Native C++ (OpenMP) when available, numpy fallback."""
    assert nbits % 4 == 0
    from deepreadmapper_tpu import native

    if native.available():
        return native.unpack_ids(packed, k, nbits)
    return unpack_ids_numpy(packed, k, nbits)


def unpack_ids_numpy(packed: np.ndarray, k: int, nbits: int) -> np.ndarray:
    assert nbits % 4 == 0
    packed = np.asarray(packed, dtype=np.uint8)
    b = packed.shape[0]
    nnib = nbits // 4
    nib = np.empty((b, packed.shape[1] * 2), dtype=np.int64)
    nib[:, 0::2] = packed & 0xF
    nib[:, 1::2] = packed >> 4
    nib = nib[:, : k * nnib].reshape(b, k, nnib)
    out = nib[:, :, 0].copy()
    for j in range(1, nnib):
        out |= nib[:, :, j] << (4 * j)
    return out
