"""On-device tokenizer (tokenizer_device.py) parity with the host tokenizer
(itself bit-exact with the reference Preprocessor), and wire-format packing
round-trips (ops/pack.py)."""

import numpy as np
import pytest

from deepreadmapper_tpu import tokenizer as tok
from deepreadmapper_tpu.ops.pack import (
    bits_needed,
    pack_ids_device,
    unpack_ids_host,
)
from deepreadmapper_tpu.tokenizer_device import pack_wrapped, tokens_from_packed


def _device_tokens(mat, lengths):
    import jax.numpy as jnp

    wire = pack_wrapped(mat, lengths)
    assert wire.dtype == np.uint8 and wire.shape == (mat.shape[0], 48)
    return np.asarray(tokens_from_packed(jnp.asarray(wire)))


def _wrap(seqs):
    return tok.strings_to_bytes([f"<{s}>" for s in seqs])


def test_fixture_reads_parity():
    from deepreadmapper_tpu.io.fastq import parse_fastq_bytes

    mat, lengths, _ = parse_fastq_bytes("tests/data/test_data.fastq")
    want = tok.tokenize_bytes(mat, lengths)
    got = _device_tokens(mat, lengths)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("n_len", [1, 2, 3, 50, 120, 121, 122, 123, 150, 200])
def test_random_lengths_parity(n_len):
    rng = np.random.default_rng(n_len)
    seqs = ["".join(rng.choice(list("ACGTacgtN"), size=n_len)) for _ in range(16)]
    mat, lengths = _wrap(seqs)
    want = tok.tokenize_bytes(mat, lengths)
    got = _device_tokens(mat, lengths)
    np.testing.assert_array_equal(got, want)


def test_mixed_length_batch_parity():
    rng = np.random.default_rng(0)
    seqs = [
        "".join(rng.choice(list("acgt"), size=int(l)))
        for l in rng.integers(1, 180, size=64)
    ]
    mat, lengths = _wrap(seqs)
    want = tok.tokenize_bytes(mat, lengths)
    got = _device_tokens(mat, lengths)
    np.testing.assert_array_equal(got, want)


def test_encode_packed_matches_encode_tokens():
    import jax.numpy as jnp

    from deepreadmapper_tpu.models.encoder import (
        Vectorizer,
        encode_packed,
        encode_tokens,
        load_params,
    )

    rng = np.random.default_rng(1)
    seqs = ["".join(rng.choice(list("acgt"), size=150)) for _ in range(8)]
    mat, lengths = _wrap(seqs)
    params = load_params()
    want = np.asarray(
        encode_tokens(params, jnp.asarray(tok.tokenize_bytes(mat, lengths)))
    )
    wire = pack_wrapped(mat, lengths)
    got = np.asarray(encode_packed(params, jnp.asarray(wire)))
    np.testing.assert_allclose(got, want, atol=1e-6)
    # Vectorizer convenience path (includes batching/padding)
    v = Vectorizer(device_batch=4)
    got2 = v.vectorize_wrapped_bytes(mat, lengths)
    np.testing.assert_allclose(got2, want, atol=1e-6)


def test_pack_ids_roundtrip():
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    for n, k in [(1702, 128), (5, 3), (1 << 20, 64), (9, 5)]:
        nbits = bits_needed(n)
        ids = rng.integers(0, n, size=(7, k)).astype(np.int32)
        packed = np.asarray(pack_ids_device(jnp.asarray(ids), nbits))
        assert packed.shape[1] == (k * (nbits // 4) + 1) // 2
        back = unpack_ids_host(packed, k, nbits)
        np.testing.assert_array_equal(back, ids.astype(np.int64))


def test_bits_needed_nibble_aligned():
    assert bits_needed(1702) == 12
    assert bits_needed(2) == 4
    assert bits_needed(1) == 4
    assert bits_needed(65536) == 16
    assert bits_needed(4096) == 12
    assert bits_needed(4097) == 16


def test_native_pack_matches_numpy():
    from deepreadmapper_tpu import native
    from deepreadmapper_tpu.ops.pack import unpack_ids_numpy
    from deepreadmapper_tpu.tokenizer_device import pack_wrapped_numpy

    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(5)
    seqs = [
        "".join(rng.choice(list("ACGTN"), size=int(l)))
        for l in rng.integers(1, 200, size=40)
    ]
    mat, lengths = _wrap(seqs)
    np.testing.assert_array_equal(
        native.pack_wrapped(mat, lengths), pack_wrapped_numpy(mat, lengths)
    )
    # unpack parity
    ids = rng.integers(0, 4096, size=(9, 128))
    import jax.numpy as jnp

    from deepreadmapper_tpu.ops.pack import pack_ids_device

    packed = np.asarray(pack_ids_device(jnp.asarray(ids), 12))
    np.testing.assert_array_equal(
        native.unpack_ids(packed, 128, 12), unpack_ids_numpy(packed, 128, 12)
    )


def test_native_pack_windows_matches_wrapped():
    """pack_windows(genome) must equal pack_wrapped of the window strings."""
    from deepreadmapper_tpu import native
    from deepreadmapper_tpu.io import fasta as fasta_io

    if not native.available():
        pytest.skip("native library unavailable")
    recs = fasta_io.parse_fasta_records("tests/data/ecoli_150.fna")
    genome = np.ascontiguousarray(recs[0])
    wire = native.pack_windows(genome, 150, 1, 0, 20)
    wins, _ = fasta_io.windows_as_strings([genome], 150, 1)  # already wrapped
    mat, lengths = tok.strings_to_bytes(wins[:40])
    want = pack_wrapped(mat, lengths)
    np.testing.assert_array_equal(wire, want)


def test_native_pack_windows_by_id_parity():
    """pack_windows_by_id wire -> device tokens must equal the native wrapped
    window tokenizer (the sparse-rerank candidate path)."""
    import jax.numpy as jnp

    from deepreadmapper_tpu import native
    from deepreadmapper_tpu.io import fasta as fasta_io

    if not native.available():
        pytest.skip("native library unavailable")
    recs = fasta_io.parse_fasta_records("tests/data/ecoli_150.fna")
    genome = np.ascontiguousarray(recs[0])
    rng = np.random.default_rng(9)
    ids = rng.integers(0, 2 * (genome.size - 150 + 1), size=64).astype(np.int64)
    ids[0] = 0
    ids[1] = 2 * (genome.size - 150)  # last valid fwd window
    ids[2] = 2 * (genome.size - 150) + 1  # last valid rev window
    wire = native.pack_windows_by_id(genome, 150, ids)
    got = np.asarray(tokens_from_packed(jnp.asarray(wire)))
    want = native.tokenize_windows_by_id(genome, 150, ids, wrap=True)
    np.testing.assert_array_equal(got, want)
    # Out-of-range ids produce the empty-window wire row (nb=0), which
    # tokenizes like an empty wrapped sequence — deterministic and harmless
    # (the pipeline's expansion clips ids before this path ever sees them).
    bad = native.pack_windows_by_id(genome, 150, np.array([-2, 10**9], np.int64))
    got_bad = np.asarray(tokens_from_packed(jnp.asarray(bad)))
    np.testing.assert_array_equal(got_bad[0], got_bad[1])
    assert (got_bad[:, 2:] == 0).all()
