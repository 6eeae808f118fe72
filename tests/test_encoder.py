"""Encoder parity tests.

The shipped IR was exported from a PyTorch bi-GRU (ONNX GRU with
linear_before_reset=1 == PyTorch GRU semantics).  We rebuild the exact model in
torch.nn.GRU from the same IR weights (independent code path, gate order
remapped zrh -> rzn) and require the JAX encoder to match to fp32 tolerance.
"""

import numpy as np
import pytest

from deepreadmapper_tpu import tokenizer as tok
from deepreadmapper_tpu.models import encoder, ir_loader


def _torch_reference(tokens: np.ndarray) -> np.ndarray:
    torch = pytest.importorskip("torch")
    z = ir_loader.load_npz_weights()
    emb = torch.tensor(z["embedding"].astype(np.float32))
    gru = torch.nn.GRU(64, 64, num_layers=2, bidirectional=True, batch_first=False)

    def put(layer, w, r, b):
        w = torch.tensor(w.astype(np.float32))
        r = torch.tensor(r.astype(np.float32))
        b = torch.tensor(b.astype(np.float32))
        for d, suffix in enumerate(["", "_reverse"]):
            # zrh -> rzn reorder of 64-row blocks.
            perm = torch.cat([torch.arange(64, 128), torch.arange(0, 64), torch.arange(128, 192)])
            getattr(gru, f"weight_ih_l{layer}{suffix}").data = w[d][perm]
            getattr(gru, f"weight_hh_l{layer}{suffix}").data = r[d][perm]
            # B = [bz+, br+, Wbh, Rbh]; torch splits ih/hh biases: put the
            # summed z/r biases on ih, zero on hh, Wbh on ih_n, Rbh on hh_n.
            b_ih = torch.cat([b[d, 64:128], b[d, 0:64], b[d, 128:192]])
            b_hh = torch.cat([torch.zeros(128), b[d, 192:256]])
            getattr(gru, f"bias_ih_l{layer}{suffix}").data = b_ih
            getattr(gru, f"bias_hh_l{layer}{suffix}").data = b_hh

    put(0, z["gru1_W"], z["gru1_R"], z["gru1_B"])
    put(1, z["gru2_W"], z["gru2_R"], z["gru2_B"])

    with torch.no_grad():
        x = emb[torch.tensor(tokens.astype(np.int64))]  # [B, T, 64]
        x = x.transpose(0, 1)  # [T, B, 64]
        _, h_n = gru(x)
        out = torch.cat([h_n[2], h_n[3]], dim=-1)  # layer-2 fwd || bwd
    return out.numpy()


def test_encoder_matches_torch_on_fixture_reads(data_dir):
    from deepreadmapper_tpu.io import fastq

    seqs, _ = fastq.parse_fastq(str(data_dir / "test_data.fastq"))
    tokens = tok.tokenize_strings(seqs[:32])
    params = encoder.load_params()
    got = np.asarray(encoder.encode_tokens(params, tokens))
    want = _torch_reference(tokens)
    assert got.shape == (32, 128)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_encoder_random_tokens():
    rng = np.random.default_rng(1)
    tokens = rng.integers(7542, 7638, size=(8, 123)).astype(np.int32)
    # Sprinkle zero padding like short sequences produce.
    tokens[:, 100:] = 0
    params = encoder.load_params()
    got = np.asarray(encoder.encode_tokens(params, tokens))
    want = _torch_reference(tokens)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_vectorizer_batching_consistency(data_dir):
    from deepreadmapper_tpu.io import fastq

    seqs, _ = fastq.parse_fastq(str(data_dir / "test_data.fastq"))
    params = encoder.load_params()
    v_small = encoder.Vectorizer(params, device_batch=64)
    v_big = encoder.Vectorizer(params, device_batch=4096)
    a = v_small.vectorize(seqs)
    b = v_big.vectorize(seqs)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
    assert a.shape == (150, 128)


def test_bfloat16_close_to_fp32(data_dir):
    from deepreadmapper_tpu.io import fastq

    seqs, _ = fastq.parse_fastq(str(data_dir / "test_data.fastq"))
    tokens = tok.tokenize_strings(seqs[:16])
    params = encoder.load_params()
    f32 = np.asarray(encoder.encode_tokens(params, tokens, dtype="float32"))
    bf16 = np.asarray(encoder.encode_tokens(params, tokens, dtype="bfloat16"))
    # bf16 recurrence over 123 steps accumulates ~0.1 absolute error on the
    # unit-scale outputs; rankings survive (fp32 is the parity default).
    assert np.max(np.abs(f32 - bf16)) < 0.25
    # Rankings by L2 between reads should be essentially identical; check
    # nearest-neighbor structure is preserved for a simple case.
    d32 = ((f32[:1] - f32) ** 2).sum(-1)
    dbf = ((bf16[:1] - bf16) ** 2).sum(-1)
    assert np.argsort(d32)[:3].tolist() == np.argsort(dbf)[:3].tolist()


def test_bfloat16_mode_close_to_fp32():
    """bf16 compute mode (Vectorizer(dtype='bfloat16')) stays within
    quantization distance of fp32 — the documented fast inference mode."""
    import numpy as np

    from deepreadmapper_tpu.models.encoder import Vectorizer

    rng = np.random.default_rng(2)
    seqs = ["".join(rng.choice(list("acgt"), size=150)) for _ in range(16)]
    v32 = Vectorizer(device_batch=16)
    vb = Vectorizer(device_batch=16, dtype="bfloat16")
    e32 = v32.vectorize([f"<{s}>" for s in seqs])
    eb = vb.vectorize([f"<{s}>" for s in seqs])
    # On CPU this exercises the scan fallback, which accumulates fully in
    # bf16 (max err ~0.14); the TPU Pallas kernel keeps fp32 gates/carry and
    # measures ~0.004.  Either is far below typical inter-window distances.
    assert np.abs(e32 - eb).max() < 0.3


def test_manual_gru_vjp_matches_autodiff():
    """The hand-written backward (gru_pallas._bwd_manual: parallel gate
    recompute + light cotangent scan + hoisted weight contractions) must
    reproduce jax.vjp of the differentiable scan reference exactly, for both
    directions and both entry points."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from deepreadmapper_tpu.models import gru_pallas as gp

    rng = np.random.default_rng(0)
    T, B, DIN = 9, 6, 64
    x = jnp.asarray(rng.standard_normal((T, B, DIN)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((DIN, gp.G)) * 0.2, jnp.float32)
    bzr = jnp.asarray(rng.standard_normal(gp.G) * 0.1, jnp.float32)
    r_mat = jnp.asarray(rng.standard_normal((gp.H, gp.G)) * 0.2, jnp.float32)
    rbh = jnp.asarray(rng.standard_normal(gp.H) * 0.1, jnp.float32)

    for reverse in (False, True):
        for last in (False, True):
            ref_fn = lambda *a: gp._scan_proj_impl(*a, reverse, last_only=last)
            out, vjp = jax.vjp(ref_fn, x, w, bzr, r_mat, rbh)
            ct = jnp.asarray(rng.standard_normal(out.shape), jnp.float32)
            ref_grads = vjp(ct)
            fn = gp.gru_proj_last if last else gp.gru_proj_seq
            out2, vjp2 = jax.vjp(lambda *a: fn(*a, reverse), x, w, bzr, r_mat, rbh)
            got = vjp2(ct)
            np.testing.assert_allclose(
                np.asarray(out), np.asarray(out2), rtol=2e-6, atol=2e-6
            )
            for g_ref, g_man in zip(ref_grads, got):
                ref = np.asarray(g_ref)
                rel = np.max(np.abs(ref - np.asarray(g_man))) / (
                    np.max(np.abs(ref)) + 1e-9
                )
                assert rel < 3e-6, (reverse, last, rel)


def test_pallas_bwd_scan_interpret_matches():
    """The Pallas cotangent-recurrence kernel (VMEM-resident lambda, reversed
    time walk) must equal the lax.scan formulation — interpret mode here;
    real-Mosaic validation happens on TPU."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from deepreadmapper_tpu.models import gru_pallas as gp

    rng = np.random.default_rng(3)
    T, B = 11, 20  # B % 8 != 0 exercises the pad path
    hp, z, r, n, gnb, ct = (
        jnp.asarray(rng.standard_normal((T, B, gp.H)), jnp.float32)
        for _ in range(6)
    )
    z, r, n = jax.nn.sigmoid(z), jax.nn.sigmoid(r), jnp.tanh(n)
    rT = jnp.asarray(rng.standard_normal((gp.G, gp.H)) * 0.2, jnp.float32)

    def step(lam, inp):
        hp_, z_, r_, n_, gnb_, ct_ = inp
        d = lam + ct_
        dz = d * (hp_ - n_)
        dn = d * (1.0 - z_)
        dgn = dn * (1.0 - n_ * n_)
        dr = dgn * gnb_
        dghn = dgn * r_
        dgz = dz * z_ * (1.0 - z_)
        dgr = dr * r_ * (1.0 - r_)
        dgh = jnp.concatenate([dgz, dgr, dghn], axis=-1)
        return d * z_ + dgh @ rT, (
            jnp.concatenate([dgz, dgr, dgn], axis=-1), dgh
        )

    _, (dgx_ref, dgh_ref) = jax.lax.scan(
        step, jnp.zeros((B, gp.H)), (hp, z, r, n, gnb, ct), reverse=True
    )
    dgx_k, dgh_k = gp._pallas_bwd_scan(rT, hp, z, r, n, gnb, ct, bt=16,
                                       interpret=True)
    np.testing.assert_allclose(np.asarray(dgx_ref), np.asarray(dgx_k),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dgh_ref), np.asarray(dgh_k),
                               rtol=1e-5, atol=1e-5)
