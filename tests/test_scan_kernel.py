"""Fused scan-kernel tests (interpret mode on CPU, bit-exact vs numpy).

The kernels compute integer arithmetic in bf16/fp32 (exact for int8-valued
inputs, |score| < 2^24), so the oracle comparison is exact equality.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from deepreadmapper_tpu.ops import scan_kernel as sk


@pytest.fixture(scope="module")
def int8_case():
    rng = np.random.default_rng(0)
    np_, qp, d = 2 * sk.CT, sk.QT, 128
    r8 = rng.integers(-127, 128, (np_, d)).astype(np.int8)
    q8 = rng.integers(-127, 128, (qp, d)).astype(np.int8)
    return r8, q8


def _oracle_winmin(scores, w=sk.W):
    """scores [Q, N] -> per-window (min [NW, Q], global argmin [NW, Q])."""
    qp, np_ = scores.shape
    s3 = scores.reshape(qp, np_ // w, w)
    vals = s3.min(-1).T
    args = (s3.argmin(-1) + np.arange(np_ // w)[None, :] * w).T
    return vals, args


def _scores(q8, r8, ntotal):
    rn = (r8.astype(np.int64) ** 2).sum(1).astype(np.float32)
    rn[ntotal:] = np.float32(3.4e38)
    return rn[None, :] - 2.0 * (
        q8.astype(np.float32) @ r8.astype(np.float32).T
    )


@pytest.mark.parametrize("w", [128, 512])
def test_int8_winmin_matches_oracle(int8_case, w):
    r8, q8 = int8_case
    qt_b = jnp.asarray(q8.T.astype(np.float32), jnp.bfloat16)
    vals, args = sk._int8_winmin_call(
        qt_b, jnp.asarray(r8), r8.shape[0], w=w, interpret=True
    )
    ov, oa = _oracle_winmin(_scores(q8, r8, r8.shape[0]), w)
    np.testing.assert_array_equal(np.asarray(vals), ov)
    np.testing.assert_array_equal(np.asarray(args), oa)


def test_pq_winmin_matches_oracle(int8_case):
    _, q8 = int8_case
    rng = np.random.default_rng(1)
    np_, m, ksub, dsub = 2 * sk.CT, 8, 256, 16
    cent8 = rng.integers(-127, 128, (m, ksub, dsub)).astype(np.int8)
    codes = rng.integers(0, ksub, (np_, m)).astype(np.int32)
    recon = np.concatenate(
        [cent8[j][codes[:, j]] for j in range(m)], axis=1
    ).astype(np.float32)
    cent2d = cent8.reshape(-1, dsub).astype(np.float32)
    qt_b = jnp.asarray(q8.T.astype(np.float32), jnp.bfloat16)
    vals, args = sk._pq_winmin_call(
        qt_b, jnp.asarray(codes.T), np_,
        jnp.asarray(cent2d, jnp.bfloat16), interpret=True,
    )
    rn = (recon**2).sum(1).astype(np.float32)
    s = rn[None, :] - 2.0 * (q8.astype(np.float32) @ recon.T)
    ov, oa = _oracle_winmin(s)
    np.testing.assert_array_equal(np.asarray(vals), ov)
    np.testing.assert_array_equal(np.asarray(args), oa)


def test_fused_topk_multichunk_merge(int8_case):
    r8, q8 = int8_case
    qt_b = jnp.asarray(q8.T.astype(np.float32), jnp.bfloat16)
    k = 16
    d, i = sk.fused_scan_topk(
        qt_b, jnp.asarray(r8), r8.shape[0], k, sk.CT, "int8",
        exact=True, interpret=True,
    )
    d, i = np.asarray(d), np.asarray(i)
    wv, wa = _oracle_winmin(_scores(q8, r8, r8.shape[0]))
    order = np.argsort(wv.T, axis=1, kind="stable")[:, :k]
    np.testing.assert_array_equal(d, np.take_along_axis(wv.T, order, 1))
    oi = np.take_along_axis(wa.T, order, 1)
    for r in range(d.shape[0]):
        assert set(i[r]) == set(oi[r])


def test_ntotal_masks_padding_rows(int8_case):
    r8, q8 = int8_case
    n_real = r8.shape[0] - sk.CT  # treat the last tile as padding
    qt_b = jnp.asarray(q8.T.astype(np.float32), jnp.bfloat16)
    d, i = sk.fused_scan_topk(
        qt_b, jnp.asarray(r8), n_real, 8, sk.CT, "int8",
        exact=True, interpret=True,
    )
    assert np.all(np.asarray(i) < n_real)
    # and the kept scores equal the oracle restricted to real rows
    wv, _ = _oracle_winmin(_scores(q8, r8, n_real))
    order = np.argsort(wv.T, axis=1, kind="stable")[:, :8]
    np.testing.assert_array_equal(
        np.asarray(d), np.take_along_axis(wv.T, order, 1)
    )


def test_choose_chunk():
    base = sk._PAD_BASE
    assert sk.choose_chunk(8 * base) == 8 * base
    assert sk.choose_chunk(16 * base) == 8 * base
    assert sk.choose_chunk(9 * base) == 3 * base   # largest divisor <= 8
    assert sk.choose_chunk(41 * base) == base      # prime unit count
    assert sk.choose_chunk(12 * base) == 6 * base


def test_fused_ratio_path_matches_mixed_scale_oracle(int8_case):
    """ratio != 1 (clip-free query scale): the fused kernel's score
    r^2*qn + rn - 2r*dot must rank exactly like the mixed-scale oracle.
    (Every other kernel test runs at ratio == 1.)"""
    r8, q8 = int8_case
    n = r8.shape[0]
    qf = q8.astype(np.float32) * 3.0  # out-of-range queries
    sc = np.float32(1.0)
    sq = np.float32(np.abs(qf).max() / 127.0)
    ratio = np.float32(sq / sc)
    q8q = np.clip(np.round(qf / sq), -127, 127).astype(np.float32)
    qt_b = jnp.asarray(q8q.T, jnp.bfloat16)
    d, i = sk.fused_scan_topk(
        qt_b, jnp.asarray(r8), n, 8, sk.CT, "int8", ratio=ratio,
        exact=True, interpret=True,
    )
    rn = (r8.astype(np.int64) ** 2).sum(1).astype(np.float32)
    s = (ratio * ratio * (q8q**2).sum(1)[:, None]
         + rn[None, :]
         - 2 * ratio * (q8q @ r8.astype(np.float32).T))
    # the kernel omits the constant qn term; compare AFTER adding it back
    d_full = np.asarray(d) + (ratio * ratio) * (q8q**2).sum(1)[:, None]
    sw = s.reshape(s.shape[0], n // sk.W, sk.W).min(-1)
    order = np.argsort(sw, axis=1, kind="stable")[:, :8]
    np.testing.assert_allclose(
        d_full, np.take_along_axis(sw, order, 1), rtol=1e-5
    )
    # argmin row ids land in the winning windows
    oi = np.asarray(i) // sk.W
    np.testing.assert_array_equal(np.sort(oi, 1), np.sort(order, 1))
