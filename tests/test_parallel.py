"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax

from deepreadmapper_tpu.ops.topk import l2_topk
from deepreadmapper_tpu.parallel.mesh import make_mesh
from deepreadmapper_tpu.parallel.sharded_search import sharded_l2_topk


def test_mesh_shapes():
    mesh = make_mesh(n_data=4, n_shard=2)
    assert mesh.shape == {"data": 4, "shard": 2}


def test_sharded_topk_matches_oracle():
    rng = np.random.default_rng(0)
    q = rng.standard_normal((16, 128)).astype(np.float32)
    r = rng.standard_normal((512, 128)).astype(np.float32)
    mesh = make_mesh(n_data=4, n_shard=2)
    d, i = sharded_l2_topk(q, r, k=10, mesh=mesh)
    d_ref, i_ref = l2_topk(q, r, 10)
    np.testing.assert_allclose(np.asarray(d), np.asarray(d_ref), rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))


def test_sharded_topk_4way():
    rng = np.random.default_rng(1)
    q = rng.standard_normal((8, 64)).astype(np.float32)
    r = rng.standard_normal((256, 64)).astype(np.float32)
    mesh = make_mesh(n_data=2, n_shard=4)
    d, i = sharded_l2_topk(q, r, k=16, mesh=mesh)
    d_ref, i_ref = l2_topk(q, r, 16)
    np.testing.assert_allclose(np.asarray(d), np.asarray(d_ref), rtol=1e-4, atol=1e-4)


def test_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (256, 128)
    assert np.all(np.isfinite(np.asarray(out)))
