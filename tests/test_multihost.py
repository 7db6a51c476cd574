"""Multi-host wiring helpers (parallel/multihost.py).

There is no multi-process fabric in CI; these pin the single-process
contracts (exact equivalence with the local-mesh helpers) plus the
layout math that must hold for any process count."""

import jax
import jax.numpy as jnp
import numpy as np

from rri_nmf_tpu.nmf import nmf
from rri_nmf_tpu.parallel import (
    distribute_dense, distribute_factors, initialize_distributed,
    make_global_mesh, make_mesh, process_row_block)


def test_initialize_distributed_single_process_noop():
    p, r = initialize_distributed()
    assert (p, r) == (0, 1)
    # idempotent
    assert initialize_distributed() == (0, 1)


def test_global_mesh_matches_local_single_process():
    m = make_global_mesh()
    assert m.axis_names == ('dp', 'tp')
    assert m.devices.size == len(jax.devices())
    assert m.shape == make_mesh(len(jax.devices())).shape
    m2 = make_global_mesh(mesh_shape=(8, 1))
    assert m2.shape == {'dp': 8, 'tp': 1}


def test_process_row_block_covers_everything():
    n = 173
    start, stop = process_row_block(n, make_global_mesh())
    assert (start, stop) == (0, n)       # single process owns all rows


def test_distribute_dense_and_factors_roundtrip():
    mesh = make_global_mesh(mesh_shape=(4, 2))
    rng = np.random.RandomState(0)
    X = rng.rand(64, 32)
    Xg = distribute_dense(X, X.shape, mesh)
    assert Xg.shape == X.shape
    np.testing.assert_allclose(np.asarray(Xg), X)
    # canonical layout: rows over dp, cols over tp
    assert Xg.sharding.spec == jax.sharding.PartitionSpec('dp', 'tp')
    W, T = rng.rand(64, 5), rng.rand(5, 32)
    Wg, Tg = distribute_factors(W, T, 64, mesh)
    np.testing.assert_allclose(np.asarray(Wg), W)
    np.testing.assert_allclose(np.asarray(Tg), T)
    assert Wg.sharding.spec == jax.sharding.PartitionSpec('dp', None)


def test_global_mesh_drives_a_sharded_fit():
    """A make_global_mesh mesh is a drop-in for nmf(mesh=...): parity
    with the single-device fit."""
    rng = np.random.RandomState(2)
    X = np.abs(rng.rand(96, 64))
    kw = dict(k=4, max_iter=3, random_state=0, early_stop=False,
              update_order='phase', reset_topic_method=None, eps_stop=0)
    single = nmf(X, **kw)
    sharded = nmf(X, mesh=make_global_mesh(mesh_shape=(4, 2)), **kw)
    assert np.allclose(single['W'], sharded['W'], atol=1e-11)
    assert np.allclose(single['T'], sharded['T'], atol=1e-11)


def test_process_row_block_clamped_and_mesh_aware():
    """process_row_block derives from the dp coordinates this process's
    devices own (clamped ceil-chunks) — the single process owns every
    row for ANY n (previously a naive even split left the start
    unclamped past n for tiny n), and dp > 1 does not change that."""
    for mesh in (make_mesh(8, mesh_shape=(8, 1)),
                 make_mesh(8, mesh_shape=(4, 2))):
        for n in (100, 5, 64, 17, 3):
            lo, hi = process_row_block(n, mesh)
            assert (lo, hi) == (0, n), (mesh.devices.shape, n, lo, hi)
