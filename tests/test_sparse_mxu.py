"""Tile-bucketed one-hot MXU sparse contractions (ops/sparse_mxu.py).

The kernel reconstructs each 128x128 X tile from its chunked nonzeros
with two one-hot MXU matmuls and accumulates F @ X_tile into revisited
output tiles. Pins: exact contraction parity vs dense, duplicate
summation (scipy COO semantics), empty tile bands, and driver-level
sparse='mxu' == dense fit parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from rri_nmf_tpu.nmf import nmf
from rri_nmf_tpu.ops.sparse_mxu import (
    contract_wtx, contract_xtt, plan_sparse_matrix)


@pytest.mark.parametrize('n,d,k,dens', [
    (300, 260, 7, 0.02),        # non-multiple-of-128 edges
    (128, 128, 4, 0.05),        # exactly one tile
    (513, 200, 16, 0.005),      # sparse tail tiles
    (64, 1000, 3, 0.01),        # wide
])
def test_mxu_contractions_match_dense(n, d, k, dens):
    rng = np.random.RandomState(hash((n, d)) % 2**31)
    Xd = rng.rand(n, d) * (rng.rand(n, d) < dens)
    plan = plan_sparse_matrix(sp.csr_matrix(Xd), np.float64)
    W = rng.rand(n, k)
    T = rng.rand(k, d)
    wtx = np.array(contract_wtx(plan, jnp.asarray(W), interpret=True))
    xtt = np.array(contract_xtt(plan, jnp.asarray(T), interpret=True))
    assert np.abs(wtx - W.T @ Xd).max() < 1e-11
    assert np.abs(xtt - T @ Xd.T).max() < 1e-11


def test_mxu_duplicates_sum_and_empty_bands():
    """Duplicate COO entries sum (scipy semantics); output tiles in
    all-zero 128-column bands come back exactly zero, not garbage."""
    X = sp.coo_matrix((np.array([1.0, 2.0, 3.0]),
                       (np.array([5, 5, 9]), np.array([7, 7, 130]))),
                      shape=(200, 400))
    plan = plan_sparse_matrix(X, np.float64)
    rng = np.random.RandomState(0)
    W = rng.rand(200, 3)
    out = np.array(contract_wtx(plan, jnp.asarray(W), interpret=True))
    ref = W.T @ X.toarray()
    assert np.isfinite(out).all()
    assert np.abs(out - ref).max() < 1e-12
    assert np.all(out[:, 256:] == 0.0)


def test_mxu_empty_matrix():
    X = sp.csr_matrix((50, 70))
    plan = plan_sparse_matrix(X, np.float64)
    W = np.random.RandomState(0).rand(50, 3)
    out = np.array(contract_wtx(plan, jnp.asarray(W), interpret=True))
    assert out.shape == (3, 70) and np.all(out == 0.0)


def test_driver_sparse_mxu_matches_dense():
    """nmf(X, sparse='mxu') == the dense fit to 1e-11 (same sweeps)."""
    rng = np.random.RandomState(3)
    Xd = np.abs(rng.rand(150, 90))
    Xd[Xd < 0.7] = 0.0
    kw = dict(k=6, max_iter=5, random_state=0, early_stop=False,
              update_order='phase', reset_topic_method=None,
              compute_obj_each_iter=True, eps_stop=0)
    dense = nmf(Xd, **kw)
    mxu = nmf(sp.csr_matrix(Xd), sparse='mxu', **kw)
    assert np.allclose(dense['W'], mxu['W'], atol=1e-11)
    assert np.allclose(dense['T'], mxu['T'], atol=1e-11)
    assert np.allclose(dense['obj_history'], mxu['obj_history'], atol=1e-9)
    assert np.all(np.diff(mxu['obj_history']) <= 1e-10)


def test_driver_sparse_mxu_inner_reps_and_tm_preset():
    """mxu path with inner_reps and the TM constraint set (simplex T via
    Gram-blocked loops, W row sums)."""
    rng = np.random.RandomState(4)
    Xd = np.abs(rng.rand(130, 80))
    Xd[Xd < 0.6] = 0.0
    kw = dict(k=5, max_iter=4, random_state=0, early_stop=False,
              update_order='phase', reset_topic_method=None,
              project_T_each_iter=True, t_row_sum=1.0, w_row_sum=1.0,
              inner_reps=2, eps_stop=0)
    dense = nmf(Xd, **kw)
    mxu = nmf(sp.csr_matrix(Xd), sparse='mxu', **kw)
    assert np.allclose(dense['W'], mxu['W'], atol=1e-11)
    assert np.allclose(dense['T'], mxu['T'], atol=1e-11)


def test_driver_sparse_mxu_validation():
    rng = np.random.RandomState(5)
    Xd = np.abs(rng.rand(40, 30))
    with pytest.raises(ValueError):
        nmf(Xd, 4, sparse='mxu')        # dense input


def test_sharded_mxu_matches_single_device():
    """Mesh-sharded MXU sweep (per-device chunk plans under shard_map,
    psum'd numerators/Grams) == the single-device mxu fit == the sharded
    BCOO fit, on (8,1) and (4,2) meshes."""
    from rri_nmf_tpu.parallel.mesh import make_mesh
    rng = np.random.RandomState(6)
    Xd = np.abs(rng.rand(300, 260))
    Xd[Xd < 0.8] = 0.0
    Xs = sp.csr_matrix(Xd)
    kw = dict(k=6, max_iter=3, random_state=0, early_stop=False,
              update_order='phase', reset_topic_method=None,
              compute_obj_each_iter=True, eps_stop=0)
    single = nmf(Xs, sparse='mxu', **kw)
    for shape in [(8, 1), (4, 2)]:
        mesh = make_mesh(8, mesh_shape=shape)
        sharded = nmf(Xs, sparse='mxu', mesh=mesh, **kw)
        assert np.allclose(single['W'], sharded['W'], atol=1e-11), shape
        assert np.allclose(single['obj_history'], sharded['obj_history'],
                           atol=1e-9), shape
    # BCOO cross-check on the 2-D mesh only (the (8,1) BCOO path is
    # covered by tests/test_sparse_mesh.py)
    bcoo = nmf(Xs, sparse=True, mesh=mesh, **kw)
    assert np.allclose(bcoo['W'], sharded['W'], atol=1e-11)


def test_sharded_mxu_tm_preset_no_padded_column_leak():
    """TM preset (per-topic T simplex projection) through the sharded
    MXU sweep: the TILE-padded ghost columns must receive NO simplex
    mass — T rows sum to t_row_sum exactly on the true d columns and the
    fit matches the single-device mxu fit. Regression for the round-3
    self-review finding (mass leaked via the Duchi threshold whenever
    the unconstrained row summed below t_row_sum; row sums came back
    d/dpad)."""
    from rri_nmf_tpu.parallel.mesh import make_mesh
    rng = np.random.RandomState(11)
    # small-magnitude X so the unconstrained T rows sum below 1.0 and
    # the projection must ADD mass — the leaking regime; d=80 pads to 128
    Xd = 0.05 * np.abs(rng.rand(96, 80))
    Xd[Xd < 0.04] = 0.0
    Xs = sp.csr_matrix(Xd)
    kw = dict(k=4, max_iter=3, random_state=0, early_stop=False,
              update_order='phase', reset_topic_method=None,
              project_T_each_iter=True, t_row_sum=1.0, eps_stop=0)
    single = nmf(Xs, sparse='mxu', **kw)
    mesh = make_mesh(8, mesh_shape=(8, 1))
    sharded = nmf(Xs, sparse='mxu', mesh=mesh, **kw)
    assert np.allclose(sharded['T'].sum(axis=1), 1.0, atol=1e-6)
    assert np.allclose(single['T'], sharded['T'], atol=1e-9)
    assert np.allclose(single['W'], sharded['W'], atol=1e-9)


def test_sharded_sparse_bf16_contraction_accumulates_f32():
    """The sharded COO sweep's contractions must cast the dense operand
    to f32 BEFORE the dot under bf16 storage (bf16 accumulation over
    n_loc terms produced garbage numerators — round-3 self-review
    finding): the bf16 sharded fit stays close to the bf16 single-device
    fit."""
    from rri_nmf_tpu.parallel.mesh import make_mesh
    rng = np.random.RandomState(12)
    Xd = np.abs(rng.rand(256, 96))
    Xd[Xd < 0.6] = 0.0
    Xs = sp.csr_matrix(Xd.astype(np.float32))
    kw = dict(k=4, max_iter=3, random_state=0, early_stop=False,
              update_order='phase', reset_topic_method=None,
              dtype='bfloat16', eps_stop=0)
    single = nmf(Xs, sparse=True, **kw)
    mesh = make_mesh(8, mesh_shape=(8, 1))
    sharded = nmf(Xs, sparse=True, mesh=mesh, **kw)
    ref = np.asarray(single['W'], np.float32)
    got = np.asarray(sharded['W'], np.float32)
    scale = np.abs(ref).max()
    assert np.abs(got - ref).max() <= 0.03 * scale


def test_sharded_mxu_inner_reps_and_empty_device():
    """A device with an all-zero block (empty plan padding) plus
    inner_reps through the sharded MXU path."""
    from rri_nmf_tpu.parallel.mesh import make_mesh
    rng = np.random.RandomState(7)
    Xd = np.abs(rng.rand(200, 150))
    Xd[Xd < 0.85] = 0.0
    Xd[:50] = 0.0          # first dp block row mostly empty
    Xs = sp.csr_matrix(Xd)
    kw = dict(k=5, max_iter=3, random_state=0, early_stop=False,
              update_order='phase', reset_topic_method=None,
              inner_reps=2, eps_stop=0)
    mesh = make_mesh(8, mesh_shape=(4, 2))
    single = nmf(Xs, sparse='mxu', **kw)
    sharded = nmf(Xs, sparse='mxu', mesh=mesh, **kw)
    assert np.allclose(single['W'], sharded['W'], atol=1e-11)
    assert np.allclose(single['T'], sharded['T'], atol=1e-11)


def test_mxu_bf16_compute_mode():
    """bf16 storage engages bf16 dot operands (f32 accumulation): result
    within bf16 input-rounding tolerance of the f64 contraction."""
    import jax.numpy as jnp
    rng = np.random.RandomState(8)
    Xd = rng.rand(300, 260) * (rng.rand(300, 260) < 0.03)
    plan16 = plan_sparse_matrix(sp.csr_matrix(Xd), np.dtype('bfloat16'))
    W = rng.rand(300, 5)
    out = np.array(contract_wtx(plan16, jnp.asarray(W, jnp.bfloat16),
                                interpret=True), np.float64)
    ref = W.T @ Xd
    scale = np.abs(ref).max()
    assert np.abs(out - ref).max() < 4e-2 * scale


def test_sharded_mxu_two_groups_no_stale_trace():
    """Two plans with DIFFERENT chunk groupings through the same
    (cfg, mesh) must each run with their own grouping — the sweep builder
    is keyed on ``group``, so no cached trace with a stale grouping can
    be reused (round-2 VERDICT item 5 / ADVICE sparse_mesh nonlocal)."""
    import jax.numpy as jnp
    from rri_nmf_tpu.ops.sweep_xla import SweepConfig
    from rri_nmf_tpu.parallel.mesh import make_mesh
    from rri_nmf_tpu.parallel.sparse_mesh import (
        make_sharded_mxu_sweep, partition_mxu)

    rng = np.random.RandomState(9)
    Xd = np.abs(rng.rand(300, 260))
    Xd[Xd < 0.8] = 0.0
    Xs = sp.csr_matrix(Xd)
    mesh = make_mesh(8, mesh_shape=(4, 2))
    cfg = SweepConfig(k=5, reset_topic_method=None, update_order='phase')
    W0 = np.abs(rng.rand(300, 5))
    T0 = np.abs(rng.rand(5, 260))
    key = jax.random.PRNGKey(0)
    rl = jnp.asarray(0, jnp.int32)

    outs = []
    for g in (8, 4):
        plan = partition_mxu(Xs, mesh, np.float64, group=g)
        sweep = make_sharded_mxu_sweep(cfg, mesh, interpret=True, group=g)
        W1, T1, _, _ = sweep(plan, jnp.asarray(W0), jnp.asarray(T0),
                             key, rl, key)
        outs.append((np.array(W1), np.array(T1)))
    # both groupings compute the identical sweep
    assert np.allclose(outs[0][0], outs[1][0], atol=1e-11)
    assert np.allclose(outs[0][1], outs[1][1], atol=1e-11)

    # a plan/sweep group mismatch is rejected loudly
    plan8 = partition_mxu(Xs, mesh, np.float64, group=8)
    sweep4 = make_sharded_mxu_sweep(cfg, mesh, interpret=True, group=4)
    with pytest.raises(ValueError):
        sweep4(plan8, jnp.asarray(W0), jnp.asarray(T0), key, rl, key)


def test_plan_transfers_narrow_widens_on_device():
    """The plan's local-index arrays cross the host->device link narrow
    and the kernel sees int32: the HOST builder emits uint8 gloc/sloc
    (``% 128`` always fits), every device-placement path widens to int32
    (Mosaic needs >= 32-bit for the 1-row slicing), and ``mxu_contract``
    normalizes a raw uint8 plan so hand-built plans keep working."""
    import jax.numpy as jnp
    from rri_nmf_tpu.ops import sparse_mxu as sm

    rng = np.random.RandomState(3)
    Xd = rng.rand(200, 300) * (rng.rand(200, 300) < 0.03)
    Xs = sp.csr_matrix(Xd)
    coo = Xs.tocoo()

    # host form: uint8 (both bucketing paths — conftest keeps the native
    # lib available here; the sort fallback is pinned by test_native's
    # equivalence test which compares the two paths field-for-field)
    host = sm._plan_direction_np(coo.row, coo.col, coo.data,
                                 -(-200 // 128), -(-300 // 128),
                                 128, 8, np.float64)
    assert host[1].dtype == np.uint8 and host[2].dtype == np.uint8

    # device form: int32 after the one-off widen
    plan = sm.plan_sparse_matrix(Xs, np.float64, group=8)
    for cp in (plan.t_phase, plan.w_phase):
        assert cp.gloc.dtype == jnp.int32 and cp.sloc.dtype == jnp.int32

    # a raw (narrow) plan still contracts correctly via normalization
    narrow = sm.ContractPlan(
        jnp.asarray(host[0]), jnp.asarray(host[1]), jnp.asarray(host[2]),
        jnp.asarray(host[3]), jnp.asarray(host[4]), jnp.asarray(host[5]))
    W = rng.rand(200, 4)
    Wt = jnp.zeros((4, 256), jnp.float64).at[:, :200].set(W.T)
    out = sm.mxu_contract(narrow, Wt, interpret=True, group=8)
    ref = W.T @ Xd
    assert np.allclose(np.asarray(out)[:, :300], ref, atol=1e-12)


def test_mxu_contract_rejects_wrong_group():
    """A group argument that disagrees with the plan's own per-group
    otile array must fail loudly — it previously indexed the
    scalar-prefetch array out of bounds (garbage SMEM on TPU)."""
    import scipy.sparse as sp
    from rri_nmf_tpu.ops.sparse_mxu import mxu_contract, plan_sparse_matrix
    rng = np.random.RandomState(0)
    Xs = sp.random(300, 200, density=0.05, random_state=0, format='csr')
    plan = plan_sparse_matrix(Xs, np.float32, group=8)
    F = jnp.asarray(np.abs(rng.rand(4, plan.t_phase.mask.shape[1])),
                    jnp.float32)
    with pytest.raises(AssertionError, match='group'):
        mxu_contract(plan.t_phase, F, interpret=True, group=1)
