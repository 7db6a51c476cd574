"""Manual-DMA sparse MXU contractions (ops/sparse_dma.py).

Second-generation beyond-HBM kernel: one grid step per used output
tile, in-kernel fori over its chunks with double-buffered
``make_async_copy`` factor/metadata fetches. Pins: exact contraction
parity vs dense, duplicate summation, empty bands/matrices, metadata
block-size invariance (the double-buffer boundary logic), and
driver-level sparse='dma' == dense fit parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from rri_nmf_tpu.nmf import nmf
from rri_nmf_tpu.ops.sparse_dma import (
    contract_wtx, contract_xtt, plan_sparse_matrix_dma)


@pytest.mark.parametrize('n,d,k,dens', [
    (300, 260, 7, 0.02),        # non-multiple-of-128 edges
    (128, 128, 4, 0.05),        # exactly one tile
    (513, 200, 16, 0.005),      # sparse tail tiles
    (64, 1000, 3, 0.01),        # wide
])
def test_dma_contractions_match_dense(n, d, k, dens):
    rng = np.random.RandomState(hash((n, d)) % 2**31)
    Xd = rng.rand(n, d) * (rng.rand(n, d) < dens)
    plan = plan_sparse_matrix_dma(sp.csr_matrix(Xd), np.float64)
    W = rng.rand(n, k)
    T = rng.rand(k, d)
    wtx = np.array(contract_wtx(plan, jnp.asarray(W), interpret=True))
    xtt = np.array(contract_xtt(plan, jnp.asarray(T), interpret=True))
    assert np.abs(wtx - W.T @ Xd).max() < 1e-11
    assert np.abs(xtt - T @ Xd.T).max() < 1e-11


@pytest.mark.parametrize('mblk', [1, 2, 8, 16])
def test_dma_metadata_block_sizes(mblk):
    """Any metadata block size computes the identical contraction —
    exercises the block-boundary start/wait pairing and the trailing
    over-read padding."""
    rng = np.random.RandomState(2)
    Xd = rng.rand(260, 390) * (rng.rand(260, 390) < 0.03)
    plan = plan_sparse_matrix_dma(sp.csr_matrix(Xd), np.float64)
    W = rng.rand(260, 6)
    out = np.array(contract_wtx(plan, jnp.asarray(W), interpret=True,
                                mblk=mblk))
    assert np.abs(out - W.T @ Xd).max() < 1e-11


def test_dma_duplicates_sum_and_empty_bands():
    X = sp.coo_matrix((np.array([1.0, 2.0, 3.0]),
                       (np.array([5, 5, 9]), np.array([7, 7, 130]))),
                      shape=(200, 400))
    plan = plan_sparse_matrix_dma(X, np.float64)
    rng = np.random.RandomState(0)
    W = rng.rand(200, 3)
    out = np.array(contract_wtx(plan, jnp.asarray(W), interpret=True))
    ref = W.T @ X.toarray()
    assert np.isfinite(out).all()
    assert np.abs(out - ref).max() < 1e-12
    assert np.all(out[:, 256:] == 0.0)


def test_dma_empty_matrix():
    X = sp.csr_matrix((50, 70))
    plan = plan_sparse_matrix_dma(X, np.float64)
    W = np.random.RandomState(0).rand(50, 3)
    out = np.array(contract_wtx(plan, jnp.asarray(W), interpret=True))
    assert out.shape == (3, 70) and np.all(out == 0.0)


def test_dma_bf16_values_stay_32bit():
    """bf16 storage: the factor operands compute in bf16 (MXU rate) but
    the plan's VALUES are stored 32-bit — a 1-row bf16 HBM array cannot
    be DMA-sliced (16-bit tiling packs 2 sublanes per word; measured
    Mosaic lowering failure on v5e). Result within bf16 input-rounding
    tolerance."""
    rng = np.random.RandomState(8)
    Xd = rng.rand(300, 260) * (rng.rand(300, 260) < 0.03)
    plan16 = plan_sparse_matrix_dma(sp.csr_matrix(Xd),
                                    np.dtype('bfloat16'))
    assert plan16.t_phase.vals.dtype == jnp.float32
    W = rng.rand(300, 5)
    out = np.array(contract_wtx(plan16, jnp.asarray(W, jnp.bfloat16),
                                interpret=True), np.float64)
    ref = W.T @ Xd
    assert np.abs(out - ref).max() < 4e-2 * np.abs(ref).max()


def test_driver_sparse_dma_matches_dense():
    """nmf(X, sparse='dma') == the dense fit to 1e-11 (same sweeps)."""
    rng = np.random.RandomState(3)
    Xd = np.abs(rng.rand(150, 90))
    Xd[Xd < 0.7] = 0.0
    kw = dict(k=6, max_iter=5, random_state=0, early_stop=False,
              update_order='phase', reset_topic_method=None,
              compute_obj_each_iter=True, eps_stop=0)
    dense = nmf(Xd, **kw)
    dma = nmf(sp.csr_matrix(Xd), sparse='dma', **kw)
    assert np.allclose(dense['W'], dma['W'], atol=1e-11)
    assert np.allclose(dense['T'], dma['T'], atol=1e-11)
    assert np.allclose(dense['obj_history'], dma['obj_history'], atol=1e-9)
    assert np.all(np.diff(dma['obj_history']) <= 1e-10)


def test_driver_sparse_dma_tm_preset_and_inner_reps():
    rng = np.random.RandomState(4)
    Xd = np.abs(rng.rand(130, 80))
    Xd[Xd < 0.6] = 0.0
    kw = dict(k=5, max_iter=4, random_state=0, early_stop=False,
              update_order='phase', reset_topic_method=None,
              project_T_each_iter=True, t_row_sum=1.0, w_row_sum=1.0,
              inner_reps=2, eps_stop=0)
    dense = nmf(Xd, **kw)
    dma = nmf(sp.csr_matrix(Xd), sparse='dma', **kw)
    assert np.allclose(dense['W'], dma['W'], atol=1e-11)
    assert np.allclose(dense['T'], dma['T'], atol=1e-11)


def test_driver_sparse_dma_validation():
    rng = np.random.RandomState(5)
    Xd = np.abs(rng.rand(40, 30))
    with pytest.raises(ValueError):
        nmf(Xd, 4, sparse='dma')        # dense input
    from rri_nmf_tpu.parallel.mesh import make_mesh
    with pytest.raises(ValueError):     # single-device only
        nmf(sp.csr_matrix(Xd), 4, sparse='dma',
            mesh=make_mesh(8, mesh_shape=(8, 1)))
