"""Property tests for the qf_min subproblem solver.

Beyond the reference's coverage (which only exercises qf_min indirectly):
checks each branch against a brute-force / scipy QP oracle and pins the
norm-return contract that the RRI scale transfer depends on.
"""

import numpy as np
import pytest

from rri_nmf_tpu.optimization import (
    first_last_stopping_condition, qf_min, universal_stopping_condition,
)


def _objective(x, w, c):
    return float(np.sum(w * x) + 0.5 * np.sum(c * x * x))


def _oracle_scalar_simplex(w, c, s):
    """Brute-force oracle via scipy SLSQP for min w'x + c/2 x'x on the
    simplex of radius s."""
    from scipy.optimize import minimize
    d = w.size
    res = minimize(
        lambda x: np.sum(w * x) + 0.5 * c * np.sum(x * x),
        np.full(d, s / d),
        jac=lambda x: w + c * x,
        bounds=[(0, s)] * d,
        constraints=[{'type': 'eq', 'fun': lambda x: np.sum(x) - s}],
        method='SLSQP', options={'maxiter': 200, 'ftol': 1e-14})
    return res.x


@pytest.mark.parametrize('seed', range(5))
def test_qf_min_scalar_positive_vs_oracle(seed):
    rng = np.random.RandomState(seed)
    d = 12
    w = rng.randn(d)
    c = float(rng.rand() + 0.1)
    x, nx = qf_min(w, c, s=1.0, ub=1.0)
    x = np.asarray(x)
    # feasibility
    assert abs(x.sum() - 1.0) < 1e-12
    assert np.all(x >= -1e-15)
    # optimality vs oracle
    x_star = _oracle_scalar_simplex(w, c, 1.0)
    assert _objective(x, w, c) <= _objective(x_star, w, c) + 1e-9
    # norm contract: pre-projection l1 norm of the unconstrained solution
    assert abs(float(nx) - (np.maximum(-w, 0) / (c + np.spacing(10))).sum()) \
        < 1e-12


def test_qf_min_scalar_nonpositive_vertex():
    """Concave objective on the simplex: vertex at argmin(w)
    (reference ``optimization.py:60-74``)."""
    w = np.array([0.3, -0.5, 0.1, -0.2])
    x, nx = qf_min(w, -1.0, s=1.0, ub=1.0)
    x = np.asarray(x)
    expected = np.zeros(4)
    expected[1] = 1.0
    assert np.allclose(x, expected)
    assert float(nx) == 1.0


def test_qf_min_scalar_nonpositive_no_sum():
    """c <= 0 with no sum constraint: saturate violating coords at ub."""
    w = np.array([0.5, -2.0, 0.3])
    x, nx = qf_min(w, -1.0, s=None, ub=2.0)
    x = np.asarray(x)
    # w + c < 0 at indices 0 (0.5-1=-0.5), 1 (-3), 2 (-0.7) -> all at ub
    assert np.allclose(x, [2.0, 2.0, 2.0])


def test_qf_min_scalar_unbounded_raises():
    with pytest.raises(ValueError):
        qf_min(np.array([-1.0, 0.5]), -1.0, s=None, ub=None)


def test_qf_min_vector_branch():
    """Vector-c (WRRI) branch: solve on c>0 coords, clip, rescale — NOT a
    simplex projection (reference ``optimization.py:75-88``)."""
    w = np.array([-2.0, -1.0, -4.0, 1.0])
    c = np.array([1.0, 0.0, 2.0, 1.0])
    x, nx = qf_min(w, c, s=None, ub=None)
    x = np.asarray(x)
    assert np.allclose(x, [2.0, 0.0, 2.0, 0.0], atol=1e-10)
    assert abs(float(nx) - 4.0) < 1e-9

    # with ub clip and rescale to s
    x, nx = qf_min(w, c, s=1.0, ub=1.5)
    x = np.asarray(x)
    # raw [2,0,2,0] -> ub=min(1.5, s=1.0)=1.0 -> clip [1,0,1,0], nx=2,
    # rescale to sum 1
    assert abs(x.sum() - 1.0) < 1e-12
    assert np.allclose(x, [0.5, 0.0, 0.5, 0.0], atol=1e-10)
    assert abs(float(nx) - 2.0) < 1e-9


def test_qf_min_vector_zero_sum_guard():
    """Dead-row rescale must not NaN (fixes reference quirk at
    ``optimization.py:86``)."""
    w = np.array([1.0, 2.0])      # -w all negative -> x = 0
    c = np.array([1.0, 1.0])
    x, nx = qf_min(w, c, s=1.0, ub=1.0)
    assert np.all(np.isfinite(np.asarray(x)))


def test_qf_min_vector_unbounded_raises():
    with pytest.raises(ValueError):
        qf_min(np.array([1.0, -1.0]), np.array([-1.0, 1.0]), s=None, ub=None)


@pytest.mark.parametrize('seed', range(10))
def test_kkt_qf_min_vs_slsqp(seed):
    """Exact breakpoint KKT solver matches/beats SLSQP on random convex
    box-simplex QPs (rebuild of the reference's exploratory kkt_qf_min,
    ``optimization.py:110-150``)."""
    from rri_nmf_tpu.optimization import kkt_qf_min, optimize_scipy
    rng = np.random.RandomState(seed)
    n = rng.randint(3, 20)
    w = rng.randn(n) * 2
    d = rng.rand(n) + 0.05
    ub = float(rng.choice([0.3, 0.5, 1.0, 2.0]))
    s = float(rng.uniform(0.2, min(1.0, n * ub * 0.9)))
    xk = kkt_qf_min(w, d, s=s, ub=ub)
    xs, _ = optimize_scipy(w, 2 * d, s=s, ub=ub)

    def f(x):
        return np.sum(w * x) + np.sum(d * x * x)

    assert abs(xk.sum() - s) < 1e-9
    assert xk.min() >= -1e-12 and xk.max() <= ub + 1e-12
    assert f(xk) <= f(xs) + 1e-6


def test_kkt_matches_qf_min_uniform_curvature():
    """With uniform curvature the simplex-projection solve of qf_min and
    the KKT solver agree."""
    from rri_nmf_tpu.optimization import kkt_qf_min
    rng = np.random.RandomState(1)
    w = rng.randn(15)
    c = 0.8
    x1, _ = qf_min(w, c, s=1.0, ub=1.0)
    # qf_min solves w'x + c/2 x'x; kkt solves w'x + d x'x -> d = c/2
    x2 = kkt_qf_min(w, c / 2.0, s=1.0, ub=1.0)
    assert np.allclose(np.asarray(x1), x2, atol=1e-8)


def test_optimize_scipy_returns():
    """The reference's optimize_scipy had a missing return
    (``optimization.py:281-282``); ours returns (x, l1 norm)."""
    from rri_nmf_tpu.optimization import optimize_scipy
    x, nx = optimize_scipy(np.array([-1.0, 0.5, -0.2]), 1.0, s=1.0, ub=1.0)
    assert abs(np.sum(x) - 1.0) < 1e-8
    assert abs(nx - np.abs(x).sum()) < 1e-12


def test_projected_gradient_norm():
    from rri_nmf_tpu.optimization import projected_gradient_norm
    grad = np.array([1.0, -2.0, 3.0, -4.0])
    vec = np.array([0.5, 0.0, 0.0, 1.0])     # interior, lb, lb, interior
    # interior coords contribute fully; lb coords only negative parts
    got = float(projected_gradient_norm(grad, vec, lb=0.0, ub=np.inf))
    assert abs(got - (1.0 + 4.0 + 0.0 + 16.0)) < 1e-12
    # at a finite upper bound, only positive gradient parts count
    got = float(projected_gradient_norm(np.array([2.0, -3.0]),
                                        np.array([1.0, 1.0]), lb=0.0, ub=1.0))
    assert abs(got - 4.0) < 1e-12


def test_measure_delta_logs(caplog):
    import logging
    from rri_nmf_tpu.utils.debug import MeasureDelta
    vals = iter([10.0, 7.5])
    log = logging.getLogger('md_test')
    log.setLevel(logging.DEBUG)
    with caplog.at_level(logging.DEBUG, logger='md_test'):
        with MeasureDelta(lambda: next(vals), 'block', log=log):
            pass
    assert any('delta = -2.50' in r.getMessage() for r in caplog.records)


def test_stopping_conditions():
    assert not universal_stopping_condition([10.0])
    assert universal_stopping_condition([10.0, 5.0, 4.9995], eps_stop=1e-3)
    assert not universal_stopping_condition([10.0, 5.0, 4.0], eps_stop=1e-3)
    assert not first_last_stopping_condition([10.0])
    assert first_last_stopping_condition([10.0, 0.0005], eps_stop=1e-4)


def test_qf_min_vector_ub_accepted():
    """Per-coordinate ub with the default s (previously crashed on ndarray
    truthiness before reaching the solver): result is feasible and sums
    to s."""
    w = np.array([-3.0, -1.0, -2.0])
    ub = np.array([0.4, 1.0, 1.0])
    x, _ = qf_min(w, 2.0, s=1.0, ub=ub)
    x = np.asarray(x)
    # contract: clip to ub, then RESCALE (not project) to sum s — the
    # rescale may exceed ub (reference optimization.py:75-88 semantics),
    # so only nonnegativity and the sum are guaranteed here
    assert abs(x.sum() - 1.0) < 1e-12
    assert (x >= 0).all()
    # and with s=None (the other crashing gate). NOTE the scalar-convex
    # branch ignores ub entirely — that is the REFERENCE's semantics
    # (reference optimization.py:53-59 never applies ub for scalar c>0),
    # kept for parity; only the crash is fixed.
    x2, _ = qf_min(np.array([-3.0, 1.0]), 2.0, s=None,
                   ub=np.array([0.5, 2.0]))
    assert np.allclose(np.asarray(x2), [1.5, 0.0])


def test_qf_min_concave_binding_ub_refused():
    """Concave objective + sum constraint + a binding upper bound
    (ub < s): the all-mass vertex is infeasible, so qf_min must refuse
    instead of returning a constraint-violating x (it previously
    returned x with max(x) = s > ub)."""
    w = np.array([3.0, 1.0, 2.0])
    with pytest.raises(NotImplementedError):
        qf_min(w, -1.0, s=2.0, ub=1.0)
    # non-binding ub (>= s): the vertex solution stands and is feasible
    x, _ = qf_min(w, -1.0, s=1.0, ub=1.0)
    x = np.asarray(x)
    assert abs(x.sum() - 1.0) < 1e-12 and x.max() <= 1.0 + 1e-12
