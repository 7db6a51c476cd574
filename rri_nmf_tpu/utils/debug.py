"""Runtime invariant validation (SURVEY.md §5.2).

The reference guards its sweep with in-loop asserts —
``W[:,t] >= 0`` / ``sum(W[:,t]) > 0`` (reference ``nmf.py:475-476``) and
feasibility asserts in the projections (``matrixops.py:42``,
``optimization.py:46``). Those cannot run inside a jitted sweep, so the
rebuild exposes them as an explicit post-sweep validation: the driver calls
:func:`validate_factors` after every iteration when ``debug_checks=True``
(off by default — it forces a device sync per iteration).
"""

import numpy as np


class FactorValidationError(AssertionError):
    pass


def validate_factors(W, T, w_row_sum=None, t_row_sum=None,
                     project_W_each_iter=False, project_T_each_iter=False,
                     tol=1e-10):
    """Check the reference's runtime invariants on (W, T).

    - non-negativity of both factors (reference nmf.py:475, clipping at
      nmf.py:867-868);
    - finiteness (the reference would propagate NaNs silently);
    - row-sum feasibility when per-iteration projection is on
      (tests/test_nmf.py:41-54 pins 1e-13 aggregate violation).

    Raises :class:`FactorValidationError` with a precise message.
    """
    W = np.asarray(W)
    T = np.asarray(T)
    if not np.all(np.isfinite(W)):
        raise FactorValidationError('W contains non-finite entries')
    if not np.all(np.isfinite(T)):
        raise FactorValidationError('T contains non-finite entries')
    if W.min() < -tol:
        raise FactorValidationError(
            'W contains negative entries (min=%g)' % W.min())
    if T.min() < -tol:
        raise FactorValidationError(
            'T contains negative entries (min=%g)' % T.min())
    if project_W_each_iter and w_row_sum is not None:
        target = np.broadcast_to(
            np.asarray(w_row_sum).reshape(-1) if np.ndim(w_row_sum)
            else w_row_sum, (W.shape[0],))
        cv = np.abs(W.sum(1) - target).sum()
        if cv > 1e-10 * max(1, W.shape[0]):
            raise FactorValidationError(
                'W row-sum constraint violated (aggregate %g)' % cv)
    if project_T_each_iter and t_row_sum is not None:
        cv = np.abs(T.sum(1) - t_row_sum).sum()
        if cv > 1e-10 * max(1, T.shape[0]):
            raise FactorValidationError(
                'T row-sum constraint violated (aggregate %g)' % cv)
    return True
