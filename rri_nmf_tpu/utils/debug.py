"""Runtime invariant validation (SURVEY.md §5.2).

The reference guards its sweep with in-loop asserts —
``W[:,t] >= 0`` / ``sum(W[:,t]) > 0`` (reference ``nmf.py:475-476``) and
feasibility asserts in the projections (``matrixops.py:42``,
``optimization.py:46``). Those cannot run inside a jitted sweep, so the
rebuild exposes them as an explicit post-sweep validation: the driver calls
:func:`validate_factors` after every iteration when ``debug_checks=True``
(off by default — it forces a device sync per iteration).
"""

import logging

import numpy as np

logger = logging.getLogger(__name__)

# The reference defines sub-DEBUG verbosity tiers (``nmf.py:36-48``:
# DEBUG-1 locals dumps, DEBUG-2 update internals, DEBUG-3 objective
# breakdowns). Named equivalents:
DEBUG1 = logging.DEBUG - 1
DEBUG2 = logging.DEBUG - 2
DEBUG3 = logging.DEBUG - 3
logging.addLevelName(DEBUG1, 'DEBUG1')
logging.addLevelName(DEBUG2, 'DEBUG2')
logging.addLevelName(DEBUG3, 'DEBUG3')


class MeasureDelta(object):
    """Log the change in objective around a block of code.

    Host-side analog of the reference's ``_MeasureDelta`` context manager
    (``nmf.py:580-609``): active only when the logger is at DEBUG or below;
    takes a zero-arg objective callable (e.g. a bound
    ``TrueObjComputer.true_objective``).

    >>> with MeasureDelta(OBJ.true_objective, 'update T'):
    ...     W, T = step(...)
    """

    def __init__(self, objective_fn, name=None, log=None):
        self.objective_fn = objective_fn
        self.name = name
        self.logger = log or logger

    def __enter__(self):
        self.active = self.logger.getEffectiveLevel() <= logging.DEBUG
        if self.active:
            self.obj = float(self.objective_fn())
        return self

    def __exit__(self, exc_type, exc, tb):
        if self.active and exc_type is None:
            delta = float(self.objective_fn()) - self.obj
            name_s = '{}: '.format(self.name) if self.name else ''
            self.logger.debug('%sdelta = %.2f', name_s, delta)


class FactorValidationError(AssertionError):
    pass


def validate_factors(W, T, w_row_sum=None, t_row_sum=None,
                     project_W_each_iter=False, project_T_each_iter=False,
                     tol=None):
    """Check the reference's runtime invariants on (W, T).

    - non-negativity of both factors (reference nmf.py:475, clipping at
      nmf.py:867-868);
    - finiteness (the reference would propagate NaNs silently);
    - row-sum feasibility when per-iteration projection is on
      (tests/test_nmf.py:41-54 pins 1e-13 aggregate violation).

    ``tol`` bounds both the negativity and the per-row sum violation;
    ``None`` picks a dtype-aware default — 1e-10 for float64 factors,
    1e-5 for 32/16-bit storage, whose simplex projections legitimately
    leave ~eps-scale per-row residue (a fixed f64-calibrated threshold
    would spuriously flag healthy float32 fits).

    Raises :class:`FactorValidationError` with a precise message.
    """
    W = np.asarray(W)
    T = np.asarray(T)
    if tol is None:
        tol = 1e-10 if W.dtype == np.float64 else 1e-5
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
        if cv > tol * max(1, W.shape[0]):
            raise FactorValidationError(
                'W row-sum constraint violated (aggregate %g)' % cv)
    if project_T_each_iter and t_row_sum is not None:
        cv = np.abs(T.sum(1) - t_row_sum).sum()
        if cv > tol * max(1, T.shape[0]):
            raise FactorValidationError(
                'T row-sum constraint violated (aggregate %g)' % cv)
    return True
