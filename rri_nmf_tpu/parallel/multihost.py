"""Multi-host (multi-process) wiring for the mesh-sharded paths.

Everything in :mod:`rri_nmf_tpu.parallel` is GSPMD over a
``jax.sharding.Mesh`` and is already multi-host *correct* — the sweep
bodies never index devices, and every collective is a mesh-axis
``psum``/``all_gather`` that XLA lowers to ICI within a slice and DCN
across slices. What a single-controller program lacks is the plumbing:
process-group initialization, a mesh over the *global* device set laid
out so the heavy collectives stay on ICI, and per-process data loading
(no host can materialize a BASELINE-scale X alone). This module is that
plumbing. (The reference has no distributed runtime at all — SURVEY.md
§2.2; its ``nmf.py:233-235,653-660`` only note what a distributed NMF
*would* send.)

Layout guidance (scaling-book recipe, applied to RRI's traffic):
per-sweep wire bytes are O(k·d/tp) psummed over ``dp``, O(k·n/dp)
psummed over ``tp``, and O(k²) Grams over both. With ``dp`` the outer
(cross-host) axis, the cross-DCN payload per sweep is the (k, d/tp)
T-phase numerator — independent of n, the axis you scale hosts over —
while the n-proportional psum stays on intra-host ICI. That is why
:func:`make_global_mesh` puts ``dp`` across slices and ``tp`` within.

Single-process calls are exact no-ops / equivalents of the local
helpers, so the same driver script runs unchanged from a laptop to a
pod — only ``initialize_distributed()`` + per-process loading differ.
Validation: beyond the single-process contracts
(tests/test_multihost.py), a REAL 2-process ``jax.distributed`` group
(XLA:CPU gloo collectives on localhost) drives this whole module plus
``nmf(mesh=...)`` end-to-end in tests/test_multiprocess.py — both
processes' gathered results are bitwise identical and match a
single-controller oracle fit. Multi-slice TPU runs remain unexercised
(no pod here), but the multi-controller code paths themselves are
tested, not just wired.
"""

import logging

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger('rri_nmf_tpu.parallel.multihost')


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None, local_device_ids=None):
    """Join (or create) the JAX process group.

    Thin idempotent wrapper over ``jax.distributed.initialize``: on Cloud
    TPU pods all arguments autodetect from the metadata server / TPU env
    vars, so call it with no arguments before any device query. On other
    fabrics pass the coordinator's ``host:port`` plus this process's
    rank. Returns ``(process_index, process_count)``.

    Safe to call when already initialized (returns the current group) and
    in a plain single-process session (initializes nothing unless
    explicitly given a coordinator).
    """
    already = getattr(jax.distributed, 'is_initialized', None)
    if callable(already) and already():
        return jax.process_index(), jax.process_count()
    explicit = coordinator_address is not None or num_processes is not None
    if explicit or _pod_env_present():
        kwargs = {}
        if coordinator_address is not None:
            kwargs['coordinator_address'] = coordinator_address
        if num_processes is not None:
            kwargs['num_processes'] = int(num_processes)
        if process_id is not None:
            kwargs['process_id'] = int(process_id)
        if local_device_ids is not None:
            kwargs['local_device_ids'] = local_device_ids
        try:
            jax.distributed.initialize(**kwargs)
        except (ValueError, RuntimeError) as e:
            if explicit:
                raise
            # pod-ish env vars without a resolvable coordinator (e.g. a
            # single tunneled chip sets TPU_WORKER_HOSTNAMES=localhost):
            # stay single-process rather than failing the caller
            logger.info('jax.distributed autodetect declined (%s); '
                        'staying single-process', e)
        else:
            logger.info('jax.distributed initialized: process %d/%d',
                        jax.process_index(), jax.process_count())
    return jax.process_index(), jax.process_count()


def _pod_env_present():
    """True when TPU-pod autodetection env is plausibly present. A lone
    TPU_WORKER_HOSTNAMES with a single host (tunneled single chips set
    'localhost') is NOT a pod."""
    import os
    if os.environ.get('MEGASCALE_COORDINATOR_ADDRESS'):
        return True
    hosts = os.environ.get('TPU_WORKER_HOSTNAMES', '')
    return os.environ.get('CLOUD_TPU_TASK_ID') is not None \
        and len(hosts.split(',')) > 1


def make_global_mesh(mesh_shape=None, axis_names=('dp', 'tp'),
                     devices=None):
    """A ``(dp, tp)`` mesh over the GLOBAL device set, DCN-aware.

    Single process: equivalent to :func:`rri_nmf_tpu.parallel.make_mesh`
    (contiguous reshape). Multi-process: ``dp`` spans processes (slices)
    and ``tp`` stays within a process, so the n-proportional W-phase psum
    rides ICI and only the (k, d/tp) T-phase numerator crosses DCN (see
    module docstring). ``mesh_shape`` defaults to
    ``(n_processes * per_host // tp, tp)`` with ``tp`` = all devices of
    one process — pass an explicit shape to override.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    n_proc = jax.process_count()
    per_host = n // max(n_proc, 1)
    if mesh_shape is None:
        mesh_shape = (n_proc, per_host) if n_proc > 1 else (
            (n // 2, 2) if n % 2 == 0 and n > 1 else (n, 1))
    if n_proc > 1:
        from jax.experimental import mesh_utils
        dp, tp = mesh_shape
        # hybrid mesh: per-slice (ICI) shape x DCN shape. tp never spans
        # DCN; dp splits into (per-slice dp) x (n_proc over DCN).
        if dp % n_proc != 0:
            raise ValueError('dp=%d must be a multiple of the process '
                             'count %d' % (dp, n_proc))
        try:
            dev_array = mesh_utils.create_hybrid_device_mesh(
                (dp // n_proc, tp), (n_proc, 1), devices=devices)
        except ValueError:
            # Fabrics whose devices carry no slice metadata (multi-process
            # CPU fleets report every device as slice 0; some non-pod
            # fabrics omit `slice_index` entirely) fail the hybrid
            # builder's slice-count check. The layout goal only needs
            # process locality: sort process-major so each process's
            # devices fill dp//n_proc consecutive dp rows and tp stays
            # within a process. Validated by the 2-process gloo tests
            # (tests/test_multiprocess.py).
            devs = sorted(devices,
                          key=lambda dv: (dv.process_index, dv.id))
            dev_array = np.array(devs).reshape(mesh_shape)
            row_procs = np.vectorize(
                lambda dv: dv.process_index)(dev_array)
            if not (row_procs == row_procs[:, :1]).all():
                raise ValueError(
                    'cannot lay out mesh_shape=%r with tp inside a '
                    'process: processes own unequal device counts'
                    % (mesh_shape,))
        return Mesh(dev_array.reshape(mesh_shape), axis_names)
    return Mesh(np.asarray(devices[:mesh_shape[0] * mesh_shape[1]])
                .reshape(mesh_shape), axis_names)


def process_row_block(n, mesh):
    """The global ``[start, stop)`` row range of X this process must
    load, under the canonical row-over-``dp`` layout.

    Derived from the dp coordinates this process's devices actually own
    (clamped ceil-chunks, jax's uneven-axis convention) — not an even
    split over the process count: with dp > process_count or n not
    divisible, a naive ``p·ceil(n/r)`` split disagrees with the device
    shards that :func:`distribute_dense`'s
    ``make_array_from_process_local_data`` expects (and its unclamped
    start could even exceed ``n``)."""
    dp_size = mesh.devices.shape[0]
    per = -(-n // dp_size)
    pidx = jax.process_index()
    mine = [i for i in range(dp_size)
            if any(d.process_index == pidx
                   for d in np.atleast_1d(mesh.devices[i]).ravel())]
    if not mine:
        return 0, 0
    lo = min(min(i * per, n) for i in mine)
    hi = max(min((i + 1) * per, n) for i in mine)
    return lo, hi


def distribute_dense(X_local, global_shape, mesh, spec=None):
    """Assemble the global sharded X from this process's row block.

    ``X_local`` is the block returned by loading
    :func:`process_row_block`'s range; every process calls this with its
    own block and receives the same global ``jax.Array`` handle. Single
    process: identical to ``jax.device_put(X_local, sharding)``.
    """
    dp, tp = mesh.axis_names
    sharding = NamedSharding(mesh, P(dp, tp) if spec is None else spec)
    X_local = np.asarray(X_local)
    if jax.process_count() == 1:
        assert X_local.shape == tuple(global_shape)
        return jax.device_put(X_local, sharding)
    return jax.make_array_from_process_local_data(
        sharding, X_local, tuple(global_shape))


def distribute_factors(W_local, T, n, mesh):
    """Place warm-start factors: W rows from per-process blocks (same
    split as :func:`process_row_block`), T replicated (every process
    passes the full T)."""
    dp, _ = mesh.axis_names
    s_W = NamedSharding(mesh, P(dp, None))
    s_T = NamedSharding(mesh, P())
    W_local = np.asarray(W_local)
    if jax.process_count() == 1:
        W_dev = jax.device_put(W_local, s_W)
    else:
        W_dev = jax.make_array_from_process_local_data(
            s_W, W_local, (n, W_local.shape[1]))
    return W_dev, jax.device_put(np.asarray(T), s_T)
