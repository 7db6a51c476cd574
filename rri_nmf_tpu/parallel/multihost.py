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


def process_row_block(n, mesh, tile=None):
    """The global ``[start, stop)`` row range of X this process must
    load, under the canonical row-over-``dp`` layout.

    Derived from the dp coordinates this process's devices actually own
    (clamped ceil-chunks, jax's uneven-axis convention) — not an even
    split over the process count: with dp > process_count or n not
    divisible, a naive ``p·ceil(n/r)`` split disagrees with the device
    shards that :func:`distribute_dense`'s
    ``make_array_from_process_local_data`` expects (and its unclamped
    start could even exceed ``n``).

    ``tile`` rounds the per-device row quantum up to a multiple (the MXU
    chunk-plan layout blocks rows by TILE-rounded quanta —
    ``partition_mxu`` / ``distribute_sparse_coo(backend='mxu')``); leave
    ``None`` for the dense / COO layouts."""
    dp_size = mesh.devices.shape[0]
    per = -(-n // dp_size)
    if tile:
        per = -(-per // int(tile)) * int(tile)
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


def _allgather_np(value):
    """Host-scalar allgather across the process group (identity in a
    single-process run). Returns a (process_count, ...) numpy array."""
    value = np.asarray(value)
    if jax.process_count() == 1:
        return value[None]
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(value))


def _owned_dp_rows(mesh):
    """This process's dp mesh rows, validated contiguous and fully owned
    (tp never spans processes — the :func:`make_global_mesh` layout).
    Returns ``(dp_first, dp_count)``."""
    pidx = jax.process_index()
    dp_size = mesh.devices.shape[0]
    mine = []
    for i in range(dp_size):
        procs = {d.process_index
                 for d in np.atleast_1d(mesh.devices[i]).ravel()}
        if pidx in procs:
            if procs != {pidx}:
                raise ValueError(
                    'mesh dp row %d spans processes %r; row-partitioned '
                    'plans need tp within a process '
                    '(parallel.make_global_mesh)' % (i, sorted(procs)))
            mine.append(i)
    if not mine:
        return 0, 0
    if mine != list(range(mine[0], mine[-1] + 1)):
        raise ValueError('this process owns non-contiguous dp rows %r; '
                         'use a process-major device layout '
                         '(parallel.make_global_mesh)' % (mine,))
    return mine[0], len(mine)


def distribute_sparse_coo(X_local, global_shape, mesh, dtype=None,
                          backend=None, C=128, group=8,
                          with_obj_coo=True):
    """Assemble a mesh-global sparse-X plan from per-process row slabs —
    the multi-controller form of
    :func:`~rri_nmf_tpu.parallel.sparse_mesh.partition_coo` /
    :func:`~rri_nmf_tpu.parallel.sparse_mesh.partition_mxu` for UNMASKED
    sparse corpora (the BASELINE #5 topic-modeling scale axis: X's
    sparse form fits the pod, its dense form fits no chip — the
    reference densifies all sparse input, reference
    ``sklearn_interface.py:78-83``, and has no distributed runtime,
    SURVEY.md §2.2).

    ``X_local`` (scipy-sparse or dense) holds THIS process's rows:
    ``process_row_block(n, mesh)``'s range for ``backend=None``, or
    ``process_row_block(n, mesh, tile=128)``'s for ``backend='mxu'``
    (the MXU layout blocks rows by 128-rounded quanta). Every process
    calls this with its own slab and receives the same global plan
    handle, ready to pass DIRECTLY as ``nmf()``'s ``X`` with explicit
    ``W_in``/``T_in`` (place them with :func:`distribute_factors`; the
    sharded sparse sweep re-pads and re-shards internally).

    ``backend=None`` returns the BCOO-contraction plan
    (:class:`~rri_nmf_tpu.parallel.sparse_mesh.ShardedCOO`);
    ``'mxu'`` returns the one-hot MXU chunk plan
    (:class:`~rri_nmf_tpu.parallel.sparse_mesh.ShardedMXUPlan`, the TPU
    fast path) — with ``with_obj_coo=True`` (default) the COO blocks
    ride along as ``plan.obj_coo`` so ``compute_obj_each_iter`` /
    early stopping work (the objective's cross term wants the plain
    coordinate list; pass ``False`` to save the extra O(nnz) device
    bytes on pure production fits). ``obj_coo`` hangs off the Python
    handle only — it does not survive a pytree round-trip.

    Cross-process coordination is a handful of host allgathers of
    scalars (padding width, nnz, chunk-group counts); the nonzeros
    themselves never move between hosts. Unlike the masked plans, a
    column (tp) mesh axis IS supported: each process owns whole dp rows
    and partitions its slab over its own tp columns locally.
    """
    import scipy.sparse as sps

    from rri_nmf_tpu.parallel.sparse_mesh import (ShardedCOO,
        _coo_block_arrays, _mxu_put, _pad_stack_mxu)

    n, d = (int(s) for s in global_shape)
    dp_size, tp_size = mesh.devices.shape
    dp_ax, tp_ax = mesh.axis_names
    if backend not in (None, 'mxu'):
        raise ValueError("backend must be None or 'mxu', got %r"
                         % (backend,))
    mxu = backend == 'mxu'
    if mxu:
        from rri_nmf_tpu.ops.sparse_mxu import TILE, _plan_direction_np
        n_loc = -(-(-(-n // dp_size)) // TILE) * TILE
        d_loc = -(-(-(-d // tp_size)) // TILE) * TILE
        tile = TILE
    else:
        n_loc = -(-n // dp_size)
        d_loc = -(-d // tp_size)
        tile = None

    dp_first, dp_count = _owned_dp_rows(mesh)
    lo, hi = process_row_block(n, mesh, tile=tile)
    n_sl = int(np.shape(X_local)[0])
    if n_sl != hi - lo:
        raise ValueError(
            'X_local has %d rows but this process owns rows [%d, %d) of '
            'the global (%d, %d) problem (process_row_block(n, mesh%s))'
            % (n_sl, lo, hi, n, d, ', tile=128' if mxu else ''))
    if int(np.shape(X_local)[1]) != d:
        raise ValueError('X_local has %d columns, global problem has %d'
                         % (np.shape(X_local)[1], d))

    if not sps.issparse(X_local):
        X_local = sps.csr_matrix(np.asarray(X_local))
    coo = X_local.tocsr().tocoo()   # canonical: sorted, duplicates summed
    if dtype is None:
        dtype = coo.data.dtype if np.issubdtype(
            coo.data.dtype, np.floating) else np.float64
    dtype = np.dtype(dtype)

    r_g = coo.row.astype(np.int64) + lo
    c_g = coo.col.astype(np.int64)
    v = coo.data.astype(dtype, copy=False)

    nblocks = max(dp_count, 1) * tp_size
    blk = (r_g // n_loc - dp_first) * tp_size + c_g // d_loc
    order = np.argsort(blk, kind='stable')
    counts = np.bincount(blk[order], minlength=nblocks)
    starts = np.concatenate([[0], np.cumsum(counts)])
    r_s, c_s, v_s = r_g[order], c_g[order], v[order]

    def _glob(local, trailing):
        s3 = NamedSharding(mesh, P(dp_ax, tp_ax,
                                   *([None] * len(trailing))))
        if jax.process_count() == 1:
            return jax.device_put(local, s3)
        return jax.make_array_from_process_local_data(
            s3, local, (dp_size, tp_size) + tuple(trailing))

    obj_coo = None
    if not mxu or with_obj_coo:
        m = int(_allgather_np(np.int64(
            counts.max() if counts.size else 0)).max())
        m = max(m, 1)
        data, rows, cols = _coo_block_arrays(
            starts, r_s, c_s, v_s, n_loc, d_loc, nblocks, m, dtype)
        g_loc = (max(dp_count, 1), tp_size, m)
        obj_coo = ShardedCOO(
            _glob(data.reshape(g_loc), (m,)),
            _glob(rows.reshape(g_loc), (m,)),
            _glob(cols.reshape(g_loc), (m,)),
            shape=(n, d), n_loc=n_loc, d_loc=d_loc)
    if not mxu:
        return obj_coo

    from rri_nmf_tpu.parallel.sparse_mesh import ShardedMXUPlan

    n_gt, n_ct = n_loc // TILE, d_loc // TILE
    plans_t, plans_w = [], []
    for b in range(nblocks):
        blo, bhi = starts[b], starts[b + 1]
        r = (r_s[blo:bhi] % n_loc).astype(np.int64)
        c = (c_s[blo:bhi] % d_loc).astype(np.int64)
        bv = v_s[blo:bhi]
        plans_t.append(_plan_direction_np(r, c, bv, n_gt, n_ct, C,
                                          group, dtype))
        plans_w.append(_plan_direction_np(c, r, bv, n_ct, n_gt, C,
                                          group, dtype))

    def _stack_dir(plans):
        ng_loc = max(p[4].shape[0] for p in plans)
        ng_to = int(_allgather_np(np.int64(ng_loc)).max())
        return _pad_stack_mxu(plans, group, C,
                              (max(dp_count, 1), tp_size), ng_to=ng_to)

    def _put(a, sh):
        if jax.process_count() == 1:
            return jax.device_put(a, sh)
        return jax.make_array_from_process_local_data(
            sh, a, (dp_size, tp_size) + tuple(a.shape[2:]))

    st = _stack_dir(plans_t)
    sw = _stack_dir(plans_w)
    plan = ShardedMXUPlan(
        *(_mxu_put(a, mesh, put=_put) for a in st + sw),
        shape=(n, d), n_loc=n_loc, d_loc=d_loc, group=group)
    plan.obj_coo = obj_coo
    return plan


def distribute_masked_coo(X_local, W_mat_local, global_shape, mesh,
                          dtype=None, backend=None, group=8):
    """Assemble a mesh-global masked (WRRI) observation plan from
    per-process row slabs — the multi-controller form of
    :func:`~rri_nmf_tpu.parallel.masked_sparse_mesh.partition_masked_coo`
    / :func:`~rri_nmf_tpu.parallel.masked_gram_mesh.partition_masked_gram`
    (round-5 VERDICT item 6: BASELINE #5-class observed sets must never
    be materialized on one host).

    ``X_local`` (dense or scipy-sparse) and scipy-sparse ``W_mat_local``
    hold THIS process's rows (:func:`process_row_block`'s range for
    ``mesh``, which must be (dp, 1)). Every process calls this with its
    own slab and receives the same global plan handle, ready to pass
    DIRECTLY as ``nmf()``'s ``X`` (with ``W_mat=None`` and explicit
    ``W_in``/``T_in`` placed by :func:`distribute_factors`).

    ``backend=None`` returns the interleaved O(nnz) plan
    (:class:`~rri_nmf_tpu.parallel.masked_sparse_mesh.ShardedMaskedCOO`,
    reference update order); ``'segsum'`` / ``'mxu'`` return the
    Gram-phase plan
    (:class:`~rri_nmf_tpu.parallel.masked_gram_mesh.ShardedMaskedGramPlan`,
    ``update_order='phase'``) with XLA segment-sum contractions or the
    per-device MXU chunk plans (the TPU record path — each process
    builds plans for its own devices; one allgathered group count per
    direction makes every device's kernel sequence identical).

    Cross-process coordination is a handful of host allgathers of
    scalars (padding width, nnz, Σmx², chunk-group counts) — the
    observation data itself never moves between hosts.
    """
    import scipy.sparse as sp

    from rri_nmf_tpu.ops.sweep_masked_sparse import (_PAD_TO,
        masked_coo_host_arrays)
    from rri_nmf_tpu.parallel.masked_sparse_mesh import (
        ShardedMaskedCOO, _host_row_blocks)

    n, d = (int(s) for s in global_shape)
    dp_size, tp_size = mesh.devices.shape
    if tp_size != 1:
        raise ValueError('masked mesh plans are row-partitioned; use an '
                         '(n_devices, 1) mesh')
    dp_ax = mesh.axis_names[0]
    n_loc = -(-n // dp_size)
    lo, hi = process_row_block(n, mesh)
    n_sl = int(np.shape(X_local)[0])
    if n_sl != hi - lo:
        raise ValueError(
            'X_local has %d rows but this process owns rows [%d, %d) of '
            'the global (%d, %d) problem (process_row_block)'
            % (n_sl, lo, hi, n, d))
    if not sp.issparse(W_mat_local):
        raise ValueError('W_mat_local must be scipy-sparse (the mask IS '
                         'the observed set)')
    if dtype is None:
        xdt = (X_local.dtype if hasattr(X_local, 'dtype')
               else np.asarray(X_local).dtype)
        dtype = xdt if np.issubdtype(xdt, np.floating) else np.float64
    dtype = np.dtype(dtype)

    rows_sl, cols_sl, x_sl, m_sl, (_n_sl, d_sl), nnz_sl = \
        masked_coo_host_arrays(X_local, W_mat_local, dtype)
    assert d_sl == d, (d_sl, d)
    rows_g = rows_sl[:nnz_sl].astype(np.int64) + lo
    cols = cols_sl[:nnz_sl]
    x = x_sl[:nnz_sl]
    m = m_sl[:nnz_sl]

    dp_first = lo // n_loc
    dp_count = -(-(hi - lo) // n_loc) if hi > lo else 0

    # one global padding width: every device block shares mmax
    local_max = int(np.bincount(rows_g // n_loc - dp_first,
                                minlength=max(dp_count, 1)).max()) \
        if nnz_sl else 0
    mmax = int(_allgather_np(np.int64(local_max)).max())
    mmax = max(mmax, 1)
    mmax += (-mmax) % _PAD_TO
    nnz_glob = int(_allgather_np(np.int64(nnz_sl)).sum())

    r_b, c_b, x_b, m_b = _host_row_blocks(
        rows_g, cols, x, m, n_loc, dp_first, dp_count, d, mmax, dtype)

    s = NamedSharding(mesh, P(dp_ax, None))

    def _glob(local):
        if jax.process_count() == 1:
            return jax.device_put(local, s)
        return jax.make_array_from_process_local_data(
            s, local, (dp_size, mmax))

    coo = ShardedMaskedCOO(
        _glob(r_b), _glob(c_b), _glob(x_b), _glob(m_b),
        shape=(n, d), n_loc=n_loc, nnz=nnz_glob)
    if backend is None:
        return coo
    if backend not in ('segsum', 'mxu'):
        raise ValueError("backend must be None, 'segsum' or 'mxu', "
                         'got %r' % (backend,))

    import jax.numpy as jnp

    from rri_nmf_tpu.parallel.masked_gram_mesh import ShardedMaskedGramPlan

    smx2 = float(_allgather_np(
        np.float64(m).dot(np.float64(x) ** 2)).sum())
    sum_mx2 = jax.device_put(
        jnp.asarray(smx2, dtype=jnp.promote_types(dtype, jnp.float32)),
        NamedSharding(mesh, P()))
    if backend == 'segsum':
        return ShardedMaskedGramPlan(
            coo=coo, m_t=None, m_w=None, mx_t_vals=None, mx_w_vals=None,
            sum_mx2=sum_mx2, shape=(n, d), n_loc=n_loc, nnz=nnz_glob,
            group=group, backend='segsum')

    # 'mxu': per-local-device chunk plans, padded to an ALLGATHERED
    # global group count per direction so every device's shard_map body
    # is the identical pallas_call sequence; the segment arrays are
    # assembled from process-local slabs like the COO blocks
    from rri_nmf_tpu.ops.sparse_mxu import _plan_direction_np
    from rri_nmf_tpu.ops.sweep_masked_gram import TILE
    from rri_nmf_tpu.parallel.masked_gram_mesh import _stack_segments

    n_rt_loc = -(-n_loc // TILE)
    n_ct = -(-d // TILE)
    mxv = (m * x).astype(dtype, copy=False)
    mv = m.astype(dtype, copy=False)
    rloc = (rows_g % n_loc).astype(np.int64)
    blk = rows_g // n_loc - dp_first
    counts = (np.bincount(blk, minlength=max(dp_count, 1))
              if rows_g.size else np.zeros(max(dp_count, 1), np.int64))
    starts = np.concatenate([[0], np.cumsum(counts)])

    def _per_dev(vals_src, g_rows, g_cols, ngt, nst):
        return [_plan_direction_np(
            g_rows[starts[b]:starts[b + 1]],
            g_cols[starts[b]:starts[b + 1]],
            vals_src[starts[b]:starts[b + 1]],
            ngt, nst, TILE, group, dtype)
            for b in range(dp_count)]

    def _put(local):
        s2 = NamedSharding(mesh, P(dp_ax, None))
        if jax.process_count() == 1:
            return jax.device_put(local, s2)
        glob_shape = (dp_size,) + tuple(local.shape[1:])
        return jax.make_array_from_process_local_data(
            s2, local, glob_shape)

    def _dir(g_rows, g_cols, ngt, nst):
        plans_m = _per_dev(mv, g_rows, g_cols, ngt, nst)
        plans_mx = _per_dev(mxv, g_rows, g_cols, ngt, nst)
        local_max = max((a[4].shape[0] for a in plans_m), default=0)
        ng_to = int(_allgather_np(np.int64(local_max)).max())
        seg_m = _stack_segments(plans_m, group, TILE, nst, mesh, dtype,
                                ngroups_to=ng_to, put=_put)
        seg_mx = _stack_segments(plans_mx, group, TILE, nst, mesh,
                                 dtype, ngroups_to=ng_to, put=_put)
        return seg_m, tuple(p.vals for p in seg_mx)

    m_t, mx_t_vals = _dir(rloc, cols, n_rt_loc, n_ct)
    m_w, mx_w_vals = _dir(cols, rloc, n_ct, n_rt_loc)
    return ShardedMaskedGramPlan(
        coo=coo, m_t=m_t, m_w=m_w, mx_t_vals=mx_t_vals,
        mx_w_vals=mx_w_vals, sum_mx2=sum_mx2, shape=(n, d),
        n_loc=n_loc, nnz=nnz_glob, group=group, backend='mxu')
