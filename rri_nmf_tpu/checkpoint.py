"""Checkpoint / resume for long (sharded) NMF runs.

The reference has no file checkpointing at all — resume is purely in-memory
via ``W_in``/``T_in`` warm starts and estimator-held factors (reference
``nmf.py:852-859``, ``sklearn_interface.py:104-112,253-261``, and the
``one_iter`` stepping contract pinned by ``tests/test_nmf.py:97-110``).
Those are preserved exactly in :func:`rri_nmf_tpu.nmf.nmf`. This module
adds what SURVEY.md §5.4 specifies for the TPU rebuild: orbax
checkpointing of the full training state — (W, T, iteration, objective
history, PRNG key, reset budget) — so multi-chip runs recover from
preemption by restart-from-checkpoint (SURVEY.md §5.3).

Orbax natively handles sharded ``jax.Array``s: each host writes its own
shards, and on restore arrays are laid out back onto the mesh via the
provided shardings.
"""

import dataclasses
from typing import Any, Optional

import jax
import numpy as np


@dataclasses.dataclass
class NMFState:
    """The complete resumable state of an ``nmf()`` run.

    ``obj_tracked`` records whether the run that WROTE the checkpoint was
    tracking the objective (``compute_obj_each_iter``). Grouped-dispatch
    runs never track it, so their checkpoints carry an empty history by
    construction, not by loss — a resume that wants objective-based
    stopping can then be warned instead of silently trusting an empty
    list.
    """
    W: Any
    T: Any
    iteration: int
    obj_history: list
    key: Any
    resets_left: int
    random_state: int
    obj_tracked: bool = True
    # HER extrapolation state (nmf(accel='her')): dict with keys
    # Wy/Ty (extrapolated factors), beta (momentum), e (last accepted
    # objective), Wb/Tb/eb (best accepted iterate) — present iff the run
    # that wrote the checkpoint was extrapolating, so a resumed HER run
    # continues the momentum sequence AND the best-iterate selection
    # exactly (resume ≡ straight run). Checkpoints written before
    # best-iterate tracking lack Wb/Tb/eb; the driver seeds them from
    # the checkpointed factors on restore.
    her: Optional[dict] = None
    # early-stopping comparison score (the driver's ``last_score``) as of
    # this checkpoint — restoring it keeps resumed ≡ straight for
    # early-stop fits (a fresh np.inf would miss the stop+rollback the
    # straight run performs at the first post-resume score increase)
    es_score: Optional[float] = None

    def tree(self):
        # orbax cannot serialize zero-size arrays: an empty history is
        # padded with one NaN and its true length stored alongside
        oh = np.asarray(self.obj_history, np.float64)
        if oh.size == 0:
            oh = np.asarray([np.nan], np.float64)
        t = {
            'W': self.W,
            'T': self.T,
            'iteration': np.asarray(self.iteration, np.int64),
            'obj_history': oh,
            'obj_history_len': np.asarray(len(self.obj_history), np.int64),
            'key': jax.random.key_data(self.key)
            if hasattr(jax.random, 'key_data') else self.key,
            'resets_left': np.asarray(self.resets_left, np.int32),
            'random_state': np.asarray(self.random_state, np.int64),
            'obj_tracked': np.asarray(self.obj_tracked, np.bool_),
        }
        if self.her is not None:
            # flattened so the sharded-restore abstract tree can give the
            # factor-shaped entries the run's W/T shardings
            for k in sorted(self.her):
                t['her_' + k] = self.her[k]
        if self.es_score is not None:
            t['es_score'] = np.asarray(self.es_score, np.float64)
        return t

    @classmethod
    def from_tree(cls, tree):
        key = tree['key']
        key = jax.numpy.asarray(np.asarray(key, dtype=np.uint32))
        oh = np.asarray(tree['obj_history'])
        oh_len = int(tree.get('obj_history_len', oh.size))
        her = {k[len('her_'):]: v for k, v in tree.items()
               if k.startswith('her_')} or None
        return cls(
            W=tree['W'], T=tree['T'],
            iteration=int(tree['iteration']),
            obj_history=list(oh[:oh_len]),
            key=key,
            resets_left=int(tree['resets_left']),
            random_state=int(tree['random_state']),
            obj_tracked=bool(tree.get('obj_tracked', True)),
            her=her,
            es_score=(float(tree['es_score'])
                      if 'es_score' in tree else None))


class NMFCheckpointer:
    """Orbax-backed checkpoint manager for NMF training state.

    Usage::

        ckpt = NMFCheckpointer('/path/to/ckpts', keep=3)
        ckpt.save(step, state)            # async-capable orbax save
        state = ckpt.restore()            # latest, or restore(step)
        soln = nmf(X, k, W_in=state.W, T_in=state.T, ...)  # warm resume
    """

    def __init__(self, directory, keep=3):
        import orbax.checkpoint as ocp
        self._ocp = ocp
        self.directory = str(directory)
        # declare the handler type up front so a FRESH manager over an
        # existing directory can serve item_metadata() (needed to build
        # the abstract tree for sharded restores)
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=keep,
                                                 create=True),
            item_handlers=ocp.StandardCheckpointHandler())

    def save(self, step: int, state: NMFState, wait: bool = False):
        self.manager.save(step, args=self._ocp.args.StandardSave(
            state.tree()))
        if wait:
            self.manager.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def restore(self, step: Optional[int] = None,
                shardings: Optional[dict] = None) -> Optional[NMFState]:
        """Restore a step (default: latest).

        Pass ``shardings`` (a dict mapping tree keys — usually 'W'/'T' —
        to ``jax.sharding.Sharding``) to restore those entries directly as
        sharded ``jax.Array``s laid out on the mesh: orbax reads each
        device's shards straight from storage, with no host-side
        full-array materialization or resharding stall (the round-trip
        the reference-scale BASELINE #5 factors cannot afford)."""
        if step is None:
            step = self.manager.latest_step()
        if step is None:
            return None
        if shardings:
            meta = self.manager.item_metadata(step)
            tree = getattr(meta, 'tree', meta)
            abstract = {
                key: jax.ShapeDtypeStruct(
                    tuple(m.shape), m.dtype,
                    sharding=shardings.get(key))
                for key, m in dict(tree).items()}
            restored = dict(self.manager.restore(
                step, args=self._ocp.args.StandardRestore(abstract)))
        else:
            restored = dict(self.manager.restore(step))
        return NMFState.from_tree(restored)

    def close(self):
        self.manager.wait_until_finished()
        self.manager.close()
