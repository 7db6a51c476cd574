"""Checkpoint / resume tests (new subsystem per SURVEY.md §5.4; the
reference has in-memory warm start only)."""

import numpy as np

from rri_nmf_tpu.nmf import nmf


def _problem(n=25, d=18, k=3, seed=0):
    rng = np.random.RandomState(seed)
    return np.abs(rng.rand(n, k) @ rng.rand(k, d) + 0.01 * rng.rand(n, d))


def test_checkpoint_roundtrip(tmp_path):
    from rri_nmf_tpu.checkpoint import NMFCheckpointer, NMFState
    import jax
    ckpt = NMFCheckpointer(tmp_path / 'ck', keep=2)
    state = NMFState(W=np.ones((4, 2)), T=np.full((2, 3), 0.5),
                     iteration=7, obj_history=[3.0, 2.0, 1.5],
                     key=jax.random.PRNGKey(42), resets_left=11,
                     random_state=42)
    ckpt.save(7, state, wait=True)
    assert ckpt.latest_step() == 7
    back = ckpt.restore()
    assert back.iteration == 7
    assert back.resets_left == 11
    assert back.random_state == 42
    assert np.allclose(back.W, state.W)
    assert np.allclose(back.T, state.T)
    assert np.allclose(back.obj_history, [3.0, 2.0, 1.5])
    ckpt.close()


def test_nmf_resume_equals_straight_run(tmp_path):
    """A run checkpointed at iter 4 and resumed must finish with the same
    factors as an uninterrupted run (the file-based analog of the
    stepped ≡ batch contract, tests/test_nmf.py:97-110)."""
    X = _problem()
    kw = dict(k=3, max_iter=8, random_state=0, early_stop=False,
              compute_obj_each_iter=True, reset_topic_method=None,
              eps_stop=0.0)

    straight = nmf(X, **kw)

    ck_dir = str(tmp_path / 'run')
    # phase 1: run 4 iterations, checkpointing every 2
    nmf(X, max_iter=4, checkpoint=ck_dir, checkpoint_every=2,
        **{k: v for k, v in kw.items() if k != 'max_iter'})
    # phase 2: resume from the checkpoint and complete to 8
    resumed = nmf(X, checkpoint=ck_dir, checkpoint_every=100, **kw)

    assert np.allclose(resumed['W'], straight['W'], atol=1e-12)
    assert np.allclose(resumed['T'], straight['T'], atol=1e-12)
    assert np.allclose(resumed['obj_history'], straight['obj_history'],
                       atol=1e-10)


def test_grouped_checkpoint_marks_untracked_objective(tmp_path, caplog):
    """Grouped-dispatch checkpoints carry obj_tracked=False; resuming one
    with objective-based stopping warns instead of silently trusting an
    empty history (VERDICT r1 weak #3)."""
    import logging
    from rri_nmf_tpu.checkpoint import NMFCheckpointer

    X = _problem()
    ck_dir = str(tmp_path / 'grp')
    # grouped run (no objective tracking possible)
    nmf(X, 3, max_iter=4, random_state=0, sweeps_per_dispatch=2,
        reset_topic_method=None, checkpoint=ck_dir, checkpoint_every=2)
    state = NMFCheckpointer(ck_dir).restore()
    assert state.obj_tracked is False
    assert state.obj_history == []

    with caplog.at_level(logging.WARNING, logger='rri_nmf_tpu.nmf'):
        resumed = nmf(X, 3, max_iter=6, random_state=0,
                      compute_obj_each_iter=True, reset_topic_method=None,
                      checkpoint=ck_dir, checkpoint_every=100)
    assert any('without objective tracking' in r.message
               for r in caplog.records)
    # history only covers the resumed iterations
    assert len(resumed['obj_history']) == 2

    # per-iteration checkpoints with tracking record obj_tracked=True
    ck2 = str(tmp_path / 'tracked')
    nmf(X, 3, max_iter=2, random_state=0, compute_obj_each_iter=True,
        reset_topic_method=None, checkpoint=ck2, checkpoint_every=1)
    st2 = NMFCheckpointer(ck2).restore()
    assert st2.obj_tracked is True
    assert len(st2.obj_history) == 2
