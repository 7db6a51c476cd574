"""Beyond-f32-HBM dense fits: mixed storage + checkpointing.

The capacity recipe for the BASELINE #4 class (100k x 50k, k=256 — a
20 GB f32 matrix that does not fit one chip's HBM):

- ``x_dtype='bfloat16'`` stores X at half residency while the factors,
  accumulators, and Gauss-Seidel topic loops stay full float32
  (measured speed-parity with f32 at HBM-fitting sizes and with the
  all-bf16 mode at the true shape — see
  benchmarks/results_round3_mixed_x.json and ROADMAP #2's close-out);
- ``update_order='phase'`` + the fused GS kernels give the ~2 ms/sweep
  headline path;
- ``checkpoint=`` makes long fits resumable (orbax; sharded-native on a
  mesh).

Run: python examples/large_dense.py  (sized down so CPU works too;
raise N/D on a real chip.)
"""

import sys
import tempfile
from pathlib import Path

import os

if os.environ.get('RRI_NMF_EXAMPLE_CPU'):
    # the tunnel-hosted TPU pays ~ms dispatch latency per op; small
    # eager demos crawl there. Set RRI_NMF_EXAMPLE_CPU=1 to force the
    # host CPU backend (must happen before the library initializes jax).
    import jax
    jax.config.update('jax_platforms', 'cpu')

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from rri_nmf_tpu.nmf import nmf

N, D, K = 2048, 1024, 32        # 100000, 50000, 256 on a real chip


def main():
    rng = np.random.RandomState(0)
    X = rng.rand(N, K) @ rng.rand(K, D)   # exactly rank-K, well-posed

    ck = tempfile.mkdtemp(prefix='rri_nmf_large_')
    soln = nmf(
        X, K,
        dtype='float32', x_dtype='bfloat16',   # mixed storage
        update_order='phase', reset_topic_method=None,
        max_iter=60, random_state=0,
        checkpoint=ck, checkpoint_every=20,
        compute_obj_each_iter=True)

    rel = (np.linalg.norm(X - soln['W'] @ soln['T'])
           / np.linalg.norm(X))
    print('factors: W %s %s, T %s %s' %
          (soln['W'].shape, soln['W'].dtype,
           soln['T'].shape, soln['T'].dtype))
    print('rel Frobenius error after %d sweeps: %.3e'
          % (len(soln['obj_history']), rel))
    print('objective %.4f -> %.4f (monotone: %s)'
          % (soln['obj_history'][0], soln['obj_history'][-1],
             bool(np.all(np.diff(soln['obj_history']) <= 1e-6))))
    print('checkpoints in %s — rerunning the same call resumes' % ck)


if __name__ == '__main__':
    main()
