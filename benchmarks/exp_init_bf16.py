"""Round 4: isolate the TRUE/half-shape bf16-X stall to its cause (TPU).

``results_round4_northstar_full.json`` + ``results_round4_quant_floor.json``
establish: (i) the bf16-X TPU runs stall ~36x above the bf16 noise floor
while the identically-seeded f32-X control converges to 1e-4, and
(ii) exact f64 RRI on bf16-QUANTIZED data converges to 0.98x the noise
floor -- the stall is an implementation artifact, not quantized-data
landscape.

Remaining suspects, separated here at the half shape (50k x 25k k=256)
with sweeps ALWAYS on the bf16-stored X:

  A. init_f32:    NNDSVD computed on the f32 upcast of the same X
                  (exact arithmetic w.r.t. the quantized values)
  B. init_bf16:   NNDSVD computed on the bf16 X itself -- the mode the
                  stalled runs used (Gram/eigh arithmetic sees bf16)
  C. smart_random: no NNDSVD at all

If A/C converge to the ~2e-3 bf16 floor where B stalls at 4e-2, the
culprit is the init-on-bf16 path (Gram accumulation / NNDSVD section
split at bf16 precision killing tail topics), and the fix is to upcast
X blockwise inside ``initialize_nmf`` -- storage stays bf16.

NNDSVD on CPU cannot run on bf16 at all (LAPACK eigh has no bf16
kernel), which is why this probe is TPU-only.

Writes benchmarks/results_round4_init_bf16.json.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from exp_northstar_floor import make_problem, run


def topic_stats(W0, T0):
    wn = np.linalg.norm(np.asarray(W0, np.float64), axis=0)
    tn = np.linalg.norm(np.asarray(T0, np.float64), axis=1)
    return {
        'dead_topics': int(np.sum((wn == 0) | (tn == 0))),
        'both_dead': int(np.sum((wn == 0) & (tn == 0))),
        'near_dead_1e-6': int(np.sum((wn < 1e-6 * wn.max())
                                     | (tn < 1e-6 * tn.max()))),
        'w_col_norm_min_max': [float(wn.min()), float(wn.max())],
        't_row_norm_min_max': [float(tn.min()), float(tn.max())],
    }


def main():
    from rri_nmf_tpu.initialization import initialize_nmf

    n, d, k = 50_000, 25_000, 256
    # bf16-stored problem, identical to the stalled half_bf16_plain run
    X, W0b, T0b, xnorm = make_problem(n, d, k, jnp.bfloat16, seed=7)

    @jax.jit
    def upcast(X):
        return X.astype(jnp.float32)

    inits = {}
    Xf = upcast(X)
    with jax.default_matmul_precision('float32'):
        inits['init_f32'] = initialize_nmf(Xf, k, 'nndsvd', random_state=0,
                                           svd_backend='jax')
    del Xf
    inits['init_bf16'] = (W0b, T0b)
    with jax.default_matmul_precision('float32'):
        inits['smart_random'] = initialize_nmf(X, k, 'smart_random',
                                               random_state=0,
                                               svd_backend='jax')

    p = Path(__file__).parent / 'results_round4_init_bf16.json'
    out = {'shape': [n, d, k], 'x_dtype': 'bfloat16', 'seed': 7,
           'note': __doc__.split('\n\n')[2], 'runs': []}
    for label, (W0, T0) in inits.items():
        st = topic_stats(W0, T0)
        print(label, st, flush=True)
        W0 = jnp.asarray(W0, jnp.float32)
        T0 = jnp.asarray(T0, jnp.float32)
        r = run(X, W0, T0, xnorm, k, her=False, label=label,
                max_sweeps=4000)
        r['init_topic_stats'] = st
        out['runs'].append(r)
        p.write_text(json.dumps(out, indent=1))
    print('wrote', p, flush=True)


if __name__ == '__main__':
    main()
