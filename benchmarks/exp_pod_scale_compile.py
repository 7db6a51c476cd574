"""BASELINE #5 record: the row-sharded 1M x 100k k=1024 config.

Real 16-chip hardware is not available in this environment (one chip via
a tunnel), so this probe does what can be done honestly at the target
shape: AOT-compile the GSPMD sharded training step (sweep + objective)
over a 16-device (8, 2) dp x tp mesh at the FULL 1,000,000 x 100,000
k=1024 shape and record the compiler's PER-DEVICE memory analysis
(jax reports argument/temp bytes per device for sharded programs). That
pins "runs beyond single-chip HBM" to compiler-verified residency
numbers rather than arithmetic:

- f32 X: 400 GB total -> 25.0 GB/device arguments (v5p HBM is ~95 GB);
- int16 quantized X (x_dtype='int16', ops/quantized.py): 200 GB total
  -> 12.5 GB/device — fits even a v5e-16's 16 GB/chip.

Functional correctness of the same sharded step at small shapes is
pinned by dryrun_multichip (12 surfaces) and the mesh parity tests;
scaling efficiency on real ICI requires hardware this sandbox lacks
(documented in BASELINE.md).

Writes benchmarks/results_round4_pod_scale_compile.json.
"""

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

os.environ['XLA_FLAGS'] = (
    '--xla_force_host_platform_device_count=16 '
    + os.environ.get('XLA_FLAGS', ''))

import jax

jax.config.update('jax_platforms', 'cpu')

import jax.numpy as jnp
import numpy as np


def mem_gib(compiled):
    m = compiled.memory_analysis()
    return {k: getattr(m, k) / 2**30 for k in
            ('argument_size_in_bytes', 'output_size_in_bytes',
             'temp_size_in_bytes')}


def main():
    from jax.sharding import NamedSharding, PartitionSpec as P

    from rri_nmf_tpu.ops.sweep_xla import SweepConfig
    from rri_nmf_tpu.parallel import make_mesh, make_sharded_training_step

    n, d, k = 1_000_000, 100_000, 1024
    mesh = make_mesh(16, mesh_shape=(8, 2))
    dp, tp = mesh.devices.shape
    out = {'shape': [n, d, k], 'mesh': [dp, tp], 'programs': {},
           'note': ('per-device GiB from XLA memory_analysis of the '
                    'GSPMD sharded training step AOT-compiled at the '
                    'full BASELINE #5 shape on a 16-device virtual '
                    'mesh'),
           'bf16_temp_caveat': (
               'the bf16_x temp (~an X-sized f32 tile) is the CPU '
               "backend widening X for the mixed f32xbf16 GEMM - a "
               'virtual-mesh artifact: the TPU backend fuses the '
               'convert into the Mosaic GEMM operand stream (round-3 '
               'real-chip probes; the single-chip 100k x 50k bf16 fit '
               'runs in 16 GB HBM, results_round4_northstar_full.json)')}

    cfg = SweepConfig(k=k, reset_topic_method=None, update_order='phase')
    step = make_sharded_training_step(cfg, mesh, with_objective=True)

    s_X = NamedSharding(mesh, P('dp', 'tp'))
    s_W = NamedSharding(mesh, P('dp', None))
    s_T = NamedSharding(mesh, P(None, 'tp'))
    s_r = NamedSharding(mesh, P())
    Wt = jax.ShapeDtypeStruct((n, k), jnp.float32, sharding=s_W)
    Tt = jax.ShapeDtypeStruct((k, d), jnp.float32, sharding=s_T)
    keyt = jax.ShapeDtypeStruct((2,), jnp.uint32, sharding=s_r)
    rlt = jax.ShapeDtypeStruct((), jnp.int32, sharding=s_r)

    for tag, xt in (
            ('f32_x', jax.ShapeDtypeStruct((n, d), jnp.float32,
                                           sharding=s_X)),
            ('bf16_x', jax.ShapeDtypeStruct((n, d), jnp.bfloat16,
                                            sharding=s_X))):
        c = jax.jit(step).lower(xt, Wt, Tt, keyt, rlt, keyt).compile()
        out['programs'][tag] = mem_gib(c)
        print(tag, out['programs'][tag], flush=True)

    # int16 quantized X rides the shard_map dense-pallas sweep (not this
    # GSPMD step) — per-device residency is pure arithmetic on the code:
    # (n/dp)·(d/tp)·2 bytes + the replicated-(tp) column scale. Its
    # single-chip AOT record at 100k x 50k is
    # results_round4_quant_compile.json; mesh functional coverage is
    # dryrun surface #12 + the quant mesh parity tests.
    out['programs']['int16_x_arithmetic'] = {
        'argument_size_in_bytes':
            ((n // dp) * (d // tp) * 2 + (d // tp) * 4) / 2**30}
    print('int16_x (arithmetic)', out['programs']['int16_x_arithmetic'],
          flush=True)

    p = Path(__file__).parent / 'results_round4_pod_scale_compile.json'
    p.write_text(json.dumps(out, indent=1))
    print('wrote', p, flush=True)


if __name__ == '__main__':
    main()
