"""Round 4: compile-probe the int16 quantized sweep at the TRUE shape.

The quantized path's correctness depends on XLA FUSING the int16->f32
operand upcast into the two X GEMMs (ops/quantized.py): a materialized
f32 copy of the 100k x 50k X would be 20 GB against 16 GB HBM. This
probe AOT-compiles (never runs) the fused dense phase sweep, the HER
multi-step (sweep + blockwise residual objective), and the NNDSVD init
program on QuantizedX at the full north-star shape and reports the
compiler's memory analysis. Argument/output bytes ~ the int16 code
(10 GB) + factors; temp bytes must stay well under HBM.

Writes benchmarks/results_round4_quant_compile.json.
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp


def mem(compiled):
    m = compiled.memory_analysis()
    return {k: getattr(m, k) / 2**30 for k in
            ('argument_size_in_bytes', 'output_size_in_bytes',
             'temp_size_in_bytes', 'generated_code_size_in_bytes')
            if hasattr(m, k)}


def main():
    from rri_nmf_tpu.initialization import _nndsvd_device_jit
    from rri_nmf_tpu.ops.accel import make_her_multi, make_residual_obj
    from rri_nmf_tpu.ops.dense_pallas import make_dense_phase_sweep_pallas
    from rri_nmf_tpu.ops.quantized import QuantizedX
    from rri_nmf_tpu.ops.sweep_xla import SweepConfig

    n, d, k = 100_000, 50_000, 256
    qx = QuantizedX(
        jax.ShapeDtypeStruct((n, d), jnp.int16),
        jax.ShapeDtypeStruct((d,), jnp.float32))
    Wt = jax.ShapeDtypeStruct((n, k), jnp.float32)
    Tt = jax.ShapeDtypeStruct((k, d), jnp.float32)
    keyt = jax.ShapeDtypeStruct((2,), jnp.uint32)
    rlt = jax.ShapeDtypeStruct((), jnp.int32)
    f32s = jax.ShapeDtypeStruct((), jnp.float32)

    cfg = SweepConfig(k=k, reset_topic_method=None, update_order='phase',
                      matmul_precision='float32', inner_reps=4)
    out = {'shape': [n, d, k], 'programs': {}}

    sweep = make_dense_phase_sweep_pallas(cfg)
    c = sweep.lower(qx, Wt, Tt, keyt, rlt, keyt).compile()
    out['programs']['phase_sweep'] = mem(c)
    print('phase_sweep', out['programs']['phase_sweep'], flush=True)

    obj = make_residual_obj(cfg)
    c = jax.jit(obj).lower(qx, Wt, Tt).compile()
    out['programs']['residual_obj'] = mem(c)
    print('residual_obj', out['programs']['residual_obj'], flush=True)

    multi = make_her_multi(sweep, obj, 20)
    c = multi.lower(qx, Wt, Tt, Wt, Tt, Wt, Tt, f32s, f32s, f32s, keyt,
                    rlt, keyt).compile()
    out['programs']['her_multi20'] = mem(c)
    print('her_multi20', out['programs']['her_multi20'], flush=True)

    init = _nndsvd_device_jit(k, 1e-6)
    c = init.lower(qx, keyt).compile()
    out['programs']['nndsvd_init'] = mem(c)
    print('nndsvd_init', out['programs']['nndsvd_init'], flush=True)

    p = Path(__file__).parent / 'results_round4_quant_compile.json'
    p.write_text(json.dumps(out, indent=1))
    print('wrote', p, flush=True)


if __name__ == '__main__':
    main()
