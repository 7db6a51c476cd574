"""Jitted sweep kernels: XLA (lax.fori_loop) and fused Pallas variants."""

from rri_nmf_tpu.ops.sweep_xla import SweepConfig, make_sweep, make_objective

__all__ = ['SweepConfig', 'make_sweep', 'make_objective']
