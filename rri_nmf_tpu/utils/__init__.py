"""Utilities: profiling/tracing hooks and runtime debug validation."""

from rri_nmf_tpu.utils.profiling import trace, TraceAnnotation, SweepTimer
from rri_nmf_tpu.utils.debug import validate_factors

__all__ = ['trace', 'TraceAnnotation', 'SweepTimer', 'validate_factors']
