"""GSPMD multi-chip distribution for the RRI/WRRI sweeps."""

from rri_nmf_tpu.parallel.mesh import (
    make_mesh, shard_problem, make_sharded_training_step,
)

__all__ = ['make_mesh', 'shard_problem', 'make_sharded_training_step']
