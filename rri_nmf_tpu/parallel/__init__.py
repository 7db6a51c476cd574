"""GSPMD multi-chip distribution for the RRI/WRRI sweeps."""

from rri_nmf_tpu.parallel.mesh import (
    make_mesh, shard_problem, make_sharded_training_step,
)
from rri_nmf_tpu.parallel.sparse_mesh import (
    ShardedCOO, partition_coo, make_sharded_sparse_sweep,
    make_sharded_sparse_objective,
)
from rri_nmf_tpu.parallel.multihost import (
    initialize_distributed, make_global_mesh, process_row_block,
    distribute_dense, distribute_factors, distribute_masked_coo,
    distribute_sparse_coo,
)

__all__ = ['make_mesh', 'shard_problem', 'make_sharded_training_step',
           'ShardedCOO', 'partition_coo', 'make_sharded_sparse_sweep',
           'make_sharded_sparse_objective',
           'initialize_distributed', 'make_global_mesh',
           'process_row_block', 'distribute_dense', 'distribute_factors',
           'distribute_masked_coo', 'distribute_sparse_coo']
