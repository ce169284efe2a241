"""Multi-chip parallelism (the reference's DDP role, TPU-native).

The reference scales by PyTorch-Lightning DDP over NCCL: each rank samples
its own rays, gradients all-reduce after backward, occupancy grids stay
per-rank (SURVEY.md §2c). Here the same data-parallel strategy is expressed
the JAX way: one ``shard_map`` over a 1-D device mesh — rays sharded, params
replicated, gradients ``pmean`` over ICI inside the step (XLA overlaps the
collective with backward), and the occupancy-grid update made *collective*
(cell evaluations sharded across chips, results all-gathered) which the
reference never does.
"""

from instant_nsr_pl_tpu.parallel.data_parallel import (  # noqa: F401
    DataParallelPlan,
    make_mesh,
)
