from .mesh import make_mesh
from .data_parallel import stack_device_batches, make_dp_train_step
from .full_graph import shard_full_graph
from .multihost import initialize_multihost, make_global_mesh
from .ell_distributed import (
    ShardedFastGraph,
    build_sharded_fast_graph,
    make_sharded_sir_aggregate,
)
from .halo import (
    HaloFastGraph,
    build_halo_fast_graph,
    make_halo_counts,
    make_halo_sir_aggregate,
)
