from .kernels import (
    bucket_bcast_act_reduce,
    bucket_bcast_act_reduce2,
    bucket_bcast_act_reduce_bwd,
    bucket_geq_reduce,
    bucket_scaled_reduce,
    bucket_src_bwd,
    bucket_src_bwd_fused,
    pallas_available,
)
