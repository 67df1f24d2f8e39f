from .kernels import (
    bucket_bcast_act_reduce,
    bucket_bcast_act_reduce_bwd,
    bucket_scaled_reduce,
    pallas_available,
)
