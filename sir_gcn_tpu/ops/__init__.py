from . import message_passing, pool, segment
from .message_passing import (
    copy_src_aggregate,
    get_backend,
    get_edge_dtype,
    set_backend,
    set_edge_dtype,
    sir_aggregate,
    sir_aggregate_concat,
)
from .pool import avg_pool, get_pool, sum_pool
