from . import message_passing, pool, segment
from .ell import FastGraph, build_fast_graph
from .message_passing import (
    allow_large_edge_aggregate,
    copy_src_aggregate,
    get_edge_dtype,
    get_remat,
    set_edge_dtype,
    set_remat,
    sir_aggregate,
    sir_aggregate_concat,
)
from .pool import avg_pool, get_pool, sum_pool
