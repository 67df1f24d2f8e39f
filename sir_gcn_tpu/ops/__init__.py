from . import message_passing, pool, segment
from .message_passing import (
    copy_src_aggregate,
    get_backend,
    set_backend,
    sir_aggregate,
    sir_aggregate_concat,
)
from .pool import avg_pool, get_pool, sum_pool
