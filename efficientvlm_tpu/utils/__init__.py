from .logger import MetricLogger, SmoothedValue
from .dist import (
    get_rank,
    get_world_size,
    init_distributed_mode,
    is_main_process,
    setup_for_distributed,
)
