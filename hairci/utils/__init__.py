from hairci.utils.config import (
    build_pretrain_parser,
    merge_config_with_args,
    parse_pretrain_args,
)
from hairci.utils.jit_cache import enable_compilation_cache
from hairci.utils.platform import apply_platform_env
from hairci.utils.seeding import set_seed
from hairci.utils.metrics import MetricLogger, SmoothedValue, label_smoothing_cross_entropy
from hairci.utils import profiling
