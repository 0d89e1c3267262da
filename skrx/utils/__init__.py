from .generic import OrderedDefaultDict, pad_sequences, md5sum, slugify
from .decorator import typeassert, timer
from .config import (Config, ModelConfig, merge_config_with_cmd_args,
                     merge_config_with_ini, parse_value)
from .logger import Logger
from .registry import ModelRegistry
from .common import normalize_adj_matrix, sp_mat_to_edges, build_ui_adjacency
from .random import randint_choice, batch_randint_choice, set_host_seed

__all__ = [
    "OrderedDefaultDict", "pad_sequences", "md5sum", "slugify",
    "typeassert", "timer",
    "Config", "ModelConfig", "merge_config_with_cmd_args",
    "merge_config_with_ini", "parse_value",
    "Logger", "ModelRegistry",
    "normalize_adj_matrix", "sp_mat_to_edges", "build_ui_adjacency",
    "randint_choice", "batch_randint_choice", "set_host_seed",
]
