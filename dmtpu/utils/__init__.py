"""Utilities: config, logging, checkpointing, images, misc."""
from dmtpu.utils.config import (
    Config,
    instantiate_from_config,
    load_config,
    merge_dotlist,
    resolve_target,
)
from dmtpu.utils.misc import (
    AverageMeter,
    amortize,
    check_freq,
    create_exp_dir,
    find_resume_checkpoint,
    get_data_generator,
    get_time_str,
    image_float_to_uint8,
    image_norm_to_float,
    image_norm_to_uint8,
)

__all__ = [
    "Config", "load_config", "merge_dotlist", "instantiate_from_config", "resolve_target",
    "check_freq", "get_time_str", "amortize", "get_data_generator",
    "find_resume_checkpoint", "AverageMeter", "create_exp_dir",
    "image_float_to_uint8", "image_norm_to_float", "image_norm_to_uint8",
]
