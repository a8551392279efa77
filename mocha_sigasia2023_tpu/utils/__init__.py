"""Config, seeding, logging, and misc utilities."""

from .config import (get_config, ensure_dirs, set_seed, get_model_list,
                     enable_compilation_cache, describe_params)
