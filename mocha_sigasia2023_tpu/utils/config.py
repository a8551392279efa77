"""YAML config loading, seeding, checkpoint discovery.

API parity: /root/reference/etc/utils.py (get_config:23-25, set_seed:12-21,
ensure_dirs:39-49, get_model_list:67-77), minus the torch/cudnn knobs —
determinism in JAX comes from explicit PRNG keys, so set_seed only seeds the
host-side RNGs used for shuffling/patch sampling.
"""

from __future__ import annotations

import os
import random
from typing import Dict, Optional

import numpy as np
import yaml


def get_config(path: str) -> Dict:
    with open(path, "r") as f:
        return yaml.load(f, Loader=yaml.FullLoader)


def ensure_dir(path: str) -> None:
    os.makedirs(path, exist_ok=True)


def ensure_dirs(paths) -> None:
    if isinstance(paths, (list, tuple)):
        for p in paths:
            ensure_dir(p)
    else:
        ensure_dir(paths)


def set_seed(seed: int = 1777) -> None:
    random.seed(seed)
    np.random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)


def get_model_list(dirname: str, key: str) -> Optional[str]:
    """Latest checkpoint file containing ``key`` (lexicographic max)."""
    if not os.path.isdir(dirname):
        return None
    files = [
        os.path.join(dirname, f)
        for f in os.listdir(dirname)
        if os.path.isfile(os.path.join(dirname, f)) and key in f
        and (f.endswith(".pt") or f.endswith(".msgpack") or f.endswith(".ckpt"))
    ]
    return max(files) if files else None


def print_composite(data, beg: str = "") -> None:
    """Recursive shape printer for nested dict/list/array structures."""
    if isinstance(data, dict):
        print(f"{beg} dict, size = {len(data)}")
        for k, v in data.items():
            print(f"  {beg}{k}:")
            print_composite(v, beg + "    ")
    elif isinstance(data, (list, tuple)):
        print(f"{beg} list, len = {len(data)}")
        for i, item in enumerate(data):
            print(f"  {beg}item {i}")
            print_composite(item, beg + "    ")
    elif hasattr(data, "shape"):
        print(f"{beg} array of size {tuple(data.shape)}")
    else:
        print(f"{beg} {data}")


def enable_compilation_cache(path: str = None) -> None:
    """Turn on JAX's persistent compilation cache (big win here: remote TPU
    compiles are minutes; CLI invocations re-trace identical programs)."""
    import jax

    path = path or os.environ.get(
        "MOCHA_COMPILATION_CACHE", os.path.expanduser("~/.cache/mocha_jax"))
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def describe_params(tree, title: str = "Generator") -> str:
    """Human-readable network description: every parameter leaf with its
    path, shape, and size, plus the total count.

    Artifact parity: the reference dumps ``print(trainer.gen)`` (the torch
    module repr) to ``info/info-network`` at train start
    (/root/reference/train.py:58-60); this is the pytree equivalent.
    """
    import jax

    lines = [title]
    total = 0
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        shape = tuple(getattr(leaf, "shape", ()))
        n = int(np.prod(shape)) if shape else 1
        total += n
        lines.append(f"  {jax.tree_util.keystr(path)}: "
                     f"{shape} [{n:,}]")
    lines.append(f"total parameters: {total:,}")
    return "\n".join(lines)
