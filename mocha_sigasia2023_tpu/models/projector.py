"""Patch-sampling projection head for PatchNCE (model.py:198-249).

Mode 'all' (the one training uses, trainer.py:24) treats each of the 90
tokens as a patch; a random permutation selects ``num_patches`` of them
(all when -1) and an MLP projects to ``prj_dim``.  Patch selection takes an
explicit index array or a JAX PRNG key instead of global numpy state.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .layers import init_linear, linear
from ..ops.numerics import safe_sqrt


class ProjectorConfig(NamedTuple):
    mode: str = "all"
    num_patches: int = -1
    encoder_dim: int = 256
    prj_dim: int = 1024
    nframes: int = 60
    temporal_patch_size: int = 4
    nbody: int = 6
    hidden: int = 1024

    @property
    def m_dim(self) -> int:
        num_temp = self.nframes // self.temporal_patch_size
        return {
            "spatial": num_temp,
            "temp": self.nbody,
            "all": 1,
            "style": 2,
            "no_patches": num_temp * self.nbody,
        }[self.mode]


def init_projector(key, cfg: ProjectorConfig, dtype=jnp.float32) -> Dict:
    k1, k2 = jax.random.split(key)
    return {
        "fc1": init_linear(k1, cfg.m_dim * cfg.encoder_dim, cfg.hidden, dtype=dtype),
        "fc2": init_linear(k2, cfg.hidden, cfg.prj_dim, dtype=dtype),
    }


def sample_patches(cfg: ProjectorConfig, feat: jnp.ndarray,
                   patch_id: Optional[jnp.ndarray] = None,
                   key: Optional[jax.Array] = None
                   ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Group tokens into patches and select a subset (model.py:231-245)."""
    b, s, c = feat.shape
    if cfg.mode in ("spatial", "temp", "all"):
        feat = feat.reshape(b, -1, cfg.m_dim * c)
        n = feat.shape[1]
        if patch_id is None:
            if key is None:
                patch_id = jnp.arange(n)
            else:
                patch_id = jax.random.permutation(key, n)
            if cfg.num_patches != -1:
                patch_id = patch_id[: min(cfg.num_patches, n)]
        return feat[:, patch_id, :].reshape(-1, cfg.m_dim * c), patch_id
    if cfg.mode == "style":
        n = feat.shape[1]
        mean = feat.mean(axis=1)
        var = feat.var(axis=1) * (n / max(n - 1, 1))
        # safe_sqrt: a dead feature channel (var == 0 exactly) must not
        # emit inf grads through the NCE path (ops/numerics.py)
        return jnp.concatenate([safe_sqrt(var), mean], axis=1), None
    return feat.reshape(b, cfg.m_dim * c), None


def apply_projector(params: Dict, cfg: ProjectorConfig, feat: jnp.ndarray,
                    patch_id: Optional[jnp.ndarray] = None,
                    key: Optional[jax.Array] = None):
    sampled, patch_id = sample_patches(cfg, feat, patch_id, key)
    h = jax.nn.relu(linear(params["fc1"], sampled))
    return linear(params["fc2"], h), patch_id
