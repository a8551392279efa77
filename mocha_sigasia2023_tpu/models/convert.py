"""Reference (PyTorch) checkpoint -> JAX param-pytree converters.

Because our params keep the torch tensor layout (see layers.py), conversion
is a pure key remap — no transposes.  Handles the reference's checkpoint
dict {'gen','gen_ema','gen_opt'} (trainer.py:218-220), DataParallel
'module.' prefixes, and the raw CVAE state_dict (train_CVAE.py:283-285).

torch is only imported inside :func:`load_torch_file`; converted
checkpoints are plain array pytrees and everything else in the framework is
torch-free.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    # copy: .numpy() ALIASES the torch storage, and jnp.asarray on the CPU
    # backend can be zero-copy on top of that — converted params would then
    # silently mutate whenever the live torch module trains in-place
    return np.array(t.detach().cpu().numpy())


def strip_module_prefix(state_dict: Dict) -> Dict:
    return {
        (k[len("module."):] if k.startswith("module.") else k): v
        for k, v in state_dict.items()
    }


class _Tracker(dict):
    """Records which state_dict keys a converter reads, so conversion can
    assert that NO reference key is silently dropped (a renamed key in a
    future reference checkpoint would otherwise vanish without error)."""

    def __init__(self, d):
        super().__init__(d)
        self.consumed = set()

    def __getitem__(self, k):
        self.consumed.add(k)
        return super().__getitem__(k)

    def leftovers(self):
        return sorted(set(self.keys()) - self.consumed)


def _check_consumed(tracker: _Tracker, what: str, strict: bool,
                    ignore=()):
    import re

    left = [k for k in tracker.leftovers()
            if not any(re.search(p, k) for p in ignore)]
    if left and strict:
        raise ValueError(
            f"{what} conversion dropped {len(left)} state_dict key(s): "
            f"{left[:8]}{' ...' if len(left) > 8 else ''} — reference "
            f"schema drifted? Pass strict=False to ignore.")


# Non-trainable reference buffers we recompute from the graph config
# instead of loading: hop-distance adjacency stacks (net/graph.py:280-323,
# registered as A_j/A_b) and the fixed joint<->bodypart pooling matrices
# (net/graph.py:461,339-447).  Value-identity with our recomputed constants
# is asserted by tests/test_models.py's graph tests.
_GENERATOR_BUFFER_KEYS = (
    r"(^|\.)A_[jb]$",
    r"^mot_embedding\.3\.weight$",   # PoolJointToBodypart buffer
    r"^to_mot\.3\.weight$",          # UnpoolBodypartToJoint buffer
)

# Deterministic sincos positional-encoding buffers (model_CVAE.py
# PositionalEncoding) — recomputed by models/cvae.py.
_CVAE_BUFFER_KEYS = (r"(^|\.)pos_encoder\.pe$",)


def load_torch_file(path: str):
    """Load a .pt file; returns the raw object (requires torch)."""
    import torch  # local import: conversion-only dependency

    return torch.load(path, map_location="cpu", weights_only=False)


# ---------------------------------------------------------------------------
# Generator
# ---------------------------------------------------------------------------


def _stgcn_from_torch(sd: Dict, prefix: str) -> Dict:
    return {
        "gcn": {
            "weight": _np(sd[f"{prefix}.blk.gcn.conv.weight"]),
            "bias": _np(sd[f"{prefix}.blk.gcn.conv.bias"]),
        },
        "tcn": {
            "weight": _np(sd[f"{prefix}.blk.tcn.weight"]),
            "bias": _np(sd[f"{prefix}.blk.tcn.bias"]),
        },
    }


def _attention_from_torch(sd: Dict, prefix: str) -> Dict:
    p = {
        "to_q": {"weight": _np(sd[f"{prefix}.to_q.1.weight"])},
        "to_k": {"weight": _np(sd[f"{prefix}.to_k.1.weight"])},
        "to_v": {"weight": _np(sd[f"{prefix}.to_v.weight"])},
    }
    if f"{prefix}.to_out.0.weight" in sd:
        p["to_out"] = {
            "weight": _np(sd[f"{prefix}.to_out.0.weight"]),
            "bias": _np(sd[f"{prefix}.to_out.0.bias"]),
        }
    return p


def _ff_from_torch(sd: Dict, prefix: str) -> Dict:
    return {
        "w1": {"weight": _np(sd[f"{prefix}.net.0.weight"]),
               "bias": _np(sd[f"{prefix}.net.0.bias"])},
        "w2": {"weight": _np(sd[f"{prefix}.net.3.weight"]),
               "bias": _np(sd[f"{prefix}.net.3.bias"])},
    }


def _transformer_from_torch(sd: Dict, prefix: str, depth: int,
                            adain_on: bool) -> Dict:
    layers = []
    for i in range(depth):
        layer = {
            "attn": _attention_from_torch(sd, f"{prefix}.layers.{i}.1"),
            "ff": _ff_from_torch(sd, f"{prefix}.layers.{i}.2"),
        }
        if adain_on:
            layer["adain"] = {
                "fc1": {"weight": _np(sd[f"{prefix}.layers.{i}.0.style.2.weight"]),
                        "bias": _np(sd[f"{prefix}.layers.{i}.0.style.2.bias"])},
                "fc2": {"weight": _np(sd[f"{prefix}.layers.{i}.0.style.4.weight"]),
                        "bias": _np(sd[f"{prefix}.layers.{i}.0.style.4.bias"])},
            }
        layers.append(layer)
    return {"layers": layers}


def generator_from_torch(state_dict: Dict, encoder_depth: int = 2,
                         decoder_depth: int = 2, strict: bool = True) -> Dict:
    """Reference Generator state_dict (model.py:15-106) -> our pytree.
    ``strict`` errors if any checkpoint key goes unconsumed."""
    sd = _Tracker(strip_module_prefix(state_dict))
    params = {
        "pos_emb": _np(sd["pos_emb"]),
        "embed": {
            "conv_in": {"weight": _np(sd["mot_embedding.1.weight"]),
                        "bias": _np(sd["mot_embedding.1.bias"])},
            "joint": _stgcn_from_torch(sd, "mot_embedding.2"),
            "body": _stgcn_from_torch(sd, "mot_embedding.5"),
        },
        "encoder": _transformer_from_torch(sd, "encoder", encoder_depth, False),
        "decoder": _transformer_from_torch(sd, "decoder", decoder_depth, True),
        "head": {
            "body": _stgcn_from_torch(sd, "to_mot.1"),
            "joint": _stgcn_from_torch(sd, "to_mot.4"),
            "conv_out": {"weight": _np(sd["to_mot.6.weight"]),
                         "bias": _np(sd["to_mot.6.bias"])},
        },
    }
    _check_consumed(sd, "Generator", strict, ignore=_GENERATOR_BUFFER_KEYS)
    return params


# ---------------------------------------------------------------------------
# CVAE
# ---------------------------------------------------------------------------


def _mha_from_torch(sd: Dict, prefix: str) -> Dict:
    return {
        "in_proj_weight": _np(sd[f"{prefix}.in_proj_weight"]),
        "in_proj_bias": _np(sd[f"{prefix}.in_proj_bias"]),
        "out_proj": {"weight": _np(sd[f"{prefix}.out_proj.weight"]),
                     "bias": _np(sd[f"{prefix}.out_proj.bias"])},
    }


def _lin(sd, prefix):
    return {"weight": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}


def _enc_layer_from_torch(sd: Dict, prefix: str) -> Dict:
    return {
        "self_attn": _mha_from_torch(sd, f"{prefix}.self_attn"),
        "linear1": _lin(sd, f"{prefix}.linear1"),
        "linear2": _lin(sd, f"{prefix}.linear2"),
        "norm1": _lin(sd, f"{prefix}.norm1"),
        "norm2": _lin(sd, f"{prefix}.norm2"),
    }


def _dec_layer_from_torch(sd: Dict, prefix: str) -> Dict:
    return {
        "self_attn": _mha_from_torch(sd, f"{prefix}.self_attn"),
        "multihead_attn": _mha_from_torch(sd, f"{prefix}.multihead_attn"),
        "linear1": _lin(sd, f"{prefix}.linear1"),
        "linear2": _lin(sd, f"{prefix}.linear2"),
        "norm1": _lin(sd, f"{prefix}.norm1"),
        "norm2": _lin(sd, f"{prefix}.norm2"),
        "norm3": _lin(sd, f"{prefix}.norm3"),
    }


def cvae_from_torch(state_dict: Dict, depth: int = 2,
                    strict: bool = True) -> Dict:
    """Reference CVAE state_dict (model_CVAE.py) -> our pytree.
    ``strict`` errors if any checkpoint key goes unconsumed."""
    sd = _Tracker(strip_module_prefix(state_dict))
    params = {
        "prior": {
            "mu_token": _np(sd["prior_net.mu_token"]),
            "logvar_token": _np(sd["prior_net.logvar_token"]),
            "layers": [
                _enc_layer_from_torch(sd, f"prior_net.encoder.layers.{i}")
                for i in range(depth)
            ],
        },
        "posterior": {
            "mu_token": _np(sd["encoder.mu_token"]),
            "logvar_token": _np(sd["encoder.logvar_token"]),
            "layers": [
                _enc_layer_from_torch(sd, f"encoder.encoder.layers.{i}")
                for i in range(depth)
            ],
        },
        "decoder": {
            "layers": [
                _dec_layer_from_torch(sd, f"decoder.decoder.layers.{i}")
                for i in range(depth)
            ],
        },
    }
    _check_consumed(sd, "CVAE", strict, ignore=_CVAE_BUFFER_KEYS)
    return params


def projector_from_torch(state_dict: Dict, strict: bool = True) -> Dict:
    """Reference Projector state_dict (model.py:198-249) -> our pytree."""
    sd = _Tracker(strip_module_prefix(state_dict))
    params = {"fc1": _lin(sd, "mlp.0"), "fc2": _lin(sd, "mlp.2")}
    _check_consumed(sd, "Projector", strict)
    return params


def load_reference_generator_checkpoint(path: str, use_ema: bool = True,
                                        encoder_depth=2, decoder_depth=2):
    """Load the reference trainer's {'gen','gen_ema','gen_opt'} checkpoint
    (trainer.py:210-222) and convert the requested branch."""
    ckpt = load_torch_file(path)
    sd = ckpt["gen_ema" if use_ema else "gen"]
    return generator_from_torch(sd, encoder_depth, decoder_depth)
