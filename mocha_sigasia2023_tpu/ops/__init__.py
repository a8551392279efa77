"""Pallas TPU kernels for the hot compute paths."""

from .attention import fused_attention, set_fused_attention, fused_attention_enabled
from .numerics import safe_sqrt, safe_unit_denom, safe_clip_by_global_norm
