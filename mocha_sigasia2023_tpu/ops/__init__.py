"""Pallas TPU kernels for the hot compute paths."""

from .attention import fused_attention, set_fused_attention, fused_attention_enabled
