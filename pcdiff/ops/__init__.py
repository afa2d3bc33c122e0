"""Pallas TPU kernels for the hot compute paths."""

from .flash_attention import (
    attention_backend,
    fused_attention,
    fused_attention_mh,
    set_attention_backend,
)

__all__ = [
    "fused_attention",
    "fused_attention_mh",
    "set_attention_backend",
    "attention_backend",
]
