"""Pallas TPU kernels for the hot compute paths."""

from .flash_attention import (
    attention_backend,
    fused_attention,
    set_attention_backend,
)

__all__ = ["fused_attention", "set_attention_backend", "attention_backend"]
