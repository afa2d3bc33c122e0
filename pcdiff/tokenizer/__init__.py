"""CLIP-compatible BPE tokenization (native C++ merge loop + Python fallback)."""

from .bpe import SimpleTokenizer, bytes_to_unicode, load_native_bpe

__all__ = ["SimpleTokenizer", "bytes_to_unicode", "load_native_bpe"]
