"""CLIP-compatible byte-pair-encoding tokenizer.

The reference depends on the OpenAI ``clip`` package's tokenizer
(``clip.tokenize``, used at ``/root/reference/models/pretrained_clip.py:44,173``).
This is an independent implementation of the same scheme: GPT-2
bytes-to-unicode mapping, the CLIP word regex, lowercase + whitespace
normalization, BPE merges with ``</w>`` end-of-word markers, and
``<|startoftext|>`` / ``<|endoftext|>`` framing to a fixed context length.

The BPE merge loop — the hot path when batch-tokenizing prompts — runs in
the native library ``native/libbpe_tokenizer.so`` (built with
``make -C native``) when present; a pure-Python implementation provides
identical behavior otherwise.

Vocabulary: pass the standard CLIP merges file
(``bpe_simple_vocab_16e6.txt[.gz]``). The derived vocab ordering matches the
OpenAI tokenizer so ids line up with published CLIP checkpoints.
"""

from __future__ import annotations

import ctypes
import functools
import gzip
import html
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

__all__ = ["SimpleTokenizer", "bytes_to_unicode", "load_native_bpe"]

_NATIVE_LIB = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native", "libbpe_tokenizer.so",
)


@functools.lru_cache()
def bytes_to_unicode() -> Dict[int, str]:
    """GPT-2's reversible byte -> printable-unicode mapping."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\xa1"), ord("\xac") + 1))
        + list(range(ord("\xae"), ord("\xff") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def _get_pairs(word: Tuple[str, ...]):
    return {(word[i], word[i + 1]) for i in range(len(word) - 1)}


class _NativeBPE:
    """ctypes wrapper over native/libbpe_tokenizer.so."""

    def __init__(self, lib_path: str, merges: Sequence[Tuple[str, str]]):
        self.lib = ctypes.CDLL(lib_path)
        self.lib.bpe_create.restype = ctypes.c_void_p
        self.lib.bpe_create.argtypes = [ctypes.c_char_p]
        self.lib.bpe_apply.restype = ctypes.c_int
        self.lib.bpe_apply.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int
        ]
        self.lib.bpe_free.argtypes = [ctypes.c_void_p]
        text = "\n".join(f"{a} {b}" for a, b in merges)
        self.handle = self.lib.bpe_create(text.encode("utf-8"))
        self._buf = ctypes.create_string_buffer(1 << 16)

    def __call__(self, token: str) -> str:
        n = self.lib.bpe_apply(
            self.handle, token.encode("utf-8"), self._buf, len(self._buf)
        )
        if n < 0:
            raise ValueError("bpe output buffer overflow")
        return self._buf.raw[:n].decode("utf-8")

    def __del__(self):
        try:
            self.lib.bpe_free(self.handle)
        except Exception:
            pass


def load_native_bpe(merges: Sequence[Tuple[str, str]]) -> Optional[_NativeBPE]:
    if os.path.exists(_NATIVE_LIB):
        try:
            return _NativeBPE(_NATIVE_LIB, merges)
        except OSError:
            return None
    return None


class SimpleTokenizer:
    """CLIP BPE tokenizer (native merge loop when available)."""

    def __init__(self, bpe_path: str, use_native: bool = True):
        import regex

        byte_encoder = bytes_to_unicode()
        self.byte_encoder = byte_encoder

        opener = gzip.open if bpe_path.endswith(".gz") else open
        with opener(bpe_path, "rt", encoding="utf-8") as f:
            lines = f.read().split("\n")
        # the standard CLIP merges file: header line, then ranked merges;
        # OpenAI uses rows 1..48894+1
        merges = [tuple(m.split()) for m in lines[1 : 49152 - 256 - 2 + 1] if m]
        self.bpe_ranks = {m: i for i, m in enumerate(merges)}

        vocab = list(byte_encoder.values())
        vocab += [v + "</w>" for v in vocab]
        vocab += ["".join(m) for m in merges]
        vocab += ["<|startoftext|>", "<|endoftext|>"]
        self.encoder = {tok: i for i, tok in enumerate(vocab)}
        self.decoder = {i: tok for tok, i in self.encoder.items()}
        self.sot = self.encoder["<|startoftext|>"]
        self.eot = self.encoder["<|endoftext|>"]

        self._pat = regex.compile(
            r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|"
            r"[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+",
            regex.IGNORECASE,
        )
        self._native = load_native_bpe(merges) if use_native else None
        self._cache: Dict[str, str] = {
            "<|startoftext|>": "<|startoftext|>",
            "<|endoftext|>": "<|endoftext|>",
        }

    # ---------------------------------------------------------------- bpe

    def _bpe_python(self, token: str) -> str:
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = _get_pairs(word)
        if not pairs:
            return token + "</w>"
        while True:
            bigram = min(
                pairs, key=lambda p: self.bpe_ranks.get(p, float("inf"))
            )
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word: List[str] = []
            i = 0
            while i < len(word):
                if (
                    i + 1 < len(word)
                    and word[i] == first
                    and word[i + 1] == second
                ):
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = _get_pairs(word)
        return " ".join(word)

    def bpe(self, token: str) -> str:
        if token in self._cache:
            return self._cache[token]
        out = (
            self._native(token) if self._native is not None
            else self._bpe_python(token)
        )
        self._cache[token] = out
        return out

    # ------------------------------------------------------------- encoding

    def _clean(self, text: str) -> str:
        text = html.unescape(html.unescape(text))
        return " ".join(text.strip().split()).lower()

    def encode(self, text: str) -> List[int]:
        ids: List[int] = []
        for token in self._pat.findall(self._clean(text)):
            token = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
            ids.extend(self.encoder[t] for t in self.bpe(token).split(" "))
        return ids

    def decode(self, ids: Sequence[int]) -> str:
        text = "".join(self.decoder[i] for i in ids)
        byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        return bytearray(
            byte_decoder[c] for c in text
        ).decode("utf-8", errors="replace").replace("</w>", " ")

    def __call__(
        self, texts, context_length: int = 77, truncate: bool = True
    ) -> np.ndarray:
        """Tokenize a batch of prompts -> int32 [N, context_length]."""
        if isinstance(texts, str):
            texts = [texts]
        out = np.zeros((len(texts), context_length), dtype=np.int32)
        for i, text in enumerate(texts):
            ids = [self.sot] + self.encode(text) + [self.eot]
            if len(ids) > context_length:
                if not truncate:
                    raise RuntimeError(
                        f"input is too long for context length {context_length}"
                    )
                ids = ids[:context_length]
                ids[-1] = self.eot
            out[i, : len(ids)] = ids
        return out
