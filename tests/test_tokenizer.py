"""BPE tokenizer tests: python/native agreement, CLIP framing semantics."""

import gzip
import os

import numpy as np
import pytest

from pcdiff.tokenizer import SimpleTokenizer, bytes_to_unicode, load_native_bpe


@pytest.fixture(scope="module")
def merges_file(tmp_path_factory):
    """A tiny synthetic merges file exercising multi-step merges."""
    path = tmp_path_factory.mktemp("bpe") / "merges.txt"
    merges = [
        ("h", "e"), ("l", "l"), ("he", "ll"), ("hell", "o</w>"),
        ("w", "o"), ("r", "l"), ("wo", "rl"), ("worl", "d</w>"),
        ("o", "</w>"), ("a", "b"), ("ab", "c</w>"),
    ]
    with open(path, "w") as f:
        f.write("#version: synthetic\n")
        for a, b in merges:
            f.write(f"{a} {b}\n")
    return str(path)


def test_bytes_to_unicode_reversible():
    m = bytes_to_unicode()
    assert len(m) == 256
    assert len(set(m.values())) == 256


def test_tokenize_roundtrip(merges_file):
    tok = SimpleTokenizer(merges_file, use_native=False)
    ids = tok.encode("hello world")
    assert tok.decode(ids).strip() == "hello world"


def test_python_native_agreement(merges_file):
    tok_py = SimpleTokenizer(merges_file, use_native=False)
    tok_nat = SimpleTokenizer(merges_file, use_native=True)
    if tok_nat._native is None:
        pytest.skip("native library not built")
    texts = ["hello world", "Hello, WORLD!", "abc abcabc xyz",
             "the quick brown fox", "héllo wörld", "a", ""]
    for t in texts:
        assert tok_py.encode(t) == tok_nat.encode(t), t


def test_native_bpe_merge_loop_parity(merges_file):
    tok_py = SimpleTokenizer(merges_file, use_native=False)
    native = tok_py._native or load_native_bpe(
        list(tok_py.bpe_ranks.keys())
    )
    if native is None:
        pytest.skip("native library not built")
    for token in ["hello", "world", "abcabc", "zzz", "h"]:
        assert native(token) == tok_py._bpe_python(token), token


def test_context_framing(merges_file):
    tok = SimpleTokenizer(merges_file, use_native=False)
    out = tok(["hello world", "abc"], context_length=10)
    assert out.shape == (2, 10)
    assert (out[:, 0] == tok.sot).all()
    row = list(out[0])
    assert tok.eot in row
    # padding after EOT is zeros
    eot_pos = row.index(tok.eot)
    assert all(v == 0 for v in row[eot_pos + 1:])


def test_truncation(merges_file):
    tok = SimpleTokenizer(merges_file, use_native=False)
    long_text = "hello " * 50
    out = tok(long_text, context_length=8, truncate=True)
    assert out.shape == (1, 8)
    assert out[0, -1] == tok.eot
    with pytest.raises(RuntimeError):
        tok(long_text, context_length=8, truncate=False)
