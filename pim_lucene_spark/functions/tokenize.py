"""Tokenizers (vectorized over pandas Series; no per-row Python loops).

``whitespace``: split on runs of whitespace, drop empties, no lowercasing
— the semantics of the reference tests' ``MockTokenizer.WHITESPACE, false``
(``TestPimIndexSearcher.java:863-869``, ``TestPimPhraseQuery.java:98-109``).
Positions are 0-based token ordinals.

``code``: a code-aware variant for the large-scale benchmark path —
identifiers/numbers plus single punctuation tokens, mirroring what a
source-code corpus needs (the reference benchmark uses Lucene's
``StandardAnalyzer`` on Wikipedia, ``IndexRAMDPU.java:90``; fixtures pin
whitespace semantics, so ``code`` is opt-in).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

_CODE_TOKEN_RE = re.compile(r"[A-Za-z_][A-Za-z_0-9]*|\d+|[^\sA-Za-z_0-9]")


def tokenize_series(texts: pd.Series, tokenizer: str = "whitespace") -> pd.Series:
    """Series[str] → Series[list[str]]."""
    if tokenizer == "whitespace":
        return texts.fillna("").str.split()
    if tokenizer == "code":
        return texts.fillna("").str.findall(_CODE_TOKEN_RE)
    raise ValueError(f"unknown tokenizer {tokenizer!r}")


def tokenize_one(text: str, tokenizer: str = "whitespace") -> list[str]:
    """Single-string tokenize with identical semantics (driver-side queries)."""
    if tokenizer == "whitespace":
        return (text or "").split()
    if tokenizer == "code":
        return _CODE_TOKEN_RE.findall(text or "")
    raise ValueError(f"unknown tokenizer {tokenizer!r}")


def explode_tokens(doc_ids: np.ndarray, token_lists: pd.Series):
    """Flatten per-doc token lists to parallel arrays.

    Returns ``(doc_idx_per_token, terms, positions)`` where positions are
    0-based ordinals within each doc — the token stream consumed by the
    posting-list builder (reference analyze step, B2).
    """
    lens = token_lists.str.len().fillna(0).astype(np.int64).to_numpy()
    total = int(lens.sum())
    doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    starts = np.repeat(np.cumsum(lens) - lens, lens)
    positions = np.arange(total, dtype=np.int64) - starts
    if total:
        terms = np.concatenate([np.asarray(t, dtype=object) for t in token_lists if len(t)])
    else:
        terms = np.empty(0, dtype=object)
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    return doc_ids[doc_idx], terms, positions
