"""Property fuzzing for the two subtle algorithmic claims of round 2:

1. `_sloppy_freqs`' nearest-above/below combo enumeration computes the
   EXACT minimal span per anchor — verified against brute-force
   enumeration of every full assignment (O(Π positions), tiny corpora).
2. The `standard` tokenizer's 2-pass medial-protection regex pipeline
   equals a direct reference implementation (single-pass scanner) on
   randomized punctuation/case/unicode soup.
"""

import itertools
import os

import numpy as np
import pytest

from pim_lucene_spark.functions.tokenize import tokenize_one
from pim_lucene_spark.plans.router import _sloppy_freqs

# --------------------------------------------------------------------------
# 1. sloppy minimal-span exactness
# --------------------------------------------------------------------------


def _brute_sloppy(tokens: list[str], terms: list[str], slop: int):
    """Reference: enumerate EVERY assignment per anchor, exact min span."""
    pos_by_term = {}
    for i, t in enumerate(tokens):
        pos_by_term.setdefault(t, []).append(i)
    if any(t not in pos_by_term for t in terms):
        return 0.0
    anchors = pos_by_term[terms[0]]
    total = 0.0
    for a in anchors:
        best = None
        pools = [[p - i for p in pos_by_term[terms[i]]]
                 for i in range(1, len(terms))]
        for combo in itertools.product(*pools):
            pps = [a, *combo]
            span = max(pps) - min(pps)
            best = span if best is None or span < best else best
        if best is not None and best <= slop:
            total += 1.0 / (1.0 + best)
    return total


def _kernel_sloppy(tokens: list[str], terms: list[str], slop: int):
    vocab = sorted(set(tokens))
    lut = {t: i for i, t in enumerate(vocab)}
    if any(t not in lut for t in terms):
        return 0.0
    codes = np.array([lut[t] for t in tokens], dtype=np.int64)
    doc_idx = np.zeros(len(tokens), dtype=np.int64)
    pos = np.arange(len(tokens), dtype=np.int64)
    tcodes = [lut[t] for t in terms]
    rows, freqs = _sloppy_freqs(doc_idx, codes, pos, tcodes, slop)
    return float(freqs[0]) if rows.size else 0.0


N_SLOPPY = int(os.environ.get("FUZZ_CASES", "300"))


@pytest.mark.parametrize("block", range(6))
def test_sloppy_minimal_span_exact(block):
    rng = np.random.RandomState(500 + block)
    vocab = ["a", "b", "c", "d"]
    per = max(N_SLOPPY // 6, 1)
    for _ in range(per):
        n = rng.randint(2, 14)
        tokens = [vocab[i] for i in rng.randint(0, len(vocab), n)]
        n_terms = rng.randint(2, 4)
        terms = list(rng.choice(vocab, size=n_terms, replace=False))
        slop = int(rng.randint(0, 6))
        exp = _brute_sloppy(tokens, terms, slop)
        got = _kernel_sloppy(tokens, terms, slop)
        assert got == pytest.approx(exp), \
            f"tokens={tokens} terms={terms} slop={slop}"


# --------------------------------------------------------------------------
# 2. standard tokenizer vs reference scanner
# --------------------------------------------------------------------------


def _ref_standard(text: str) -> list[str]:
    """Reference single-pass scanner for the documented semantics:
    tokens are runs of [letter|digit|_]; a single medial '/. between
    letters or ./, between digits joins; everything else splits."""
    text = text.lower()
    out, cur, i = [], [], 0
    n = len(text)

    def is_tok(ch):
        return ch.isalpha() or ch.isdigit() or ch == "_"

    def cat(ch):  # letter-ish vs digit for medial rules
        return "d" if ch.isdigit() else ("l" if ch.isalpha() else "_")

    while i < n:
        ch = text[i]
        if is_tok(ch):
            cur.append(ch)
            i += 1
        elif (ch in "'." or ch == ",") and cur and i + 1 < n \
                and is_tok(text[i + 1]):
            prev, nxt = cur[-1], text[i + 1]
            letters = cat(prev) == "l" and cat(nxt) == "l" and ch in "'."
            digits = cat(prev) == "d" and cat(nxt) == "d" and ch in ".,"
            if letters or digits:
                cur.append(ch)
                i += 1
            else:
                if cur:
                    out.append("".join(cur))
                    cur = []
                i += 1
        else:
            if cur:
                out.append("".join(cur))
                cur = []
            i += 1
    if cur:
        out.append("".join(cur))
    return out


ALPHABET = list("ab1_ .'," ) + ["É", "ü", "日", "!", "-"]


@pytest.mark.parametrize("block", range(6))
def test_standard_tokenizer_vs_reference(block):
    rng = np.random.RandomState(900 + block)
    per = max(N_SLOPPY // 6, 1)
    for _ in range(per):
        n = rng.randint(0, 30)
        s = "".join(ALPHABET[i] for i in rng.randint(0, len(ALPHABET), n))
        assert tokenize_one(s, "standard") == _ref_standard(s), repr(s)
