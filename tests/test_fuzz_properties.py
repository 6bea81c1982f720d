"""Property fuzzing for the subtle algorithmic claims:

1. The Lucene SloppyPhraseMatcher re-expression: the numpy batch wrapper
   equals the per-doc matcher, and BOTH equal the structurally independent
   DuckDB recursive-CTE state machine (`oracle._sloppy_rec_ctes`) on
   randomized corpora with repeated query terms and repeated doc terms.
2. The `standard` tokenizer's 2-pass medial-protection regex pipeline
   equals a direct reference implementation (single-pass scanner) on
   randomized punctuation/case/unicode soup.
"""

import os

import numpy as np
import pytest

from pim_lucene_spark.functions.sloppy import sloppy_doc_freq, \
    sloppy_freqs_batch
from pim_lucene_spark.functions.tokenize import tokenize_one

# --------------------------------------------------------------------------
# 1. sloppy matcher: batch wrapper == per-doc matcher == DuckDB CTE
# --------------------------------------------------------------------------

N_SLOPPY = int(os.environ.get("FUZZ_CASES", "300"))


def _per_doc_freqs(doc_tokens: list[list[str]], terms: list[str],
                   slop: int) -> dict[int, float]:
    out = {}
    for did, toks in enumerate(doc_tokens):
        pls = [np.array([i for i, x in enumerate(toks) if x == t],
                        dtype=np.int64) for t in terms]
        if any(len(p) == 0 for p in pls):
            continue
        f = sloppy_doc_freq(pls, terms, slop)
        if f > 0.0:
            out[did] = f
    return out


def _batch_freqs(doc_tokens: list[list[str]], terms: list[str],
                 slop: int) -> dict[int, float]:
    vocab = sorted({t for toks in doc_tokens for t in toks})
    lut = {t: i for i, t in enumerate(vocab)}
    if any(t not in lut for t in terms):
        return {}
    doc_idx, codes, pos = [], [], []
    for did, toks in enumerate(doc_tokens):
        for p, t in enumerate(toks):
            doc_idx.append(did)
            codes.append(lut[t])
            pos.append(p)
    rows, freqs = sloppy_freqs_batch(
        np.array(doc_idx, dtype=np.int64), np.array(codes, dtype=np.int64),
        np.array(pos, dtype=np.int64), [lut[t] for t in terms], slop)
    return dict(zip(rows.tolist(), freqs.tolist()))


@pytest.mark.parametrize("block", range(6))
def test_sloppy_batch_equals_per_doc(block):
    rng = np.random.RandomState(500 + block)
    vocab = ["a", "b", "c", "d"]
    per = max(N_SLOPPY // 6, 1)
    for _ in range(per):
        docs = [[vocab[i] for i in rng.randint(0, len(vocab),
                                               rng.randint(1, 14))]
                for _ in range(8)]
        n_terms = rng.randint(2, 5)
        terms = list(rng.choice(vocab, size=n_terms, replace=True))
        slop = int(rng.randint(0, 6))
        assert _batch_freqs(docs, terms, slop) == \
            _per_doc_freqs(docs, terms, slop), f"{docs} {terms} {slop}"


@pytest.mark.parametrize("block", range(3))
def test_sloppy_matcher_vs_duckdb_state_machine(block):
    duckdb = pytest.importorskip("duckdb")
    import pandas as pd
    from pim_lucene_spark.oracle import sloppy_phrase_bm25_sql
    rng = np.random.RandomState(700 + block)
    vocab = ["a", "b", "c", "d", "e"]
    for _ in range(12):
        docs = [" ".join(vocab[i] for i in rng.randint(0, len(vocab),
                                                       rng.randint(1, 15)))
                for _ in range(12)]
        queries = [(qi, " ".join(rng.choice(vocab,
                                            size=rng.randint(2, 5))))
                   for qi in range(5)]
        slop = int(rng.randint(0, 5))
        pdf = pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
        con = duckdb.connect()
        con.register("documents", pdf)
        odf = con.execute(sloppy_phrase_bm25_sql(queries, slop=slop,
                                                 k=None)).fetchdf()
        got = {(int(r.qid), int(r.doc_id)): round(float(r.freq), 6)
               for r in odf.itertuples()}
        exp = {}
        for qid, q in queries:
            for did, f in _per_doc_freqs([d.split() for d in docs],
                                         q.split(), slop).items():
                exp[(qid, did)] = round(f, 6)
        assert got == exp, f"{docs} {queries} slop={slop}"


# --------------------------------------------------------------------------
# 2. standard tokenizer vs reference scanner
# --------------------------------------------------------------------------


def _ref_standard(text: str) -> list[str]:
    """Reference single-pass scanner for the documented semantics:
    tokens are runs of [letter|digit|_]; a single medial '/. between
    letters or ./, between digits joins (plus Hebrew gershayim/geresh
    quote forms); Han/Hiragana are one token per char; Katakana runs do
    not join other letters (underscore joins everything); runs cap at
    255 chars; everything else splits."""
    text = text.lower()
    out, cur, i = [], [], 0
    n = len(text)

    def is_heb(ch):
        return "א" <= ch <= "ײ"

    def is_kata(ch):
        return ("゠" < ch <= "ヿ" and ch != "・") or \
            ch == "ー"

    def is_cjk_single(ch):
        return ("一" <= ch <= "鿿") or ("぀" <= ch <= "ゟ")

    def is_tok(ch):
        return (ch.isalpha() or ch.isdigit() or ch == "_") \
            and not is_cjk_single(ch)

    def cat(ch):  # letter-ish vs digit for medial rules (Katakana/CJK
        # never join via medials: the engine splits their boundaries
        # before the medial passes run)
        if ch.isdigit():
            return "d"
        if ch.isalpha() and not is_kata(ch) and not is_cjk_single(ch):
            return "l"
        return "_"

    def flush():
        if cur:
            out.append("".join(cur))
            cur.clear()

    while i < n:
        ch = text[i]
        if is_cjk_single(ch):
            flush()
            out.append(ch)
            i += 1
        elif is_tok(ch):
            # Katakana/other letter boundary splits (underscore joins)
            if cur and cur[-1] != "_" and ch != "_" \
                    and is_kata(cur[-1]) != is_kata(ch):
                flush()
            cur.append(ch)
            if len(cur) == 255:
                flush()
            i += 1
        elif ch == "'" and cur and is_heb(cur[-1]) and \
                not (i + 1 < n and cat(text[i + 1]) == "l"):
            cur.append(ch)   # Hebrew geresh (WB7a)
            flush()
            i += 1
        elif ch == '"' and cur and is_heb(cur[-1]) and i + 1 < n \
                and is_heb(text[i + 1]):
            cur.append(ch)   # Hebrew gershayim (WB7b/c)
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
                flush()
                i += 1
        else:
            flush()
            i += 1
    flush()
    return out


ALPHABET = list("ab1_ .'," ) + ["É", "ü", "日", "!", "-", "カ", "ナ",
                                "の", "א", "מ", '"']


@pytest.mark.parametrize("block", range(6))
def test_standard_tokenizer_vs_reference(block):
    rng = np.random.RandomState(900 + block)
    per = max(N_SLOPPY // 6, 1)
    for _ in range(per):
        n = rng.randint(0, 30)
        s = "".join(ALPHABET[i] for i in rng.randint(0, len(ALPHABET), n))
        assert tokenize_one(s, "standard") == _ref_standard(s), repr(s)
