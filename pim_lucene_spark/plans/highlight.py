"""Highlighting — best-fragment snippets for search hits.

The Lucene ``highlighter`` module re-analyzes a stored document with
offsets, finds the query's match positions, and emits a character
window around the best match with the matched tokens wrapped in markup.
This is that surface for the engine's term/phrase queries, Spark-first:
the hits frame joins the docs table (broadcast of the tiny query map),
and one Arrow-batched ``mapInPandas`` kernel per partition re-tokenizes
each hit document, aligns the phrase the same way the scorer does
(conjunction + adjacent positions), and cuts the snippet — no driver
loop, no per-row Python UDF.

Offsets: the ``whitespace`` analyzer's tokens are exactly the
``\\S+`` runs, so character offsets are recovered precisely.  For the
``standard`` analyzer the normalized tokens don't map 1:1 back to raw
text; the kernel falls back to a case-insensitive search for each
matched token's literal text (documented best-effort, like Lucene's
``SimpleHTMLEncoder`` fallback paths).
"""

from __future__ import annotations

import re

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

HIGHLIGHT_SCHEMA = T.StructType([
    T.StructField("qid", T.LongType(), False),
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("n_matches", T.LongType(), False),
    T.StructField("snippet", T.StringType(), True),
])


def _ws_spans(text: str) -> list[tuple[str, int, int]]:
    return [(m.group(0), m.start(), m.end())
            for m in re.finditer(r"\S+", text)]


def _match_starts(tokens: list[str], terms: list[str]) -> list[int]:
    m = len(terms)
    return [i for i in range(len(tokens) - m + 1)
            if tokens[i:i + m] == terms]


def _snippet_ws(text: str, spans, starts: list[int], m: int,
                pre: str, post: str, window: int) -> str:
    """Window around the FIRST match; every match fully inside the
    window gets wrapped (Lucene's best-fragment behavior for one
    fragment)."""
    s0, e0 = spans[starts[0]][1], spans[starts[0] + m - 1][2]
    lo, hi = max(0, s0 - window), min(len(text), e0 + window)
    # wrap matched token runs inside [lo, hi); overlapping matches
    # (repeated-term phrases like 'red red' in 'red red red') merge
    # into one highlighted run, else the right-to-left insertion
    # produces mis-nested tags
    cuts = []
    for st in starts:
        a, b = spans[st][1], spans[st + m - 1][2]
        if a >= lo and b <= hi:
            cuts.append((a, b))
    cuts.sort()
    merged: list[list[int]] = []
    for a, b in cuts:
        if merged and a <= merged[-1][1]:
            merged[-1][1] = max(merged[-1][1], b)
        else:
            merged.append([a, b])
    out = text[lo:hi]
    for a, b in sorted(map(tuple, merged), reverse=True):
        ra, rb = a - lo, b - lo
        out = out[:ra] + pre + out[ra:rb] + post + out[rb:]
    prefix = "..." if lo > 0 else ""
    suffix = "..." if hi < len(text) else ""
    return prefix + out + suffix


def highlight(docs: DataFrame, hits: DataFrame,
              queries: list[tuple[int, str]],
              tokenizer: str = "whitespace",
              pre: str = "<b>", post: str = "</b>",
              window: int = 40,
              id_col: str = "doc_id",
              content_col: str = "content") -> DataFrame:
    """Snippets for ``hits`` → (qid, doc_id, n_matches, snippet).

    ``hits`` needs (qid, doc_id) — pass a ``search`` result directly.
    ``queries`` is the same (qid, text) batch that produced the hits.
    ``window`` is the number of context characters on each side of the
    first match.  ``snippet`` is NULL when the analyzer finds no match
    in the stored text (n_matches 0 — e.g. a stale hits frame).
    """
    from pim_lucene_spark.functions.tokenize import tokenize_one

    qmap = {int(qid): tokenize_one(text, tokenizer)
            for qid, text in queries}
    joined = (hits.select(F.col("qid").cast("long"),
                          F.col("doc_id").cast("long"))
              .join(docs.select(F.col(id_col).cast("long").alias("doc_id"),
                                F.col(content_col).alias("hl_content")),
                    "doc_id"))

    def kernel(batches):
        for pdf in batches:
            out = {"qid": [], "doc_id": [], "n_matches": [], "snippet": []}
            for row in pdf.itertuples(index=False):
                terms = qmap.get(int(row.qid))
                text = row.hl_content or ""
                snippet, n = None, 0
                if terms:
                    if tokenizer == "whitespace":
                        spans = _ws_spans(text)
                        tokens = [t for t, _, _ in spans]
                        starts = _match_starts(tokens, terms)
                        n = len(starts)
                        if starts:
                            snippet = _snippet_ws(text, spans, starts,
                                                  len(terms), pre, post,
                                                  window)
                    else:
                        # best-effort: case-insensitive literal search of
                        # the analyzed phrase joined by whitespace runs
                        pat = r"\s+".join(re.escape(t) for t in terms)
                        ms = list(re.finditer(pat, text, re.IGNORECASE))
                        n = len(ms)
                        if ms:
                            a, b = ms[0].start(), ms[0].end()
                            lo = max(0, a - window)
                            hi = min(len(text), b + window)
                            out_s = (text[lo:a] + pre + text[a:b] + post
                                     + text[b:hi])
                            snippet = (("..." if lo > 0 else "") + out_s
                                       + ("..." if hi < len(text) else ""))
                out["qid"].append(int(row.qid))
                out["doc_id"].append(int(row.doc_id))
                out["n_matches"].append(n)
                out["snippet"].append(snippet)
            yield pd.DataFrame(out)

    return joined.mapInPandas(kernel, HIGHLIGHT_SCHEMA)
