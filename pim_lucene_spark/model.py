"""Pure pandas/numpy reference model: brute-force tokenizer + BM25 scorer.

This is the rebuild's analogue of the reference's two software oracles:

- the CPU fallback path (standard Lucene ``PhraseQuery``,
  ``PimPhraseWeight.java:70-121``), and
- the pure-Java DPU simulator (``DpuSystemSimulator.java:30-72`` running
  ``PimIndexSearcher`` over the on-disk index).

``BruteForceModel`` computes term/phrase frequencies by direct scanning of
tokenized docs and scores them with the exact Lucene BM25 expression tree
(:mod:`pim_lucene_spark.functions.bm25`).  The Spark engine is
differential-tested against it (rank-identical top-k, float-equal scores),
mirroring ``TestPimIndexSearcher.checkPhraseQuery``
(``TestPimIndexSearcher.java:820-860``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pim_lucene_spark.functions import bm25
from pim_lucene_spark.functions.smallfloat import int_to_byte4
from pim_lucene_spark.functions.tokenize import tokenize_one, tokenize_series


def phrase_freq(tokens: list[str], phrase_terms: list[str]) -> int:
    """Count of aligned start positions — every overlapping occurrence.

    Semantics of the DPU position matcher (``matcher.c:133-177``): position
    ``p`` matches iff ``tokens[p + i] == phrase_terms[i]`` for all i; all
    (overlapping) matches count toward the phrase frequency.  Pinned by the
    'blah' fixtures (``TestPimIndexSearcher.java:517-547``).
    """
    m = len(phrase_terms)
    n = len(tokens)
    if m == 0 or n < m:
        return 0
    count = 0
    for p in range(n - m + 1):
        if all(tokens[p + i] == phrase_terms[i] for i in range(m)):
            count += 1
    return count


class BruteForceModel:
    """Tokenize-once, scan-per-query model over a pandas corpus."""

    def __init__(self, docs: pd.DataFrame, id_col: str = "doc_id",
                 content_col: str = "content", tokenizer: str = "whitespace"):
        self.doc_ids = docs[id_col].to_numpy(np.int64)
        self.tokens = tokenize_series(docs[content_col], tokenizer).tolist()
        self.tokenizer = tokenizer
        self.doc_count = len(self.doc_ids)
        lengths = np.array([len(t) for t in self.tokens], dtype=np.int64)
        self.norm_bytes = int_to_byte4(lengths)
        self.sum_ttf = int(lengths.sum())

    def doc_freq(self, term: str) -> int:
        return sum(1 for t in self.tokens if term in t)

    def search_phrase(self, phrase: str, k: int = 10, precision: str = "float32",
                      boost: float = 1.0) -> pd.DataFrame:
        """Top-k (doc_id, freq, score); score desc, doc_id asc tie-break.

        Ordering matches Lucene's ``TopScoreDocCollector``.
        """
        terms = tokenize_one(phrase, self.tokenizer)
        if not terms:
            return pd.DataFrame({"doc_id": [], "freq": [], "score": []})
        term_set = sorted(set(terms))
        dfs = np.array([self.doc_freq(t) for t in term_set], dtype=np.int64)
        if np.any(dfs == 0):
            # no-match short-circuit (PimPhraseQuery.java:122-124,134-146)
            return pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                                 "freq": pd.Series([], dtype=np.int64),
                                 "score": pd.Series([], dtype=np.float64)})
        # phrase idf sums the idf of terms *in phrase order incl. duplicates*
        # (PimPhraseQuery.java:110-132 collects TermStatistics per position)
        dfs_in_order = np.array([self.doc_freq(t) for t in terms], dtype=np.int64)
        weight = bm25.phrase_weight(dfs_in_order, self.doc_count, boost, precision)
        avgdl = bm25.avg_field_length(self.sum_ttf, self.doc_count, precision)
        cache = bm25.score_cache(avgdl, precision=precision)

        freqs = np.array([phrase_freq(t, terms) for t in self.tokens], dtype=np.int64)
        hit = freqs > 0
        scores = bm25.score(freqs[hit], self.norm_bytes[hit], weight, cache, precision)
        out = pd.DataFrame({
            "doc_id": self.doc_ids[hit],
            "freq": freqs[hit],
            "score": scores.astype(np.float64),
        })
        out = out.sort_values(["score", "doc_id"], ascending=[False, True],
                              kind="mergesort").head(k).reset_index(drop=True)
        return out

    def search_term(self, term: str, k: int = 10**9, precision: str = "float32") -> pd.DataFrame:
        """Single-term query (PimIndexSearcher.java:73-108 oracle analogue)."""
        return self.search_phrase(term, k=k, precision=precision)
