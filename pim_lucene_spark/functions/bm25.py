"""BM25 scoring math with Lucene's exact float32 expression order.

Reproduced semantics (behavioral spec, reimplemented in numpy):

- per-term idf: ``(float) log(1 + (docCount - docFreq + 0.5)/(docFreq + 0.5))``
  — double log, cast to float32 (``BM25Similarity.java:103-106``).
- phrase idf: per-term float32 idfs accumulated in a double, then cast to
  float32 (``BM25Similarity.java:185-194``).
- weight = ``boost * idf`` in float32 (``BM25Similarity.java:236``).
- score = ``weight - weight / (1 + freq * cache[norm])`` in float32
  (``BM25Similarity.java:240-252``), with
  ``cache[i] = 1/(k1*((1-b) + b*LENGTH_TABLE[i]/avgdl))``
  (``BM25Similarity.java:205-208``).
- avgdl = ``(float)(sumTotalTermFreq / (double) docCount)``
  (``BM25Similarity.java:108-111``).

``precision='float64'`` runs the identical expression tree in float64; that
mode is bit-reproducible from ANSI SQL (DuckDB oracle) and is used for the
driver's side-by-side correctness checks, while float32 is the
Lucene-parity mode pinned by the pytest fixtures.
"""

from __future__ import annotations

import numpy as np

from pim_lucene_spark.functions.smallfloat import norm_inverse_cache

K1 = 1.2
B = 0.75


def _dtype(precision: str):
    if precision == "float32":
        return np.float32
    if precision == "float64":
        return np.float64
    raise ValueError(f"unknown precision {precision!r}")


def idf(doc_freq: np.ndarray | int, doc_count: int, precision: str = "float32") -> np.ndarray:
    """Per-term idf (BM25Similarity.java:103-106)."""
    dt = _dtype(precision)
    n = np.asarray(doc_freq, dtype=np.float64)
    val = np.log(1.0 + (doc_count - n + 0.5) / (n + 0.5))
    return val.astype(dt)


def phrase_weight(doc_freqs: np.ndarray, doc_count: int, boost: float = 1.0,
                  precision: str = "float32") -> float:
    """Summed-idf phrase weight (BM25Similarity.java:185-194,236).

    Per-term idfs are computed at target precision, summed in float64, the
    sum cast back to target precision, then multiplied by boost.
    """
    dt = _dtype(precision)
    idfs = idf(np.atleast_1d(doc_freqs), doc_count, precision)
    total = dt(np.sum(idfs.astype(np.float64)))
    return dt(dt(boost) * total)


def avg_field_length(sum_total_term_freq: int, doc_count: int,
                     precision: str = "float32") -> float:
    """avgdl (BM25Similarity.java:108-111)."""
    dt = _dtype(precision)
    return dt(sum_total_term_freq / float(doc_count))


def score_cache(avgdl: float, k1: float = K1, b: float = B,
                precision: str = "float32") -> np.ndarray:
    """256-entry norm-inverse cache at the requested precision."""
    return norm_inverse_cache(avgdl, k1=k1, b=b, dtype=_dtype(precision))


def score(freq: np.ndarray, norm_bytes: np.ndarray, weight: float,
          cache: np.ndarray, precision: str = "float32") -> np.ndarray:
    """Vectorized BM25 score (BM25Similarity.java:240-252)."""
    dt = _dtype(precision)
    w = dt(weight)
    f = np.asarray(freq).astype(dt)
    norm_inv = cache[np.asarray(norm_bytes, dtype=np.int64) & 0xFF].astype(dt)
    return (w - w / (dt(1.0) + f * norm_inv)).astype(dt)
