"""Deterministic synthetic source-code corpus generator.

Produces the Iceberg-shaped input table from ``BASELINE.json.input_hint``:
``(repo string, path string, commit string, lang string, content string)``
plus a dense ``doc_id`` — one row per source file, ``content`` the single
indexed field (the analogue of the reference benchmark's Wikipedia
``"contents"`` field, ``SearchWikiDPUMultiThread.java:220-224``).

Design constraints:

- **Deterministic and partition-independent.**  Every value is a pure
  function of ``doc_id`` via a splitmix64-style hash — the same corpus
  comes out at any parallelism, which the two-cluster-size scaling
  protocol requires (identical input at local[8] and local[32]).
- **Skewed like real source code.**  Token frequencies follow a Zipf
  distribution over a vocabulary whose head is common language keywords
  (``def``, ``import``, ``return``, ...), so hot-term skew handling
  (posting striping, see ``index_build.py``) is actually exercised —
  the reference acknowledges this imbalance as an open problem
  (``README.md:46-48``, ``PimIndexWriter.java:505-507``).
- **Vectorized.**  Content is assembled in numpy inside ``mapInPandas``;
  no per-row Python in the generation hot loop.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

CORPUS_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("repo", T.StringType(), False),
    T.StructField("path", T.StringType(), False),
    T.StructField("commit", T.StringType(), False),
    T.StructField("lang", T.StringType(), False),
    T.StructField("content", T.StringType(), False),
])

# Zipf head: common source-code keywords (the skewed hot terms).
KEYWORDS = [
    "def", "import", "return", "self", "if", "for", "in", "not", "else",
    "class", "from", "None", "True", "False", "while", "try", "except",
    "with", "as", "pass", "break", "continue", "lambda", "yield", "raise",
    "print", "len", "range", "int", "str", "list", "dict", "set",
]
LANGS = ["py", "java", "c", "go", "rs", "js"]

_U64 = np.uint64


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain mixing constants)."""
    z = x.astype(np.uint64) + _U64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> _U64(27))) * _U64(0x94D049BB133111EB)
    return z ^ (z >> _U64(31))


def _vocab(size: int) -> np.ndarray:
    idents = [f"v{i}" for i in range(size - len(KEYWORDS))]
    return np.asarray(KEYWORDS + idents, dtype=object)


def _zipf_cdf(size: int, s: float = 1.07) -> np.ndarray:
    w = 1.0 / np.power(np.arange(1, size + 1, dtype=np.float64), s)
    return np.cumsum(w) / w.sum()


def _gen_batch(doc_ids: np.ndarray, seed: int, vocab: np.ndarray,
               cdf: np.ndarray, min_tokens: int, max_tokens: int,
               repo_bias: float = 0.0) -> pd.DataFrame:
    ids = doc_ids.astype(np.uint64)
    base = _splitmix64(ids ^ _U64(seed))
    n_tok = (min_tokens
             + (base % _U64(max_tokens - min_tokens + 1)).astype(np.int64))
    total = int(n_tok.sum())
    # per-token counter: doc_hash * 2^20 + position, remixed
    doc_rep = np.repeat(base, n_tok)
    pos = np.arange(total, dtype=np.uint64) \
        - np.repeat(np.cumsum(n_tok) - n_tok, n_tok).astype(np.uint64)
    h = _splitmix64(doc_rep * _U64(0x100003) + pos)
    u = (h >> _U64(11)).astype(np.float64) / float(1 << 53)
    tok_idx = np.searchsorted(cdf, u, side="left")
    tok_idx = np.minimum(tok_idx, len(vocab) - 1)
    if repo_bias > 0.0:
        # repo-correlated vocabulary (real source trees share per-repo
        # identifiers): a `repo_bias` fraction of tokens draw from the
        # repo's own 173-ident slice — gives doc-id-reordering by
        # (repo, path) something to compress, still a pure function of
        # (seed, doc_id, position)
        repo_rep = np.repeat((ids % _U64(97)).astype(np.int64), n_tok)
        biased = (h % _U64(1000)).astype(np.int64) < int(repo_bias * 1000)
        slice_idx = len(KEYWORDS) + (repo_rep * 173
                                     + ((h >> _U64(32)) % _U64(173))
                                     .astype(np.int64)) % (len(vocab)
                                                           - len(KEYWORDS))
        tok_idx = np.where(biased, slice_idx, tok_idx)
    toks = vocab[tok_idx]

    bounds = np.cumsum(n_tok)
    contents = []
    start = 0
    for end in bounds:
        contents.append(" ".join(toks[start:end]))
        start = end

    lang_ix = (base % _U64(len(LANGS))).astype(np.int64)
    repo_ix = (ids % _U64(97)).astype(np.int64)
    commits = np.char.zfill(
        np.char.mod("%x", (base >> _U64(24)).astype(np.int64)), 10)
    return pd.DataFrame({
        "doc_id": doc_ids.astype(np.int64),
        "repo": [f"org/repo{r}" for r in repo_ix],
        "path": [f"src/m{int(i) % 211}/f{int(i)}.{LANGS[l]}"
                 for i, l in zip(doc_ids, lang_ix)],
        "commit": commits,
        "lang": [LANGS[l] for l in lang_ix],
        "content": contents,
    })


def generate_corpus(spark: SparkSession, num_docs: int, seed: int = 42,
                    vocab_size: int = 20_000, min_tokens: int = 40,
                    max_tokens: int = 260,
                    num_partitions: int | None = None,
                    repo_bias: float = 0.0) -> DataFrame:
    """Deterministic ``(doc_id, repo, path, commit, lang, content)`` frame.

    Dense ``doc_id`` in ``[0, num_docs)``; content identical regardless of
    ``num_partitions`` (pure function of ``doc_id`` and ``seed``).
    ``repo_bias`` > 0 draws that fraction of tokens from a per-repo
    identifier slice (see :func:`_gen_batch`).
    """
    n_part = num_partitions or spark.sparkContext.defaultParallelism
    vocab = _vocab(vocab_size)
    cdf = _zipf_cdf(vocab_size)

    def gen(pdf_iter):
        for pdf in pdf_iter:
            if len(pdf):
                yield _gen_batch(pdf["id"].to_numpy(np.int64), seed, vocab,
                                 cdf, min_tokens, max_tokens, repo_bias)

    return (spark.range(0, num_docs, numPartitions=n_part)
            .mapInPandas(gen, CORPUS_SCHEMA))
