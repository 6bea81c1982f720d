"""Text analysis operators: quality scoring, language-ID, token counting,
document fingerprinting.  All JVM-side built-ins (no Python in the hot
path) so every one of them is ANSI-SQL reproducible for the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pim_lucene_spark.operators.dedup import tokens_col

# tiny deterministic marker sets for the n-gram/stopword language heuristic
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es"],
    "de": ["der", "die", "das", "und", "ist", "ein", "nicht", "mit"],
    "fr": ["le", "la", "de", "et", "un", "est", "que", "pour"],
}
EN_STOPWORDS = LANG_MARKERS["en"] + ["for", "on", "with", "as", "at", "by"]

# a BPE-ish pre-tokenization: identifier-ish runs, digit runs, single punct
TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

FINGERPRINT_MOD = 1_000_000_007
FINGERPRINT_MULT = 31


def quality_cols(text_col: str = "content") -> dict:
    """The quality-feature expressions as reusable Catalyst Columns —
    pure map-stage (no UDF, no shuffle); :func:`text_quality` and
    :func:`~pim_lucene_spark.operators.pipeline.curate_corpus` both
    consume these so a pipeline can inline them into an existing scan
    instead of joining a feature frame back by id."""
    toks = tokens_col(text_col)
    n_tokens = F.size(toks)
    n_chars = F.length(F.col(text_col))
    stop = F.size(F.filter(toks, lambda x: x.isin(EN_STOPWORDS)))
    punct = F.length(F.regexp_replace(F.col(text_col), r"[A-Za-z0-9\s]", ""))
    avg_tok = F.when(n_tokens > 0,
                     F.aggregate(toks, F.lit(0).cast("long"),
                                 lambda acc, t: acc + F.length(t)).cast("double")
                     / n_tokens.cast("double")).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tokens > 0, stop.cast("double") / n_tokens.cast("double")) \
                  .otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, punct.cast("double") / n_chars.cast("double")) \
                   .otherwise(F.lit(0.0))
    quality = F.round(
        F.least(n_tokens.cast("double") / F.lit(100.0), F.lit(1.0)) * 0.5
        + stop_ratio * 0.3 + (F.lit(1.0) - punct_ratio) * 0.2, 6)
    return {"n_tokens": n_tokens, "n_chars": n_chars, "avg_tok": avg_tok,
            "stop_ratio": stop_ratio, "punct_ratio": punct_ratio,
            "quality": quality}


def lang_pred_col(text_col: str = "content"):
    """The language-ID prediction as one reusable Catalyst Column."""
    toks = tokens_col(text_col)
    counts = {lang: F.size(F.filter(toks, lambda x: x.isin(words)))
              for lang, words in LANG_MARKERS.items()}
    best = F.greatest(*counts.values())
    pred = F.when(best <= 0, F.lit("unknown"))
    for lang in ("en", "es", "de", "fr"):  # deterministic tie-break order
        pred = pred.when(counts[lang] == best, F.lit(lang))
    return pred


def text_quality(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "content") -> DataFrame:
    """Per-doc quality features: token/char counts, ratios, quality score."""
    c = quality_cols(text_col)
    n_tokens, n_chars = c["n_tokens"], c["n_chars"]
    avg_tok, stop_ratio = c["avg_tok"], c["stop_ratio"]
    punct_ratio, quality = c["punct_ratio"], c["quality"]
    return docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        n_tokens.cast("long").alias("n_tokens"),
        n_chars.cast("long").alias("n_chars_computed"),
        F.round(avg_tok, 6).alias("avg_token_len"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        quality.alias("quality_score"),
    )


def lang_id(docs: DataFrame, id_col: str = "doc_id",
            text_col: str = "content") -> DataFrame:
    """Heuristic language ID: argmax of marker-token hits, fixed tie order."""
    toks = tokens_col(text_col)
    counts = {lang: F.size(F.filter(toks, lambda x: x.isin(words)))
              for lang, words in LANG_MARKERS.items()}
    return docs.select(F.col(id_col).cast("long").alias("doc_id"),
                       *[c.cast("long").alias(f"hits_{lang}")
                         for lang, c in counts.items()],
                       lang_pred_col(text_col).alias("lang_pred"))


def token_counts(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "content") -> DataFrame:
    """Whitespace and regex (BPE-ish) token counts per doc."""
    return docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.size(tokens_col(text_col)).cast("long").alias("ws_tokens"),
        F.regexp_count(F.col(text_col), F.lit(TOKEN_REGEX)).cast("long")
         .alias("re_tokens"),
    )


def fingerprint(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "content") -> DataFrame:
    """Order-sensitive rolling document fingerprint (Rabin-Karp style).

    fold over tokens of ``(h*31 + (ascii(first_char)*131 + len(token)))
    mod 1e9+7`` — integer math with a deterministic left fold, hence
    bit-identical in any engine.
    """
    toks = tokens_col(text_col)
    vals = F.transform(toks, lambda t: (F.ascii(F.substring(t, 1, 1))
                                        * F.lit(131)
                                        + F.length(t)).cast("long"))
    h = F.aggregate(vals, F.lit(0).cast("long"),
                    lambda acc, v: (acc * FINGERPRINT_MULT + v)
                    % FINGERPRINT_MOD)
    return docs.select(F.col(id_col).cast("long").alias("doc_id"),
                       h.alias("fingerprint"))


def repetition_stats(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "content") -> DataFrame:
    """Gopher-style repetition quality signals, all JVM built-ins:

    - ``distinct_ratio``: distinct tokens / tokens (low ⇒ loops/boilerplate)
    - ``top_token_share``: max single-token frequency / tokens (the
      "fraction of characters in the most common n-gram" family, n=1)
    - ``dup_line_ratio``: 1 - distinct lines / lines (duplicate-line
      fraction; machine-generated pages repeat whole lines)

    Rules of this family gate pre-training corpora (the Gopher/C4 quality
    filters); each value is per-doc computable — a pure map stage.
    """
    toks = tokens_col(text_col)
    n_tok = F.size(toks)
    distinct_ratio = F.when(
        n_tok > 0, F.size(F.array_distinct(toks)).cast("double")
        / n_tok.cast("double")).otherwise(F.lit(1.0))
    # max token frequency: sort then fold run lengths — O(n log n) per doc
    # (a distinct×tokens nested scan would go quadratic on long docs)
    def _run(acc, t):
        run = (F.when(t == acc.prev, acc.run + F.lit(1).cast("long"))
               .otherwise(F.lit(1).cast("long")))
        return F.struct(t.alias("prev"), run.alias("run"),
                        F.greatest(acc.best, run).alias("best"))

    acc0 = F.struct(F.lit("\x00").alias("prev"),
                    F.lit(0).cast("long").alias("run"),
                    F.lit(0).cast("long").alias("best"))
    top_cnt = F.aggregate(F.array_sort(toks), acc0, _run,
                          lambda acc: acc.best)
    top_share = F.when(n_tok > 0, top_cnt.cast("double")
                       / n_tok.cast("double")).otherwise(F.lit(0.0))
    lines = F.filter(F.split(F.col(text_col), r"\n"),
                     lambda x: F.trim(x) != "")
    n_lines = F.size(lines)
    dup_line_ratio = F.when(
        n_lines > 0,
        F.lit(1.0) - F.size(F.array_distinct(lines)).cast("double")
        / n_lines.cast("double")).otherwise(F.lit(0.0))
    return docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.round(distinct_ratio, 6).alias("distinct_ratio"),
        F.round(top_share, 6).alias("top_token_share"),
        F.round(dup_line_ratio, 6).alias("dup_line_ratio"))
