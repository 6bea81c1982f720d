"""DuckDB oracle-SQL generators mirroring the engine's float64 mode.

Each generator returns an ANSI-SQL string (DuckDB dialect) computing the
same result as the corresponding Spark query over the pre-registered
``documents`` / ``embeddings`` views.  The BM25 SQL reproduces the whole
scoring pipeline — whitespace tokenization, SmallFloat byte4 norm
quantization (``SmallFloat.java:103-167``) in integer bit math, the
norm-inverse cache expression (``BM25Similarity.java:205-208``) and the
``weight - weight/(1+freq*cache)`` score (``BM25Similarity.java:240-252``)
— in float64 with the same association order as the engine's
``precision='float64'`` mode.  Scores are rounded to 6 decimals on both
sides; ranking uses the exact (unrounded) doubles on both sides.
"""

from __future__ import annotations

from pim_lucene_spark.functions.tokenize import tokenize_one

_TOK_CTE_TAIL = r"""
docl AS (SELECT doc_id, CAST(len(tks) AS BIGINT) AS dl FROM tok),
cstats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl
  FROM docl
),
positions AS (
  SELECT doc_id, unnest(tks) AS term,
         CAST(generate_subscripts(tks, 1) AS BIGINT) - 1 AS pos
  FROM tok
)"""

TOK_CTE = r"""
tok AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS tks
  FROM documents
),""" + _TOK_CTE_TAIL


def _std_tok_expr(col: str) -> str:
    """The `standard` tokenizer's normalize pipeline in DuckDB SQL — the
    same regex passes as ``functions.tokenize._standard_split`` (RE2 both
    sides): lower → strip raw placeholder bytes → protect medial chars
    (2 passes per rule) → strip non-token chars to spaces."""
    x = f"lower({col})"
    x = f"regexp_replace({x}, '[\\x01-\\x03]+', ' ', 'g')"
    for _ in range(2):
        for pat, ph in ((r"(\p{L})''(\p{L})", 1),
                        (r"(\p{L})\.(\p{L})", 2),
                        (r"(\p{N})\.(\p{N})", 2),
                        (r"(\p{N}),(\p{N})", 3)):
            x = (f"regexp_replace({x}, '{pat}', "
                 f"'\\1' || chr({ph}) || '\\2', 'g')")
    return (f"regexp_replace({x}, "
            f"'[^\\p{{L}}\\p{{N}}_\\x01-\\x03]+', ' ', 'g')")


STD_TOK_CTE = (r"""
tok AS (
  SELECT doc_id,
         list_transform(
           list_filter(regexp_split_to_array(trim(""" + _std_tok_expr("text")
               + r"""), '\s+'), x -> x <> ''),
           t -> replace(replace(replace(t, chr(1), chr(39)),
                                chr(2), '.'), chr(3), ',')) AS tks
  FROM documents
),""" + _TOK_CTE_TAIL)


def _tok_cte(tokenizer: str) -> str:
    if tokenizer == "whitespace":
        return TOK_CTE
    if tokenizer == "standard":
        return STD_TOK_CTE
    raise ValueError(f"no oracle CTE for tokenizer {tokenizer!r}")


def _norm_byte_sql(dl: str) -> str:
    """SmallFloat.intToByte4 in SQL bit math (SmallFloat.java:103-156)."""
    v = f"({dl} - 24)"
    log2v = f"CAST(floor(log2({v})) AS BIGINT)"
    return (f"(CASE WHEN {dl} < 24 THEN {dl} "
            f"ELSE 24 + (CASE WHEN {v} < 8 THEN {v} "
            f"ELSE (({v} >> ({log2v} - 3)) & 7) | (({log2v} - 2) << 3) END) "
            f"END)")


def _byte4_to_int_sql(b: str) -> str:
    """SmallFloat.byte4ToInt in SQL bit math (SmallFloat.java:159-167)."""
    v = f"({b} - 24)"
    return (f"(CASE WHEN {b} < 24 THEN {b} "
            f"ELSE 24 + (CASE WHEN ({v} >> 3) = 0 THEN {v} & 7 "
            f"ELSE (({v} & 7) | 8) << (({v} >> 3) - 1) END) END)")


def _quantized_dl(dl: str) -> str:
    return _byte4_to_int_sql(_norm_byte_sql(dl))


def _cache_sql(qdl: str) -> str:
    """1/(k1*((1-b) + b*qdl/avgdl)) in the engine's association order."""
    return (f"(1.0 / (1.2 * ((1.0 - 0.75) + "
            f"(0.75 * CAST({qdl} AS DOUBLE)) / "
            f"(CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))))")


def _idf_sql(term: str) -> str:
    df = (f"(SELECT count(DISTINCT doc_id) FROM positions "
          f"WHERE term = '{_q(term)}')")
    return (f"ln(1.0 + (CAST(n_docs AS DOUBLE) - {df} + 0.5) / ({df} + 0.5))")


def _q(s: str) -> str:
    return s.replace("'", "''")


def _phrase_freq_select(terms: list[str]) -> str:
    """Per-doc overlap-counting phrase frequency via m-way position joins."""
    if len(terms) == 1:
        return (f"SELECT doc_id, CAST(count(*) AS BIGINT) AS freq "
                f"FROM positions WHERE term = '{_q(terms[0])}' GROUP BY doc_id")
    joins = []
    for i in range(1, len(terms)):
        joins.append(
            f"JOIN positions p{i} ON p{i}.doc_id = p0.doc_id "
            f"AND p{i}.pos = p0.pos + {i} AND p{i}.term = '{_q(terms[i])}'")
    return (f"SELECT p0.doc_id, CAST(count(*) AS BIGINT) AS freq "
            f"FROM positions p0 {' '.join(joins)} "
            f"WHERE p0.term = '{_q(terms[0])}' GROUP BY p0.doc_id")


def phrase_bm25_sql(queries: list[tuple[int, str]], k: int | None = 10,
                    tokenizer: str = "whitespace",
                    round_scores: bool = True) -> str:
    """Full BM25 top-k SQL for a query batch → (qid, doc_id, freq, score).

    ``round_scores=False`` emits raw doubles — required when the caller
    combines scores across queries/fields before its own final rounding.
    """
    selects = []
    for qid, text in queries:
        terms = tokenize_one(text, tokenizer)
        if not terms:
            continue
        weight = "(" + " + ".join(_idf_sql(t) for t in terms) + ")"
        freq_sel = _phrase_freq_select(terms)
        cache = _cache_sql(_quantized_dl("docl.dl"))
        score_exact = (f"({weight} - {weight} / "
                       f"(1.0 + CAST(f.freq AS DOUBLE) * {cache}))")
        qualify = (f"QUALIFY row_number() OVER "
                   f"(ORDER BY {score_exact} DESC, f.doc_id ASC) <= {k} "
                   if k is not None else "")
        score_out = (f"round({score_exact}, 6)" if round_scores
                     else score_exact)
        selects.append(
            f"SELECT CAST({qid} AS BIGINT) AS qid, f.doc_id, f.freq, "
            f"{score_out} AS score "
            f"FROM ({freq_sel}) f "
            f"JOIN docl ON docl.doc_id = f.doc_id, cstats "
            f"{qualify}")
    body = " UNION ALL ".join(selects)
    return f"WITH {_tok_cte(tokenizer)} {body}"


def _sloppy_freq_select(terms: list[str], slop: int) -> str:
    """Per-doc sloppy phrase frequency: Σ 1/(1+bestlen) over first-term
    anchors, bestlen = minimal adjusted-position span ≤ slop (the same
    semantics as ``plans.router._sloppy_freqs``; the join window
    ``|pp_i - a| <= slop`` is lossless because any assignment with span
    ≤ slop keeps every term within slop of the anchor)."""
    if len(terms) == 1:
        return (f"SELECT doc_id, CAST(count(*) AS DOUBLE) AS freq "
                f"FROM positions WHERE term = '{_q(terms[0])}' "
                f"GROUP BY doc_id")
    joins, pps = [], ["CAST(p0.pos AS BIGINT)"]
    for i in range(1, len(terms)):
        pp = f"(p{i}.pos - {i})"
        joins.append(
            f"JOIN positions p{i} ON p{i}.doc_id = p0.doc_id "
            f"AND p{i}.term = '{_q(terms[i])}' "
            f"AND abs({pp} - p0.pos) <= {slop}")
        pps.append(pp)
    span = f"(greatest({', '.join(pps)}) - least({', '.join(pps)}))"
    anchors = (f"SELECT p0.doc_id, p0.pos AS a, min({span}) AS bestlen "
               f"FROM positions p0 {' '.join(joins)} "
               f"WHERE p0.term = '{_q(terms[0])}' "
               f"GROUP BY p0.doc_id, p0.pos "
               f"HAVING min({span}) <= {slop}")
    return (f"SELECT doc_id, sum(1.0 / (1.0 + bestlen)) AS freq "
            f"FROM ({anchors}) GROUP BY doc_id")


def sloppy_phrase_bm25_sql(queries: list[tuple[int, str]], slop: int,
                           k: int | None = 10,
                           tokenizer: str = "whitespace") -> str:
    """BM25 top-k SQL for sloppy phrases → (qid, doc_id, freq, score).

    ``freq`` is DOUBLE (sum of sloppy weights).  Use slop values whose
    weights ``1/(1+L)`` are binary-exact (slop <= 1) when comparing
    hash-for-hash against the engine — larger slops can differ in the last
    ulp from summation order.
    """
    selects = []
    for qid, text in queries:
        terms = tokenize_one(text, tokenizer)
        if not terms:
            continue
        weight = "(" + " + ".join(_idf_sql(t) for t in terms) + ")"
        freq_sel = _sloppy_freq_select(terms, slop)
        cache = _cache_sql(_quantized_dl("docl.dl"))
        score_exact = (f"({weight} - {weight} / "
                       f"(1.0 + CAST(f.freq AS DOUBLE) * {cache}))")
        qualify = (f"QUALIFY row_number() OVER "
                   f"(ORDER BY {score_exact} DESC, f.doc_id ASC) <= {k} "
                   if k is not None else "")
        selects.append(
            f"SELECT CAST({qid} AS BIGINT) AS qid, f.doc_id, "
            f"round(f.freq, 6) AS freq, round({score_exact}, 6) AS score "
            f"FROM ({freq_sel}) f "
            f"JOIN docl ON docl.doc_id = f.doc_id, cstats "
            f"{qualify}")
    body = " UNION ALL ".join(selects)
    return f"WITH {_tok_cte(tokenizer)} {body}"


def phrase_freqs_sql(queries: list[tuple[int, str]]) -> str:
    """(qid, doc_id, freq) without scoring."""
    selects = []
    for qid, text in queries:
        terms = tokenize_one(text)
        if not terms:
            continue
        selects.append(
            f"SELECT CAST({qid} AS BIGINT) AS qid, doc_id, freq "
            f"FROM ({_phrase_freq_select(terms)})")
    return f"WITH {TOK_CTE} " + " UNION ALL ".join(selects)


TERM_STATS_SQL = f"""WITH {TOK_CTE}
SELECT term,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS doc_freq,
       CAST(count(*) AS BIGINT) AS total_tf
FROM positions GROUP BY term"""

COLLECTION_STATS_SQL = f"""WITH {TOK_CTE}
SELECT n_docs AS doc_count, sum_dl AS sum_ttf,
       round(CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE), 6) AS avgdl
FROM cstats"""

DOC_NORMS_SQL = f"""WITH {TOK_CTE}
SELECT doc_id, dl AS token_count,
       CAST({_norm_byte_sql('dl')} AS BIGINT) AS norm,
       CAST({_quantized_dl('dl')} AS BIGINT) AS quantized_len
FROM docl"""
