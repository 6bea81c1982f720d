"""Typed query objects — the engine's ``PimPhraseQuery`` surface.

The reference's user-visible query types are Lucene's ``PimPhraseQuery``
(field, terms, slop — ``PimPhraseQuery.java``) and plain term queries,
optionally wrapped in ``BoostQuery``; ``PimQuery.java`` is the extension
point for new offloaded types.  The Spark engine's equivalents:

- :class:`PhraseQuery` — analyzed text, optional slop (slop routes to the
  scan path, reference rewrite contract) and boost.
- :class:`TermQuery` — single term with boost (a 1-term phrase).

``FullTextIndex.query([...])`` consumes them; the tuple protocol
``(qid, text)`` / ``(qid, text, boost)`` stays supported everywhere for
scripting.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class PhraseQuery:
    """Exact (slop=0) or sloppy phrase; ``boost`` scales the BM25 weight
    exactly as Lucene's ``BoostQuery`` (weight = boost * Σidf, float32)."""

    text: str
    slop: int = 0
    boost: float = 1.0


@dataclass(frozen=True)
class TermQuery:
    """Single-term query (a 1-term phrase; slop is meaningless)."""

    term: str
    boost: float = 1.0

    @property
    def text(self) -> str:
        return self.term

    @property
    def slop(self) -> int:
        return 0


def to_tuple(qid: int, q) -> tuple[int, str, float]:
    """Normalize a typed query or tuple to ``(qid, text, boost)``."""
    if isinstance(q, (PhraseQuery, TermQuery)):
        return (qid, q.text, float(q.boost))
    if isinstance(q, str):
        return (qid, q, 1.0)
    raise TypeError(f"unsupported query object {type(q).__name__}")


@dataclass(frozen=True)
class FieldedQuery:
    """A sub-query bound to a named field (``field:...`` query syntax,
    Lucene's per-clause field binding).  Consumed by
    ``MultiFieldIndex.parse_and_query`` / ``search_boolean_fields`` —
    the single-field ``FullTextIndex`` rejects it."""

    field: str
    query: object


@dataclass(frozen=True)
class MatchAllDocsQuery:
    """Every doc matches with a constant score of ``boost``
    (``MatchAllDocsQuery.java``); ties (all of them) break doc-id asc."""

    boost: float = 1.0


@dataclass(frozen=True)
class SynonymQuery:
    """Terms that score as ONE pseudo-term (``SynonymQuery.java``):
    per-doc frequency = Σ boostᵢ·tfᵢ over the matching terms (float
    accumulation in declaration order), ONE BM25 weight from merged
    stats (pseudo-docFreq = max over the terms' docFreq — idf computed
    once, never summed).  ``terms`` entries are index terms (post-
    analysis), optionally ``(term, boost)`` with the per-term boost in
    (0, 1] (``SynonymQuery.Builder.addTerm`` contract); ``boost`` is the
    usual BoostQuery top-level weight scale.
    """

    terms: tuple
    boost: float = 1.0

    def __post_init__(self):
        norm = []
        for t in self.terms:
            term, tb = (t, 1.0) if isinstance(t, str) else t
            tb = float(tb)
            if not 0.0 < tb <= 1.0:
                raise ValueError(
                    f"synonym term boost must be in (0, 1], got {tb}")
            norm.append((str(term), tb))
        if not norm:
            raise ValueError("SynonymQuery needs at least one term")
        object.__setattr__(self, "terms", tuple(norm))


@dataclass(frozen=True)
class FacetFilterQuery:
    """Matches docs whose facet ordinal for ``dim`` is one of
    ``values`` — the drill-down constraint of ``DrillDownQuery.java``
    (OR within a dimension, AND across dimensions via multiple FILTER
    clauses).  Non-scoring: Lucene adds drill-down terms with
    ``Occur.FILTER``; in a scoring role the contribution is 0.  Needs
    the dimension's ordinal sidecar
    (:func:`~pim_lucene_spark.operators.facets.build_facet_index`)."""

    dim: str
    values: tuple

    def __post_init__(self):
        vals = tuple(sorted({str(v) for v in self.values}))
        if not vals:
            raise ValueError("FacetFilterQuery needs at least one value")
        object.__setattr__(self, "values", vals)


@dataclass(frozen=True)
class DocValuesRangeQuery:
    """Matches docs whose numeric doc value for ``col`` lies in the
    INCLUSIVE range ``[lo, hi]`` —
    ``NumericDocValuesField.newSlowRangeQuery``: evaluated against the
    resident doc-values sidecar, non-scoring (FILTER semantics, score 0
    in a scoring role).  Needs the column's sidecar
    (:func:`~pim_lucene_spark.operators.docvalues.
    build_numeric_docvalues`)."""

    col: str
    lo: int
    hi: int

    def __post_init__(self):
        if int(self.lo) > int(self.hi):
            raise ValueError(f"range lo {self.lo} > hi {self.hi}")
        object.__setattr__(self, "lo", int(self.lo))
        object.__setattr__(self, "hi", int(self.hi))


@dataclass(frozen=True)
class ConstantScoreQuery:
    """Wraps any engine query; every matching doc scores ``boost``
    (``ConstantScoreQuery.java`` — the wrapped query's scores are
    discarded, only its match set is kept)."""

    query: object
    boost: float = 1.0


@dataclass(frozen=True)
class IntervalQuery:
    """Proximity via minimal intervals over TERM sub-sources — the
    engine's ``IntervalQuery.java`` surface ("A within N words of B,
    ordered"): ``Intervals.maxgaps(g, Intervals.ordered(terms…))`` /
    ``maxwidth`` / ``unordered``.

    ``text`` analyzes with the index tokenizer into the sub-terms (one
    per token, in order).  Alternatively ``sources`` gives the sub-term
    slots explicitly, each a term string or a tuple of ALTERNATIVE
    terms (``Intervals.or`` over terms — "table near (scan OR merge)");
    every element analyzes with the index tokenizer and must yield one
    term.  ``ordered`` demands the slots appear in that order;
    enumerated intervals follow minimal-interval semantics
    (:mod:`pim_lucene_spark.functions.intervals`).  ``max_gaps`` keeps
    intervals with at most that many non-query positions inside
    (width − slot count); ``max_width`` caps the whole span length; None
    = unfiltered.  Scoring is the saturation function
    (``IntervalScoreFunction.java``): per-doc
    ``freq = Σ 1/max(width − minExtent + 1, 1)`` over minimal intervals
    and ``score = boost · (1 − pivot/(pivot + freq))`` — NOT BM25 (the
    doc norm never enters).
    """

    text: str | None = None
    ordered: bool = True
    max_gaps: int | None = None
    max_width: int | None = None
    pivot: float = 1.0
    boost: float = 1.0
    sources: tuple | None = None

    def __post_init__(self):
        if (self.text is None) == (self.sources is None):
            raise ValueError("give exactly one of text= or sources=")
        if self.sources is not None:
            object.__setattr__(
                self, "sources",
                tuple((s,) if isinstance(s, str) else tuple(s)
                      for s in self.sources))
            if not self.sources or any(not s for s in self.sources):
                raise ValueError("sources must be non-empty slots")
        if self.max_gaps is not None and int(self.max_gaps) < 0:
            raise ValueError("max_gaps must be >= 0")
        if self.max_width is not None and int(self.max_width) < 1:
            raise ValueError("max_width must be >= 1")
        if not float(self.pivot) > 0:
            raise ValueError("pivot must be > 0")
