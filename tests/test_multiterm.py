"""MultiTermQuery family — prefix/wildcard/range/regexp/fuzzy expansion
against the term dictionary, constant-score and scoring-boolean rewrites
(MultiTermQuery.java), Lucene fuzzy boosts (FuzzyTermsEnum.java:239-256)
and top-terms selection order (TopTermsRewrite.java:199-213).
"""

import random
import re

import numpy as np
import pandas as pd
import pytest

from pim_lucene_spark.config import IndexConfig
from pim_lucene_spark.operators.index_build import build_index
from pim_lucene_spark.operators.search import search
from pim_lucene_spark.plans.multiterm import (
    MAX_CLAUSE_COUNT, FuzzyQuery, PrefixQuery, RegexpQuery, TermRangeQuery,
    WildcardQuery, expand_frame, expand_fuzzy, expand_terms, osa_distance,
    search_multiterm, wildcard_to_regex)

DOCS = pd.DataFrame({
    "doc_id": range(8),
    "content": [
        "cold bold colt",
        "colour color bolt",
        "hold the door",
        "color colors colour",
        "bale bold bound",
        "cool cooler coolest",
        "a.b c-d under_score",
        "bold bold bold colt",
    ],
})
VOCAB = sorted({t for c in DOCS.content for t in c.split()})


@pytest.fixture(scope="module")
def midx(spark, tmp_path_factory):
    cfg = IndexConfig(num_partitions=2, num_segments=2, build_chunks=1)
    return build_index(spark, spark.createDataFrame(DOCS),
                       str(tmp_path_factory.mktemp("mt")), cfg,
                       content_col="content", id_col="doc_id")


def _docs_with_any(terms):
    ts = set(terms)
    return {int(r.doc_id) for _, r in DOCS.iterrows()
            if ts & set(r.content.split())}


# --- expansion --------------------------------------------------------------

def test_prefix_expansion(spark, midx):
    got = sorted(r.term for r in
                 expand_frame(spark, midx, PrefixQuery("col")).collect())
    assert got == [t for t in VOCAB if t.startswith("col")]


def test_range_expansion_bounds(spark, midx):
    q = TermRangeQuery("bold", "colt", include_lower=True,
                       include_upper=False)
    got = sorted(r.term for r in expand_frame(spark, midx, q).collect())
    assert got == [t for t in VOCAB if "bold" <= t < "colt"]
    open_q = TermRangeQuery(None, "bolt")
    got = sorted(r.term for r in expand_frame(spark, midx, open_q).collect())
    assert got == [t for t in VOCAB if t <= "bolt"]


@pytest.mark.parametrize("pattern", ["co?l*", "*old", "b*", "c*o*r",
                                     "a.b", "c-d", "under?score", "*"])
def test_wildcard_matches_python_re(spark, midx, pattern):
    rx = re.compile("^" + wildcard_to_regex(pattern) + "$")
    got = sorted(r.term for r in
                 expand_frame(spark, midx, WildcardQuery(pattern)).collect())
    assert got == [t for t in VOCAB if rx.match(t)]


def test_wildcard_escape(spark, midx):
    # escaped * is a literal — matches nothing in this vocab
    got = expand_frame(spark, midx, WildcardQuery(r"co\*")).collect()
    assert got == []
    # a.b: the dot is literal in wildcard syntax, not regex-any
    got = sorted(r.term for r in
                 expand_frame(spark, midx, WildcardQuery("a.b")).collect())
    assert got == ["a.b"]


def test_regexp_expansion(spark, midx):
    got = sorted(r.term for r in
                 expand_frame(spark, midx,
                              RegexpQuery("b(old|olt)")).collect())
    assert got == ["bold", "bolt"]


def test_too_many_clauses(spark, midx):
    with pytest.raises(ValueError, match="TooManyClauses"):
        expand_terms(spark, midx, PrefixQuery(""), max_clause_count=3)
    assert len(expand_terms(spark, midx, PrefixQuery(""))) == len(VOCAB)
    assert MAX_CLAUSE_COUNT == 1024


# --- OSA distance (transpositions=true automaton accept set) ---------------

def test_osa_known_cases():
    assert osa_distance("blod", "bold") == 1      # one transposition
    assert osa_distance("bold", "bold") == 0
    assert osa_distance("ca", "abc") == 3         # OSA ≠ full Damerau (2)
    assert osa_distance("abc", "acb") == 1
    assert osa_distance("ab", "ba") == 1


def _levenshtein_ref(a, b):
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_osa_properties_fuzz():
    rng = random.Random(7)
    for _ in range(500):
        a = "".join(rng.choice("abc") for _ in range(rng.randint(0, 7)))
        b = "".join(rng.choice("abc") for _ in range(rng.randint(0, 7)))
        osa, lev = osa_distance(a, b), _levenshtein_ref(a, b)
        assert osa <= lev <= 2 * osa or (osa == lev == 0)
        assert osa == osa_distance(b, a)
        assert osa_distance(a, b, cap=1) in (osa, 2) if osa <= 1 else True


# --- fuzzy expansion --------------------------------------------------------

def test_fuzzy_classic_boosts_and_order(spark, midx):
    got = expand_fuzzy(spark, midx,
                       FuzzyQuery("bold", max_edits=1, transpositions=False))
    exp = []
    for t in VOCAB:
        ed = _levenshtein_ref(t, "bold")
        if ed <= 1:
            boost = 1.0 if ed == 0 else float(
                np.float32(1.0) - np.float32(ed)
                / np.float32(min(len(t), 4)))
            exp.append((t, boost))
    exp.sort(key=lambda tb: (-tb[1], tb[0]))
    assert got == exp
    assert got[0] == ("bold", 1.0)  # exact match boosts 1.0 first


def test_fuzzy_transpositions_accepts_osa1(spark, midx):
    # 'blod' → 'bold' is one transposition: OSA accepts at maxEdits=1,
    # classic needs 2
    assert expand_fuzzy(spark, midx, FuzzyQuery("blod", max_edits=1)) == \
        [("bold", 0.75)]
    assert expand_fuzzy(
        spark, midx,
        FuzzyQuery("blod", max_edits=1, transpositions=False)) == []


def test_fuzzy_prefix_length(spark, midx):
    got = expand_fuzzy(spark, midx,
                       FuzzyQuery("bolt", max_edits=1, prefix_length=2))
    assert [t for t, _ in got] == ["bolt", "bold"]  # cold/hold prefix-fail
    nop = expand_fuzzy(spark, midx,
                       FuzzyQuery("bolt", max_edits=1, prefix_length=0))
    # cold is 2 edits from bolt (c→b, d→t) — out at max_edits=1
    assert {"colt", "bold", "bolt"} <= {t for t, _ in nop}
    assert "cold" not in {t for t, _ in nop}


def test_fuzzy_max_expansions_selection(spark, midx):
    full = expand_fuzzy(spark, midx,
                        FuzzyQuery("bold", max_edits=2,
                                   transpositions=False))
    cut = expand_fuzzy(spark, midx,
                       FuzzyQuery("bold", max_edits=2, transpositions=False,
                                  max_expansions=3))
    assert cut == full[:3]  # keeps the (boost desc, term asc) head


def test_facade_mixed_typed_batch(spark, midx):
    from pim_lucene_spark import (FullTextIndex, FuzzyQuery, PhraseQuery,
                                  PrefixQuery)
    idx = FullTextIndex(spark, midx)
    res = idx.query([
        (0, PhraseQuery("bold")),
        (1, PrefixQuery("col", boost=2.0)),      # constant-score rewrite
        (2, FuzzyQuery("blod", max_edits=1)),    # scoring rewrite
    ], k=10).toPandas()
    assert set(res.qid) == {0, 1, 2}
    mt = res[res.qid.isin([1, 2])]
    assert mt.freq.isna().all()                  # multiterm: no freq
    assert (res[res.qid == 1].score == 2.0).all()


# --- rewrites ---------------------------------------------------------------

def test_constant_score_docs_and_boost(spark, midx):
    res = search_multiterm(
        spark, midx, [(1, PrefixQuery("col", boost=2.5))],
        k=100).toPandas()
    terms = [t for t in VOCAB if t.startswith("col")]
    assert set(res.doc_id) == _docs_with_any(terms)
    assert (res.score == 2.5).all()


def test_constant_score_topk_docid_order(spark, midx):
    res = search_multiterm(spark, midx, [(1, PrefixQuery("b"))],
                           k=2).toPandas()
    all_docs = sorted(_docs_with_any(
        [t for t in VOCAB if t.startswith("b")]))
    assert sorted(res.doc_id) == all_docs[:2]


def test_constant_score_fuzzy_and_batch(spark, midx):
    res = search_multiterm(
        spark, midx,
        [(1, FuzzyQuery("blod", max_edits=1)),
         (2, WildcardQuery("co?l*"))], k=100).toPandas()
    assert set(res[res.qid == 1].doc_id) == _docs_with_any(["bold"])
    assert set(res[res.qid == 2].doc_id) == _docs_with_any(
        ["cool", "cooler", "coolest"])


def test_scoring_boolean_sums_float32(spark, midx):
    res = search_multiterm(spark, midx, [(0, PrefixQuery("col"))],
                           k=100, rewrite="scoring_boolean").toPandas()
    terms = [t for t in VOCAB if t.startswith("col")]
    per_term = {}
    for i, t in enumerate(terms):
        r = search(spark, midx, [(i, t)], k=100).toPandas()
        for d, s in zip(r.doc_id, r.score):
            per_term.setdefault(int(d), []).append(np.float64(s))
    assert set(res.doc_id) == set(per_term)
    for d, s in zip(res.doc_id, res.score):
        acc = np.float64(0.0)
        for x in per_term[int(d)]:  # ord order == sorted-term order
            acc = acc + x
        assert np.float32(acc) == np.float32(s)


def test_scoring_boolean_applies_boosts(spark, midx):
    plain = search_multiterm(spark, midx, [(0, PrefixQuery("colt"))],
                             k=10, rewrite="scoring_boolean").toPandas()
    boosted = search_multiterm(
        spark, midx, [(0, PrefixQuery("colt", boost=3.0))],
        k=10, rewrite="scoring_boolean").toPandas()
    assert set(plain.doc_id) == set(boosted.doc_id) != set()
    pm = dict(zip(plain.doc_id, plain.score))
    for d, s in zip(boosted.doc_id, boosted.score):
        assert s == pytest.approx(3.0 * pm[d], rel=1e-6)


def test_empty_expansion_and_empty_batch(spark, midx):
    assert search_multiterm(spark, midx,
                            [(0, PrefixQuery("zzz"))], k=10).count() == 0
    assert search_multiterm(spark, midx, [], k=10).count() == 0
    assert search_multiterm(
        spark, midx, [(0, PrefixQuery("zzz"))], k=10,
        rewrite="scoring_boolean").count() == 0


def test_fuzzy_validation():
    with pytest.raises(ValueError, match="max_edits"):
        FuzzyQuery("x", max_edits=3)
    with pytest.raises(ValueError, match="maxExpansions"):
        FuzzyQuery("x", max_expansions=0)
