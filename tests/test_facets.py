"""Faceted search (operators/facets.py): kernel-counted ordinals vs a
brute-force pandas oracle, plus the plan property the design exists for
(only (qid, ordinal, count) rows leave the kernel)."""

import numpy as np
import pandas as pd
import pytest

from pim_lucene_spark.config import IndexConfig
from pim_lucene_spark.operators.facets import (build_facet_index,
                                               facet_counts)
from pim_lucene_spark.operators.index_build import build_index
from pim_lucene_spark.plans.boolean import BooleanQuery
from pim_lucene_spark.plans.query import PhraseQuery

VOCAB = ["red", "green", "blue", "apple", "house", "sky", "the", "fast"]
CATS = ["news", "blog", "wiki", None, "docs"]


def _corpus(n=150, seed=11):
    rng = np.random.default_rng(seed)
    rows, cats = [], []
    for i in range(n):
        words = list(rng.choice(VOCAB, size=rng.integers(4, 14)))
        if i % 4 == 0:
            words += ["the", "fast"]
        rows.append(" ".join(words))
        cats.append(CATS[int(rng.integers(0, len(CATS)))])
    return pd.DataFrame({"doc_id": range(n), "content": rows,
                         "category": cats})


@pytest.fixture(scope="module")
def fidx(spark, tmp_path_factory):
    pdf = _corpus()
    cfg = IndexConfig(num_partitions=4, num_segments=2, build_chunks=1)
    m = build_index(spark, spark.createDataFrame(pdf),
                    str(tmp_path_factory.mktemp("facets")), cfg,
                    content_col="content", id_col="doc_id",
                    meta_cols=["category"])
    build_facet_index(spark, m, "category")
    return m, pdf


def _brute(pdf, match_fn, top_n=10):
    hits = pdf[pdf.content.map(match_fn)]
    cnt = (hits[hits.category.notna()].groupby("category").size()
           .reset_index(name="n"))
    cnt = cnt.sort_values(["n", "category"],
                          ascending=[False, True]).head(top_n)
    return list(cnt.itertuples(index=False, name=None))


def test_facet_counts_match_bruteforce(spark, fidx):
    m, pdf = fidx
    queries = [
        (0, "red"),                                       # term
        (1, PhraseQuery("the fast")),                     # phrase
        (2, BooleanQuery(must=["red"], should=["sky"])),  # boolean
        (3, "zzz_absent red"),                            # partial absent
    ]
    got = (facet_counts(spark, m, queries, "category", top_n=10)
           .toPandas().sort_values(["qid", "n", "value"],
                                   ascending=[True, False, True]))
    toks = {i: set(c.split()) for i, c in enumerate(pdf.content)}

    def match(qid):
        if qid == 0:
            return lambda c: "red" in c.split()
        if qid == 1:
            return lambda c: "the fast" in c
        if qid == 2:
            return lambda c: "red" in c.split()
        return lambda c: False
    for qid in (0, 1, 2, 3):
        exp = _brute(pdf, match(qid))
        sub = got[got.qid == qid]
        assert list(zip(sub.value, sub.n)) == [(v, n) for v, n in exp], qid


def test_facet_absent_everything_empty(spark, fidx):
    m, _ = fidx
    out = facet_counts(spark, m, [(9, "zzz_absent")], "category")
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["qid", "value", "n"]


def test_facet_respects_deletes(spark, fidx, tmp_path):
    """Deleted docs never count toward a bucket (live-masked leaves)."""
    import shutil

    from pim_lucene_spark.operators.deletes import write_deletes
    from pim_lucene_spark.manifest import IndexManifest
    m, pdf = fidx
    dst = str(tmp_path / "delfacet")
    shutil.copytree(m.index_dir, dst)
    md = write_deletes(spark, IndexManifest.load(dst),
                       [int(i) for i in pdf.doc_id[::3]])
    alive = pdf[pdf.doc_id % 3 != 0]
    got = (facet_counts(spark, md, [(0, "red")], "category")
           .toPandas().sort_values(["n", "value"],
                                   ascending=[False, True]))
    exp = _brute(alive, lambda c: "red" in c.split())
    assert list(zip(got.value, got.n)) == [(v, n) for v, n in exp]


def test_facet_top_n_and_tie_order(spark, fidx):
    m, pdf = fidx
    got = (facet_counts(spark, m, [(0, "red")], "category", top_n=2)
           .toPandas())
    assert len(got) == 2
    full = _brute(pdf, lambda c: "red" in c.split())
    assert list(zip(got.sort_values(["n", "value"],
                                    ascending=[False, True]).value,
                    got.sort_values(["n", "value"],
                                    ascending=[False, True]).n)) \
        == [(v, n) for v, n in full[:2]]


def test_facet_local_matches_distributed(spark, fidx):
    """Serving-path facets (no Spark job) == the distributed plan."""
    from pim_lucene_spark.operators.facets import facet_counts_local
    m, _ = fidx
    queries = [(0, "red"), (1, PhraseQuery("the fast")),
               (2, BooleanQuery(must=["red"], should=["sky"]))]
    a = (facet_counts(spark, m, queries, "category", top_n=10)
         .toPandas().sort_values(["qid", "value"]).reset_index(drop=True))
    b = (facet_counts_local(m, queries, "category", top_n=10)
         .sort_values(["qid", "value"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(a.astype(b.dtypes.to_dict()), b)


# --- DrillDownQuery / DrillSideways ------------------------------------------

def test_drill_down_matches_bruteforce(spark, fidx):
    """Base query AND facet constraint: hits = base matches whose
    category is in the drill set, scores = the base clause's scores."""
    from pim_lucene_spark.operators.facets import drill_down
    from pim_lucene_spark.plans.boolean import search_boolean
    m, pdf = fidx
    got = (drill_down(spark, m,
                      [(0, "red", {"category": ["news", "blog"]})],
                      k=1000, precision="float64").toPandas())
    base = (search_boolean(spark, m,
                           [(0, BooleanQuery(must=["red"]))],
                           k=1000, precision="float64").toPandas()
            .set_index("doc_id").score)
    cat = pdf.set_index("doc_id").category
    exp_docs = {d for d in base.index if cat[d] in ("news", "blog")}
    assert set(got.doc_id) == exp_docs
    for _, r in got.iterrows():
        assert r.score == base[r.doc_id]


def test_drill_down_pure_browse(spark, fidx):
    """base=None: every live doc with the facet value, score 0."""
    from pim_lucene_spark.operators.facets import drill_down
    m, pdf = fidx
    got = (drill_down(spark, m, [(0, None, {"category": ["wiki"]})],
                      k=10_000).toPandas())
    exp = set(pdf.doc_id[pdf.category == "wiki"])
    assert set(got.doc_id) == exp
    assert (got.score == 0.0).all()


def test_drill_down_multi_dim_and_unknown_value(spark, fidx):
    from pim_lucene_spark.operators.facets import drill_down
    m, pdf = fidx
    # unknown value in the drill set is just an empty disjunct
    got = (drill_down(spark, m,
                      [(0, "red", {"category": ["news", "zzz_nope"]})],
                      k=1000).toPandas())
    cat = pdf.set_index("doc_id").category
    assert all(cat[d] == "news" for d in got.doc_id)
    # all-unknown values -> no hits
    got2 = (drill_down(spark, m, [(1, "red", {"category": ["zzz"]})],
                       k=1000).toPandas())
    assert len(got2) == 0


def test_drill_sideways_counts(spark, fidx):
    """Per-dim counts with that dim's own constraint removed equal the
    plain facet counts of the base query."""
    from pim_lucene_spark.operators.facets import drill_sideways
    m, pdf = fidx
    hits, side = drill_sideways(
        spark, m, [(0, "red", {"category": ["news"]})],
        dims=["category"], k=1000, top_n=10)
    cat = pdf.set_index("doc_id").category
    hd = hits.toPandas()
    assert all(cat[d] == "news" for d in hd.doc_id)
    counts = side["category"].toPandas()
    exp = _brute(pdf, lambda c: "red" in c.split())
    got_pairs = list(zip(
        counts.sort_values(["n", "value"],
                           ascending=[False, True]).value,
        counts.sort_values(["n", "value"],
                           ascending=[False, True]).n))
    assert got_pairs == [(v, n) for v, n in exp]


def test_drill_down_serving_matches_distributed(spark, fidx):
    from pim_lucene_spark.operators.facets import drill_down
    from pim_lucene_spark.plans.compound import search_compound_local
    from pim_lucene_spark.plans.query import FacetFilterQuery
    m, _ = fidx
    q = BooleanQuery(must=["red"],
                     filter=[FacetFilterQuery("category",
                                              ("news", "blog"))])
    a = (drill_down(spark, m,
                    [(0, "red", {"category": ["news", "blog"]})],
                    k=10).toPandas()
         .sort_values("doc_id").reset_index(drop=True))
    b = (search_compound_local(m, [(0, q)], k=10)
         .sort_values("doc_id").reset_index(drop=True))
    import pandas as pd
    pd.testing.assert_frame_equal(a.astype(b.dtypes.to_dict()), b)


def test_drill_down_random_fuzz(spark, fidx):
    """Random (base term/phrase, drill value subsets, deletes-free)
    drill-downs vs a pandas brute force over the corpus."""
    import numpy as np

    from pim_lucene_spark.operators.facets import drill_down
    m, pdf = fidx
    rng = np.random.default_rng(13)
    cats = [c for c in CATS if c is not None]
    bases = ["red", "green", "blue", "the fast", "apple house", None]
    queries, exps = [], {}
    for qid in range(10):
        base = bases[int(rng.integers(0, len(bases)))]
        vals = list(rng.choice(cats, size=int(rng.integers(1, 4)),
                               replace=False))
        queries.append((qid, base, {"category": vals}))
        if base is None:
            match = pdf.content.map(lambda c: True)
        elif " " in base:
            match = pdf.content.map(lambda c, b=base: b in c)
        else:
            match = pdf.content.map(lambda c, b=base: b in c.split())
        exps[qid] = set(pdf.doc_id[match
                                   & pdf.category.isin(vals)])
    got = drill_down(spark, m, queries, k=10_000).toPandas()
    for qid in range(10):
        assert set(got[got.qid == qid].doc_id) == exps[qid], qid


def test_count_matches_drill_down(spark, fidx):
    """IndexSearcher.count over a drill-down boolean (matchall base +
    facet FILTER) rides the count-only compound kernel."""
    from pim_lucene_spark.plans.query import (FacetFilterQuery,
                                              MatchAllDocsQuery)
    from pim_lucene_spark.plans.suggest import count_matches
    m, pdf = fidx
    q = BooleanQuery(must=[MatchAllDocsQuery()],
                     filter=[FacetFilterQuery("category", ("news",))])
    got = (count_matches(spark, m, [(0, q)])
           .toPandas().set_index("qid").n_hits)
    assert int(got[0]) == int((pdf.category == "news").sum())


def test_facade_routes_bare_facet_filter(spark, fidx):
    """FullTextIndex.query and query_local route a bare
    FacetFilterQuery as pure browse (constant score 0), row-identical."""
    from pim_lucene_spark.index import FullTextIndex
    from pim_lucene_spark.plans.query import FacetFilterQuery
    m, pdf = fidx
    idx = FullTextIndex(spark, m)
    q = FacetFilterQuery("category", ("wiki",))
    a = (idx.query([(5, q)], k=10_000).toPandas()
         [["qid", "doc_id", "score"]]
         .sort_values("doc_id").reset_index(drop=True))
    exp = set(pdf.doc_id[pdf.category == "wiki"])
    assert set(a.doc_id) == exp and (a.score == 0.0).all()
    b = (idx.query_local([(5, q)], k=10_000)
         [["qid", "doc_id", "score"]]
         .sort_values("doc_id").reset_index(drop=True))
    import pandas as pd
    pd.testing.assert_frame_equal(
        a.astype(b.dtypes.to_dict()), b.reset_index(drop=True))


def test_drill_down_local_matches_distributed(spark, fidx):
    from pim_lucene_spark.operators.facets import (drill_down,
                                                   drill_down_local)
    m, _ = fidx
    qs = [(0, "red", {"category": ["news", "blog"]}),
          (1, None, {"category": ["wiki"]})]
    a = (drill_down(spark, m, qs, k=10).toPandas()
         .sort_values(["qid", "doc_id"]).reset_index(drop=True))
    b = (drill_down_local(m, qs, k=10)
         .sort_values(["qid", "doc_id"]).reset_index(drop=True))
    import pandas as pd
    pd.testing.assert_frame_equal(a.astype(b.dtypes.to_dict()), b)
