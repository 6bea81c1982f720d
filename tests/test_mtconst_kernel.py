"""Constant-score multiterm clauses in the compound kernel (round 5).

Lucene's in-boolean rewrite for prefix/wildcard/range/regexp is
CONSTANT_SCORE; the kernel now hosts it when the expansion (from the
resident term dictionary, pyarrow pushdown) fits the cap — the clause's
match-set union never leaves its partition, killing the former k=None
``search_multiterm`` frame on these routes.  Over-wide expansions keep
the distributed constant-score path (never a term list)."""

import pandas as pd
import pytest

from pim_lucene_spark.config import IndexConfig
from pim_lucene_spark.operators.index_build import build_index
from pim_lucene_spark.plans.boolean import BooleanQuery, search_boolean
from pim_lucene_spark.plans.compound import (ExpansionTooWide,
                                             clause_kernelable,
                                             search_compound_local)
from pim_lucene_spark.plans.multiterm import (PrefixQuery, RegexpQuery,
                                              TermRangeQuery,
                                              WildcardQuery,
                                              expand_const_local)

DOCS = pd.DataFrame({
    "doc_id": range(12),
    "content": ["red apple", "applet green", "apply now", "red plum",
                "apple red pie", "sky blue", "apricot jam", "ripe apple",
                "red sun", "blue dawn", "apple apple", "plum red"],
})

BATCH = [
    (0, BooleanQuery(must=["red"], should=[PrefixQuery("ap", boost=2.0)])),
    (1, BooleanQuery(should=[WildcardQuery("*lu*")], must_not=["red"])),
    (2, BooleanQuery(must=[TermRangeQuery(lower="apple", upper="apricot",
                                          include_lower=True,
                                          include_upper=True)])),
    (3, BooleanQuery(must=[RegexpQuery("ap.l.*")], filter=["red"])),
]


@pytest.fixture(scope="module")
def midx(spark, tmp_path_factory):
    return build_index(spark, spark.createDataFrame(DOCS),
                       str(tmp_path_factory.mktemp("mtidx")),
                       IndexConfig(3, 2, build_chunks=1),
                       content_col="content", id_col="doc_id")


def test_expand_const_local_shapes(midx):
    assert expand_const_local(midx, PrefixQuery("ap")) == \
        ["apple", "applet", "apply", "apricot"]
    assert expand_const_local(midx, WildcardQuery("*lu*")) == \
        ["blue", "plum"]
    assert expand_const_local(midx, RegexpQuery("ap.l.*")) == \
        ["apple", "applet", "apply"]
    assert expand_const_local(
        midx, TermRangeQuery(lower="apple", upper="apricot",
                             include_lower=True,
                             include_upper=False)) == \
        ["apple", "applet", "apply"]
    # over-wide → None (caller keeps the distributed path)
    assert expand_const_local(midx, PrefixQuery(""), cap=3) is None


def test_mtconst_kernel_equals_join_and_serving(spark, midx):
    kern = (search_boolean(spark, midx, BATCH, k=6, plan="kernel")
            .toPandas().sort_values(["qid", "doc_id"])
            .reset_index(drop=True))
    join = (search_boolean(spark, midx, BATCH, k=6, plan="join")
            .toPandas().sort_values(["qid", "doc_id"])
            .reset_index(drop=True))
    pd.testing.assert_frame_equal(kern, join)
    loc = (search_compound_local(midx, BATCH, k=6)
           .sort_values(["qid", "doc_id"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(kern, loc.astype(kern.dtypes.to_dict()))
    assert len(kern) > 0


def test_routing_uses_expansion_probe(midx):
    mf = {"": midx}
    bq = BooleanQuery(must=[PrefixQuery("ap")])
    assert clause_kernelable(bq, manifests=mf)
    assert not clause_kernelable(bq)  # no manifests → join (old rule)
    # huge expansion: kernelable says no, spec build raises loudly
    from pim_lucene_spark.plans.multiterm import MAX_CLAUSE_COUNT
    assert expand_const_local(midx, PrefixQuery("ap"), cap=1) is None
    from pim_lucene_spark.plans.compound import _SpecBuilder
    import pim_lucene_spark.plans.multiterm as MT
    old = MT.MAX_CLAUSE_COUNT
    try:
        MT.MAX_CLAUSE_COUNT = 1
        b = _SpecBuilder(None, mf, "")
        with pytest.raises(ExpansionTooWide):
            b.bool_spec(0, BooleanQuery(must=[PrefixQuery("ap")]), "")
    finally:
        MT.MAX_CLAUSE_COUNT = old


def test_mtconst_honors_deletes(spark, tmp_path):
    from pim_lucene_spark.operators.deletes import write_deletes
    m = build_index(spark, spark.createDataFrame(DOCS),
                    str(tmp_path / "mtdel"),
                    IndexConfig(3, 2, build_chunks=1),
                    content_col="content", id_col="doc_id")
    m = write_deletes(spark, m, [0, 4])
    kern = (search_boolean(spark, m, BATCH, k=6, plan="kernel")
            .toPandas())
    join = (search_boolean(spark, m, BATCH, k=6, plan="join").toPandas())
    assert not set(kern.doc_id) & {0, 4}
    a = kern.sort_values(["qid", "doc_id"]).reset_index(drop=True)
    b = join.sort_values(["qid", "doc_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
