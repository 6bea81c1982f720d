"""Term suggestion (prefix autocomplete over the dictionary) and
IndexSearcher.count-style hit counting.
"""

import pandas as pd
import pytest

from pim_lucene_spark.config import IndexConfig
from pim_lucene_spark.operators.index_build import build_index
from pim_lucene_spark.plans.multiterm import PrefixQuery
from pim_lucene_spark.plans.suggest import count_matches, suggest_terms

DOCS = pd.DataFrame({
    "doc_id": range(5),
    "content": ["red apple pie apple", "applet reddish apple",
                "green apple", "red red red", "apricot jam"],
})


@pytest.fixture(scope="module")
def sidx(spark, tmp_path_factory):
    cfg = IndexConfig(num_partitions=2, num_segments=2, build_chunks=1)
    return build_index(spark, spark.createDataFrame(DOCS),
                       str(tmp_path_factory.mktemp("sugidx")), cfg,
                       content_col="content", id_col="doc_id")


def test_suggest_ranked_by_doc_freq(spark, sidx):
    got = suggest_terms(spark, sidx, "ap", k=10).toPandas()
    assert list(got.term) == ["apple", "applet", "apricot"]
    assert list(got.doc_freq) == [3, 1, 1]  # applet < apricot ties term asc
    assert got[got.term == "apple"].total_tf.iloc[0] == 4


def test_suggest_k_cut_and_total_tf_rank(spark, sidx):
    got = suggest_terms(spark, sidx, "re", k=1, by="total_tf").toPandas()
    assert list(got.term) == ["red"]  # total_tf 4 beats reddish 1


def test_suggest_no_completion(spark, sidx):
    assert suggest_terms(spark, sidx, "zz", k=5).count() == 0


def test_suggest_bad_rank_col(spark, sidx):
    with pytest.raises(ValueError, match="doc_freq"):
        suggest_terms(spark, sidx, "a", by="nope")


def test_count_matches_mixed(spark, sidx):
    got = (count_matches(spark, sidx, [
        (0, "apple"), (1, "red apple"), (2, PrefixQuery("ap")),
        (3, "nothere")]).toPandas().set_index("qid").n_hits)
    assert got[0] == 3            # docs 0,1,2
    assert got[1] == 1            # doc 0 only ("red apple" adjacent)
    assert got[2] == 4            # ap* in docs 0,1,2,4
    assert got[3] == 0            # zero-hit query still reported


def test_count_sloppy_phrase(spark, sidx):
    """A sloppy PhraseQuery must count sloppy matches (scan path), not
    silently fall back to exact adjacency."""
    from pim_lucene_spark.plans.query import PhraseQuery
    got = (count_matches(spark, sidx, [
        (0, PhraseQuery("red pie", slop=0)),
        (1, PhraseQuery("red pie", slop=1)),
    ]).toPandas().set_index("qid").n_hits)
    assert got[0] == 0            # 'red apple pie' is not adjacent
    assert got[1] == 1            # one gap allowed


def test_suggest_local_matches_spark(spark, sidx):
    from pim_lucene_spark.plans.suggest import suggest_terms_local
    for prefix, by in (("ap", "doc_freq"), ("re", "total_tf"),
                       ("zz", "doc_freq"), ("", "doc_freq")):
        a = (suggest_terms(spark, sidx, prefix, k=5, by=by).toPandas()
             .reset_index(drop=True))
        b = suggest_terms_local(sidx, prefix, k=5, by=by)
        pd.testing.assert_frame_equal(a, b.astype(a.dtypes.to_dict()))


def test_count_matches_boolean_and_dismax(spark, tmp_path):
    """IndexSearcher.count over compound queries: the count-only kernel
    equals len(full search result), only counts cross the exchange."""
    import numpy as np
    import pandas as pd

    from pim_lucene_spark.config import IndexConfig
    from pim_lucene_spark.operators.index_build import build_index
    from pim_lucene_spark.plans.boolean import BooleanQuery, search_boolean
    from pim_lucene_spark.plans.dismax import DisMaxQuery, search_dismax

    rng = np.random.default_rng(17)
    vocab = ["red", "green", "blue", "apple", "sky", "pie"]
    docs = pd.DataFrame({
        "doc_id": range(60),
        "content": [" ".join(rng.choice(vocab, size=rng.integers(3, 10)))
                    for _ in range(60)],
    })
    m = build_index(spark, spark.createDataFrame(docs),
                    str(tmp_path / "cntidx"),
                    IndexConfig(3, 2, build_chunks=1),
                    content_col="content", id_col="doc_id")
    batch = [
        (0, BooleanQuery(must=["red"], should=["apple"])),
        (1, BooleanQuery(should=["green", "sky"], min_should_match=2)),
        (2, DisMaxQuery(clauses=["pie", "blue"], tie=0.5)),
        (3, BooleanQuery(must=["red", "zzz_absent"])),
    ]
    got = dict(count_matches(spark, m, batch)
               .toPandas()[["qid", "n_hits"]].itertuples(index=False))
    assert got[0] == search_boolean(spark, m, [batch[0]],
                                    k=10 ** 6).count()
    assert got[1] == search_boolean(spark, m, [batch[1]],
                                    k=10 ** 6).count()
    assert got[2] == search_dismax(spark, m, [batch[2]],
                                   k=10 ** 6).count()
    assert got[3] == 0


# --- DirectSpellChecker (spell_suggest) -------------------------------------

def test_spell_suggest_basic(spark, sidx):
    """Misspelled absent terms get dictionary suggestions ranked by
    similarity desc, doc_freq desc, term asc."""
    from pim_lucene_spark.plans.suggest import spell_suggest
    got = spell_suggest(sidx, [(0, "aple"), (1, "redd")], num_sug=5)
    s0 = got[got.qid == 0]
    # aple -> apple (ed 1, sim 1-1/4), applet (ed 2) ...
    assert list(s0.suggestion)[0] == "apple"
    assert abs(s0.sim.iloc[0] - (1 - 1 / 4)) < 1e-12
    s1 = got[got.qid == 1]
    assert list(s1.suggestion)[0] == "red"  # ed 1 beats reddish ed 3>2


def test_spell_suggest_gates(spark, sidx):
    from pim_lucene_spark.plans.suggest import spell_suggest
    # present term: not_in_index mode suggests nothing
    assert len(spell_suggest(sidx, [(0, "apple")])) == 0
    # too short
    assert len(spell_suggest(sidx, [(0, "apl")])) == 0
    # always mode suggests even for present terms, excluding itself
    got = spell_suggest(sidx, [(0, "apple")], suggest_mode="always",
                        max_query_frequency=0)
    assert "apple" not in set(got.suggestion)
    assert "applet" in set(got.suggestion)


def test_spell_suggest_prefix_constraint(spark, sidx):
    """Candidates must share the first prefix_length chars: 'green'
    never suggests for a 'r'-prefixed misspelling."""
    from pim_lucene_spark.plans.suggest import spell_suggest
    got = spell_suggest(sidx, [(0, "rreen")], num_sug=10)
    assert "green" not in set(got.suggestion)


def test_spell_suggest_more_popular(spark, sidx):
    """more_popular mode requires candidate df > query-term df."""
    from pim_lucene_spark.plans.suggest import spell_suggest
    # applet (df 1) -> apple (df 3) qualifies; apricot (df 1) does not
    got = spell_suggest(sidx, [(0, "applet")],
                        suggest_mode="more_popular",
                        max_query_frequency=0)
    assert list(got.suggestion) == ["apple"]


def test_spell_suggest_bruteforce_differential(spark, sidx):
    """Full semantics vs a scalar brute force over the dictionary."""
    import itertools

    import numpy as np

    from pim_lucene_spark.plans.multiterm import osa_distance
    from pim_lucene_spark.plans.suggest import spell_suggest

    vocab = {"red": 3, "apple": 3, "pie": 1, "applet": 1, "reddish": 1,
             "green": 1, "apricot": 1, "jam": 1}
    queries = ["aple", "pple", "gren", "apricto", "redz", "jamm",
               "zzzz", "redi"]
    got = spell_suggest(sidx, list(enumerate(queries)), num_sug=3)
    for qid, q in enumerate(queries):
        rows = []
        for c, df in vocab.items():
            if c[:1] != q[:1] or c == q:
                continue
            ed = osa_distance(c[1:], q[1:])
            if ed == 0 or ed > 2:
                continue
            sim = 1.0 - ed / min(len(c), len(q))
            if sim < 0.5:  # DirectSpellChecker accuracy default
                continue
            rows.append((c, sim, df))
        rows.sort(key=lambda r: (-r[1], -r[2], r[0]))
        sub = got[got.qid == qid]
        assert list(sub.suggestion) == [r[0] for r in rows[:3]], q
        np.testing.assert_allclose(sub.sim.to_numpy(),
                                   [r[1] for r in rows[:3]])
