"""Golden fixtures from the reference test suite, run against the pure model.

Transliterated expectations from ``TestPimIndexSearcher.java`` (see
FIXTURES.md).  The Spark engine is separately differential-tested against
this model; these tests pin the model itself to the reference goldens.
"""

import numpy as np
import pandas as pd
import pytest

from pim_lucene_spark.model import BruteForceModel, phrase_freq

# Fixture 1 — colors (TestPimIndexSearcher.java:77-93)
FIELD1 = pd.DataFrame({
    "doc_id": [0, 1, 2],
    "content": ["red black yellow", "yellow green blue", "black blue pink"],
})
FIELD2 = pd.DataFrame({
    "doc_id": [0, 1, 2],
    "content": ["red orange white orange red", "green red", "white brown"],
})


@pytest.mark.parametrize("table,term,expected", [
    ("f1", "yellow", [(0, 1), (1, 1)]),
    ("f1", "green", [(1, 1)]),
    ("f2", "green", [(1, 1)]),
    ("f2", "orange", [(0, 2)]),
    ("f2", "yellow", []),
])
def test_colors_term_search(table, term, expected):
    model = BruteForceModel(FIELD1 if table == "f1" else FIELD2)
    res = model.search_term(term)
    got = list(zip(res.doc_id.astype(int), res.freq.astype(int)))
    assert sorted(got) == sorted(expected)


# Fixture 2 — overlap counting (TestPimIndexSearcher.java:508-547)
OVERLAP_DOC = "blah blah blah blah blah youpi blah blah blah"


@pytest.mark.parametrize("phrase,expected_freq", [
    ("blah blah", 6),
    ("blah blah blah", 4),
    ("blah youpi blah", 1),
])
def test_overlap_phrase_freq(phrase, expected_freq):
    assert phrase_freq(OVERLAP_DOC.split(), phrase.split()) == expected_freq
    model = BruteForceModel(pd.DataFrame({"doc_id": [0], "content": [OVERLAP_DOC]}))
    res = model.search_phrase(phrase)
    assert list(zip(res.doc_id, res.freq)) == [(0, expected_freq)]


# Fixture 5 — phrase-contract regressions (TestPimPhraseQuery.java:112-127)
def test_slop_suite_exact_phrases():
    docs = pd.DataFrame({
        "doc_id": [0],
        "content": ["one two three four five"],
    })
    model = BruteForceModel(docs)
    assert len(model.search_phrase("four five")) == 1
    assert len(model.search_phrase("two one")) == 0

    palindrome = BruteForceModel(pd.DataFrame({
        "doc_id": [0], "content": ["one two three two one"]}))
    assert len(palindrome.search_phrase("two one")) == 1  # positions 3,4
    assert len(palindrome.search_phrase("one two")) == 1

    nonexist = BruteForceModel(pd.DataFrame({
        "doc_id": [1, 2],
        "content": ["phrase exist notexist exist found",
                    "phrase exist notexist exist found"],
    }))
    assert len(nonexist.search_phrase("phrase notexist")) == 0
    # slop=0 exact semantics: "exist exist" never adjacent in these docs.
    # (The reference's 2-hit expectations at TestPimPhraseQuery.java:510-514
    # use slop=1, which the indexed path delegates to CPU Lucene,
    # PimPhraseQuery.java:77-82 — out of scope.)
    assert len(nonexist.search_phrase("exist exist")) == 0
    res = nonexist.search_phrase("phrase exist")
    assert sorted(res.doc_id.tolist()) == [1, 2]


def test_bm25_scores_float32_and_ordering():
    # hand-checkable BM25 on the colors fixture, float32 Lucene tree
    model = BruteForceModel(FIELD2)
    res = model.search_phrase("red")
    # doc1 "green red": tf=1, len=2; doc0: tf=2, len=5
    assert res.doc_id.tolist()[0] in (0, 1)
    # exact expected score via the same expression tree, independently coded
    import math
    N, n = 3, 2
    idf = np.float32(math.log(1 + (N - n + 0.5) / (n + 0.5)))
    avgdl = np.float32((5 + 2 + 2) / 3.0)
    for _, row in res.iterrows():
        dl = {0: 5, 1: 2}[int(row.doc_id)]
        cache = np.float32(1.0) / (np.float32(1.2) * ((np.float32(1) - np.float32(0.75))
                 + (np.float32(0.75) * np.float32(dl)) / avgdl))
        f = np.float32(row.freq)
        expected = idf - idf / (np.float32(1) + f * cache)
        assert np.float32(row.score) == expected


def test_missing_term_short_circuits():
    model = BruteForceModel(FIELD1)
    assert model.search_phrase("red nosuchterm").empty
