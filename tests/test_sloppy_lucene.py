"""Golden fixtures transliterated from the reference's own sloppy-phrase
tests (``TestPimPhraseQuery.java``) plus hand-traced freq pins against
``SloppyPhraseMatcher.java:174-206``.

The reference's position-increment gap (100) between repeated field
instances is replicated with 100 unique filler tokens — match/no-match
and matchLength semantics are position-arithmetic and carry over exactly.
"""

import numpy as np
import pandas as pd
import pytest

from pim_lucene_spark.functions.sloppy import sloppy_doc_freq
from pim_lucene_spark.plans.router import brute_force_search


def _freq(doc: str, query: str, slop: int) -> float:
    toks = doc.split()
    terms = query.split()
    pls = [np.array([i for i, x in enumerate(toks) if x == t],
                    dtype=np.int64) for t in terms]
    if any(len(p) == 0 for p in pls):
        return 0.0
    return sloppy_doc_freq(pls, terms, slop)


_GAP = " ".join(f"gap{i}" for i in range(100))
# TestPimPhraseQuery.java:114-117 — field "repeated", two instances with
# positionIncrementGap 100
WRAPPED = ("this is a repeated field - first part " + _GAP
           + " second part of a repeated field")
# TestPimPhraseQuery.java:122-127 — field "nonexist", same doc twice
NONEXIST = "phrase exist notexist exist found"
# TestPimPhraseQuery.java:118 — field "palindrome"
PALINDROME = "one two three two one"


def test_wrapped_phrase_slop_100_matches_99_not():
    """TestPimPhraseQuery.testWrappedPhrase (java:486-496)."""
    assert _freq(WRAPPED, "first part second part", 100) > 0.0
    assert _freq(WRAPPED, "first part second part", 99) == 0.0


def test_nonexisting_phrase_fixtures():
    """TestPimPhraseQuery.testNonExistingPhrase (java:500-529)."""
    # phrase without repetitions that exists
    assert _freq(NONEXIST, "phrase notexist found", 2) > 0.0
    # phrase with repetitions that exists
    assert _freq(NONEXIST, "phrase exist exist", 1) > 0.0
    # repeated term with too few occurrences -> no match at any slop
    assert _freq(NONEXIST, "phrase notexist phrase", 1000) == 0.0
    assert _freq(NONEXIST, "phrase exist exist exist", 1000) == 0.0


def test_palindrome2_fixtures():
    """TestPimPhraseQuery.testPalyndrome2 (java:538-594)."""
    assert _freq("one two three four five", "two three", 0) == 1.0
    # sloppy scorer scores the same when slop does not matter
    assert _freq("one two three four five", "two three", 2) == 1.0
    assert _freq(PALINDROME, "two three", 2) > 0.0
    assert _freq(PALINDROME, "three two", 2) > 0.0


def test_palindrome3_fixtures():
    """TestPimPhraseQuery.testPalyndrome3 (java:600-660)."""
    assert _freq("one two three four five", "one two three", 0) == 1.0
    assert _freq("one two three four five", "one two three", 4) == 1.0
    assert _freq(PALINDROME, "one two three", 4) > 0.0
    assert _freq(PALINDROME, "three two one", 4) > 0.0


def test_hand_traced_freq_pins():
    """Exact freqs hand-traced through the pq traversal."""
    # pop two(pos1): advance to 3 > next(1) -> match len 0 (w 1.0);
    # pop three(pos1): ml = end(3)-1 = 2, exhaust -> w 1/3
    assert _freq(PALINDROME, "two three", 2) == pytest.approx(1 + 1 / 3)
    # reversed: three@2 adj 2, two@{1,3} adj {0,2}: pop two(0) ml 2;
    # advance two -> 2, not > next(2), ml 0; exhaust -> one match w 1.0
    assert _freq(PALINDROME, "three two", 2) == 1.0
    # greedy emits one match per lead position of ANY term
    assert _freq("a a b", "a b", 1) == 1.0
    # slop 0 degenerates to the exact matcher's count, repeats included
    assert _freq("a a a", "a a", 0) == 2.0
    assert _freq(NONEXIST, "phrase exist exist", 1) == 0.5
    assert _freq(WRAPPED, "first part second part", 100) == \
        pytest.approx(1.0 / 101.0)


def test_wrapped_phrase_end_to_end(spark):
    """The java:486-496 fixture through the distributed fallback scan."""
    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [0, 1],
        "content": [WRAPPED, "first part elsewhere second half"],
    }))
    hits100 = brute_force_search(docs, [(0, "first part second part")],
                                 k=10, slop=100,
                                 precision="float64").toPandas()
    assert hits100.doc_id.tolist() == [0]
    hits99 = brute_force_search(docs, [(0, "first part second part")],
                                k=10, slop=99,
                                precision="float64").toPandas()
    assert len(hits99) == 0
