"""Per-partition size guard + partition-count advisor (48 MiB/DPU
analogue, ``DpuSystemExecutor.java:40``) and the ShardedServer worker
residency check."""

import warnings

import numpy as np
import pandas as pd
import pytest

from pim_lucene_spark.config import IndexConfig
from pim_lucene_spark.operators.index_build import (advise_num_partitions,
                                                    build_index)


@pytest.fixture(scope="module")
def gidx(spark, tmp_path_factory):
    rng = np.random.default_rng(3)
    vocab = ["red", "blue", "fast", "slow", "data", "rows"]
    docs = pd.DataFrame({
        "doc_id": range(200),
        "content": [" ".join(rng.choice(vocab, size=20))
                    for _ in range(200)],
    })
    return build_index(spark, spark.createDataFrame(docs),
                       str(tmp_path_factory.mktemp("guard")),
                       IndexConfig(4, 2, build_chunks=1),
                       content_col="content", id_col="doc_id")


def test_advisor_from_manifest(gidx):
    per = gidx.metrics["per_partition"]
    worst = max(v["bytes_compressed"] for v in per.values())
    # generous budget → current count suffices
    assert advise_num_partitions(gidx, budget_bytes=worst + 1) == 4
    # half the worst partition → double (ceil) the partition count
    assert advise_num_partitions(gidx, budget_bytes=max(worst // 2, 1)) \
        >= 8
    with pytest.raises(ValueError):
        advise_num_partitions(gidx, corpus_tokens=10)
    with pytest.raises(ValueError):
        advise_num_partitions(gidx, budget_bytes=0)


def test_advisor_pre_build_estimate():
    # 100 TB-ish corpus: 20e12 tokens * 4 B/token / 48 MiB ≈ 1.6M parts
    p = advise_num_partitions(corpus_tokens=20 * 10 ** 12,
                              budget_bytes=48 << 20)
    assert p == -(-20 * 10 ** 12 * 4 // (48 << 20))
    assert advise_num_partitions(corpus_tokens=10) == 1


def test_sharded_server_residency_warn(gidx):
    """A worker whose shards outgrow the resident-rows budget gets an
    advisory warning naming the worker count that would fit."""
    from pim_lucene_spark.operators import search as S
    from pim_lucene_spark.serving import ShardedServer

    old = S._LOCAL_ROWS_MAX
    try:
        S._LOCAL_ROWS_MAX = 16  # absurdly small budget → must warn
        with warnings.catch_warnings(record=True) as rec:
            warnings.simplefilter("always")
            srv = ShardedServer(gidx, num_workers=2, mode="shard")
            srv._check_residency()
        msgs = [str(w.message) for w in rec]
        assert any("residency" in m for m in msgs), msgs
    finally:
        S._LOCAL_ROWS_MAX = old
    # sane budget: no warning
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        ShardedServer(gidx, num_workers=2, mode="shard")._check_residency()
    assert not [w for w in rec if "residency" in str(w.message)]
