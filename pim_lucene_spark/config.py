"""Engine configuration.

Mirrors the knobs of the reference's ``PimConfig``
(``lucene/sandbox/src/java/org/apache/lucene/sandbox/pim/PimConfig.java:34-42``):
number of index partitions (reference: DPUs, default benchmark 2048) and
number of intra-partition segments (power of two <= 255, benchmark 16).
BM25 constants are fixed at k1=1.2, b=0.75
(``PimIndexWriter.java:112-113``, ``BM25Similarity.java:99-100``).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class IndexConfig:
    """Build/search configuration for the inverted index.

    num_partitions
        Horizontal index partitions.  Each partition holds a self-contained
        posting-list set for docs with ``doc_id % num_partitions == pid``
        (round-robin routing, ``PimIndexWriter.java:496-503``).  At cluster
        scale this is the shuffle width of the build job; locally keep it a
        small multiple of cores.
    num_segments
        Intra-partition docid-range stripes (reference "DPU segments",
        ``PimIndexWriter.java:86-95,152-153``).  Postings of a term are
        physically segmented so any stripe can be scanned independently —
        we keep them as skippable sub-blobs with per-stripe byte sizes and
        block-max scores.
    k1, b
        BM25 parameters (must stay 1.2/0.75 for reference score parity).
    build_chunks
        Checkpoint granularity of the build job: partitions are built in
        this many independent Spark jobs, each writing a completion marker;
        a resumed build skips completed chunks (Spark-native analogue of the
        DPU context save/restore, ``context_save_restore.c:17-68``).
    max_postings_per_stripe
        Skew bound: a term whose partition-local posting list exceeds this
        many docs is split into multiple stripe rows, each independently
        delta-decodable.  Round-robin doc routing already spreads hot terms
        evenly *across* partitions (``PimIndexWriter.java:496-503``); the
        stripe cap bounds the *within-partition* row size so hot keywords
        (``def``/``the``/...) never produce multi-GB Parquet cells or Arrow
        batches at 100 TB scale — the explicit skew handling the reference
        lacks (its README.md:46-48 names the imbalance an open problem).
    """

    num_partitions: int = 8
    num_segments: int = 4
    k1: float = 1.2
    b: float = 0.75
    build_chunks: int = 4
    tokenizer: str = "whitespace"  # whitespace | standard | code | english
    max_postings_per_stripe: int = 1 << 17
    # per-partition compressed-index size guard (the reference enforces
    # MAX_DPU_INDEX_SIZE = 48 MiB per DPU, DpuSystemExecutor.java:40).
    # 0 disables; when set, build_index warns with the offending partitions
    # and the num_partitions that would bring them under the bound.
    max_partition_bytes: int = 0

    def __post_init__(self) -> None:
        if self.num_partitions < 1:
            raise ValueError("num_partitions must be >= 1")
        if not (1 <= self.num_segments <= 255):
            # PimConfig.java:34-42 bounds segments to [1, 255]
            raise ValueError("num_segments must be in [1, 255]")
        if self.build_chunks < 1:
            raise ValueError("build_chunks must be >= 1")
        if self.max_postings_per_stripe < 1:
            raise ValueError("max_postings_per_stripe must be >= 1")


DOC_SCHEMA_COLUMNS = ("repo", "path", "commit", "lang", "content")
