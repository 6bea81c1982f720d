"""Posting-list codecs: delta+varint compressed docIDs, freqs and positions.

Semantics from the reference's per-DPU postings format
(``PimIndexWriter.java:826-916``):

- docIDs are stored **relative to the partition** (``relDoc = doc //
  num_partitions``, ``PimIndexWriter.java:898-901``) and delta-encoded
  within an intra-partition *segment*; the first doc of each segment is
  encoded as an absolute relDoc (the reference resets ``this.doc = 0`` at
  segment boundaries, ``PimIndexWriter.java:847-849``).
- a doc's segment is ``abs_doc // nb_doc_per_segment`` with
  ``nb_doc_per_segment = ceil(total_docs / num_segments)``
  (``PimIndexWriter.java:152-153,822-824``).
- positions are delta-encoded per doc starting from 0
  (``PimIndexWriter.java:859-868``).
- per (term, segment) byte sizes are kept as skip data so any segment can
  be decoded independently (``PimIndexWriter.java:826-849,903-916``); we
  extend the skip entry with per-segment ``max_tf`` and an admissible
  quantized max-score bound for block-max WAND pruning
  (``score_lower_bound.c:88-122``).

Two codecs:

``encode_columnar`` / ``decode_columnar``
    The engine's hot path.  Three separate varint streams per term (docs,
    freqs, positions) instead of the reference's interleaved stream — same
    delta+varint compression, but decodable with pure vectorized numpy
    (the interleaved sign-trick stream forces a sequential scan).  This is
    the Arrow/columnar-native re-expression, not a byte-level copy.

``encode_interleaved`` / ``decode_interleaved``
    A faithful model of the reference's interleaved per-doc stream with the
    freq sign trick (``PimIndexWriter.java:870-891``): freq>0 → positions
    byte-length in 1 raw byte, freq<0 → 2-byte big-endian short, freq==0 →
    real VInt(freq) + VLong(len).  Kept for format-parity tests.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from pim_lucene_spark.functions.varint import (
    decode_uvarints,
    encode_uvarints,
    uvarint_byte_lengths,
    zigzag_encode,
)

__all__ = [  # uvarint_byte_lengths re-exported: callers import it from here
    "uvarint_byte_lengths",
]


def segmented_delta(values: np.ndarray, seg_start_mask: np.ndarray) -> np.ndarray:
    """Gaps of ``values`` with the delta chain reset at each True in mask.

    Rows where ``seg_start_mask`` is True encode the absolute value
    (reference resets the previous doc to 0 at segment boundaries,
    ``PimIndexWriter.java:847-849``).
    """
    v = np.asarray(values, dtype=np.int64)
    if v.size == 0:
        return v.astype(np.uint64)
    gaps = np.empty_like(v)
    gaps[0] = v[0]
    np.subtract(v[1:], v[:-1], out=gaps[1:])
    gaps[seg_start_mask] = v[seg_start_mask]
    if np.any(gaps < 0):
        raise ValueError("segmented_delta requires per-segment sorted input")
    return gaps.astype(np.uint64)


def segmented_cumsum(gaps: np.ndarray, seg_start_idx: np.ndarray) -> np.ndarray:
    """Inverse of :func:`segmented_delta` given sorted segment start indices."""
    g = np.asarray(gaps, dtype=np.int64)
    if g.size == 0:
        return g
    seg_start_idx = np.asarray(seg_start_idx, dtype=np.int64)
    if seg_start_idx.size == 0 or seg_start_idx[0] != 0:
        seg_start_idx = np.concatenate([[0], seg_start_idx])
    c = np.cumsum(g)
    # value carried into each segment = cumulative sum just before its start
    base = np.where(seg_start_idx > 0, c[np.maximum(seg_start_idx - 1, 0)], 0)
    reps = np.diff(np.concatenate([seg_start_idx, [g.size]]))
    return c - np.repeat(base, reps)


@dataclass
class TermPostings:
    """Decoded postings of one term within one index partition."""

    rel_docs: np.ndarray      # int64, ascending
    freqs: np.ndarray         # int64
    positions: np.ndarray     # int64, concatenated per doc
    pos_offsets: np.ndarray   # int64, len(rel_docs)+1 offsets into positions


def encode_columnar(
    rel_docs: np.ndarray,
    freqs: np.ndarray,
    positions: np.ndarray,
    seg_ids: np.ndarray,
    num_segments: int,
) -> dict:
    """Encode one term's partition-local postings into columnar blobs.

    Parameters are doc-ordered; ``positions`` is the concatenation of each
    doc's ascending position list (lengths = ``freqs``); ``seg_ids`` is the
    per-doc segment id (``abs_doc // nb_doc_per_segment``).

    Returns dict with doc/freq/pos blobs, per-segment doc counts and blob
    byte sizes (skip data), and per-segment max_tf.
    """
    rel_docs = np.asarray(rel_docs, dtype=np.int64)
    freqs = np.asarray(freqs, dtype=np.int64)
    positions = np.asarray(positions, dtype=np.int64)
    seg_ids = np.asarray(seg_ids, dtype=np.int64)
    n = rel_docs.size

    seg_start = np.zeros(n, dtype=bool)
    if n:
        seg_start[0] = True
        seg_start[1:] = seg_ids[1:] != seg_ids[:-1]

    doc_gaps = segmented_delta(rel_docs, seg_start)
    freq_u = freqs.astype(np.uint64)
    doc_lens = uvarint_byte_lengths(doc_gaps)
    freq_lens = uvarint_byte_lengths(freq_u)
    doc_blob = encode_uvarints(doc_gaps, doc_lens)
    freq_blob = encode_uvarints(freq_u, freq_lens)

    # per-doc position deltas, first position absolute (previousPos = 0,
    # PimIndexWriter.java:859-868)
    pos_doc_start = np.zeros(positions.size, dtype=bool)
    if positions.size:
        starts = np.zeros(n, dtype=np.int64)
        np.cumsum(freqs[:-1], out=starts[1:])
        pos_doc_start[starts[freqs > 0]] = True
    pos_gaps = segmented_delta(positions, pos_doc_start)
    pos_lens_per_val = uvarint_byte_lengths(pos_gaps)
    pos_blob = encode_uvarints(pos_gaps, pos_lens_per_val)

    # per-segment skip data
    seg_doc_counts = np.bincount(seg_ids, minlength=num_segments).astype(np.int64)
    # positions byte size per doc, then per segment
    pos_bytes_per_doc = np.zeros(n, dtype=np.int64)
    if positions.size:
        off = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(freqs, out=off[1:])
        csum = np.concatenate([[0], np.cumsum(pos_lens_per_val)])
        pos_bytes_per_doc = csum[off[1:]] - csum[off[:-1]]

    def per_seg_sum(per_doc: np.ndarray) -> np.ndarray:
        out = np.zeros(num_segments, dtype=np.int64)
        np.add.at(out, seg_ids, per_doc)
        return out

    seg_doc_bytes = per_seg_sum(doc_lens)
    seg_freq_bytes = per_seg_sum(freq_lens)
    seg_pos_bytes = per_seg_sum(pos_bytes_per_doc)
    seg_max_tf = np.zeros(num_segments, dtype=np.int64)
    np.maximum.at(seg_max_tf, seg_ids, freqs)

    return {
        "df": int(n),
        "ttf": int(freqs.sum()),
        "doc_blob": doc_blob.tobytes(),
        "freq_blob": freq_blob.tobytes(),
        "pos_blob": pos_blob.tobytes(),
        "seg_doc_counts": seg_doc_counts,
        "seg_doc_bytes": seg_doc_bytes,
        "seg_freq_bytes": seg_freq_bytes,
        "seg_pos_bytes": seg_pos_bytes,
        "seg_max_tf": seg_max_tf,
    }


def slice_segments(doc_blob: bytes, freq_blob: bytes, pos_blob: bytes,
                   seg_doc_counts: np.ndarray, seg_doc_bytes: np.ndarray,
                   seg_freq_bytes: np.ndarray, seg_pos_bytes: np.ndarray,
                   seg_mask: np.ndarray):
    """Seek to the selected segments via the per-segment skip sizes.

    The reference stores per-(term, DPU-segment) postings byte sizes so any
    segment can be sought and decoded independently
    (``PimIndexWriter.java:826-849,903-916``; zero-size segments skipped at
    ``matcher.c:31-35``, absent terms at ``dpu.c:204-207``).  Returns
    ``(doc_blob', freq_blob', pos_blob', seg_doc_counts')`` restricted to
    ``seg_mask`` — decodable by :func:`decode_columnar` because the
    delta chain resets at every segment start.
    """
    counts = np.asarray(seg_doc_counts, dtype=np.int64)
    mask = np.asarray(seg_mask, dtype=bool)

    def cut(blob: bytes, sizes) -> bytes:
        sizes = np.asarray(sizes, dtype=np.int64)
        ends = np.cumsum(sizes)
        starts = ends - sizes
        return b"".join(blob[starts[i]:ends[i]]
                        for i in np.flatnonzero(mask & (sizes > 0)))

    return (cut(doc_blob, seg_doc_bytes), cut(freq_blob, seg_freq_bytes),
            cut(pos_blob, seg_pos_bytes), np.where(mask, counts, 0))


def decode_positions_slice(pos_bytes: bytes, freqs: np.ndarray) -> np.ndarray:
    """Decode a contiguous slice of the position-gap stream.

    ``freqs`` are the per-posting frequencies of exactly the postings whose
    positions the slice holds (the delta chain resets at every posting
    start, so any posting-aligned byte range decodes independently — the
    block-max WAND lazy-decode path uses this to decode only the
    (term, segment) units the score-bound loop actually evaluates).
    """
    gaps = decode_uvarints(pos_bytes).astype(np.int64)
    freqs = np.asarray(freqs, dtype=np.int64)
    offs = np.zeros(freqs.size + 1, dtype=np.int64)
    np.cumsum(freqs, out=offs[1:])
    starts = offs[:-1][freqs > 0]
    if starts.size == 0:
        return np.empty(0, dtype=np.int64)
    return segmented_cumsum(gaps, starts)


def decode_columnar(
    doc_blob: bytes,
    freq_blob: bytes,
    pos_blob: bytes,
    seg_doc_counts: np.ndarray,
    decode_positions: bool = True,
) -> TermPostings:
    """Decode columnar blobs back to doc/freq/position arrays."""
    seg_doc_counts = np.asarray(seg_doc_counts, dtype=np.int64)
    doc_gaps = decode_uvarints(doc_blob).astype(np.int64)
    freqs = decode_uvarints(freq_blob).astype(np.int64)
    n = doc_gaps.size

    nonempty = seg_doc_counts > 0
    seg_starts = (np.cumsum(seg_doc_counts) - seg_doc_counts)[nonempty]
    c = np.cumsum(doc_gaps) if n else doc_gaps
    base = np.where(seg_starts > 0, c[seg_starts - 1], 0) if n else seg_starts
    if n:
        reps = np.diff(np.concatenate([seg_starts, [n]]))
        rel_docs = c - np.repeat(base, reps)
    else:
        rel_docs = doc_gaps

    if decode_positions and len(pos_blob):
        pos_gaps = decode_uvarints(pos_blob).astype(np.int64)
        pos_offsets = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(freqs, out=pos_offsets[1:])
        pc = np.cumsum(pos_gaps)
        doc_starts = pos_offsets[:-1][freqs > 0]
        pbase = np.where(doc_starts > 0, pc[doc_starts - 1], 0)
        preps = np.diff(np.concatenate([doc_starts, [pos_gaps.size]]))
        positions = pc - np.repeat(pbase, preps)
    else:
        positions = np.empty(0, dtype=np.int64)
        pos_offsets = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(freqs, out=pos_offsets[1:])

    return TermPostings(rel_docs=rel_docs, freqs=freqs,
                        positions=positions, pos_offsets=pos_offsets)


# ---------------------------------------------------------------------------
# Faithful interleaved codec (format-parity model of PimIndexWriter.writeDoc)
# ---------------------------------------------------------------------------

def encode_interleaved(rel_docs, freqs, positions, seg_ids, num_segments) -> tuple[bytes, np.ndarray]:
    """Reference-format interleaved stream (PimIndexWriter.java:826-893).

    Returns (blob, per-segment byte sizes).  Test/model use only — the
    engine uses the columnar codec.
    """
    rel_docs = np.asarray(rel_docs, dtype=np.int64)
    freqs = np.asarray(freqs, dtype=np.int64)
    positions = np.asarray(positions, dtype=np.int64)
    seg_ids = np.asarray(seg_ids, dtype=np.int64)
    out = bytearray()
    seg_sizes = np.zeros(num_segments, dtype=np.int64)
    prev_rel = 0
    prev_seg = -1
    pos_off = 0
    for i in range(rel_docs.size):
        if seg_ids[i] != prev_seg:
            prev_rel = 0
            prev_seg = seg_ids[i]
        start_len = len(out)
        out += encode_uvarints(np.array([rel_docs[i] - prev_rel], np.uint64)).tobytes()
        prev_rel = rel_docs[i]
        f = int(freqs[i])
        pos = positions[pos_off:pos_off + f]
        pos_off += f
        gaps = np.empty(f, dtype=np.int64)
        if f:
            gaps[0] = pos[0]
            gaps[1:] = np.diff(pos)
        pos_bytes = encode_uvarints(gaps.astype(np.uint64)).tobytes()
        npos = len(pos_bytes)
        if npos <= 0xFF:
            out += encode_uvarints(zigzag_encode(np.array([f]))).tobytes()
            out += bytes([npos])
        elif npos <= 0xFFFF:
            out += encode_uvarints(zigzag_encode(np.array([-f]))).tobytes()
            out += npos.to_bytes(2, "big")
        else:
            out += encode_uvarints(zigzag_encode(np.array([0]))).tobytes()
            out += encode_uvarints(np.array([f], np.uint64)).tobytes()
            out += encode_uvarints(np.array([npos], np.uint64)).tobytes()
        out += pos_bytes
        seg_sizes[seg_ids[i]] += len(out) - start_len
    return bytes(out), seg_sizes


def decode_interleaved(blob: bytes, seg_sizes: np.ndarray) -> TermPostings:
    """Sequential decoder for the interleaved reference format
    (model of PimIndexSearcher.java:536-622)."""
    buf = np.frombuffer(blob, dtype=np.uint8)
    rel_docs, freqs, positions = [], [], []
    offset = 0

    def read_uvarint(off):
        val = 0
        shift = 0
        while True:
            byte = int(buf[off])
            off += 1
            val |= (byte & 0x7F) << shift
            if byte < 0x80:
                return val, off
            shift += 7

    seg_bounds = np.cumsum(np.asarray(seg_sizes, dtype=np.int64))
    seg_start_offsets = np.concatenate([[0], seg_bounds[:-1]])
    for s in range(len(seg_sizes)):
        offset = int(seg_start_offsets[s])
        end = int(seg_bounds[s])
        prev_rel = 0
        while offset < end:
            gap, offset = read_uvarint(offset)
            rel = prev_rel + gap
            prev_rel = rel
            zz, offset = read_uvarint(offset)
            f_signed = (zz >> 1) ^ -(zz & 1)
            if f_signed > 0:
                f = f_signed
                offset += 1
            elif f_signed < 0:
                f = -f_signed
                offset += 2
            else:
                f, offset = read_uvarint(offset)
                _plen, offset = read_uvarint(offset)
            prev_pos = 0
            for _ in range(f):
                g, offset = read_uvarint(offset)
                prev_pos += g
                positions.append(prev_pos)
            rel_docs.append(rel)
            freqs.append(f)
    freqs_arr = np.asarray(freqs, dtype=np.int64)
    pos_offsets = np.zeros(freqs_arr.size + 1, dtype=np.int64)
    np.cumsum(freqs_arr, out=pos_offsets[1:])
    return TermPostings(
        rel_docs=np.asarray(rel_docs, dtype=np.int64),
        freqs=freqs_arr,
        positions=np.asarray(positions, dtype=np.int64),
        pos_offsets=pos_offsets,
    )
