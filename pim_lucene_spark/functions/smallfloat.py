"""Lucene SmallFloat byte4 norm codec + BM25 norm-inverse caches, vectorized.

Semantics reproduced from the reference (behavioral spec, reimplemented):

- ``int_to_byte4`` / ``byte4_to_int``: Lucene's 4-significant-bit float-like
  integer quantization used for document-length norms
  (``lucene/core/src/java/org/apache/lucene/util/SmallFloat.java:103-167``).
  ``NUM_FREE_VALUES = 255 - longToInt4(Integer.MAX_VALUE) = 24`` — values
  below 24 are stored exactly.
- ``LENGTH_TABLE``: decoded lengths for all 256 norm bytes
  (``BM25Similarity.java:123-129``).
- ``norm_inverse_cache``: per-field float32 cache
  ``1/(k1*((1-b) + b*LENGTH_TABLE[i]/avgdl))`` in Java float evaluation
  order (``BM25Similarity.java:205-208``).
- ``quantize_norm_inverse``: the PIM index's admissible byte quantization
  ``qf = (int)(256/max(cache))``, ``q[i] = ceil(cache[i]*qf) & 0xFF``
  (``PimIndexWriter.java:468-484``).  ``ceil`` keeps the quantized upper
  bound admissible for WAND-style pruning.

All functions are numpy-vectorized; no per-row Python in hot paths.
"""

from __future__ import annotations

import numpy as np

NUM_FREE_VALUES = 24  # 255 - longToInt4(2**31 - 1); SmallFloat.java:139-140


def _long_to_int4(i: np.ndarray) -> np.ndarray:
    """Vectorized SmallFloat.longToInt4 (SmallFloat.java:103-122)."""
    i = np.asarray(i, dtype=np.int64)
    if np.any(i < 0):
        raise ValueError("longToInt4 only supports non-negative values")
    # numBits = 64 - numberOfLeadingZeros(i); 0 for i == 0.  np.frexp is
    # exact for i < 2**53 (norm inputs are int32 lengths, far below that).
    num_bits = np.frexp(i.astype(np.float64))[1].astype(np.int64)

    out = i.copy()  # subnormal: numBits < 4 → value itself
    normal = num_bits >= 4
    shift = num_bits[normal] - 4
    encoded = (i[normal] >> shift) & 0x07
    out[normal] = encoded | ((shift + 1) << 3)
    return out


def _int4_to_long(v: np.ndarray) -> np.ndarray:
    """Vectorized SmallFloat.int4ToLong (SmallFloat.java:125-137)."""
    v = np.asarray(v, dtype=np.int64)
    bits = v & 0x07
    shift = (v >> 3) - 1
    out = bits.copy()  # shift == -1 → subnormal
    normal = shift >= 0
    out[normal] = (bits[normal] | 0x08) << shift[normal]
    return out


def int_to_byte4(i: np.ndarray | int) -> np.ndarray:
    """Encode non-negative int(s) to the byte4 norm (SmallFloat.java:147-156)."""
    arr = np.atleast_1d(np.asarray(i, dtype=np.int64))
    if np.any(arr < 0):
        raise ValueError("intToByte4 only supports non-negative values")
    out = arr.copy()
    big = arr >= NUM_FREE_VALUES
    out[big] = NUM_FREE_VALUES + _long_to_int4(arr[big] - NUM_FREE_VALUES)
    return out.astype(np.uint8)


def byte4_to_int(b: np.ndarray | int) -> np.ndarray:
    """Decode byte4 norm byte(s) to quantized length (SmallFloat.java:159-167)."""
    arr = np.atleast_1d(np.asarray(b, dtype=np.int64)) & 0xFF
    out = arr.copy()
    big = arr >= NUM_FREE_VALUES
    out[big] = NUM_FREE_VALUES + _int4_to_long(arr[big] - NUM_FREE_VALUES)
    return out


# Decoded length for each of the 256 norm bytes (BM25Similarity.java:123-129).
LENGTH_TABLE: np.ndarray = byte4_to_int(np.arange(256)).astype(np.float32)


def norm_inverse_cache(avgdl: float, k1: float = 1.2, b: float = 0.75,
                       dtype=np.float32) -> np.ndarray:
    """Per-norm-byte cache 1/(k1*((1-b)+b*len/avgdl)) (BM25Similarity.java:205-208).

    float32 arithmetic in Java evaluation order:
    ``b * LENGTH_TABLE[i] / avgdl`` left-to-right, then ``(1-b) + _``,
    then ``k1 * _``, then reciprocal.  Pass ``dtype=np.float64`` for the
    double-precision scoring mode (oracle-comparable).
    """
    k1 = dtype(k1)
    b = dtype(b)
    one = dtype(1.0)
    avgdl = dtype(avgdl)
    table = LENGTH_TABLE.astype(dtype)
    with np.errstate(all="ignore"):
        return (one / (k1 * ((one - b) + (b * table) / avgdl))).astype(dtype)


def quantize_norm_inverse(cache: np.ndarray) -> tuple[int, np.ndarray]:
    """PIM byte quantization of the norm-inverse cache (PimIndexWriter.java:468-484).

    Returns ``(quant_factor, uint8[256])`` with the reference's exact
    rounding: ``qf = int(256.0f / max(cache))`` (truncation) and
    ``q[i] = int(ceil(cache[i] * qf)) & 0xFF``.
    """
    cache32 = cache.astype(np.float32)
    max_v = np.float32(cache32.max())
    qf = int(np.float32(256.0) / max_v)
    quant = (np.ceil(cache32 * np.float32(qf)).astype(np.int64) & 0xFF).astype(np.uint8)
    return qf, quant
