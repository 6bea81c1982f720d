"""Multimodal column plumbing: opaque binary media + typed metadata.

Image/audio/video payloads are treated as opaque ``binary`` columns with a
typed metadata struct.  Decode / feature-extraction runs as Arrow-batched
``mapInPandas`` so each batch moves once over the Python boundary.  The
actual codec step is STUBBED (no image/audio libraries in this
environment): ``decode_media`` raises ``NotImplementedError`` unless a
decoder is injected; tests/benches inject :func:`fake_decoder`, a
deterministic stand-in, so the Spark-side plumbing — schema, partitioning,
UDF signature, batch shape — is real and tested.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("media_type", T.StringType(), False),
    T.StructField("payload", T.BinaryType(), False),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("media_type", T.StringType(), False),
    T.StructField("n_bytes", T.LongType(), False),
    T.StructField("feature", T.ArrayType(T.FloatType()), False),
])

FEATURE_DIM = 16


def as_media(docs: DataFrame, id_col: str = "doc_id",
             payload_col: str = "content",
             media_type: str = "text/plain") -> DataFrame:
    """Wrap any column as an opaque media table (demo source: text bytes)."""
    return docs.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(media_type).alias("media_type"),
        F.encode(F.col(payload_col), "UTF-8").alias("payload"),
    )


def fake_decoder(payload: bytes, media_type: str) -> np.ndarray:
    """Deterministic stand-in for a real codec: 16-bin byte histogram,
    L1-normalized, float32.  Replace with PIL/librosa/ffmpeg at deploy."""
    b = np.frombuffer(payload, dtype=np.uint8)
    if b.size == 0:
        return np.zeros(FEATURE_DIM, dtype=np.float32)
    hist = np.bincount(b >> 4, minlength=FEATURE_DIM).astype(np.float64)
    return (hist / hist.sum()).astype(np.float32)


def decode_media(payload: bytes, media_type: str) -> np.ndarray:
    """Real decode step, gated on OPTIONAL codec imports:

    - ``image/*`` → PIL: grayscale pixel histogram (16 bins over 0..255),
      L1-normalized float32;
    - ``audio/*`` → soundfile: sample-amplitude histogram (16 bins over
      [-1, 1]), L1-normalized float32.

    Where the codec library is absent (this container ships neither) the
    stub contract holds: ``NotImplementedError`` with an injection hint —
    the Spark-side plumbing stays identical either way, so deployments
    with PIL/soundfile get real features with zero code change.
    """
    import io

    if media_type.startswith("image/"):
        try:
            from PIL import Image
        except ImportError as exc:
            raise NotImplementedError(
                "image decode needs the optional Pillow dependency; "
                "install PIL or inject a decoder into "
                "extract_features(decoder=...)") from exc
        arr = np.asarray(Image.open(io.BytesIO(payload)).convert("L"),
                         dtype=np.float64)
        hist = np.histogram(arr, bins=FEATURE_DIM,
                            range=(0, 256))[0].astype(np.float64)
        s = hist.sum()
        return ((hist / s) if s else hist).astype(np.float32)
    if media_type.startswith("audio/"):
        try:
            import soundfile as sf
        except ImportError as exc:
            raise NotImplementedError(
                "audio decode needs the optional soundfile dependency; "
                "install it or inject a decoder into "
                "extract_features(decoder=...)") from exc
        data, _sr = sf.read(io.BytesIO(payload))
        x = np.asarray(data, dtype=np.float64).ravel()
        if x.size == 0:
            return np.zeros(FEATURE_DIM, dtype=np.float32)
        hist = np.histogram(np.clip(x, -1.0, 1.0), bins=FEATURE_DIM,
                            range=(-1, 1))[0].astype(np.float64)
        return (hist / max(hist.sum(), 1)).astype(np.float32)
    raise NotImplementedError(
        f"no decoder wired for media_type {media_type!r}; inject one via "
        "extract_features(decoder=...)")


def extract_features(media: DataFrame,
                     decoder: Callable[[bytes, str], np.ndarray] | None = None,
                     batch_partitions: int | None = None) -> DataFrame:
    """media table → (media_id, media_type, n_bytes, feature[16]).

    ``mapInPandas`` keeps Arrow batch shape; repartition first when the
    payload column is heavy so decode parallelism matches the cluster.
    """
    fn = decoder or decode_media
    if batch_partitions:
        media = media.repartition(batch_partitions, "media_id")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [fn(p, t) for p, t in zip(pdf["payload"], pdf["media_type"])]
            yield pd.DataFrame({
                "media_id": pdf["media_id"].to_numpy(np.int64),
                "media_type": pdf["media_type"],
                "n_bytes": pdf["payload"].str.len().astype(np.int64),
                "feature": [np.asarray(f, dtype=np.float32) for f in feats],
            })

    return media.mapInPandas(kernel, FEATURE_SCHEMA)


def media_metadata(media: DataFrame) -> DataFrame:
    """SQL-reproducible metadata projection: byte length + 8-byte header hex."""
    return media.select(
        "media_id", "media_type",
        F.length("payload").cast("long").alias("n_bytes"),
        F.upper(F.hex(F.substring(F.col("payload"), 1, 8))).alias("header_hex"),
    )
