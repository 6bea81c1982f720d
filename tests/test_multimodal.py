"""Multimodal plumbing: Arrow-batched feature extraction with injected
decoders, and the optional real-codec gate (PIL/soundfile)."""

import numpy as np
import pandas as pd
import pytest

from pim_lucene_spark.operators import multimodal as mm


def _media(spark, n=6):
    pdf = pd.DataFrame({
        "doc_id": range(n),
        "content": [f"payload number {i} {'x' * i}" for i in range(n)],
    })
    return mm.as_media(spark.createDataFrame(pdf))


def test_fake_decoder_plumbing(spark):
    feats = mm.extract_features(_media(spark),
                                decoder=mm.fake_decoder).toPandas()
    assert len(feats) == 6
    for f in feats.feature:
        assert len(f) == mm.FEATURE_DIM
        assert abs(float(np.sum(f)) - 1.0) < 1e-5


def test_decode_media_stub_without_codecs(spark):
    """Where the optional codec libs are absent, the stub contract must
    hold: a clear NotImplementedError naming the injection hook."""
    try:
        import PIL  # noqa: F401
        pytest.skip("Pillow installed — the real-decode test covers this")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="decoder"):
        mm.decode_media(b"\x89PNG\r\n", "image/png")
    with pytest.raises(NotImplementedError, match="decoder"):
        mm.decode_media(b"", "application/octet-stream")


def test_decode_media_real_image():
    """Real decode path — runs only where Pillow exists (skipped in this
    container; the gate keeps deployments zero-code-change)."""
    PIL = pytest.importorskip("PIL")  # noqa: F841
    import io

    from PIL import Image
    buf = io.BytesIO()
    Image.fromarray(
        (np.arange(64, dtype=np.uint8).reshape(8, 8) * 4)).save(buf, "PNG")
    f = mm.decode_media(buf.getvalue(), "image/png")
    assert f.shape == (mm.FEATURE_DIM,) and f.dtype == np.float32
    assert abs(float(f.sum()) - 1.0) < 1e-5


def test_decode_media_real_audio():
    sf = pytest.importorskip("soundfile")
    import io
    buf = io.BytesIO()
    sf.write(buf, np.sin(np.linspace(0, 20, 8000)), 8000, format="WAV")
    f = mm.decode_media(buf.getvalue(), "audio/wav")
    assert f.shape == (mm.FEATURE_DIM,) and abs(float(f.sum()) - 1.0) < 1e-5
