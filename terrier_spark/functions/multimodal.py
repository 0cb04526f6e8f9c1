"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The driver brief: treat image/audio/video as binary columns; make the
Spark-side plumbing (schema, partitioning, Arrow batch shape, UDF
signatures) real and tested, with the actual media decode STUBBED —
the decode libraries (PIL/ffmpeg/librosa) are not in this container.

``decode_image`` raises NotImplementedError unless PIL is importable;
``fake_features`` is the deterministic stand-in used by tests: an
8-bin byte histogram (so the full pipeline — binary ingest, mapInPandas
fan-out, fixed-size float vector out — runs for real).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # decode gate: real decoder only if the lib exists (it doesn't here)
    import PIL.Image  # noqa: F401

    _HAS_PIL = True
except Exception:
    _HAS_PIL = False

N_FEATURES = 8

MEDIA_SCHEMA = (
    "doc_id long, media_type string, payload binary, n_bytes long"
)


def to_media_df(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Synthesize a media table: payload = utf-8 bytes of the text (the
    deterministic stand-in for image/audio bytes), plus typed metadata."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.lit("image/fake").alias("media_type"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.octet_length(F.encode(F.col(text_col), "UTF-8")).alias("n_bytes"),
    )


def decode_image(payload: bytes) -> "np.ndarray":
    """Real decode path — gated on the library actually existing."""
    if not _HAS_PIL:
        raise NotImplementedError(
            "image decode requires PIL, which is not available in this "
            "environment; use fake_features() for the pipeline shape"
        )
    import io

    import PIL.Image as Image

    return np.asarray(Image.open(io.BytesIO(payload)))


def fake_features(payload: bytes) -> np.ndarray:
    """Deterministic stand-in feature extractor: 8-bin byte histogram,
    L1-normalized. Replaces CNN-embedding/resize/frame-sample steps."""
    a = np.frombuffer(payload, dtype=np.uint8)
    if a.size == 0:
        return np.zeros(N_FEATURES, dtype=np.float64)
    hist, _ = np.histogram(a, bins=N_FEATURES, range=(0, 256))
    return hist / a.size


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction: (doc_id, features array<double>).

    The Arrow batch shape here is exactly what a real image pipeline
    uses — binary column in, fixed-width float vector out; swapping
    fake_features for a real decoder changes no Spark plumbing."""

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in it:
            feats = [fake_features(bytes(p)) for p in b["payload"]]
            yield pd.DataFrame(
                {"doc_id": b["doc_id"], "features": [f.tolist() for f in feats]}
            )

    return media.select("doc_id", "payload").mapInPandas(
        kernel, schema="doc_id long, features array<double>"
    )
