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


# ---------------------------------------------------------------------------
# Deterministic fake media formats (round 4).
#
# The container has no image/audio codecs, so the DECODE step cannot be
# JPEG/WAV — but "stub behind NotImplementedError" left the whole
# decode→resize→frame-sample surface untested.  Instead we define tiny
# self-describing raw formats and synthesize payloads deterministically
# from (doc_id, shape); decode/resize/frame-sample are then REAL numpy
# programs over REAL binary columns, and swapping in PIL/ffmpeg later
# changes only the per-payload parse, none of the Spark plumbing.
#
# Formats (little-endian headers):
#   FIM1: magic(4) | u16 height | u16 width | u8 channels | pixels u8[h*w*c]
#   FVD1: magic(4) | u16 n_frames | u16 height | u16 width | u8 channels
#         | frames u8[n*h*w*c]
#   FAU1: magic(4) | u32 sample_rate | u32 n_samples | samples i16[n]
#
# Reference parity note: the reference has no media pipeline (it is a
# relational DBMS); this implements the driver brief's multimodal
# requirement (decode / feature-extract / resize / frame-sample as
# vectorized kernels over binary columns with typed metadata).
# ---------------------------------------------------------------------------

import struct

MAGIC_IMG = b"FIM1"
MAGIC_VID = b"FVD1"
MAGIC_AUD = b"FAU1"


def _mix_bytes(seed: int, n: int) -> np.ndarray:
    """Deterministic pseudo-random uint8 stream: splitmix-style integer
    hash of (seed, index), fully vectorized — no Python loop over
    pixels/samples."""
    # mix the seed in Python ints (numpy warns on uint64 SCALAR overflow;
    # array ops below wrap silently, which is what we want)
    s = (int(seed) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    i = np.arange(n, dtype=np.uint64)
    x = i * np.uint64(0x9E3779B97F4A7C15) + np.uint64(s)
    x ^= x >> np.uint64(31)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(27)
    return (x & np.uint64(0xFF)).astype(np.uint8)


def synth_image_bytes(seed: int, height: int, width: int, channels: int = 3) -> bytes:
    header = MAGIC_IMG + struct.pack("<HHB", height, width, channels)
    return header + _mix_bytes(seed, height * width * channels).tobytes()


def synth_video_bytes(
    seed: int, n_frames: int, height: int, width: int, channels: int = 3
) -> bytes:
    header = MAGIC_VID + struct.pack("<HHHB", n_frames, height, width, channels)
    return header + _mix_bytes(seed, n_frames * height * width * channels).tobytes()


def synth_audio_bytes(seed: int, sample_rate: int, n_samples: int) -> bytes:
    header = MAGIC_AUD + struct.pack("<II", sample_rate, n_samples)
    samples = (_mix_bytes(seed, 2 * n_samples).view("<i2")).astype("<i2")
    return header + samples.tobytes()


def decode_image_bytes(payload: bytes) -> np.ndarray:
    """(h, w, c) uint8 array from an FIM1 payload."""
    if payload[:4] != MAGIC_IMG:
        raise ValueError(f"not an FIM1 image: magic={payload[:4]!r}")
    h, w, c = struct.unpack_from("<HHB", payload, 4)
    a = np.frombuffer(payload, dtype=np.uint8, count=h * w * c, offset=9)
    return a.reshape(h, w, c)


def decode_video_bytes(payload: bytes) -> np.ndarray:
    """(n_frames, h, w, c) uint8 array from an FVD1 payload."""
    if payload[:4] != MAGIC_VID:
        raise ValueError(f"not an FVD1 video: magic={payload[:4]!r}")
    n, h, w, c = struct.unpack_from("<HHHB", payload, 4)
    a = np.frombuffer(payload, dtype=np.uint8, count=n * h * w * c, offset=11)
    return a.reshape(n, h, w, c)


def decode_audio_bytes(payload: bytes) -> tuple[int, np.ndarray]:
    """(sample_rate, int16 samples) from an FAU1 payload."""
    if payload[:4] != MAGIC_AUD:
        raise ValueError(f"not an FAU1 audio: magic={payload[:4]!r}")
    sr, n = struct.unpack_from("<II", payload, 4)
    return sr, np.frombuffer(payload, dtype="<i2", count=n, offset=12)


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize via index gather (pure numpy, the same
    sampling PIL's Image.NEAREST performs)."""
    h, w = img.shape[:2]
    rows = (np.arange(out_h) * h // out_h).astype(np.intp)
    cols = (np.arange(out_w) * w // out_w).astype(np.intp)
    return img[rows[:, None], cols[None, :]]


def sample_frames(vid: np.ndarray, stride: int) -> np.ndarray:
    """Every stride-th frame (ffmpeg select='not(mod(n\\,k))' analog)."""
    if stride < 1:
        raise ValueError(f"stride must be >= 1, got {stride}")
    return vid[::stride]


def synth_media_table(spark, n_docs: int, parts: int | None = None) -> DataFrame:
    """Deterministic mixed-modality media table: (doc_id, media_type,
    payload, width, height, channels, n_frames, sample_rate, n_bytes).

    Payloads are synthesized IN the executors (mapInPandas over a
    range frame), so a 10^9-row media table never exists driver-side;
    metadata columns are typed and queryable without touching payloads
    (the 100 TB pattern: partition prune / filter on metadata, decode
    only the surviving rows)."""
    base = spark.range(n_docs, numPartitions=parts) if parts else spark.range(n_docs)

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in it:
            rows = []
            for i in b["id"]:
                i = int(i)
                kind = i % 3
                if kind == 0:
                    h, w, c = 16 + (i % 5) * 8, 16 + (i % 7) * 8, 3
                    rows.append(
                        (i, "image/fim1", synth_image_bytes(i, h, w, c),
                         w, h, c, None, None)
                    )
                elif kind == 1:
                    n, h, w, c = 4 + i % 6, 8, 8, 3
                    rows.append(
                        (i, "video/fvd1", synth_video_bytes(i, n, h, w, c),
                         w, h, c, n, None)
                    )
                else:
                    sr, ns = 16000, 256 + (i % 9) * 64
                    rows.append(
                        (i, "audio/fau1", synth_audio_bytes(i, sr, ns),
                         None, None, None, None, sr)
                    )
            out = pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "media_type", "payload", "width", "height",
                    "channels", "n_frames", "sample_rate",
                ],
            )
            out["n_bytes"] = out["payload"].map(len)
            yield out

    return base.mapInPandas(
        kernel,
        schema=(
            "doc_id long, media_type string, payload binary, width int, "
            "height int, channels int, n_frames int, sample_rate int, "
            "n_bytes long"
        ),
    )


def resize_images(media: DataFrame, out_h: int, out_w: int) -> DataFrame:
    """Transform-in-place plumbing: decode each FIM1 payload, resize
    nearest-neighbor, re-encode — binary column in, binary column out,
    metadata updated.  Non-image rows pass through untouched."""

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in it:
            pays, ws, hs = [], [], []
            for mt, p, w0, h0 in zip(
                b["media_type"], b["payload"], b["width"], b["height"]
            ):
                if mt == "image/fim1":
                    img = resize_nearest(decode_image_bytes(bytes(p)), out_h, out_w)
                    pays.append(
                        MAGIC_IMG
                        + struct.pack("<HHB", out_h, out_w, img.shape[2])
                        + img.tobytes()
                    )
                    ws.append(out_w)
                    hs.append(out_h)
                else:
                    pays.append(bytes(p))
                    ws.append(w0)
                    hs.append(h0)
            out = b.copy()
            out["payload"] = pays
            out["width"] = pd.array(ws, dtype="Int32")
            out["height"] = pd.array(hs, dtype="Int32")
            out["n_bytes"] = out["payload"].map(len)
            yield out

    return media.mapInPandas(kernel, schema=media.schema)


def decode_media_features(
    media: DataFrame, thumb: int = 8, frame_stride: int = 2
) -> DataFrame:
    """Decode + feature-extract across all three modalities in ONE
    Arrow pass: images are resized to a thumb x thumb thumbnail first,
    videos are frame-sampled then averaged, audio uses rms /
    zero-crossing-rate.  Output features are fixed-width per modality:

      image: [mean_r, mean_g, mean_b, std_r, std_g, std_b]  (thumbnail)
      video: same 6, over the sampled frames' mean image
      audio: [rms, zcr, mean, std, 0, 0]  (padded to width 6)
    """

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in it:
            feats = []
            for mt, p in zip(b["media_type"], b["payload"]):
                p = bytes(p)
                if mt == "image/fim1":
                    img = resize_nearest(decode_image_bytes(p), thumb, thumb)
                    f = np.concatenate(
                        [img.mean(axis=(0, 1)), img.std(axis=(0, 1))]
                    )
                elif mt == "video/fvd1":
                    frames = sample_frames(decode_video_bytes(p), frame_stride)
                    mean_img = frames.mean(axis=0)
                    f = np.concatenate(
                        [mean_img.mean(axis=(0, 1)), mean_img.std(axis=(0, 1))]
                    )
                else:
                    _, s = decode_audio_bytes(p)
                    x = s.astype(np.float64)
                    zcr = (
                        float(np.count_nonzero(np.signbit(x[1:]) != np.signbit(x[:-1])))
                        / max(len(x) - 1, 1)
                    )
                    f = np.array(
                        [np.sqrt(np.mean(x * x)), zcr, x.mean(), x.std(), 0.0, 0.0]
                    )
                feats.append(f.tolist())
            yield pd.DataFrame(
                {
                    "doc_id": b["doc_id"],
                    "media_type": b["media_type"],
                    "features": feats,
                }
            )

    return media.select("doc_id", "media_type", "payload").mapInPandas(
        kernel, schema="doc_id long, media_type string, features array<double>"
    )
