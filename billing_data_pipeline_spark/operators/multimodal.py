"""[EXT] Multimodal binary columns (SURVEY.md §2.12).

Images/audio/video ride through the engine as opaque ``binary`` columns
with typed metadata structs; decode / feature-extract / resize / frame-
sample run as Arrow-batched ``mapInPandas`` stages so bytes never leave the
executors and Python sees whole record batches, not rows.

Pixel/sample-level codecs (PIL/ffmpeg/torchaudio) are NOT in this
container, so the kernels are tiered: ``decode_media(..., fake=True)``
parses our synthetic header layout (deterministic test fixture), while
``fake=False`` runs REAL dependency-free decoders — BMP, PNG, and WAV
header+layout parsing in ``_decode_real`` — over genuine format bytes.
Heavier codecs drop into the same sniff table untouched. Either way the
Spark-side plumbing — schema, Arrow batch iteration, partitioning — is
identical and fully tested.

Synthetic media header (16 bytes, big-endian): magic ``MM01`` + u32 width +
u32 height + u32 n_frames, then payload bytes.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), False),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("valid", T.BooleanType(), False),
    ]
)

MAGIC = b"MM01"
HEADER_LEN = 16


def encode_fake_media(media_id: int, kind: str, width: int, height: int, n_frames: int, payload: bytes = b"") -> tuple[int, str, bytes]:
    """Build a synthetic media record (test fixture helper)."""
    header = MAGIC + struct.pack(">III", width, height, n_frames)
    return (media_id, kind, header + payload)


def _decode_fake(batch: pd.DataFrame) -> pd.DataFrame:
    """Deterministic stand-in decode: parse the synthetic header."""
    rows = []
    for _, r in batch.iterrows():
        content = bytes(r["content"])
        ok = len(content) >= HEADER_LEN and content[:4] == MAGIC
        if ok:
            w, h, nf = struct.unpack(">III", content[4:HEADER_LEN])
        else:
            w = h = nf = None
        rows.append(
            {
                "media_id": r["media_id"],
                "kind": r["kind"],
                "n_bytes": len(content),
                "width": w,
                "height": h,
                "n_frames": nf,
                "valid": ok,
            }
        )
    return pd.DataFrame(rows)


def _parse_bmp(content: bytes) -> tuple[int, int, int] | None:
    """BMP (Windows DIB): 'BM' file header (14 B) + BITMAPINFOHEADER.
    Width/height are little-endian i32 at offsets 18/22; height may be
    negative for top-down rows. Single image -> n_frames=1."""
    if len(content) < 26 or content[:2] != b"BM":
        return None
    dib_size = struct.unpack_from("<I", content, 14)[0]
    if dib_size < 40 or len(content) < 14 + dib_size:
        return None
    w, h = struct.unpack_from("<ii", content, 18)
    if w <= 0 or h == 0:
        return None
    return w, abs(h), 1


def _parse_png(content: bytes) -> tuple[int, int, int] | None:
    """PNG: 8-byte signature, then the IHDR chunk (must be first) carries
    big-endian u32 width/height at offsets 16/20."""
    if len(content) < 24 or content[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    if content[12:16] != b"IHDR":
        return None
    w, h = struct.unpack_from(">II", content, 16)
    if not w or not h:
        return None
    return w, h, 1


def _parse_wav(content: bytes) -> tuple[int, int, int] | None:
    """WAV (RIFF): walk chunks for 'fmt ' (channels, sample rate, bits) and
    'data' (payload size). Mapped into the decoded schema as width=sample
    rate, height=channels, n_frames=samples per channel (audio 'frames')."""
    if len(content) < 12 or content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        return None
    pos, channels, rate, bits, data_len = 12, None, None, None, None
    while pos + 8 <= len(content):
        cid = content[pos : pos + 4]
        clen = struct.unpack_from("<I", content, pos + 4)[0]
        if cid == b"fmt " and clen >= 16 and pos + 8 + 16 <= len(content):
            channels, rate = struct.unpack_from("<HI", content, pos + 10)
            bits = struct.unpack_from("<H", content, pos + 22)[0]
        elif cid == b"data":
            data_len = min(clen, len(content) - pos - 8)
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if not channels or not rate or not bits or data_len is None:
        return None
    n_frames = data_len // (channels * (bits // 8)) if bits >= 8 else 0
    return rate, channels, n_frames


def _decode_real(batch: pd.DataFrame) -> pd.DataFrame:
    """Dependency-free real decoders: BMP / PNG / WAV header+layout parsing
    (pure byte arithmetic — no PIL/ffmpeg, which this container lacks).
    Formats beyond these would slot into the same sniff table; unknown or
    malformed blobs yield valid=false, never a job failure."""
    rows = []
    for _, r in batch.iterrows():
        content = bytes(r["content"])
        parsed = _parse_bmp(content) or _parse_png(content) or _parse_wav(content)
        rows.append(
            {
                "media_id": r["media_id"],
                "kind": r["kind"],
                "n_bytes": len(content),
                "width": parsed[0] if parsed else None,
                "height": parsed[1] if parsed else None,
                "n_frames": parsed[2] if parsed else None,
                "valid": parsed is not None,
            }
        )
    return pd.DataFrame(rows)


def decode_media(df: DataFrame, fake: bool = True) -> DataFrame:
    """Decode/inspect a binary media column via Arrow-batched mapInPandas."""
    kernel = _decode_fake if fake else _decode_real

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            if len(batch):
                yield kernel(batch)

    return df.mapInPandas(run, schema=DECODED_SCHEMA)


def sample_frames(df: DataFrame, every_n: int, fake: bool = True) -> DataFrame:
    """Frame sampling for video records: emits one row per sampled frame
    index (schema-level plumbing; frame bytes extraction is codec work that
    slots into the same kernel)."""
    decoded = decode_media(df, fake=fake)
    return (
        decoded.filter(F.col("valid") & (F.col("kind") == "video"))
        .withColumn(
            "frame_idx",
            F.explode(
                F.sequence(
                    F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_n)
                )
            ),
        )
        .select("media_id", "frame_idx", "width", "height")
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("valid", T.BooleanType(), False),
    ]
)


def resize_media(df: DataFrame, max_w: int, max_h: int, fake: bool = True) -> DataFrame:
    """Aspect-preserving downscale to fit (max_w, max_h): the scale factor
    and target dims are computed per record in the Arrow batch; the fake
    codec rewrites the header with the new dims and keeps the payload (a
    real codec re-encodes pixels in the same spot). Records already small
    enough pass through byte-identical; invalid blobs yield NULL content
    with valid=false (per-record containment, never a job failure)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            if not len(batch):
                continue
            rows = []
            for _, r in batch.iterrows():
                content = bytes(r["content"])
                ok = len(content) >= HEADER_LEN and content[:4] == MAGIC
                if not ok:
                    rows.append(
                        {
                            "media_id": r["media_id"],
                            "kind": r["kind"],
                            "content": None,
                            "width": None,
                            "height": None,
                            "valid": False,
                        }
                    )
                    continue
                w, h, nf = struct.unpack(">III", content[4:HEADER_LEN])
                if w > max_w or h > max_h:
                    scale = min(max_w / w, max_h / h) if w and h else 1.0
                    w2, h2 = max(1, int(w * scale)), max(1, int(h * scale))
                    if not fake:
                        raise NotImplementedError(
                            "real resize codec goes here (PIL Image.resize / "
                            "ffmpeg scale) — same record contract as the fake"
                        )
                    content = (
                        MAGIC + struct.pack(">III", w2, h2, nf) + content[HEADER_LEN:]
                    )
                    w, h = w2, h2
                rows.append(
                    {
                        "media_id": r["media_id"],
                        "kind": r["kind"],
                        "content": content,
                        "width": w,
                        "height": h,
                        "valid": True,
                    }
                )
            yield pd.DataFrame(rows)

    return df.mapInPandas(kernel, schema=RESIZED_SCHEMA)


FEATURE_DIM = 64

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
        T.StructField("valid", T.BooleanType(), False),
    ]
)


def extract_features(df: DataFrame, fake: bool = True) -> DataFrame:
    """Feature extraction: binary content -> unit-norm float vector, one
    vectorized numpy pass per Arrow batch (the real model — CLIP/wav2vec —
    drops into the same kernel; the fake is a deterministic byte-histogram
    projection so tests are exact). Output schema array<float> matches the
    embeddings table, so decoded media feeds straight into the similarity
    operators (cosine_topk / lsh_neardup_pairs) — media dedup for free."""
    import numpy as np

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            if not len(batch):
                continue
            out = []
            for _, r in batch.iterrows():
                content = bytes(r["content"])
                ok = len(content) >= HEADER_LEN and content[:4] == MAGIC
                if not ok:
                    out.append(
                        {
                            "media_id": r["media_id"],
                            "kind": r["kind"],
                            "embedding": None,
                            "valid": False,
                        }
                    )
                    continue
                if not fake:
                    raise NotImplementedError(
                        "real feature model (CLIP/wav2vec) goes here — same "
                        "(bytes) -> (float[FEATURE_DIM]) contract"
                    )
                payload = np.frombuffer(content[HEADER_LEN:], dtype=np.uint8)
                hist = np.bincount(payload % FEATURE_DIM, minlength=FEATURE_DIM).astype(
                    np.float64
                )
                hist += 1.0 / FEATURE_DIM  # never the zero vector
                vec = hist / np.linalg.norm(hist)
                out.append(
                    {
                        "media_id": r["media_id"],
                        "kind": r["kind"],
                        "embedding": vec.astype(np.float32).tolist(),
                        "valid": True,
                    }
                )
            yield pd.DataFrame(out)

    return df.mapInPandas(kernel, schema=FEATURES_SCHEMA)
