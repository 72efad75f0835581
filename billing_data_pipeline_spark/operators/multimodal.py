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
        # all nullable (review r8): lake reality — failed downloads leave
        # NULL blobs, joins leave NULL ids — and the decode kernels
        # contain both (valid=false / NULL-id manifest row) rather than
        # reject them at the schema door. Parquet scans surface nullable
        # columns anyway; the old non-null declaration only ever bound
        # createDataFrame test fixtures.
        T.StructField("media_id", T.LongType(), True),
        T.StructField("kind", T.StringType(), True),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        # media_id/kind nullable (review r8, NULL-key probe): a record
        # with an unknown id must decode to a NULL-id manifest row — a
        # non-nullable field turns it into EXPRESSION_DECODING_FAILED
        # and kills the job (the applyInPandasWithState crash's twin)
        T.StructField("media_id", T.LongType(), True),
        T.StructField("kind", T.StringType(), True),
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
    # direct column zip, not iterrows() (review r7): iterrows builds a
    # dtype-coerced Series per record — pure overhead for a few bytes of
    # header parsing per row
    for mid, kind, raw in zip(
        batch["media_id"], batch["kind"], batch["content"]
    ):
        # NULL blob -> empty -> valid=false (review r8, NULL-key probe):
        # bytes(None) raised and killed the whole job, violating this
        # module's own containment contract ("malformed blobs yield
        # valid=false, never a job failure")
        content = bytes(raw) if raw is not None else b""
        ok = len(content) >= HEADER_LEN and content[:4] == MAGIC
        if ok:
            w, h, nf = struct.unpack(">III", content[4:HEADER_LEN])
            # u32 fields above int32 are malformed headers, not crashes:
            # the Arrow IntegerType cast would overflow the whole task
            # (review r5; _parse_png/_parse_wav already guard this)
            if max(w, h, nf) > 0x7FFFFFFF:
                ok, w, h, nf = False, None, None, None
        else:
            w = h = nf = None
        rows.append(
            {
                "media_id": mid,
                "kind": kind,
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
    if h == -(1 << 31):
        # abs(INT32_MIN) = 2^31 overflows the IntegerType height column —
        # the same u32->int32 containment the PNG/WAV parsers got in
        # r4/r5, missing only here (review r6): malformed, not fatal
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
    # u32 header fields above int32 max are MALFORMED here, not values:
    # the decoded schema stores IntegerType, and letting them through
    # would wrap negative (or crash the Arrow safe-cast) instead of the
    # promised valid=false containment (review r4)
    if not w or not h or w > 0x7FFFFFFF or h > 0x7FFFFFFF:
        return None
    return w, h, 1


def _wav_data_chunk(content: bytes) -> bytes | None:
    """Payload of the WAV's data chunk — the LAST 'data' chunk, with the
    declared length clamped to the real bytes, exactly matching
    _parse_wav's n_frames accounting (review r5: extract_features carried
    an inline copy of this walk that took the FIRST chunk unclamped, so a
    two-data-chunk or length-lying WAV got n_frames from one chunk and
    features from another)."""
    pos, data = 12, None
    while pos + 8 <= len(content):
        cid = content[pos : pos + 4]
        clen = struct.unpack_from("<I", content, pos + 4)[0]
        if cid == b"data":
            data = content[pos + 8 : pos + 8 + min(clen, len(content) - pos - 8)]
        pos += 8 + clen + (clen & 1)
    return data


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
    # same int32 containment rule as _parse_png (review r4)
    if rate > 0x7FFFFFFF or n_frames > 0x7FFFFFFF:
        return None
    return rate, channels, n_frames


def _decode_real(batch: pd.DataFrame) -> pd.DataFrame:
    """Dependency-free real decoders: BMP / PNG / WAV header+layout parsing
    (pure byte arithmetic — no PIL/ffmpeg, which this container lacks).
    Formats beyond these would slot into the same sniff table; unknown or
    malformed blobs yield valid=false, never a job failure."""
    rows = []
    for mid, kind, raw in zip(
        batch["media_id"], batch["kind"], batch["content"]
    ):
        # NULL blob -> empty -> valid=false, not a job failure (review
        # r8; same guard as _decode_fake)
        content = bytes(raw) if raw is not None else b""
        parsed = _parse_bmp(content) or _parse_png(content) or _parse_wav(content)
        rows.append(
            {
                "media_id": mid,
                "kind": kind,
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
    if every_n < 1:
        # fail at plan time like chunk_tokens, not mid-job in F.sequence
        raise ValueError(f"every_n must be >= 1, got {every_n}")
    # Per-record containment for hostile frame counts (review r6): a fake
    # header with n_frames = INT32_MAX is 'valid' shape-wise, but one such
    # record's F.sequence would exceed Spark's max array length (or OOM an
    # executor) and kill the whole job. 4M sampled indices per record is
    # far past any real video (36 h at 30 fps) — beyond it the record is
    # malformed by fiat and yields no frames, like any other parse reject.
    max_samples = 4_000_000
    n_sampled = (F.col("n_frames") - 1) / F.lit(every_n) + 1
    decoded = decode_media(df, fake=fake)
    return (
        # n_frames > 0: a zero-frame (or NULL-frame-count) video has no
        # frames to sample — the old greatest(n-1, 0) clamp emitted a
        # phantom frame_idx=0 row pointing past the payload (review r4)
        decoded.filter(
            F.col("valid")
            & (F.col("kind") == "video")
            & (F.col("n_frames") > 0)
            & (n_sampled <= max_samples)
        )
        .withColumn(
            "frame_idx",
            F.explode(
                F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
            ),
        )
        .select("media_id", "frame_idx", "width", "height")
    )


RESIZED_SCHEMA = T.StructType(
    [
        # nullable ids/kinds: a NULL-id source row must flow through as a
        # contained valid=false record, not an EXPRESSION_DECODING_FAILED
        # crash (review r8 — same contract DECODED_SCHEMA already carries)
        T.StructField("media_id", T.LongType(), True),
        T.StructField("kind", T.StringType(), True),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("valid", T.BooleanType(), False),
    ]
)


def _bmp_pixels(content: bytes) -> "tuple | None":
    """Decode an uncompressed 24-bpp BMP into (H, W, 3) uint8 (top-down row
    order). Returns None for anything the pure-python decoder can't read."""
    import numpy as np

    parsed = _parse_bmp(content)
    if parsed is None:
        return None
    w, h, _ = parsed
    bpp = struct.unpack_from("<H", content, 28)[0]
    compression = struct.unpack_from("<I", content, 30)[0]
    if bpp != 24 or compression != 0:
        return None
    offset = struct.unpack_from("<I", content, 10)[0]
    stride = (w * 3 + 3) & ~3
    if len(content) < offset + stride * h:
        return None
    raw = np.frombuffer(content, dtype=np.uint8, count=stride * h, offset=offset)
    rows = raw.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    # positive stored height = bottom-up rows; negative = already top-down
    raw_h = struct.unpack_from("<i", content, 22)[0]
    return rows[::-1] if raw_h > 0 else rows


def _bmp_encode(pixels) -> bytes:
    """(H, W, 3) uint8 top-down -> uncompressed 24-bpp BMP bytes."""
    import numpy as np

    h, w, _ = pixels.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = pixels[::-1].reshape(h, w * 3)
    data = rows.tobytes()
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    head = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(data), 0, 0, 14 + 40)
    return head + dib + data


def resize_media(df: DataFrame, max_w: int, max_h: int, fake: bool = True) -> DataFrame:
    """Aspect-preserving downscale to fit (max_w, max_h): the scale factor
    and target dims are computed per record in the Arrow batch.

    ``fake=True``: rewrites the synthetic MM01 header with the new dims and
    keeps the payload. ``fake=False``: REAL resize for uncompressed 24-bpp
    BMP — decode the pixel grid (numpy), nearest-neighbor sample to the
    target dims, re-encode a valid BMP. Records already small enough pass
    through byte-identical, including decodable-but-not-resizable formats
    (an in-bounds PNG; audio, which has no pixel grid to bound); ONLY a
    required resize without a pixel codec (oversized PNG/JPEG/video — the
    PIL/ffmpeg seam) or an undecodable blob yields NULL content with
    valid=false (per-record containment, never a job failure)."""
    import numpy as np

    def fit(w: int, h: int) -> tuple[int, int] | None:
        # zero/negative/u32-overflow dims are malformed, not 'scale 1.0':
        # the old fallback passed a 5000x0 record through unscaled with
        # valid=true, and >int32 dims crashed the Arrow cast (review r5)
        if not (0 < w <= 0x7FFFFFFF and 0 < h <= 0x7FFFFFFF):
            return None
        scale = min(max_w / w, max_h / h)
        return max(1, int(w * scale)), max(1, int(h * scale))

    def real_record(r) -> dict:
        # NULL blob -> empty -> valid=false, never a TypeError job kill
        # (review r8; same guard as _decode_real/_decode_fake)
        raw = r["content"]
        content = bytes(raw) if raw is not None else b""
        base = {"media_id": r["media_id"], "kind": r["kind"]}
        pix = _bmp_pixels(content)
        if pix is not None:
            h, w, _ = pix.shape
            if w <= max_w and h <= max_h:
                return {**base, "content": content, "width": w, "height": h,
                        "valid": True}
            fitted = fit(w, h)
            if fitted is None:  # unreachable for a decoded grid; contained
                return {**base, "content": None, "width": None,
                        "height": None, "valid": False}
            w2, h2 = fitted
            yi = (np.arange(h2) * h // h2).astype(np.int64)
            xi = (np.arange(w2) * w // w2).astype(np.int64)
            out = _bmp_encode(pix[yi][:, xi])
            return {**base, "content": out, "width": w2, "height": h2,
                    "valid": True}
        # Decodable-but-not-resizable formats: pass through when no resize
        # is needed (a BMP whose bpp the pixel decoder doesn't cover, a
        # PNG within bounds; audio has no pixel grid to bound); only a
        # REQUIRED resize without a pixel codec is a failure. The BMP
        # header fallback mirrors the PNG branch (review r4: an in-bounds
        # 32-bpp BMP was destroyed with valid=false although no resize
        # was needed).
        # one rule for every parseable-but-not-resizable image format
        # (review r7: the BMP and PNG branches were identical copy-paste —
        # the r4 32-bpp containment fix had to land twice)
        for parse in (_parse_bmp, _parse_png):
            parsed = parse(content)
            if parsed is not None:
                w, h, _ = parsed
                if w <= max_w and h <= max_h:
                    return {**base, "content": content, "width": w,
                            "height": h, "valid": True}
                return {**base, "content": None, "width": None,
                        "height": None, "valid": False}
        if _parse_wav(content) is not None:
            return {**base, "content": content, "width": None, "height": None,
                    "valid": True}
        return {**base, "content": None, "width": None, "height": None,
                "valid": False}

    def fake_record(r) -> dict:
        # same NULL-blob containment as real_record (review r8)
        raw = r["content"]
        content = bytes(raw) if raw is not None else b""
        base = {"media_id": r["media_id"], "kind": r["kind"]}
        ok = len(content) >= HEADER_LEN and content[:4] == MAGIC
        if not ok:
            return {**base, "content": None, "width": None, "height": None,
                    "valid": False}
        w, h, nf = struct.unpack(">III", content[4:HEADER_LEN])
        if not (0 < w <= 0x7FFFFFFF and 0 < h <= 0x7FFFFFFF):
            # malformed dims: contained as invalid, never passed through
            # unscaled or crashed into the Arrow int32 cast (review r5)
            return {**base, "content": None, "width": None, "height": None,
                    "valid": False}
        if w > max_w or h > max_h:
            w, h = fit(w, h)
            content = MAGIC + struct.pack(">III", w, h, nf) + content[HEADER_LEN:]
        return {**base, "content": content, "width": w, "height": h,
                "valid": True}

    record = fake_record if fake else real_record

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            if len(batch):
                # column zip, not iterrows (review r7 — see _decode_fake)
                yield pd.DataFrame(
                    [
                        record({"media_id": m, "kind": k, "content": c})
                        for m, k, c in zip(
                            batch["media_id"], batch["kind"], batch["content"]
                        )
                    ]
                )

    return df.mapInPandas(kernel, schema=RESIZED_SCHEMA)


FEATURE_DIM = 64

FEATURES_SCHEMA = T.StructType(
    [
        # nullable ids/kinds: same NULL-row containment contract as
        # DECODED_SCHEMA / RESIZED_SCHEMA (review r8)
        T.StructField("media_id", T.LongType(), True),
        T.StructField("kind", T.StringType(), True),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
        T.StructField("valid", T.BooleanType(), False),
    ]
)


def extract_features(df: DataFrame, fake: bool = True) -> DataFrame:
    """Feature extraction: binary content -> unit-norm float vector, one
    numpy pass per record inside the Arrow batch. Output schema
    array<float> matches the embeddings table, so decoded media feeds
    straight into the similarity operators (cosine_topk /
    lsh_neardup_pairs) — media dedup for free.

    ``fake=True`` histograms the synthetic MM01 payload bytes.
    ``fake=False`` extracts from REAL decoded content — BMP pixel values /
    WAV sample bytes via the pure-python decoders — a deterministic
    content-level descriptor (identical pixels => identical vector; a
    learned model like CLIP/wav2vec drops into the same
    (decoded content) -> (float[FEATURE_DIM]) seam). Undecodable blobs
    yield valid=false, never a job failure."""
    import numpy as np

    def payload_of(content: bytes):
        if fake:
            if len(content) >= HEADER_LEN and content[:4] == MAGIC:
                return np.frombuffer(content[HEADER_LEN:], dtype=np.uint8)
            return None
        pix = _bmp_pixels(content)
        if pix is not None:
            return pix.reshape(-1)
        wav = _parse_wav(content)
        if wav is not None:
            data = _wav_data_chunk(content)
            if data is not None:
                return np.frombuffer(data, dtype=np.uint8)
        return None

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            if not len(batch):
                continue
            out = []
            for mid, kind, raw in zip(
                batch["media_id"], batch["kind"], batch["content"]
            ):
                # NULL blob -> empty -> valid=false (review r8; same
                # guard as _decode_real)
                payload = payload_of(bytes(raw) if raw is not None else b"")
                if payload is None:
                    out.append(
                        {
                            "media_id": mid,
                            "kind": kind,
                            "embedding": None,
                            "valid": False,
                        }
                    )
                    continue
                hist = np.bincount(payload % FEATURE_DIM, minlength=FEATURE_DIM).astype(
                    np.float64
                )
                hist += 1.0 / FEATURE_DIM  # never the zero vector
                vec = hist / np.linalg.norm(hist)
                out.append(
                    {
                        "media_id": mid,
                        "kind": kind,
                        "embedding": vec.astype(np.float32).tolist(),
                        "valid": True,
                    }
                )
            yield pd.DataFrame(out)

    return df.mapInPandas(kernel, schema=FEATURES_SCHEMA)
