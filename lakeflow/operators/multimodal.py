"""Multimodal column plumbing (north star): opaque binary payloads + typed
metadata, processed via Arrow-batched ``mapInPandas``.

The container has no image/audio codecs, so the decode step is STUBBED:
``decode_image_stub`` derives deterministic fake metadata from the bytes and
``decode_image_real`` raises NotImplementedError where a codec (Pillow/ffmpeg)
would plug in. Everything Spark-side — schema, batch iteration, partitioning,
UDF signature — is real and tested.

Scale notes: binary payloads ride in parquet as BYTE_ARRAY; keep them OUT of
shuffle keys and aggregations. mapInPandas streams Arrow record batches, so
peak executor memory is one batch (tune spark.sql.execution.arrow
.maxRecordsPerBatch for fat rows, e.g. 1k rows for ~1 MB images).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "media_id bigint, byte_len int, format string, width int, height int, checksum string"
)


def attach_binary_payload(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Fixture adapter: treat utf-8 bytes of a text column as an opaque media
    blob with a media_id — the schema shape a real image/audio table has."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
    )


def decode_image_real(payload: bytes) -> dict:
    """Real decoder hook — requires an image codec, absent in this container."""
    raise NotImplementedError(
        "image decoding requires Pillow/opencv; install and replace the stub"
    )


def _stub_meta(payload: bytes) -> tuple[int, str, int, int, str]:
    """Deterministic fake decode: metadata derived purely from the bytes."""
    import hashlib

    n = len(payload)
    checksum = hashlib.md5(payload).hexdigest()
    fmt = ["png", "jpeg", "webp"][n % 3]
    width = 64 + (n % 640)
    height = 64 + ((n * 7) % 480)
    return n, fmt, width, height, checksum


def extract_media_meta(media: DataFrame) -> DataFrame:
    """mapInPandas decode/feature-extract: (media_id, payload) → typed metadata.

    The pandas function is the seam where a real decoder (resize, frame
    sample, EXIF) slots in; the stub keeps outputs deterministic for tests.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = [_stub_meta(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "byte_len": [m[0] for m in meta],
                    "format": [m[1] for m in meta],
                    "width": [m[2] for m in meta],
                    "height": [m[3] for m in meta],
                    "checksum": [m[4] for m in meta],
                }
            )

    return media.mapInPandas(decode, schema=MEDIA_META_SCHEMA)


RESIZED_SCHEMA = "media_id bigint, width int, height int, payload binary"

FRAME_SCHEMA = "media_id bigint, frame_idx int, frame_off bigint, frame_len int"


def resize_images(media: DataFrame, width: int = 32, height: int = 32) -> DataFrame:
    """mapInPandas resize: (media_id, payload) → fixed-size thumbnail payload.

    Stub transform (no codec in container): deterministic byte-fold down to
    width*height bytes. The Spark-side contract is the real part — binary in,
    binary out, Arrow-batched, output size bounded per row so
    maxRecordsPerBatch tuning carries over unchanged to a Pillow decoder.
    """
    import hashlib

    target = width * height

    def do_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for p in pdf["payload"]:
                # Deterministic fold: repeat md5 stream to target length.
                stream = b""
                seed = bytes(p)
                while len(stream) < target:
                    seed = hashlib.md5(seed).digest()
                    stream += seed
                out.append(stream[:target])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "width": width,
                    "height": height,
                    "payload": out,
                }
            )

    return media.mapInPandas(do_resize, schema=RESIZED_SCHEMA)


def sample_frames(media: DataFrame, frame_bytes: int = 256) -> DataFrame:
    """Row-expanding mapInPandas frame sampler: one output row per
    ``frame_bytes`` window of the payload (a video decoder emits one row per
    sampled frame the same way — the 1→N batch shape is what matters).

    Output rows per media = ceil(byte_len / frame_bytes), deterministic.
    """

    def do_sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, offs, lens = [], [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                n = len(p)
                k = max(1, -(-n // frame_bytes))
                for i in range(k):
                    ids.append(int(mid))
                    idxs.append(i)
                    offs.append(i * frame_bytes)
                    lens.append(min(frame_bytes, n - i * frame_bytes))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_off": pd.Series(offs, dtype="int64"),
                    "frame_len": pd.Series(lens, dtype="int32"),
                }
            )

    return media.mapInPandas(do_sample, schema=FRAME_SCHEMA)


FEATURES_SCHEMA = "media_id long, embedding array<float>"


def extract_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """mapInPandas feature extraction: (media_id, payload) → unit-norm float
    embedding — the encoder stage of a multimodal training pipeline.

    Stub encoder (no model runtime in container): md5-stream bytes mapped to
    [-0.5, 0.5) then L2-normalized — deterministic per payload, so tests and
    oracles can assert exact values. The Spark contract is the real part:
    binary in, ``array<float>`` out, Arrow-batched, one row per input — a
    real CLIP/ViT encoder drops in by replacing the inner function, and the
    output column feeds operators/similarity.py unchanged (cosine top-k, LSH,
    IVF) for cross-modal retrieval.
    """
    import hashlib
    import math

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = []
            for p in pdf["payload"]:
                stream = b""
                seed = bytes(p)
                while len(stream) < dim:
                    seed = hashlib.md5(seed).digest()
                    stream += seed
                raw = [b / 256.0 - 0.5 for b in stream[:dim]]
                nrm = math.sqrt(sum(x * x for x in raw)) or 1.0
                vecs.append([float(x / nrm) for x in raw])
            yield pd.DataFrame(
                {"media_id": pdf["media_id"].astype("int64"), "embedding": vecs}
            )

    return media.mapInPandas(encode, schema=FEATURES_SCHEMA)
