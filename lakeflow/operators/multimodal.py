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
