"""Multimodal column plumbing (beyond-reference, north-star op).

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata (schemas.MEDIA_SCHEMA). The Spark-side plumbing — schema,
partitioning, Arrow batch shape, ``mapInPandas`` operator signatures —
is real and tested; the actual codec work is STUBBED because the
image/audio libraries are not in this container:

- :func:`decode_media` raises ``NotImplementedError`` unless the
  optional codec import succeeds (import-try gate), or runs a
  clearly-marked deterministic fake when ``fake=True``.

Scale design (100 TB of media): payloads never shuffle — every
operator here is ``mapInPandas`` (narrow, per-partition, Arrow-
batched). Metadata-only derivations project the binary column away
before any wide op. Partition by content hash prefix for even file
sizes; batch size is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # optional codec stack (absent in this container)
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except Exception:  # pragma: no cover
    _HAS_PIL = False

METADATA_SCHEMA = (
    "media_id long, media_type string, byte_len long, content_hash string"
)
DECODED_SCHEMA = (
    "media_id long, media_type string, width int, height int, "
    "n_frames int, sample_rate int"
)


def attach_payload(
    df: DataFrame, id_col: str, text_col: str, type_col_mod: int = 3
) -> DataFrame:
    """Test/demo helper: derive an opaque binary payload column from a
    text column (utf-8 bytes) plus a media_type. Mirrors how a real
    pipeline would land raw bytes + type tag from object storage."""
    mtype = (
        F.when(F.col(id_col) % type_col_mod == 0, "image")
        .when(F.col(id_col) % type_col_mod == 1, "audio")
        .otherwise("video")
    )
    return df.select(
        F.col(id_col).alias("media_id"),
        mtype.alias("media_type"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
    )


def extract_metadata(media_df: DataFrame) -> DataFrame:
    """Codec-free metadata pass: byte length + content hash, computed
    in Arrow-batched pandas. md5 here matches SQL ``md5`` exactly, so
    the whole mapInPandas hop is oracle-checkable."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": pdf["payload"].map(
                        lambda b: len(b) if b is not None else 0
                    ),
                    "content_hash": pdf["payload"].map(
                        lambda b: hashlib.md5(b).hexdigest()
                        if b is not None
                        else None
                    ),
                }
            )

    return media_df.mapInPandas(op, METADATA_SCHEMA)


def decode_media(media_df: DataFrame, *, fake: bool = False) -> DataFrame:
    """Decode payloads to typed media properties.

    STUB: real decoding needs codec libraries not present in this
    container. With ``fake=True`` it produces *deterministic* fake
    dimensions derived from the content hash — keeping the operator
    signature, schema, and batch shape real for pipeline tests.
    """
    if not fake and not _HAS_PIL:
        raise NotImplementedError(
            "media decoding requires codec libraries (PIL/av) that are "
            "not installed; pass fake=True for the deterministic stub"
        )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                h = int(hashlib.md5(row["payload"]).hexdigest()[:8], 16)
                is_img = row["media_type"] == "image"
                is_vid = row["media_type"] == "video"
                out.append(
                    {
                        "media_id": row["media_id"],
                        "media_type": row["media_type"],
                        "width": 64 + h % 1024 if (is_img or is_vid) else 0,
                        "height": 64 + (h // 1024) % 1024 if (is_img or is_vid) else 0,
                        "n_frames": 1 + h % 300 if is_vid else (1 if is_img else 0),
                        "sample_rate": 16000 if row["media_type"] == "audio" else 0,
                    }
                )
            yield pd.DataFrame(out)

    return media_df.mapInPandas(op, DECODED_SCHEMA)


def sample_frames(
    media_df: DataFrame, every_n: int = 30, *, fake: bool = False
) -> DataFrame:
    """Frame sampling for video payloads (1->N row expansion through
    mapInPandas — the plumbing a real decoder plugs into). STUBBED
    like :func:`decode_media`."""
    if not fake and not _HAS_PIL:
        raise NotImplementedError(
            "frame sampling requires video codec libraries; pass "
            "fake=True for the deterministic stub"
        )

    schema = "media_id long, frame_idx int, frame_hash string"

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                if row["media_type"] != "video":
                    continue
                h = hashlib.md5(row["payload"]).hexdigest()
                n = 1 + int(h[:8], 16) % 300
                for idx in range(0, n, every_n):
                    rows.append(
                        {
                            "media_id": row["media_id"],
                            "frame_idx": idx,
                            "frame_hash": hashlib.md5(
                                f"{h}:{idx}".encode()
                            ).hexdigest(),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "frame_hash"]
            )

    return media_df.mapInPandas(op, schema)
