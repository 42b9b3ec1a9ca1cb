"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Real decode (image/audio/video) libraries aren't in this container, so the
decode step is a deterministic fake — but the Spark-side plumbing is real:
binary columns travel as ``BinaryType``, metadata extraction runs as an
Arrow-batched ``mapInPandas`` with an explicit output schema, and the
operator parallelizes per input partition with zero shuffle.

Swap ``_fake_decode_meta`` for a real decoder (PIL/ffmpeg) without touching
the Spark plumbing.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("first_byte", T.IntegerType()),
        T.StructField("fake_width", T.IntegerType()),
        T.StructField("fake_height", T.IntegerType()),
    ]
)


def _fake_decode_meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic stand-in for an image decoder: derives 'dimensions'
    from the payload bytes. A real implementation would decode here
    (vectorized per Arrow batch) — signature and schema stay the same."""
    for pdf in batches:
        blobs = pdf["payload"]
        byte_len = blobs.map(len)
        first = blobs.map(lambda b: b[0] if len(b) else -1)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "byte_len": byte_len.astype("int64"),
                "first_byte": first.astype("int32"),
                "fake_width": (byte_len % 640).astype("int32"),
                "fake_height": (first.astype("int64") % 480).astype("int32"),
            }
        )


def extract_metadata(df: DataFrame, id_col: str, binary_col: str) -> DataFrame:
    """Arrow-batched metadata extraction over a binary column."""
    src = df.select(F.col(id_col).alias("doc_id"), F.col(binary_col).alias("payload"))
    return src.mapInPandas(_fake_decode_meta, schema=META_SCHEMA)


def documents_as_binary(df: DataFrame) -> DataFrame:
    """Model the documents table as a multimodal table: text re-encoded as
    an opaque binary payload column (utf-8)."""
    return df.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )


def decode_image_stub(*_args, **_kwargs):
    """Real image decode is unavailable in this environment (no PIL/ffmpeg)."""
    raise NotImplementedError(
        "image/audio decode requires PIL/ffmpeg — not installed in this container; "
        "use extract_metadata's mapInPandas plumbing with a real decoder instead"
    )
