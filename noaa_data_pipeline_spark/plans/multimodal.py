"""Multimodal-column operators: binary payloads + typed metadata.

The container has no image/audio codecs, so the *decode* step is a
deterministic stub (documented inline); everything Spark-side — the
binary column handling, metadata struct schema, Arrow-batched
``mapInPandas`` plumbing, batch shapes, and the relational
frame-sampling plan — is real and oracle-checked where SQL can
express it.

Data: payloads are derived deterministically from the ``documents``
corpus (text bytes stand in for encoded media), so both engines see
identical binary content.

Scale notes: binary columns ride through Spark as opaque byte arrays
(no row-level Python until an explicit mapInPandas stage); metadata
lives in a sibling struct column so pruning a query to metadata never
touches payload bytes — at 100 TB that's the difference between a
metadata-only scan and a full-corpus read.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..tables import load_table
from . import register

FRAME_EVERY = 7  # sample every 7th frame


def _with_payload(docs: DataFrame) -> DataFrame:
    """Attach a binary payload + typed media metadata to each doc.

    The payload is the utf8 encoding of the text (deterministic stand-
    in for encoded media bytes); metadata mimics an image header:
    format from source, width/height derived from doc_id.
    """
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.struct(
            F.col("source").alias("format"),
            (F.col("doc_id") % 640 + 16).cast("int").alias("width"),
            (F.col("doc_id") % 480 + 16).cast("int").alias("height"),
            (F.col("n_chars") % 120 + 1).cast("int").alias("n_frames"),
        ).alias("media_meta"),
    )


@register(
    "mm_binary_metadata",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS payload_md5,  -- payload IS the utf8 text bytes
           source AS format,
           CAST(doc_id % 640 + 16 AS INTEGER) AS width,
           CAST(doc_id % 480 + 16 AS INTEGER) AS height
    FROM documents
    """,
)
def mm_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque binary column + typed metadata struct: byte length and
    content hash compute JVM-side without any Python. Scale: pure
    map-side projection; metadata queries prune the payload column
    entirely (ReadSchema shows only the referenced fields)."""
    docs = load_table(spark, sf_dir, "documents")
    mm = _with_payload(docs)
    return mm.select(
        "doc_id",
        F.octet_length("payload").cast("long").alias("n_bytes"),
        F.md5("payload").alias("payload_md5"),
        F.col("media_meta.format").alias("format"),
        F.col("media_meta.width").alias("width"),
        F.col("media_meta.height").alias("height"),
    )


_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("mean_byte", T.DoubleType()),
        T.StructField("max_byte", T.IntegerType()),
        T.StructField("n_batch_rows", T.LongType()),
    ]
)


def _extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched feature extraction over binary payloads.

    A real deployment would decode the media here (PIL/librosa/ffmpeg
    are not in this container — the byte-level stats below are the
    deterministic stand-in for a decode + feature step). The batch
    shape is the part that matters at scale: one pandas frame per
    Arrow batch, vectorized numpy over each payload, no per-row
    Python function calls.
    """
    import numpy as np

    for pdf in batches:
        arrs = [np.frombuffer(b, dtype=np.uint8) for b in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "n_bytes": [a.size for a in arrs],
                "mean_byte": [float(a.mean()) if a.size else 0.0 for a in arrs],
                "max_byte": [int(a.max()) if a.size else 0 for a in arrs],
                # batch-shape witness: lets tests assert Arrow batching
                # actually happened (rows per batch > 1)
                "n_batch_rows": [len(pdf)] * len(pdf),
            }
        )


def mm_features_with_witness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The raw ``mapInPandas`` stage INCLUDING the n_batch_rows
    batch-shape witness column. tests/test_multimodal.py asserts the
    witness (rows per Arrow batch > 1 proves vectorized batching);
    the registry entry below drops it so the feature columns are
    oracle-checkable."""
    docs = load_table(spark, sf_dir, "documents")
    mm = _with_payload(docs).select("doc_id", "payload")
    return mm.mapInPandas(_extract_features, schema=_FEATURE_SCHEMA)


# Hex-nibble decode: DuckDB has no byte-indexing on BLOBs, but
# hex(encode(text)) exposes every byte as two hex digits, and strpos
# over the digit alphabet converts a pair back to its integer value —
# exact for arbitrary bytes, no ASCII assumption. mean_byte divides
# two exact integers in double, which both engines round identically
# (numpy's .mean() on uint8 is the same exact-int division).
_SQL_BYTE = (
    "(strpos('0123456789ABCDEF', upper(substr(h, 2 * i - 1, 1))) - 1) * 16"
    " + (strpos('0123456789ABCDEF', upper(substr(h, 2 * i, 1))) - 1)"
)


@register(
    "mm_feature_extract_pandas",
    oracle=f"""
    WITH bytes AS (
        SELECT doc_id, {_SQL_BYTE} AS b
        FROM (SELECT doc_id, hex(encode(text)) AS h FROM documents) s,
             UNNEST(range(1, length(h) // 2 + 1)) AS u(i)
    )
    SELECT d.doc_id,
           CAST(COUNT(b.b) AS BIGINT) AS n_bytes,
           COALESCE(CAST(SUM(b.b) AS DOUBLE) / NULLIF(COUNT(b.b), 0), 0.0)
               AS mean_byte,
           CAST(COALESCE(MAX(b.b), 0) AS INTEGER) AS max_byte
    FROM documents d
    LEFT JOIN bytes b USING (doc_id)
    GROUP BY d.doc_id
    """,
)
def mm_feature_extract_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode/feature-extract stage as ``mapInPandas``: payload bytes
    -> numeric features via vectorized numpy per Arrow batch (decode
    itself stubbed — no codecs in this container). Oracle-checked
    (promoted in r6): the byte-level stats are deterministic
    functions of the payload, and the oracle re-derives every byte
    from the hex expansion of the same utf8 payload — the
    n_batch_rows batch-shape witness that previously blocked an
    oracle moved to :func:`mm_features_with_witness`, asserted by
    pytest. Scale: Arrow transfer batches ~10k rows, so Python
    crossing cost is per-batch, not per-row; the stage preserves
    partitioning (no shuffle)."""
    return mm_features_with_witness(spark, sf_dir).select(
        "doc_id", "n_bytes", "mean_byte", "max_byte"
    )


@register(
    "mm_frame_sample",
    oracle=f"""
    SELECT doc_id, frame_idx,
           md5(md5(text) || '|' || frame_idx) AS frame_key
    FROM (
        SELECT doc_id, text,
               unnest(range(0, CAST(n_chars % 120 + 1 AS BIGINT), {FRAME_EVERY})) AS frame_idx
        FROM documents
    ) s
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling as a relational plan: every {FRAME_EVERY}th
    frame index per clip via sequence()+explode, with a deterministic
    frame key (md5 of payload-hash + index) standing in for the
    decoded frame. Scale: the explode fan-out is bounded by
    n_frames/{FRAME_EVERY} per row and never shuffles; downstream
    per-frame stages inherit the partitioning."""
    docs = load_table(spark, sf_dir, "documents")
    mm = _with_payload(docs)
    frames = mm.select(
        "doc_id",
        F.md5("payload").alias("payload_md5"),
        F.explode(
            F.sequence(
                F.lit(0).cast("long"),
                (F.col("media_meta.n_frames") - 1).cast("long"),
                F.lit(FRAME_EVERY).cast("long"),
            )
        ).alias("frame_idx"),
    )
    return frames.select(
        "doc_id",
        "frame_idx",
        F.md5(F.concat_ws("|", "payload_md5", "frame_idx")).alias("frame_key"),
    )


RESIZE_BOX = 224  # target long side (the standard vision-model input)


@register(
    "mm_resize_dims",
    oracle=f"""
    SELECT doc_id, width, height,
           CAST(CASE WHEN greatest(width, height) <= {RESIZE_BOX} THEN width
                ELSE width * {RESIZE_BOX} // greatest(width, height) END AS INTEGER) AS out_width,
           CAST(CASE WHEN greatest(width, height) <= {RESIZE_BOX} THEN height
                ELSE height * {RESIZE_BOX} // greatest(width, height) END AS INTEGER) AS out_height,
           greatest(width, height) > {RESIZE_BOX} AS needs_resize
    FROM (
        SELECT doc_id,
               CAST(doc_id % 640 + 16 AS INTEGER) AS width,
               CAST(doc_id % 480 + 16 AS INTEGER) AS height
        FROM documents
    ) m
    """,
)
def mm_resize_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize planning: aspect-preserving target dimensions for a
    {RESIZE_BOX}px long side, computed with integer arithmetic
    (floor-div — bit-identical across engines, no float rounding
    ambiguity) from the metadata struct alone. Scale: this is the
    stage that decides WHICH payloads a resize pass must decode —
    a metadata-only scan (payload column pruned) that at 100 TB
    turns a full-corpus read into a header read; the actual pixel
    resample would be the mapInPandas stage downstream of this
    filter (decode stubbed in this container, see
    _extract_features)."""
    docs = load_table(spark, sf_dir, "documents")
    mm = _with_payload(docs)
    w = F.col("media_meta.width")
    h = F.col("media_meta.height")
    longest = F.greatest(w, h)
    out_w = F.when(longest <= RESIZE_BOX, w).otherwise(
        (w * RESIZE_BOX).cast("long") / longest
    )
    out_h = F.when(longest <= RESIZE_BOX, h).otherwise(
        (h * RESIZE_BOX).cast("long") / longest
    )
    return mm.select(
        "doc_id",
        w.alias("width"),
        h.alias("height"),
        F.floor(out_w).cast("int").alias("out_width"),
        F.floor(out_h).cast("int").alias("out_height"),
        (longest > RESIZE_BOX).alias("needs_resize"),
    )
