"""Multimodal query surface: binary payload columns + metadata (oracle-
checked) and the mapInPandas decode path (rows-only - pandas stage is not
SQL-expressible)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.multimodal import binary_metadata, decode_features
from .registry import register


@register(
    "mm_binary_metadata",
    oracle="""
SELECT doc_id,
       'text/plain' AS media_type,
       octet_length(encode(text)) AS n_bytes,
       md5(text) AS checksum
FROM documents
ORDER BY doc_id
""",
)
def mm_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary metadata extraction: payload = utf-8 bytes of the
    document (the harness has no real media; the operator contract -
    binary column + typed metadata, no decode - is identical)."""
    docs = load_table(spark, sf_dir, "documents")
    payload = F.col("text").cast("binary")
    meta = binary_metadata(payload, "text/plain")
    return docs.select(
        "doc_id",
        meta["media_type"].alias("media_type"),
        meta["n_bytes"].alias("n_bytes"),
        meta["checksum"].alias("checksum"),
    ).orderBy("doc_id")


@register("mm_decode_features")
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched decode/feature-extract via mapInPandas (deterministic
    fake codec; real codecs stubbed - see operators/multimodal.py).
    Rows-only check: the pandas stage is not SQL-expressible in DuckDB."""
    docs = load_table(spark, sf_dir, "documents")
    with_payload = docs.select(
        "doc_id", F.col("text").cast("binary").alias("payload"))
    return decode_features(with_payload)


@register(
    "mm_frame_sample",
    oracle="""
SELECT doc_id,
       CAST(i AS INT) AS frame_no,
       CAST(octet_length(encode(substring(text, 1 + i * 64, 64))) AS INT)
           AS frame_bytes,
       md5(substring(text, 1 + i * 64, 64)) AS frame_checksum
FROM documents,
     UNNEST(range(0, CAST(ceil(length(text) / 64.0) AS INT))) t(i)
WHERE i % 2 = 0
ORDER BY doc_id, frame_no
""",
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling over payloads (every 2nd 64-unit 'frame', fake
    codec): one row in -> N frame rows out through Arrow-batched
    mapInPandas - cardinality-changing decode, the video-pipeline shape.
    The oracle rebuilds the same frames with slicing + md5, proving the
    pandas stage preserves exact content semantics."""
    from ..operators.multimodal import sample_frames

    docs = load_table(spark, sf_dir, "documents")
    with_payload = docs.select(
        "doc_id", F.col("text").cast("binary").alias("payload"))
    return sample_frames(with_payload).orderBy("doc_id", "frame_no")
