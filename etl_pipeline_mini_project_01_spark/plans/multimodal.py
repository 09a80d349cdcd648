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
