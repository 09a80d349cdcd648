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
    "mm_binary_frames",
    oracle="""
WITH frames AS (
    SELECT doc_id,
           CAST(i AS INT) AS frame_no,
           CAST(octet_length(encode(substring(text, 1 + i * 64, 64)))
                AS INT) AS frame_bytes,
           md5(substring(text, 1 + i * 64, 64)) AS frame_checksum
    FROM documents,
         UNNEST(range(0, CAST(ceil(length(text) / 64.0) AS INT))) t(i)
    WHERE i % 2 = 0
)
SELECT d.doc_id,
       'text/plain' AS media_type,
       octet_length(encode(d.text)) AS n_bytes,
       md5(d.text) AS checksum,
       COALESCE(f.frame_no, -1) AS frame_no,
       COALESCE(f.frame_bytes, 0) AS frame_bytes,
       COALESCE(f.frame_checksum, '') AS frame_checksum
FROM documents d
LEFT JOIN frames f ON d.doc_id = f.doc_id
ORDER BY d.doc_id, frame_no
""",
)
def mm_binary_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal composite (r11 capacity fold of the standalone
    mm_binary_metadata + mm_frame_sample rows, plans/registry.py slot
    plan): opaque-binary metadata extraction (binary column + typed
    metadata struct, computed JVM-side with no decode) LEFT-joined to
    frame-sampling over the same payloads (every 2nd 64-unit 'frame'
    through Arrow-batched mapInPandas - one row in -> N frame rows out,
    the cardinality-changing video-pipeline shape; deterministic fake
    codec, real codecs env-stubbed). The LEFT join keeps zero-frame
    docs (empty payloads) on the metadata surface with sentinel frame
    columns - deterministic sort keys on both engines, no NULL-ordering
    divergence. The doc-sized-to-frames join carries no hint: both
    sides grow with the corpus, AQE governs the strategy. The oracle
    rebuilds frames with slicing + md5, proving the pandas stage
    preserves exact content semantics."""
    from ..operators.multimodal import sample_frames

    docs = load_table(spark, sf_dir, "documents")
    payload = F.col("text").cast("binary")
    meta = binary_metadata(payload, "text/plain")
    meta_df = docs.select(
        "doc_id",
        meta["media_type"].alias("media_type"),
        meta["n_bytes"].alias("n_bytes"),
        meta["checksum"].alias("checksum"),
    )
    with_payload = docs.select("doc_id", payload.alias("payload"))
    frames = sample_frames(with_payload)
    return (meta_df.join(frames, "doc_id", "left")
            .select(
                "doc_id", "media_type", "n_bytes", "checksum",
                F.coalesce("frame_no", F.lit(-1)).alias("frame_no"),
                F.coalesce("frame_bytes", F.lit(0)).alias("frame_bytes"),
                F.coalesce("frame_checksum", F.lit("")).alias(
                    "frame_checksum"),
            )
            .orderBy("doc_id", "frame_no"))


#: DuckDB twin of the fake codec's byte histogram: byte % 8 depends only
#: on each byte's LOW HEX NIBBLE (16 = 0 mod 8), so the histogram reads
#: off the even-position chars of hex(payload) - no blob byte-indexing
#: needed (DuckDB can't subscript BLOBs).
_DECODE_ORACLE = """
WITH nib AS (
    SELECT doc_id,
           (strpos('0123456789ABCDEF',
                   substring(hex(encode(text)), 2 * i, 1)) - 1) % 8 AS bin
    FROM documents,
         UNNEST(range(1, octet_length(encode(text)) + 1)) t(i)
)
SELECT d.doc_id,
       CAST(octet_length(encode(d.text)) AS INT) AS n_bytes,
       md5(d.text) AS checksum,
""" + ",\n".join(
    f"       CAST(COUNT(*) FILTER (WHERE n.bin = {b}) AS INT) AS bin_{b}"
    for b in range(8)) + """
FROM documents d
LEFT JOIN nib n ON d.doc_id = n.doc_id
GROUP BY d.doc_id, d.text
ORDER BY d.doc_id
"""


@register("mm_decode_features", oracle=_DECODE_ORACLE)
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched decode/feature-extract via mapInPandas (deterministic
    fake codec; real codecs stubbed - see operators/multimodal.py). The
    registered surface flattens the histogram to 8 scalar bin_N columns:
    driver-safe (the grading driver's pandas canonicalizer cannot sort
    array cells) AND oracle-checkable - the array form stays available
    via decode_features() directly."""
    docs = load_table(spark, sf_dir, "documents")
    with_payload = docs.select(
        "doc_id", F.col("text").cast("binary").alias("payload"))
    decoded = decode_features(with_payload)
    return decoded.select(
        "doc_id", "n_bytes", "checksum",
        *[F.col("byte_histogram")[b].alias(f"bin_{b}") for b in range(8)],
    ).orderBy("doc_id")


#: Resize oracle: byte k (0-based) of the payload is hex chars
#: (2k+1, 2k+2) of hex(payload), so the fake codec's nearest-neighbor
#: byte sampling (index (j*len)//target) reconstructs from the hex
#: string - DuckDB cannot subscript BLOBs, but never needs to.
_RESIZE_ORACLE = """
WITH px AS (
    SELECT doc_id,
           hex(encode(text)) AS hx,
           octet_length(encode(text)) AS n
    FROM documents
)
SELECT doc_id,
       CAST(8 AS INT) AS width,
       CAST(8 AS INT) AS height,
       string_agg(substring(hx, 2 * ((j * n) // 64) + 1, 2), ''
                  ORDER BY j) AS pixels_hex
FROM px, UNNEST(range(0, 64)) u(j)
WHERE n > 0
GROUP BY doc_id
ORDER BY doc_id
"""


@register("mm_image_resize", oracle=_RESIZE_ORACLE)
def mm_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-resize plumbing surface: every payload -> a fixed 8x8 pixel
    buffer via Arrow-batched mapInPandas (fake codec nearest-neighbor
    byte sampling; real decoders env-gated). Emitted as the hex string of
    the 64-byte buffer - driver-safe and bit-exactly reconstructible in
    SQL, proving the pandas stage's byte-level semantics."""
    from ..operators.multimodal import resize_images

    docs = load_table(spark, sf_dir, "documents")
    with_payload = docs.select(
        "doc_id", F.col("text").cast("binary").alias("payload"))
    resized = resize_images(with_payload, 8, 8)
    return resized.select(
        "doc_id", "width", "height",
        F.hex("pixels").alias("pixels_hex"),
    ).orderBy("doc_id")


# mm_binary_metadata and mm_frame_sample were folded into the
# mm_binary_frames composite above (r11 capacity fold): the metadata
# struct extraction and the cardinality-changing mapInPandas frame
# sampler are both exercised - and oracle-checked - inside that one
# contract row.
