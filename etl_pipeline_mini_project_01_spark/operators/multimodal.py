"""Multimodal column plumbing (north-star operator family).

Images/audio/video ride through the engine as opaque `binary` payload
columns with a typed metadata struct alongside - the schema/partitioning/
batching is real Spark; only the codec itself is stubbed (no image/audio
libraries in this environment).

Scale design: payloads stay in the executor (mapInPandas streams Arrow
batches; nothing collects to the driver); metadata extraction is a
column expression, so pruning a query to metadata never touches bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Arrow schema for decoded features - fixed width so downstream plans
#: can rely on it (the real decoder must honor the same contract).
DECODE_SCHEMA = (
    "doc_id bigint, n_bytes int, checksum string, byte_histogram array<int>"
)

N_HISTOGRAM_BINS = 8


def binary_metadata(payload: Column, media_type: str) -> Column:
    """Typed metadata struct for an opaque payload column - computed
    JVM-side, no decode."""
    return F.struct(
        F.lit(media_type).alias("media_type"),
        F.length(payload).alias("n_bytes"),
        F.md5(payload).alias("checksum"),
    )


def decode_features(df: DataFrame, payload_col: str = "payload",
                    key_col: str = "doc_id",
                    codec: str = "fake") -> DataFrame:
    """Decode/feature-extract via mapInPandas (Arrow-batched).

    codec='fake' is the deterministic stand-in used for tests: an
    N_HISTOGRAM_BINS-bin histogram of byte values mod bins. Real codecs
    (image resize, audio frames, video frame-sample) plug in here; they
    are STUBBED in this environment.
    """
    if codec != "fake":
        raise NotImplementedError(
            f"codec {codec!r}: real media decoding requires image/audio "
            "libraries not present in this environment; the Spark-side "
            "plumbing (schema, Arrow batching, partitioning) is what this "
            "operator provides")

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame({
                "doc_id": pdf[key_col],
                "n_bytes": pdf[payload_col].map(len),
                "checksum": pdf[payload_col].map(
                    lambda b: __import__("hashlib").md5(b).hexdigest()),
                "byte_histogram": pdf[payload_col].map(
                    lambda b: _histogram(b)),
            })
            yield out

    return df.mapInPandas(_decode, schema=DECODE_SCHEMA)


def _histogram(payload: bytes) -> list[int]:
    bins = [0] * N_HISTOGRAM_BINS
    for byte in payload:
        bins[byte % N_HISTOGRAM_BINS] += 1
    return bins
