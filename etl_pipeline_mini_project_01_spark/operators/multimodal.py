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


FRAME_SIZE = 64  # units per fake "frame" (chars for the fake codec)

FRAME_SCHEMA = ("doc_id bigint, frame_no int, frame_bytes int, "
                "frame_checksum string")

RESIZE_SCHEMA = "doc_id bigint, width int, height int, pixels binary"


def sample_frames(df: DataFrame, payload_col: str = "payload",
                  key_col: str = "doc_id", every_n: int = 2,
                  codec: str = "fake") -> DataFrame:
    """Video frame-sampling plumbing: one payload row -> N frame rows
    (mapInPandas legitimately changes cardinality), keeping every
    `every_n`-th frame. codec='fake' decodes the payload as utf-8 and
    treats each FRAME_SIZE-char chunk as a frame - deterministic and
    oracle-expressible (DuckDB cannot byte-slice BLOBs); a real video
    codec plugs into the same schema/batch shape (chunking raw bytes)
    and is env-stubbed."""
    if codec != "fake":
        raise NotImplementedError(
            f"codec {codec!r}: real video decoding requires libraries "
            "not present in this environment")

    import hashlib

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for key, payload in zip(pdf[key_col], pdf[payload_col]):
                text = payload.decode("utf-8")
                n_frames = (len(text) + FRAME_SIZE - 1) // FRAME_SIZE
                for i in range(0, n_frames, every_n):
                    chunk = text[i * FRAME_SIZE:(i + 1) * FRAME_SIZE]
                    raw = chunk.encode("utf-8")
                    rows.append((key, i, len(raw),
                                 hashlib.md5(raw).hexdigest()))
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_no", "frame_bytes",
                               "frame_checksum"])

    return df.mapInPandas(_frames, schema=FRAME_SCHEMA)


def resize_images(df: DataFrame, width: int, height: int,
                  payload_col: str = "payload", key_col: str = "doc_id",
                  codec: str = "fake") -> DataFrame:
    """Image-resize plumbing: payload -> fixed (width x height) pixel
    buffer. codec='fake' nearest-neighbor-samples the raw byte stream to
    width*height bytes (deterministic); a real decoder (PIL etc.) slots
    into the same contract and is env-stubbed."""
    if codec != "fake":
        raise NotImplementedError(
            f"codec {codec!r}: real image decoding requires libraries "
            "not present in this environment")

    target = width * height

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def sample(payload: bytes) -> bytes:
                if not payload:
                    return bytes(target)
                # nearest-neighbor over the byte stream
                return bytes(payload[(i * len(payload)) // target]
                             for i in range(target))
            yield pd.DataFrame({
                "doc_id": pdf[key_col],
                "width": width,
                "height": height,
                "pixels": pdf[payload_col].map(sample),
            })

    return df.mapInPandas(_resize, schema=RESIZE_SCHEMA)
