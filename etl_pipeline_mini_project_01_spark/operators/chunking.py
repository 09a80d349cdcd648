"""Context-window chunking: split documents into ~chunk_tokens-token
pieces with a fixed-token overlap - the step between curation and
tokenization in a training-data pipeline (long documents must become
model-context-sized training rows without losing boundary context).

Spark-first: the whole operator is built-in array functions (tokenize ->
F.sequence of chunk starts -> F.slice per start -> posexplode), so it
stays inside whole-stage codegen - no UDF, no Python in the hot path,
and chunking is embarrassingly parallel (row-local: zero shuffles; the
plan is scan -> generate -> project).

Contract (pinned in tests/test_chunking.py):
  * every chunk except possibly the last has exactly `chunk_tokens`
    tokens; the last has at least 1;
  * consecutive chunks overlap by exactly `overlap` tokens;
  * stripping the leading `overlap` tokens from every chunk after the
    first reconstructs the document's token stream exactly;
  * a document with <= chunk_tokens tokens yields exactly 1 chunk;
  * empty/whitespace-only documents yield 0 chunks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import word_array


def chunk_documents(df: DataFrame, chunk_tokens: int = 256,
                    overlap: int = 32, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """(doc_id, chunk_id, n_tokens, chunk_text): fixed-size token windows
    with `overlap` tokens of context carried between consecutive chunks.

    A trailing window that would only repeat the previous chunk's overlap
    (start > 0 and fewer than `overlap`+1 new tokens) is not emitted:
    starts advance by the stride (chunk_tokens - overlap) only while new
    content remains.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(f"need 0 <= overlap < chunk_tokens, got "
                         f"{overlap=}, {chunk_tokens=}")
    stride = chunk_tokens - overlap
    toks = df.select(id_col, word_array(text_col).alias("_w"))
    # Chunk start offsets (1-based for F.slice): 1, 1+stride, 1+2*stride,
    # ... while start <= len - overlap (i.e. the window adds new tokens).
    starts = F.when(
        F.size("_w") > 0,
        F.sequence(F.lit(1),
                   F.greatest(F.size("_w") - overlap, F.lit(1)),
                   F.lit(stride)),
    ).otherwise(F.array().cast("array<int>"))
    chunks = toks.select(
        id_col,
        F.posexplode(F.transform(
            starts, lambda s: F.slice("_w", s, chunk_tokens))
        ).alias("chunk_id", "_ctoks"))
    return chunks.select(
        id_col,
        "chunk_id",
        F.size("_ctoks").alias("n_tokens"),
        F.array_join("_ctoks", " ").alias("chunk_text"),
    )
