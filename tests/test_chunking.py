"""Context-window chunking contract: exact sizes, exact overlap, exact
reconstruction of the token stream, and a shuffle-free physical plan
(chunking is row-local and must stay that way)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from conftest import SF_DIR

from etl_pipeline_mini_project_01_spark.catalog import load_table
from etl_pipeline_mini_project_01_spark.operators.chunking import (
    chunk_documents,
)

CHUNK, OVERLAP = 64, 16


def _chunks(spark):
    docs = load_table(spark, SF_DIR, "documents")
    return chunk_documents(docs, CHUNK, OVERLAP).cache()


def test_chunk_sizes_and_ids(spark):
    rows = _chunks(spark).collect()
    by_doc: dict[str, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert by_doc, "fixture produced no chunks"
    for chunks in by_doc.values():
        chunks.sort(key=lambda r: r.chunk_id)
        assert [c.chunk_id for c in chunks] == list(range(len(chunks)))
        for c in chunks[:-1]:
            assert c.n_tokens == CHUNK
        assert 1 <= chunks[-1].n_tokens <= CHUNK
        # every non-first chunk contributes new tokens beyond the overlap
        for c in chunks[1:]:
            assert c.n_tokens > OVERLAP


def test_reconstruction_and_overlap(spark):
    docs = load_table(spark, SF_DIR, "documents")
    truth = {r.doc_id: r.toks for r in docs.select(
        "doc_id", F.filter(F.split(F.lower("text"), r"\s+"),
                           lambda t: t != "").alias("toks")).collect()}
    rows = _chunks(spark).collect()
    by_doc: dict[str, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, toks in truth.items():
        chunks = sorted(by_doc.get(doc_id, []), key=lambda r: r.chunk_id)
        if not toks:
            assert chunks == []
            continue
        parts = [chunks[0].chunk_text.split(" ")] + [
            c.chunk_text.split(" ")[OVERLAP:] for c in chunks[1:]]
        flat = [t for p in parts for t in p]
        assert flat == toks, f"reconstruction failed for {doc_id}"
        # exact overlap: each chunk's first OVERLAP tokens == previous
        # chunk's last OVERLAP tokens
        for prev, cur in zip(chunks, chunks[1:]):
            assert (cur.chunk_text.split(" ")[:OVERLAP]
                    == prev.chunk_text.split(" ")[-OVERLAP:])


def test_short_doc_single_chunk(spark):
    df = spark.createDataFrame(
        [("a", "one two three"), ("b", "   "), ("c", "x " * CHUNK)],
        "doc_id string, text string")
    rows = {r.doc_id: r for r in chunk_documents(df, CHUNK, OVERLAP).collect()}
    assert rows["a"].n_tokens == 3 and rows["a"].chunk_id == 0
    assert "b" not in rows  # whitespace-only doc: zero chunks
    assert rows["c"].n_tokens == CHUNK  # exactly-full doc: one chunk


def test_bad_params_raise(spark):
    df = spark.createDataFrame([("a", "x")], "doc_id string, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, 10, 10)
    with pytest.raises(ValueError):
        chunk_documents(df, 10, -1)


def test_plan_is_shuffle_free(spark):
    docs = load_table(spark, SF_DIR, "documents")
    plan = (chunk_documents(docs, CHUNK, OVERLAP)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan


def test_boundary_lengths_match_python_model(spark):
    """Every boundary length around the stride/chunk arithmetic, checked
    against a direct Python model of the contract in one Spark job."""
    chunk, overlap = 10, 3
    stride = chunk - overlap
    lengths = sorted({0, 1, 2, overlap, overlap + 1, stride, stride + 1,
                      chunk - 1, chunk, chunk + 1, chunk + stride,
                      chunk + stride + 1, 2 * chunk, 5 * chunk + 1})
    docs = [(f"len{n}", " ".join(f"t{i}" for i in range(n)))
            for n in lengths]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    got: dict[str, list] = {}
    for r in chunk_documents(df, chunk, overlap).collect():
        got.setdefault(r.doc_id, []).append(r)

    for doc_id, text in docs:
        toks = text.split() if text else []
        # python model: starts advance by stride while new tokens remain
        starts, s = [], 0
        while s == 0 or s < len(toks) - overlap:
            if s == 0 and not toks:
                break
            starts.append(s)
            s += stride
        want = [toks[s:s + chunk] for s in starts]
        chunks = sorted(got.get(doc_id, []), key=lambda r: r.chunk_id)
        assert [c.chunk_text.split(" ") if c.chunk_text else []
                for c in chunks] == want, f"mismatch at {doc_id}"
