"""Batched model-inference UDF surface (SURVEY §2.11 U2).

The reference collects a text column, runs a HuggingFace sentiment
pipeline in batches of 32 on CUDA/MPS/CPU, applies a 0.75 confidence
threshold -> 'Neutral', maps labels to Positive/Negative, rounds the score
to 4 places, and attaches the model name
(/root/reference/src/transformer/sentiment_analyzer.py:70-168).

Engine mapping: a Series->Series pandas_udf - Arrow ships batches to the
worker, the "model" loads lazily once per executor process, batch size is
spark.sql.execution.arrow.maxRecordsPerBatch. A real transformer plugs in
by replacing `_load_model`; tests gate on the deterministic lexicon
stand-in (same signature, threshold and label-mapping semantics), since a
neural net is not oracle-reproducible.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType, StringType, StructField, StructType

MODEL_NAME = "lexicon-sentiment-v1"
CONFIDENCE_THRESHOLD = 0.75

POSITIVE_WORDS = frozenset(
    {"fast", "good", "small", "new", "fresh", "win", "top", "best", "clean"})
NEGATIVE_WORDS = frozenset(
    {"slow", "bad", "big", "old", "error", "fail", "dup", "worst", "stale"})

#: Per-executor lazy singleton (the reference's GPU-pipeline analogue).
_MODEL = None


def _load_model():
    """Lazily build the scorer once per executor process."""
    global _MODEL
    if _MODEL is None:
        def score(text: str) -> tuple[str, float]:
            toks = text.lower().split()
            pos = sum(t in POSITIVE_WORDS for t in toks)
            neg = sum(t in NEGATIVE_WORDS for t in toks)
            total = pos + neg
            if total == 0:
                return "Neutral", 0.5
            # Winning-class confidence in [0.5, 1], rounded to 4 places
            # by EXACT integer half-up on the true rational max/total
            # (float round() is half-to-even on the binary double - not
            # reproducible in SQL); the final /10000.0 is a single IEEE
            # division, bit-identical in any engine.
            score_e4 = (20000 * max(pos, neg) + total) // (2 * total)
            label = "Positive" if pos >= neg else "Negative"
            if 4 * max(pos, neg) < 3 * total:
                # raw < CONFIDENCE_THRESHOLD (0.75), exact in integers:
                # below-threshold confidence -> Neutral, keep the score
                # (sentiment_analyzer.py:146-158 semantics).
                label = "Neutral"
            return label, score_e4 / 10000.0
        _MODEL = score
    return _MODEL


# Explicit StructType (a DDL string here would require an active
# SparkSession at import time - this module imports session-free).
_SENTIMENT_SCHEMA = StructType([
    StructField("sentiment_value", StringType()),
    StructField("sentiment_score", DoubleType()),
])


@pandas_udf(_SENTIMENT_SCHEMA)
def sentiment_batch(texts: pd.Series) -> pd.DataFrame:
    model = _load_model()
    out = texts.fillna("").map(model)
    return pd.DataFrame({
        "sentiment_value": out.map(lambda x: x[0]),
        "sentiment_score": out.map(lambda x: x[1]),
    })


#: Reference model id (sentiment_analyzer.py:34) and batch size (:118).
HF_MODEL_NAME = "distilbert-base-uncased-finetuned-sst-2-english"
HF_BATCH_SIZE = 32

_REAL_MODEL = None


def _load_real_model():
    """Real-transformer path (sentiment_analyzer.py:70-133): lazy
    per-executor HuggingFace pipeline with device autoselect
    (cuda -> mps -> cpu) and batch-32 scoring. The container ships no
    transformers/torch, so this raises NotImplementedError there - the
    plumbing (signature, lazy singleton, Arrow batching, threshold and
    label post-processing) is identical to the lexicon path and is what
    tests exercise."""
    global _REAL_MODEL
    if _REAL_MODEL is not None:
        return _REAL_MODEL
    try:
        import torch
        from transformers import pipeline
    except ImportError as exc:  # honest env gate, like multimodal codecs
        raise NotImplementedError(
            "real-model sentiment requires transformers+torch; install "
            "them or use the 'lexicon' backend") from exc
    if torch.cuda.is_available():
        device = 0
    elif getattr(torch.backends, "mps", None) and torch.backends.mps.is_available():
        device = "mps"
    else:
        device = -1
    clf = pipeline("sentiment-analysis", model=HF_MODEL_NAME, device=device)

    def score_batch(texts: list[str]) -> list[tuple[str, float]]:
        out = []
        for res in clf(texts, batch_size=HF_BATCH_SIZE, truncation=True):
            label = "Positive" if res["label"] == "POSITIVE" else "Negative"
            conf = float(res["score"])
            if conf < CONFIDENCE_THRESHOLD:
                label = "Neutral"  # same post-processing as the lexicon path
            out.append((label, round(conf, 4)))
        return out

    _REAL_MODEL = score_batch
    return _REAL_MODEL


def make_sentiment_udf(backend: str = "lexicon"):
    """Build the Series->DataFrame sentiment pandas_udf for a backend:
    'lexicon' (deterministic, oracle-reproducible) or 'hf' (the
    reference's real transformer; env-gated). Both ride the same Arrow
    batching and per-executor lazy-singleton shape."""
    if backend == "lexicon":
        return sentiment_batch
    if backend != "hf":
        raise ValueError(f"unknown sentiment backend: {backend}")

    @pandas_udf(_SENTIMENT_SCHEMA)
    def sentiment_batch_hf(texts: pd.Series) -> pd.DataFrame:
        model = _load_real_model()
        scored = model(texts.fillna("").tolist())
        return pd.DataFrame({
            "sentiment_value": [s[0] for s in scored],
            "sentiment_score": [s[1] for s in scored],
        })

    return sentiment_batch_hf


def with_sentiment(text_col: str | Column) -> list[Column]:
    """Column bundle: sentiment_value / sentiment_score / sentiment_model -
    the three bronze sentiment columns (bronze/02:74-78)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    s = sentiment_batch(c)
    return [
        s["sentiment_value"].alias("sentiment_value"),
        s["sentiment_score"].alias("sentiment_score"),
        F.lit(MODEL_NAME).alias("sentiment_model"),
    ]
