"""Training-mix assembly: the whole curation chain composed into one
relation flow - what a 100 TB pre-training data job actually runs:

    near-dup clusters -> keeper-only dedup
      -> benchmark decontamination (optional)
      -> leakage-safe cluster split (train/val/test)
      -> deterministic pseudo-random document order (salted hash - no
         RNG state, stable across runs/engines/partitionings)
      -> token-budget shard packing per split (distributed prefix sum)

Every stage is one of the engine's tested operators (plans/curation.py,
operators/decontaminate.py, operators/packing.py); this module only
composes them, so the end-to-end invariants - no duplicate-cluster
straddle, no contaminated survivor, budget-bounded shards, partition-
count independence - follow from the parts and are re-asserted
end-to-end in tests/test_training_mix.py.

Scale notes: the chain's shuffles are (1) the LSH candidate equi-join +
CC rounds from the cluster stage, (2) one doc_id join per annotation
(split, decontamination verdict), (3) the range partition inside the
packer. Nothing materializes on the driver; the orchestration is a
single lazy plan per split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import word_array
from .decontaminate import decontaminate
from .packing import pack_into_shards


def assemble_training_shards(docs: DataFrame,
                             benchmark: DataFrame | None = None,
                             budget: int = 50_000,
                             train_pct: int = 80, val_pct: int = 10,
                             order_salt: str = "order|",
                             num_partitions: int = 8) -> DataFrame:
    """(doc_id, cluster_id, split, n_tokens, order_key, prefix_tokens,
    shard): deduplicated, decontaminated, split-assigned documents packed
    into ~`budget`-token shards per split, in a deterministic salted-hash
    order. Shard ids are dense from 0 WITHIN each split.

    `docs` needs (doc_id, text). Non-keeper cluster members and (when
    `benchmark` is given) contaminated documents are dropped; the split
    hash keys on cluster_id, so surviving near-dup keepers can never
    straddle train/test even though their duplicates are gone.
    """
    # Late import: plans.curation registers queries on import; operators
    # stay import-light unless the composition is actually used.
    from ..plans.curation import (
        _near_dup_edges,
        cluster_safe_split,
        connected_components,
        md5_32,
    )

    labels = (docs.select("doc_id")
              .join(connected_components(_near_dup_edges(docs)),
                    "doc_id", "left")
              .select("doc_id",
                      F.coalesce("label", F.col("doc_id"))
                      .alias("cluster_id")))
    keepers = docs.join(
        labels.filter(F.col("doc_id") == F.col("cluster_id"))
        .select("doc_id"), "doc_id", "left_semi")
    if benchmark is not None:
        keepers = decontaminate(keepers, benchmark)
    split = cluster_safe_split(keepers, labels,
                               train_pct=train_pct, val_pct=val_pct)
    annotated = (keepers
                 .select("doc_id",
                         F.size(word_array("text")).alias("n_tokens"))
                 .join(split, "doc_id")
                 # zero-padded hex keeps lexicographic == numeric order;
                 # the doc_id suffix makes the key UNIQUE, so hash-prefix
                 # ties cannot reorder nondeterministically between runs
                 .withColumn("order_key", F.concat_ws(
                     "|",
                     F.lpad(F.hex(md5_32(F.concat(
                         F.lit(order_salt),
                         F.col("doc_id").cast("string")))), 8, "0"),
                     F.col("doc_id").cast("string"))))
    parts = []
    for s in ("train", "val", "test"):
        parts.append(pack_into_shards(
            annotated.filter(F.col("split") == s), budget,
            key_col="order_key", token_col="n_tokens",
            num_partitions=num_partitions,
            carry_cols=("doc_id", "cluster_id", "split")))
    packed = parts[0]
    for p in parts[1:]:
        packed = packed.unionByName(p)
    return packed.select("doc_id", "cluster_id", "split", "n_tokens",
                         "order_key", "prefix_tokens", "shard")
