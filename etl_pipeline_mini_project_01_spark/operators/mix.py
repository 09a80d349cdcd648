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
packer. Nothing materializes on the driver; the orchestration is one
plan with two deliberate materialization pins - the CC rounds'
per-round localCheckpoints and the packer's eager range-partition
checkpoint (operators/packing.py explains why the latter must be
eager: a lazy pin re-opens the range-boundary resampling race) - and
the packer groups on split, so the chain never re-runs per split.
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
    # One grouped pass: prefix sums and shard numbering restart per split
    # inside a single plan, so the upstream chain (CC rounds, joins) runs
    # once - not once per split as a filter-per-split union would.
    packed = pack_into_shards(
        annotated, budget, key_col="order_key", token_col="n_tokens",
        num_partitions=num_partitions,
        carry_cols=("doc_id", "cluster_id"), group_col="split")
    return packed.select("doc_id", "cluster_id", "split", "n_tokens",
                         "order_key", "prefix_tokens", "shard")


def temperature_mix_rates(docs: DataFrame, scale: int = 10_000,
                          domain_col: str = "source") -> DataFrame:
    """(domain, n_docs, keep_per_scale): per-domain acceptance thresholds
    realizing sqrt-temperature (alpha = 0.5) mixing by DOWNSAMPLING only -
    the Pile/LLaMA-style rebalance where target mass per domain goes as
    n^alpha, flattening the head without upsampling the tail.

    keep rate r_s = sqrt(min_n / n_s): proportional to n^(alpha-1),
    normalized so the rarest domain keeps 100%. alpha is pinned at 0.5
    on purpose - sqrt and division are correctly-rounded IEEE ops in
    every engine, so the emitted integer thresholds are reproducible
    cross-engine (general pow() is libm-dependent and is not).

    Scale shape: one tiny per-domain count aggregate; the min is a 1-row
    broadcast (scalar-subquery idiom, same as tfidf's n_docs) - nothing
    driver-side, nothing proportional to the corpus.
    """
    counts = docs.groupBy(F.col(domain_col).alias("domain")).agg(
        F.count(F.lit(1)).alias("n_docs"))
    min_n = counts.agg(F.min("n_docs").alias("min_n"))
    return (counts.crossJoin(F.broadcast(min_n))
            .select(
                "domain", "n_docs",
                F.floor(F.lit(float(scale))
                        * F.sqrt(F.col("min_n") / F.col("n_docs")))
                .cast("bigint").alias("keep_per_scale")))


def temperature_sample(docs: DataFrame, scale: int = 10_000,
                       domain_col: str = "source",
                       salt: str = "tmix|") -> DataFrame:
    """Documents surviving the sqrt-temperature mix: doc kept iff its
    salted md5 bucket (0..scale-1) falls under its domain's threshold.
    Deterministic across runs/engines/partitionings (hash-keyed, no RNG
    state - same contract as split/sample in plans/curation.py); the
    rates relation is domain-cardinality-sized, so the join broadcasts."""
    from ..plans.curation import md5_32

    rates = temperature_mix_rates(docs, scale, domain_col)
    bucket = F.pmod(
        md5_32(F.concat(F.lit(salt), F.col("doc_id").cast("string"))),
        F.lit(scale))
    # Dataframe-qualified selects: with domain_col == "domain" the bare
    # column name would be ambiguous against the rates relation's key.
    return (docs.join(F.broadcast(rates),
                      docs[domain_col] == rates["domain"])
            .where(bucket < rates["keep_per_scale"])
            .select(*[docs[c] for c in docs.columns]))
