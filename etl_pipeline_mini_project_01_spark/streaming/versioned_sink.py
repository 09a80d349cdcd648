"""Versioned-table streaming sink: every micro-batch commits ONE new
snapshot of the target table through the CAS protocol
(sources/versioned.py write_version_cas) - Structured Streaming
composed with the engine's own storage layer, the shape Delta calls a
"streaming MERGE sink" and the reference approximates with per-run
`ON CONFLICT` upserts (/root/reference/src/loader/bronze_loader.py).

Why CAS and not plain write_version: a streaming job is exactly the
multi-writer setting - a zombie driver from a failed-over run, a
backfill job, or a human repair script can race the live query. The
optimistic loop (re-read head -> re-stage -> claim head+1) means the
sink NEVER silently clobbers a concurrent commit; it rebases on it.

Delivery contract (stated honestly): foreachBatch is at-least-once -
after a crash between a version commit and the checkpoint write, the
restarted query re-runs the batch and commits it AGAIN as a new
version. With `keys` (upsert mode) the re-commit is IDEMPOTENT IN
CONTENT (same keys upserted to the same values - the reader-visible
table converges), it just burns a version number; vacuum reclaims the
duplicate snapshot. Append mode re-appends (true at-least-once) -
callers who need exact dedup add an event-id anti-join, which is the
documented reference pattern (SURVEY SS2.9 M2).

At 100 TB: each micro-batch commit writes |changed-keys| + |table|
parquet ONLY in upsert mode's snapshot rewrite - the honest cost of a
format-free snapshot store (a real Delta/Iceberg writes deltas +
manifest instead; sources/table_format.py is that seam). Append mode
writes |batch| only. Time travel across versions is free either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..sources.versioned import (VersionConflict, latest_readable_version,
                                 list_versions, read_version,
                                 write_version_cas)


def commit_batch_versioned(batch_df: DataFrame, root: str,
                           keys: list[str] | None = None,
                           max_retries: int = 5) -> int | None:
    """Commit one (micro-)batch as the table's next version via the
    optimistic CAS loop; returns the committed version, or None for an
    empty batch (no version burned). With `keys`, the new snapshot is
    previous-version-rows-not-in-batch + batch (per-key upsert);
    without, the batch alone is the snapshot (append-log of batches).
    On VersionConflict the loop re-reads the head and re-stages - the
    concurrent committer's rows are INCLUDED in the rebase read.

    The rebase reads the newest READABLE version from the manifest log
    (ADVICE r8), not the _LATEST pointer: after a writer crashed
    between manifest content and the pointer swap the log is AHEAD of
    _LATEST with a fully-readable version - rebasing from the pointer
    would silently drop that version's rows from every future
    snapshot (and with the pointer missing entirely would crash the
    stream on a phantom version 0)."""
    if batch_df.isEmpty():
        return None
    spark = batch_df.sparkSession
    for _ in range(max_retries):
        head = max(list_versions(root), default=0)
        prev_v = latest_readable_version(root)
        if keys and prev_v > 0:
            prev = read_version(spark, root, prev_v)
            # Null-safe anti-join: a NULL grouping key (e.g. after a
            # left-join enrichment) is a real upsert key here, but a
            # plain column-list anti join never matches NULL = NULL -
            # the previous snapshot's NULL-key row would survive every
            # batch ALONGSIDE the re-emitted one, one duplicate per
            # commit.
            batch_keys = batch_df.select(*keys).distinct()
            cond = None
            for k in keys:
                c = prev[k].eqNullSafe(batch_keys[k])
                cond = c if cond is None else cond & c
            snapshot = (prev.join(batch_keys, cond, "left_anti")
                        .unionByName(batch_df))
        else:
            snapshot = batch_df
        try:
            return write_version_cas(snapshot, root, expected_version=head)
        except VersionConflict:
            continue
    raise VersionConflict(
        f"gave up committing the batch to {root} after "
        f"{max_retries} conflicts")


def run_to_versioned_sink(result: DataFrame, root: str,
                          checkpoint_dir: str,
                          keys: list[str] | None = None,
                          output_mode: str = "update",
                          max_retries: int = 5) -> DataFrame:
    """Execute a streaming query over all currently-available input
    (availableNow) with a foreachBatch sink that CAS-commits every
    micro-batch as a new version of the table at `root`; returns the
    final (latest-version) table. Update-mode aggregations pair with
    `keys` = the grouping keys, so each version is the upserted
    running state and `read_version(spark, root, v)` is the state as
    of batch v - a time-travelling materialized view."""
    def _commit(batch_df: DataFrame, _batch_id: int) -> None:
        commit_batch_versioned(batch_df, root, keys=keys,
                               max_retries=max_retries)

    q = (result.writeStream
         .foreachBatch(_commit)
         .outputMode(output_mode)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    if latest_readable_version(root) == 0:
        # A source with no pending data (or all-empty micro-batches)
        # commits nothing - the happy "nothing to do" run of a fresh
        # pipeline. The table is simply absent; return the empty
        # result rather than letting read_version raise
        # FileNotFoundError on a query that succeeded.
        return result.sparkSession.createDataFrame([], result.schema)
    return read_version(result.sparkSession, root)
