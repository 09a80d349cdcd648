"""Measured scale point for vacuum_txn + orphan reclamation under
concurrent commits (VERDICT r10 #8's named gap in the curve coverage).

The cost drivers of transaction-log maintenance are MANIFEST COUNTS -
retained txns scanned for pins, per-table version listings, orphan
removals - not table bytes, so the bootstrap synthesizes versions
through the REAL commit protocol (fsio claim -> snapshot dir ->
manifest finalize -> pointer publish, identical to write_version) with
a template parquet dir copied per version instead of a Spark write:
the measured vacuum does exactly the IO it would do in production,
and a 600-txn log bootstraps in seconds instead of 20 minutes of
1-row Spark jobs.

Scenario per scale point (N txns, 2 tables, every 3rd iteration also
strands an unpinned orphan version per table, orphans pre-aged past
the retention gate via utime):

  1. bootstrap N committed transactions + ~2N/3 aged orphans;
  2. run vacuum_txn(keep_last_txns=5) WHILE a rival committer thread
     lands fresh write-then-pin commits (retryable VersionConflict
     loops, the documented protocol);
  3. checks (all recorded, the run fails loudly on any):
     - every retained txn's full pin set still readable;
     - the latest snapshot still serves (servable end state);
     - every AGED orphan reclaimed, NO fresh (in-gate) version lost -
       the age gate is what protects the concurrent committer's
       write-then-pin window;
     - every concurrent commit succeeded (conflicts retried, none
       dropped).

Usage: python tools/txn_vacuum_measure.py [N_base] [N_big]
Prints one JSON line: walls + checks per point + the wall ratio.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from etl_pipeline_mini_project_01_spark.sources import fsio  # noqa: E402
from etl_pipeline_mini_project_01_spark.sources.transactions import (  # noqa: E402
    commit_txn,
    latest_txn,
    list_txns,
    read_txn_manifest,
    unpinned_table_versions,
    vacuum_txn,
)
from etl_pipeline_mini_project_01_spark.sources.versioned import (  # noqa: E402
    VersionConflict,
    _manifest_dir,
    _publish_latest,
    latest_readable_version,
    list_versions,
)

TABLES = ("orders", "lineitem")
AGE = 7 * 24 * 3600.0


def _template(spark) -> str:
    d = tempfile.mkdtemp(prefix="txnv_tpl_")
    spark.createDataFrame([(1,)], "k bigint").coalesce(1) \
        .write.mode("overwrite").parquet(d)
    return d


def fast_version(troot: str, template: str, aged: bool = False) -> int:
    """One table version through the real commit order (claim ->
    snapshot -> finalize -> publish), template-copied data."""
    fsio.makedirs(_manifest_dir(troot))
    while True:
        v = max(list_versions(troot), default=0) + 1
        vdir = f"v{v:08d}"
        mpath = os.path.join(_manifest_dir(troot), f"{vdir}.json")
        try:
            claim = fsio.claim_excl(mpath)
        except FileExistsError:
            continue
        shutil.copytree(template, os.path.join(troot, vdir))
        claim.finalize_json({"version": v, "dir": vdir})
        _publish_latest(troot, {"version": v, "dir": vdir})
        if aged:
            old = time.time() - AGE
            os.utime(mpath, (old, old))
        return v


def bootstrap(root: str, template: str, n_txns: int) -> dict:
    t_prev, n_orphans = 0, 0
    for i in range(n_txns):
        pins = {t: fast_version(os.path.join(root, t), template)
                for t in TABLES}
        # age every bootstrap manifest so only the LAST keep window and
        # the rival's fresh commits sit inside the retention gate
        t_prev = commit_txn(root, pins, t_prev)
        for t in TABLES:
            mp = os.path.join(root, t, "_versions",
                              f"v{pins[t]:08d}.json")
            old = time.time() - AGE
            os.utime(mp, (old, old))
        if i % 3 == 2:                      # strand an aged orphan
            for t in TABLES:
                fast_version(os.path.join(root, t), template, aged=True)
                n_orphans += 1
    return {"txns": t_prev, "orphans": n_orphans}


def run_point(spark, n_txns: int) -> dict:
    root = tempfile.mkdtemp(prefix="txnv_root_")
    template = _template(spark)
    t0 = time.time()
    boot = bootstrap(root, template, n_txns)
    boot_wall = round(time.time() - t0, 2)

    pre_orphans = sum(len(v) for v in unpinned_table_versions(root).values())
    rival_done, rival_commits, rival_conflicts = [], [], [0]

    def rival():
        head = latest_txn(root)
        for _ in range(10):
            pins = {t: fast_version(os.path.join(root, t), template)
                    for t in TABLES}
            while True:
                try:
                    head = commit_txn(root, pins, head)
                    rival_commits.append((head, pins))
                    break
                except VersionConflict:
                    rival_conflicts[0] += 1
                    head = max(list_txns(root), default=0)
        rival_done.append(True)

    th = threading.Thread(target=rival)
    th.start()
    t0 = time.time()
    removed = vacuum_txn(root, keep_last_txns=5,
                         stage_retention_sec=24 * 3600.0)
    vac_wall = round(time.time() - t0, 3)
    th.join(timeout=300)

    checks = {}
    checks["rival_finished_all_commits"] = (
        bool(rival_done) and len(rival_commits) == 10)
    # every retained txn fully readable
    ok = True
    for t in list_txns(root):
        try:
            pins = read_txn_manifest(root, t)
        except FileNotFoundError:
            continue                         # crashed claim: fine
        for name, v in pins.items():
            mp = os.path.join(root, name, "_versions", f"v{v:08d}.json")
            if not (fsio.exists(mp) and fsio.getsize(mp) > 0
                    and fsio.isdir(os.path.join(root, name,
                                                f"v{v:08d}"))):
                ok = False
    checks["every_retained_pin_readable"] = ok
    # latest snapshot serves
    lt = read_txn_manifest(root)
    checks["latest_snapshot_servable"] = all(
        fsio.isdir(os.path.join(root, n, f"v{v:08d}"))
        for n, v in lt.items())
    # no fresh version lost: every rival-committed pin readable
    checks["no_fresh_version_lost"] = all(
        fsio.getsize(os.path.join(root, n, "_versions",
                                  f"v{v:08d}.json")) > 0
        for _, pins in rival_commits for n, v in pins.items())
    # aged orphans reclaimed (rival-staged fresh unpinned ones are in
    # the gate and may legally survive)
    post_orphans = unpinned_table_versions(root)
    aged_left = 0
    now = time.time()
    for name, vs in post_orphans.items():
        for v in vs:
            mp = os.path.join(root, name, "_versions", f"v{v:08d}.json")
            try:
                if now - fsio.getmtime(mp) > 25 * 3600:
                    aged_left += 1
            except FileNotFoundError:
                pass
    checks["aged_orphans_reclaimed"] = aged_left == 0
    n_removed = sum(len(v) for v in removed.values())
    checks["reclaimed_nonzero"] = n_removed > 0

    shutil.rmtree(root, ignore_errors=True)
    shutil.rmtree(template, ignore_errors=True)
    return {"n_txns": n_txns, **boot, "bootstrap_wall": boot_wall,
            "pre_orphans": pre_orphans, "vacuum_wall": vac_wall,
            "versions_removed": n_removed,
            "rival_conflict_retries": rival_conflicts[0],
            "checks": checks, "checks_pass": all(checks.values())}


def main() -> int:
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    n_big = int(sys.argv[2]) if len(sys.argv) > 2 else 600
    from etl_pipeline_mini_project_01_spark.session import get_spark
    spark = get_spark("txn-vacuum-measure", master="local[4]",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    base = run_point(spark, n_base)
    big = run_point(spark, n_big)
    ratio = round(big["vacuum_wall"] / max(base["vacuum_wall"], 1e-9), 2)
    out = {"series": "txn_vacuum_churn", "base": base, "big": big,
           "wall_ratio": ratio,
           "per_unit": round(ratio / (n_big / n_base), 3)}
    spark.stop()
    sys.stdout.flush()
    print(json.dumps(out))
    return 0 if (base["checks_pass"] and big["checks_pass"]) else 1


if __name__ == "__main__":
    sys.exit(main())
