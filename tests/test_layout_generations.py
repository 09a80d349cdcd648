"""E49 generation-versioned layouts (operators/ivf_layout.py): each
index rebuild stages an immutable `gen=<uuid>` directory tree and
CAS-commits ONE manifest version naming exactly its files - readers
resolve files through the manifest, so rebuilds are lock-free swaps:
pinned probes keep serving the old generation bit-identically while
and after a new one lands, fresh probes see only the new generation
(never a mix), and vacuum reclaims rotated-out generations."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from conftest import SF_DIR

from etl_pipeline_mini_project_01_spark.catalog import load_table
from etl_pipeline_mini_project_01_spark.operators.ivf_layout import (
    MANIFEST_SUBDIR,
    ivf_probe_pruned,
    ivf_probe_pruned_batch,
    read_layout_manifest,
    vacuum_layout_generations,
    write_ivf_layout_generation,
)
from etl_pipeline_mini_project_01_spark.operators.kmeans import kmeans_fit

K, NPROBE, TOPK = 8, 2, 5


@pytest.fixture(scope="module")
def genlayout(spark):
    """Two generations over DIFFERENT corpora (v1 = half the table,
    v2 = all of it) under one frozen model - distinguishable results,
    so serving the wrong generation cannot pass."""
    emb = load_table(spark, SF_DIR, "embeddings")
    cents, dim = kmeans_fit(emb, k=K, iters=1)
    path = tempfile.mkdtemp(prefix="ivf_gen_") + "/embeddings"
    half = emb.filter(F.col("vec_id") % 2 == 0)
    v1 = write_ivf_layout_generation(half, cents, dim, path)
    yield emb, half, cents, dim, path, v1
    shutil.rmtree(os.path.dirname(path), ignore_errors=True)


def _rows(df):
    return sorted((r.vec_id, int(r.cluster), repr(r.cosine))
                  for r in df.collect())


def test_generation_swap_is_lock_free(spark, genlayout):
    """A probe pinned to v1 returns IDENTICAL rows before and after a
    full rebuild commits v2; unpinned probes flip to v2 atomically at
    the commit; no read ever mixes generations."""
    emb, half, cents, dim, path, v1 = genlayout
    qv = [float(v) for v in
          emb.filter("vec_id = 1").select("embedding").first()[0]]

    before = _rows(ivf_probe_pruned(spark, path, qv, cents, NPROBE, TOPK,
                                    index_version=v1))
    assert before and all(v % 2 == 0 for v, _, _ in before)  # half corpus

    v2 = write_ivf_layout_generation(emb, cents, dim, path)
    assert v2 == v1 + 1

    # pinned probe: bit-identical across the swap (old files immutable)
    after = _rows(ivf_probe_pruned(spark, path, qv, cents, NPROBE, TOPK,
                                   index_version=v1))
    assert after == before

    # unpinned probe now serves v2 - and ONLY v2 (no generation mixing:
    # the half-corpus generation shares every even vec_id, so a mixed
    # read would duplicate rows)
    latest = read_layout_manifest(spark, path)
    assert latest.count() == emb.count()
    assert latest.select("vec_id").distinct().count() == emb.count()
    pinned_v2 = _rows(ivf_probe_pruned(spark, path, qv, cents, NPROBE,
                                       TOPK, index_version=v2))
    unpinned = _rows(ivf_probe_pruned(spark, path, qv, cents, NPROBE,
                                      TOPK))
    assert unpinned == pinned_v2 != before

    # two gen= trees coexist on disk during the overlap window
    gens = [e for e in os.listdir(path) if e.startswith("gen=")]
    assert len(gens) == 2


def test_batch_probe_pins_generation_in_both_modes(spark, genlayout):
    """index_version threads through the batch probe's literal AND plan
    paths with equal results (the shared tail resolves the pinned
    manifest either way)."""
    emb, half, cents, dim, path, v1 = genlayout
    queries = emb.filter(F.col("vec_id") < 3).select("vec_id", "embedding")

    def _b(df):
        return sorted((r.query_id, r.vec_id, int(r.cluster),
                       repr(r.cosine), r.rank) for r in df.collect())

    lit = ivf_probe_pruned_batch(spark, path, queries, cents, dim,
                                 NPROBE, TOPK, probe_lists="literal",
                                 index_version=v1)
    pln = ivf_probe_pruned_batch(spark, path, queries, cents, dim,
                                 NPROBE, TOPK, probe_lists="plan",
                                 index_version=v1)
    assert _b(lit) == _b(pln) and _b(lit)
    assert all(v % 2 == 0 for _, v, _, _, _ in _b(lit))   # v1 corpus only


def test_vacuum_reclaims_rotated_generations(spark, genlayout):
    """vacuum keep_last=1 drops v1's manifest and (with retention 0)
    its gen directory; pinned v1 reads then raise, the latest read is
    untouched. A FRESH unreferenced gen dir (an in-flight rebuild's
    stage) survives the default retention."""
    emb, half, cents, dim, path, v1 = genlayout
    # plant an "in-flight rebuild": a fresh unreferenced gen dir
    fresh = os.path.join(path, "gen=inflight0000")
    os.makedirs(os.path.join(fresh, "cluster=0"), exist_ok=True)

    removed = vacuum_layout_generations(path, keep_last=1)
    assert removed == []                      # everything fresh: age gate
    assert os.path.isdir(fresh)

    removed = vacuum_layout_generations(path, keep_last=1,
                                        stage_retention_sec=0.0)
    assert len(removed) >= 1                  # v1's generation + plant
    assert not os.path.isdir(fresh)
    with pytest.raises(FileNotFoundError):
        read_layout_manifest(spark, path, version=v1)
    assert read_layout_manifest(spark, path).count() == emb.count()


def test_conflict_loser_reclaims_next_version(spark, genlayout,
                                              monkeypatch):
    """The CAS loop: a rebuild that loses its first claim re-claims the
    next number without re-staging (a generation replaces the whole
    index - there is nothing to rebase on)."""
    from etl_pipeline_mini_project_01_spark.sources import versioned
    from etl_pipeline_mini_project_01_spark.sources.versioned import (
        VersionConflict,
    )

    emb, half, cents, dim, path, v1 = genlayout
    # r15: local roots commit through the driver-staged table variant
    # (write_version_cas_table); scheme-qualified roots keep the Spark
    # variant. Intercept BOTH so the retry loop is exercised no matter
    # which staging the seam picked.
    real_cas = versioned.write_version_cas
    real_cas_table = versioned.write_version_cas_table
    calls = {"n": 0}

    def lose_once(df, root, expected_version, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            raise VersionConflict("claimed by a concurrent committer")
        return real_cas(df, root, expected_version, **kw)

    def lose_once_table(tab, root, expected_version, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            raise VersionConflict("claimed by a concurrent committer")
        return real_cas_table(tab, root, expected_version, **kw)

    # the writer resolves the names at call time (function-body import),
    # so patching the source module intercepts it
    monkeypatch.setattr(versioned, "write_version_cas", lose_once)
    monkeypatch.setattr(versioned, "write_version_cas_table",
                        lose_once_table)
    v = write_ivf_layout_generation(half, cents, dim, path)
    assert calls["n"] == 2 and v >= 2


def test_pq_generation_swap_pins_model_and_files(spark, genlayout):
    """The production-index variant: write_ivf_pq_layout_generation
    stages CODES under gen= trees; a probe pinned to (version, model)
    serves bit-identically across a model-refresh rebuild, fresh probes
    cut over, and literal==plan equality holds on the pinned
    generation."""
    from etl_pipeline_mini_project_01_spark.operators.pq import (
        ivf_pq_probe,
        pq_train,
        write_ivf_pq_layout_generation,
    )

    emb, half, cents, dim, path, _ = genlayout
    books = pq_train(emb, m=8, ksub=16, iters=1)
    ppath = os.path.join(os.path.dirname(path), "codes")
    v1 = write_ivf_pq_layout_generation(half, cents, dim, books, ppath)
    queries = (emb.filter(F.col("vec_id") < 4)
               .select("vec_id", "embedding").localCheckpoint())

    def _rows(df):
        return sorted((r.query_id, r.vec_id, repr(r.score), r.rank)
                      for r in df.collect())

    before = _rows(ivf_pq_probe(spark, ppath, queries, cents, books,
                                3, TOPK, probe_lists="literal",
                                index_version=v1))
    assert before and all(v % 2 == 0 for _, v, _, _ in before)

    # model refresh: NEW codebooks + full corpus as generation 2
    books2 = pq_train(emb, m=8, ksub=16, iters=2)
    v2 = write_ivf_pq_layout_generation(emb, cents, dim, books2, ppath)
    assert v2 == v1 + 1

    # pinned (v1, books) serves bit-identically across the swap...
    after = _rows(ivf_pq_probe(spark, ppath, queries, cents, books,
                               3, TOPK, probe_lists="literal",
                               index_version=v1))
    assert after == before
    # ...in plan mode too (the shared manifest-resolved read)
    pln = _rows(ivf_pq_probe(spark, ppath, queries, cents, books,
                             3, TOPK, probe_lists="plan",
                             index_version=v1))
    assert pln == before

    # unpinned probes serve (v2, books2) - the full corpus, no mixing
    latest = _rows(ivf_pq_probe(spark, ppath, queries, cents, books2,
                                3, TOPK, probe_lists="literal"))
    pinned2 = _rows(ivf_pq_probe(spark, ppath, queries, cents, books2,
                                 3, TOPK, probe_lists="literal",
                                 index_version=v2))
    assert latest == pinned2 != before
    from etl_pipeline_mini_project_01_spark.operators.ivf_layout import (
        read_layout_manifest,
    )
    assert read_layout_manifest(spark, ppath).count() == emb.count()


def test_pq_generation_twolevel_roundtrip(spark, genlayout):
    """Two-level generation build: stored rows match the flat
    generation contract (manifest-resolved full corpus, pinned reads
    stable) under the hierarchical quantizer."""
    from etl_pipeline_mini_project_01_spark.operators.ivf_layout import (
        read_layout_manifest,
    )
    from etl_pipeline_mini_project_01_spark.operators.kmeans import (
        kmeans_fit_twolevel,
    )
    from etl_pipeline_mini_project_01_spark.operators.pq import (
        ivf_pq_probe_twolevel,
        pq_train,
        write_ivf_pq_layout_generation_twolevel,
    )

    emb, half, cents, dim, path, _ = genlayout
    books = pq_train(emb, m=8, ksub=16, iters=1)
    cc, fi, dim2 = kmeans_fit_twolevel(emb, 3, 3, 1, 1)
    ppath = os.path.join(os.path.dirname(path), "codes2l")
    v1 = write_ivf_pq_layout_generation_twolevel(
        emb, cc, fi, 3, dim2, books, ppath)
    assert read_layout_manifest(spark, ppath, version=v1).count() \
        == emb.count()
    queries = (emb.filter(F.col("vec_id") < 3)
               .select("vec_id", "embedding"))
    out = ivf_pq_probe_twolevel(spark, ppath, queries, cc, fi, 3, books,
                                nprobe=4, k=TOPK, nprobe_coarse=2,
                                probe_lists="literal", index_version=v1)
    assert out.count() > 0


def test_compaction_binpacks_and_migrates(spark):
    """compact_layout_generation: after N appends a cluster holds N
    sliver files; compaction rewrites the live rows as one file per
    cluster in a fresh generation - content identical, probes cut over
    atomically, and the append-origin bare directories become
    reclaimable once no retained manifest references them."""
    from etl_pipeline_mini_project_01_spark.operators.ivf_layout import (
        append_to_ivf_layout,
        compact_layout_generation,
        manifest_clusters,
        write_ivf_layout,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    cents, dim = kmeans_fit(emb, k=K, iters=1)
    root = tempfile.mkdtemp(prefix="ivf_compact_")
    path = root + "/emb"
    write_ivf_layout(emb.filter("vec_id % 3 = 0"), cents, dim, path)
    append_to_ivf_layout(emb.filter("vec_id % 3 = 1"), cents, dim, path)
    append_to_ivf_layout(emb.filter("vec_id % 3 = 2"), cents, dim, path)

    mf = manifest_clusters(path)
    assert max(len(fs) for fs in mf.values()) >= 2     # slivers piled up
    before = sorted((r.vec_id, int(r.cluster)) for r in
                    read_layout_manifest(spark, path)
                    .select("vec_id", "cluster").collect())

    v = compact_layout_generation(spark, path)
    mf2 = manifest_clusters(path)
    assert all(len(fs) == 1 for fs in mf2.values())    # bin-packed
    assert all(fs[0].startswith("gen=") for fs in mf2.values())
    after = sorted((r.vec_id, int(r.cluster)) for r in
                   read_layout_manifest(spark, path)
                   .select("vec_id", "cluster").collect())
    assert after == before                             # content identical

    # probes read the compacted generation
    qv = [float(x) for x in
          emb.filter("vec_id = 0").select("embedding").first()[0]]
    hits = ivf_probe_pruned(spark, path, qv, cents, NPROBE, 1).collect()
    assert hits and hits[0].vec_id == 0

    # the bare append-origin dirs die once their manifests rotate out
    removed = vacuum_layout_generations(path, keep_last=1,
                                        stage_retention_sec=0.0)
    assert removed and all(e.startswith("cluster=") for e in removed)
    assert sorted((r.vec_id, int(r.cluster)) for r in
                  read_layout_manifest(spark, path)
                  .select("vec_id", "cluster").collect()) == before
    with pytest.raises(FileNotFoundError):
        read_layout_manifest(spark, path, version=v - 1)
    shutil.rmtree(root, ignore_errors=True)


def test_generation_vacuum_refuses_manifestless_layout(spark, tmp_path):
    """A layout with no manifest log has no membership authority -
    vacuum must refuse rather than sweep every directory as
    'unreferenced'."""
    import pandas as pd

    p = str(tmp_path / "bare")
    (spark.createDataFrame(pd.DataFrame({"vec_id": [1, 2],
                                         "cluster": [0, 1]}))
     .write.partitionBy("cluster").parquet(p))
    assert vacuum_layout_generations(p, keep_last=1,
                                     stage_retention_sec=0.0) == []
    assert sorted(e for e in os.listdir(p) if e.startswith("cluster=")) \
        == ["cluster=0", "cluster=1"]


@pytest.mark.parametrize("scheme", ["plain", "file_uri"])
def test_append_after_compaction_keeps_compacted_rows(spark, scheme):
    """ADVICE r9 (medium): the documented lifecycle write -> append ->
    compact -> vacuum (bare dirs reclaimed) -> APPEND AGAIN used to
    lose data silently - the incremental manifest commit rebuilt each
    touched cluster's rows by listing only the bare cluster=N
    directory, discarding the previous manifest's gen= rows for that
    cluster, so every pre-compaction row became unreadable (and then
    vacuumable). Now every previous manifest row is carried through
    verbatim and the commit adopts only the add-action diff: after
    the second append EVERY row (compacted + both appends) resolves
    through the manifest, across vacuums. Runs on a scheme-less root
    and the file:// JVM path alike."""
    from etl_pipeline_mini_project_01_spark.operators.ivf_layout import (
        append_to_ivf_layout,
        compact_layout_generation,
        manifest_clusters,
        write_ivf_layout,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    cents, dim = kmeans_fit(emb, k=K, iters=1)
    root = tempfile.mkdtemp(prefix="ivf_apc_")
    path = (root + "/emb") if scheme == "plain" else f"file://{root}/emb"

    write_ivf_layout(emb.filter("vec_id % 4 = 0"), cents, dim, path)
    append_to_ivf_layout(emb.filter("vec_id % 4 = 1"), cents, dim, path)
    compact_layout_generation(spark, path)
    # the documented lifecycle: bare append-origin dirs reclaimed once
    # no retained manifest references them
    vacuum_layout_generations(path, keep_last=1, stage_retention_sec=0.0)

    append_to_ivf_layout(emb.filter("vec_id % 4 = 2"), cents, dim, path)

    got = sorted(r.vec_id for r in read_layout_manifest(spark, path)
                 .select("vec_id").collect())
    want = sorted(r.vec_id for r in
                  emb.filter("vec_id % 4 in (0, 1, 2)")
                  .select("vec_id").collect())
    assert got == want                      # nothing silently unlinked

    # the merged manifest names BOTH conventions for touched clusters
    mf = manifest_clusters(path)
    allfiles = [f for fs in mf.values() for f in fs]
    assert any(f.startswith("gen=") for f in allfiles)
    assert any(f.startswith("cluster=") for f in allfiles)

    # and a second vacuum must not reclaim what the merged manifest pins
    vacuum_layout_generations(path, keep_last=1, stage_retention_sec=0.0)
    got2 = sorted(r.vec_id for r in read_layout_manifest(spark, path)
                  .select("vec_id").collect())
    assert got2 == want

    # the serving path works over the MIXED manifest: a probe for a
    # compacted row and one for a freshly-appended row both hit
    for probe_id in (0, 2):                 # residue 0 = compacted, 2 = new
        qv = [float(x) for x in
              emb.filter(f"vec_id = {probe_id}").select("embedding")
              .first()[0]]
        hits = ivf_probe_pruned(spark, path, qv, cents, NPROBE, 1).collect()
        assert hits and hits[0].vec_id == probe_id
    shutil.rmtree(root, ignore_errors=True)


def test_append_after_compaction_without_vacuum_no_duplicates(spark):
    """write -> append -> compact -> APPEND with NO vacuum in between
    (legal: compaction's docstring says the bare dirs stay until
    vacuum_layout_generations). The pre-compaction sliver files still
    sit in the bare cluster=N directories, already migrated into the
    gen= files the manifest carries - an incremental commit that
    re-adopted everything a touched directory lists would name BOTH
    copies and the manifest read would double-count every
    pre-compaction row. The add-action diff (pre-write snapshot of the
    touched dirs) must adopt exactly the second append's files."""
    from etl_pipeline_mini_project_01_spark.operators.ivf_layout import (
        append_to_ivf_layout,
        compact_layout_generation,
        write_ivf_layout,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    cents, dim = kmeans_fit(emb, k=K, iters=1)
    root = tempfile.mkdtemp(prefix="ivf_apc_nv_")
    path = root + "/emb"

    write_ivf_layout(emb.filter("vec_id % 4 = 0"), cents, dim, path)
    append_to_ivf_layout(emb.filter("vec_id % 4 = 1"), cents, dim, path)
    compact_layout_generation(spark, path)
    # NO vacuum: the bare sliver dirs still hold the migrated rows
    append_to_ivf_layout(emb.filter("vec_id % 4 = 2"), cents, dim, path)

    got = sorted(r.vec_id for r in read_layout_manifest(spark, path)
                 .select("vec_id").collect())
    want = sorted(r.vec_id for r in
                  emb.filter("vec_id % 4 in (0, 1, 2)")
                  .select("vec_id").collect())
    assert got == want          # each row exactly once: no dup, no drop
    shutil.rmtree(root, ignore_errors=True)


def test_generation_rebuilds_true_concurrency(spark):
    """REAL interleaving for the lock-free swap: three rebuilds race
    `write_ivf_layout_generation` on one path. Each must land as its
    own consecutive manifest version (the CAS loop re-claims without
    re-staging), every version must resolve to exactly ONE complete
    generation (never a mix - each rebuild writes a disjoint corpus
    slice, so a mixed read shows a wrong row count), and the latest
    pointer must name one of the three."""
    from concurrent.futures import ThreadPoolExecutor

    emb = load_table(spark, SF_DIR, "embeddings")
    cents, dim = kmeans_fit(emb, k=4, iters=1)
    root = tempfile.mkdtemp(prefix="ivf_genconc_")
    path = root + "/emb"

    slices = {i: emb.filter(F.col("vec_id") % 3 == i).localCheckpoint()
              for i in range(3)}
    counts = {i: slices[i].count() for i in range(3)}

    def rebuild(i: int) -> int:
        return write_ivf_layout_generation(slices[i], cents, dim, path,
                                           max_retries=20)

    with ThreadPoolExecutor(max_workers=3) as pool:
        wins = list(pool.map(rebuild, range(3)))

    assert sorted(wins) == [1, 2, 3]           # dense, no loss
    for i, v in enumerate(wins):
        got = read_layout_manifest(spark, path, version=v)
        assert got.count() == counts[i]        # one whole generation
        assert (got.select("vec_id")
                .filter(F.col("vec_id") % 3 != i).count()) == 0
    latest = read_layout_manifest(spark, path).count()
    assert latest == counts[wins.index(3)]
    shutil.rmtree(root, ignore_errors=True)


def test_compaction_reconciles_concurrent_append(spark):
    """Lost-update guard: a daily append that lands AFTER compaction
    snapshotted its base manifest but BEFORE its commit must survive -
    the CAS number alone would serialize versions, not content, and
    the compacted manifest would silently drop the appended rows
    (which vacuum then deletes permanently). The reconcile commit
    carries the head-minus-base diff into the compacted manifest."""
    import uuid as _uuid

    from etl_pipeline_mini_project_01_spark.operators.ivf_layout import (
        MANIFEST_SUBDIR,
        append_to_ivf_layout,
        commit_generation_manifest,
        write_ivf_layout,
    )
    from etl_pipeline_mini_project_01_spark.sources.versioned import (
        latest_readable_version,
    )
    from pyspark.sql import functions as F

    emb = load_table(spark, SF_DIR, "embeddings")
    cents, dim = kmeans_fit(emb, k=K, iters=1)
    root = tempfile.mkdtemp(prefix="ivf_reconcile_")
    path = root + "/emb"

    write_ivf_layout(emb.filter("vec_id % 3 = 0"), cents, dim, path)
    base_v = latest_readable_version(os.path.join(path, MANIFEST_SUBDIR))

    # compaction body: stage the base content as a gen tree (what
    # compact_layout_generation does before its commit)...
    lay = read_layout_manifest(spark, path, version=base_v)
    if "gen" in lay.columns:
        lay = lay.drop("gen")
    gen = f"gen={_uuid.uuid4().hex[:12]}"
    (lay.repartition("cluster").write.partitionBy("cluster")
     .mode("errorifexists").parquet(os.path.join(path, gen)))

    # ... an append lands mid-rewrite ...
    append_to_ivf_layout(emb.filter("vec_id % 3 = 1"), cents, dim, path)

    # ... and the reconcile commit must carry the appended rows.
    commit_generation_manifest(spark, path, gen, reconcile_base=base_v)
    got = sorted(r.vec_id for r in read_layout_manifest(spark, path)
                 .select("vec_id").collect())
    want = sorted(r.vec_id for r in
                  emb.filter("vec_id % 3 in (0, 1)")
                  .select("vec_id").collect())
    assert got == want
    shutil.rmtree(root, ignore_errors=True)


def test_compaction_aborts_when_superseded_by_rebuild(spark):
    """A rival REBUILD that lands mid-compaction replaces the content
    wholesale - the head manifest is not an append extension of the
    compaction's base, so the reconcile commit must abort with
    VersionConflict (committing the stale rewrite would resurrect the
    superseded corpus)."""
    import uuid as _uuid

    from etl_pipeline_mini_project_01_spark.operators.ivf_layout import (
        MANIFEST_SUBDIR,
        commit_generation_manifest,
        write_ivf_layout_generation,
    )
    from etl_pipeline_mini_project_01_spark.sources.versioned import (
        VersionConflict,
        latest_readable_version,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    cents, dim = kmeans_fit(emb, k=K, iters=1)
    root = tempfile.mkdtemp(prefix="ivf_supersede_")
    path = root + "/emb"

    write_ivf_layout_generation(emb.filter("vec_id % 2 = 0"),
                                cents, dim, path)
    base_v = latest_readable_version(os.path.join(path, MANIFEST_SUBDIR))
    lay = read_layout_manifest(spark, path, version=base_v).drop("gen")
    gen = f"gen={_uuid.uuid4().hex[:12]}"
    (lay.repartition("cluster").write.partitionBy("cluster")
     .mode("errorifexists").parquet(os.path.join(path, gen)))

    # a rival rebuild replaces the index mid-compaction
    v2 = write_ivf_layout_generation(emb, cents, dim, path)

    with pytest.raises(VersionConflict, match="superseded"):
        commit_generation_manifest(spark, path, gen, reconcile_base=base_v)
    # the rival's content is untouched truth
    assert read_layout_manifest(spark, path).count() == emb.count()
    assert read_layout_manifest(spark, path, version=v2).count() \
        == emb.count()
    shutil.rmtree(root, ignore_errors=True)


def test_empty_query_batch_on_mixed_convention_layout(spark):
    """Zero queries -> empty probe list. The probed read must stay
    manifest-resolved: a bare spark.read.parquet(path) on a mixed-
    convention layout (gen= trees + bare cluster= dirs coexisting
    after an unvacuumed compaction) throws 'Conflicting directory
    structures', and on a pure-generation layout it would union
    generations. The batch probe must return an empty result."""
    from etl_pipeline_mini_project_01_spark.operators.ivf_layout import (
        append_to_ivf_layout,
        compact_layout_generation,
        write_ivf_layout,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    cents, dim = kmeans_fit(emb, k=K, iters=1)
    root = tempfile.mkdtemp(prefix="ivf_eq_")
    path = root + "/emb"
    write_ivf_layout(emb.filter("vec_id % 2 = 0"), cents, dim, path)
    append_to_ivf_layout(emb.filter("vec_id % 2 = 1"), cents, dim, path)
    compact_layout_generation(spark, path)
    append_to_ivf_layout(emb.filter("vec_id = 1"), cents, dim, path)
    # mixed on disk AND in the manifest, nothing vacuumed

    queries = (emb.filter("vec_id < 0")        # empty by construction
               .select("vec_id", "embedding"))
    out = ivf_probe_pruned_batch(spark, path, queries, cents, dim,
                                 NPROBE, TOPK)
    assert out.count() == 0
    shutil.rmtree(root, ignore_errors=True)


def test_compaction_races_live_appends_true_concurrency(spark):
    """REAL interleaving: a compaction thread races an append thread on
    one layout. Whichever order the commits land in, the final
    manifest must hold exactly the union - the append's add-action
    carry keeps compacted gen= rows when it lands second, and the
    compaction's reconcile commit carries the append's files when it
    lands second. (The reconcile path itself is pinned deterministically
    by test_compaction_reconciles_concurrent_append; this run proves
    the protocol under genuine thread interleaving.)"""
    from concurrent.futures import ThreadPoolExecutor

    from etl_pipeline_mini_project_01_spark.operators.ivf_layout import (
        append_to_ivf_layout,
        compact_layout_generation,
        write_ivf_layout,
    )
    from etl_pipeline_mini_project_01_spark.sources.versioned import (
        VersionConflict,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    cents, dim = kmeans_fit(emb, k=K, iters=1)
    root = tempfile.mkdtemp(prefix="ivf_race_")
    path = root + "/emb"
    write_ivf_layout(emb.filter("vec_id % 4 = 0"), cents, dim, path)
    append_to_ivf_layout(emb.filter("vec_id % 4 = 1"), cents, dim, path)

    def compact():
        try:
            compact_layout_generation(spark, path)
            return "committed"
        except VersionConflict:
            return "superseded"    # legal: rival rebuild only - none here

    def append():
        append_to_ivf_layout(emb.filter("vec_id % 4 = 2"), cents, dim, path)
        return "appended"

    with ThreadPoolExecutor(max_workers=2) as pool:
        fc, fa = pool.submit(compact), pool.submit(append)
        rc, ra = fc.result(120), fa.result(120)

    assert ra == "appended" and rc == "committed"  # no rebuild raced it
    got = sorted(r.vec_id for r in read_layout_manifest(spark, path)
                 .select("vec_id").collect())
    want = sorted(r.vec_id for r in
                  emb.filter("vec_id % 4 in (0, 1, 2)")
                  .select("vec_id").collect())
    assert got == want          # union, exactly once, either interleaving
    shutil.rmtree(root, ignore_errors=True)
