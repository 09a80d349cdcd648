"""sources/fsio.py primitive semantics, pinned on BOTH backends: the
scheme-less os.* fast path and the Hadoop FileSystem JVM path via
``file://`` (the code path hdfs://s3a:// roots take). The storage
protocol batteries (test_versioned / test_transactions /
test_layout_generations) cover the composed behavior; this file pins
the primitives the protocols are built from - especially the
arbitration semantics: claim_excl raising FileExistsError on a taken
name, rename refusing an existing destination, replace overwriting
atomically."""

from __future__ import annotations

import os

import pytest

from etl_pipeline_mini_project_01_spark.sources import fsio


@pytest.fixture(params=["plain", "file_uri"])
def root(request, tmp_path, spark):
    # `spark` is required even for the plain param: the file_uri branch
    # resolves the Hadoop client from the active session.
    return str(tmp_path) if request.param == "plain" else f"file://{tmp_path}"


def test_has_scheme_forms():
    assert not fsio.has_scheme("/tmp/x")
    assert not fsio.has_scheme("relative/path")
    assert fsio.has_scheme("file:///tmp/x")
    assert fsio.has_scheme("file:/tmp/x")       # ADVICE r9 single-slash
    assert fsio.has_scheme("hdfs://nn/x")
    assert fsio.has_scheme("s3a://bucket/x")


def test_roundtrip_bytes_json_and_stat(root):
    p = os.path.join(root, "a.json")
    fsio.write_bytes(p, b'{"k": 1}')
    assert fsio.exists(p) and not fsio.isdir(p)
    assert fsio.getsize(p) == 8
    assert fsio.read_bytes(p) == b'{"k": 1}'
    assert fsio.read_json(p) == {"k": 1}
    with pytest.raises(FileNotFoundError):
        fsio.read_bytes(os.path.join(root, "missing.json"))


def test_listdir_scandir_makedirs(root):
    fsio.makedirs(os.path.join(root, "d", "inner"))
    fsio.write_bytes(os.path.join(root, "f.txt"), b"xy")
    names = sorted(fsio.listdir(root))
    assert names == ["d", "f.txt"]
    ents = {e.name: e for e in fsio.scandir(root)}
    assert ents["d"].is_dir and not ents["f.txt"].is_dir
    assert ents["f.txt"].size == 2
    assert ents["d"].mtime > 1e9


def test_claim_excl_arbitration(root):
    p = os.path.join(root, "claim.json")
    h = fsio.claim_excl(p)
    with pytest.raises(FileExistsError):
        fsio.claim_excl(p)                 # the loser conflicts HERE
    h.finalize_json({"v": 1})
    assert fsio.read_json(p) == {"v": 1}
    with pytest.raises(FileExistsError):
        fsio.claim_excl(p)                 # still taken after finalize


def test_rename_refuses_existing_destination(root):
    a, b = os.path.join(root, "a"), os.path.join(root, "b")
    fsio.write_bytes(a, b"A")
    fsio.write_bytes(b, b"B")
    with pytest.raises(OSError):
        fsio.rename(a, b)
    assert fsio.read_bytes(b) == b"B"      # untouched
    fsio.remove(b)
    fsio.rename(a, b)
    assert fsio.read_bytes(b) == b"A" and not fsio.exists(a)


def test_replace_overwrites(root):
    a, b = os.path.join(root, "a"), os.path.join(root, "b")
    fsio.write_bytes(a, b"NEW")
    fsio.write_bytes(b, b"OLD")
    fsio.replace(a, b)
    assert fsio.read_bytes(b) == b"NEW" and not fsio.exists(a)


def test_write_json_atomic_leaves_no_tmp(root):
    p = os.path.join(root, "ptr.json")
    fsio.write_json_atomic(p, {"version": 1}, tmp_prefix="._t_")
    fsio.write_json_atomic(p, {"version": 2}, tmp_prefix="._t_")
    assert fsio.read_json(p) == {"version": 2}
    assert not [n for n in fsio.listdir(root) if n.startswith("._t_")]


def test_rmtree_and_remove(root):
    d = os.path.join(root, "tree")
    fsio.makedirs(os.path.join(d, "x"))
    fsio.write_bytes(os.path.join(d, "x", "f"), b"1")
    fsio.rmtree(d)
    assert not fsio.exists(d)
    fsio.rmtree(d)                         # ignore-errors semantics


def test_remove_missing_raises_on_both_backends(root):
    """fsio.remove must signal a missing file identically on the os.*
    and Hadoop paths (FileSystem.delete returns false instead of
    raising); a silent remote no-op would make a racing vacuum sweep
    crash locally and succeed remotely."""
    with pytest.raises(FileNotFoundError):
        fsio.remove(os.path.join(root, "never_existed"))


def test_stat_missing_raises_filenotfound_on_both_backends(root):
    """getsize/getmtime/listdir map the JVM's FileNotFoundException to
    Python's FileNotFoundError, so the storage layer's racing-vacuum
    handlers (`except FileNotFoundError`) behave identically on both
    backends instead of seeing a raw Py4J error remotely."""
    missing = os.path.join(root, "never_existed")
    for fn in (fsio.getsize, fsio.getmtime, fsio.listdir):
        with pytest.raises(FileNotFoundError):
            fn(missing)
