"""Snapshot/restore for maintained-index state roots (S12/S13 applied
to the bucketed store): a published snapshot restores into a fresh root
that serves EXACTLY the state at publish time — later live maintenance
does not leak in — with the manifest as the commit witness (no
manifest, no restore; damaged tree, no restore)."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE
from worker_spark.plans.bucketed_state import (
    restore_state,
    snapshot_state,
)
from worker_spark.sources import load_table
from worker_spark.streaming.retrieval_index import IncrementalRetrievalIndex


def _docs(spark):
    return (
        load_table(spark, SF_ORACLE, "documents")
        .select("doc_id", "text")
        .limit(300)
        .localCheckpoint(eager=True)
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_snapshot_restores_point_in_time_state(spark, tmp_path):
    docs = _docs(spark)
    live = IncrementalRetrievalIndex(spark, str(tmp_path / "live"))
    live.apply_batch(docs.filter(F.col("doc_id") % 2 == 0))

    snap = str(tmp_path / "snap1")
    manifest = snapshot_state(live.store, snap)
    assert manifest["n_buckets"] == live.store.n_buckets
    assert set(manifest["tables"]) >= {"postings", "doclen"}

    # live keeps moving AFTER the snapshot
    live.apply_batch(docs.filter(F.col("doc_id") % 2 == 1))

    restored_store = restore_state(spark, snap, str(tmp_path / "restored"))
    restored = IncrementalRetrievalIndex(spark, restored_store.root)
    # the restored index is the pre-snapshot build exactly...
    ref = IncrementalRetrievalIndex(spark, str(tmp_path / "ref"))
    ref.apply_batch(docs.filter(F.col("doc_id") % 2 == 0))
    q = ["the data", "fast stream"]
    assert _rows(restored.bm25_topk(q, k=5)) == _rows(ref.bm25_topk(q, k=5))
    assert _rows(restored.bm25_topk(q, k=5)) != _rows(live.bm25_topk(q, k=5))
    restored.fsck()
    # ...and maintenance continues on the restored root
    restored.apply_batch(docs.filter(F.col("doc_id") % 2 == 1))
    assert _rows(restored.bm25_topk(q, k=5)) == _rows(live.bm25_topk(q, k=5))


def test_snapshot_and_restore_refusals(spark, tmp_path):
    docs = _docs(spark).limit(50)
    live = IncrementalRetrievalIndex(spark, str(tmp_path / "live"))
    live.apply_batch(docs)
    snap = str(tmp_path / "snap")
    snapshot_state(live.store, snap)

    with pytest.raises(ValueError, match="already exists"):
        snapshot_state(live.store, snap)

    # restore target must be empty
    busy = tmp_path / "busy"
    busy.mkdir()
    (busy / "x").write_text("y")
    with pytest.raises(ValueError, match="not empty"):
        restore_state(spark, snap, str(busy))

    # a manifest-less dir is a crashed publish: never restorable
    torn = str(tmp_path / "torn")
    shutil.copytree(snap, torn)
    os.remove(os.path.join(torn, "_snapshot_manifest"))
    with pytest.raises(ValueError, match="no snapshot manifest"):
        restore_state(spark, torn, str(tmp_path / "r1"))

    # a damaged tree (missing bucket file) fails the manifest totals
    damaged = str(tmp_path / "damaged")
    shutil.copytree(snap, damaged)
    victims = [
        os.path.join(dp, f)
        for dp, _d, fs in os.walk(os.path.join(damaged, "postings"))
        for f in fs
    ]
    os.remove(victims[0])
    with pytest.raises(ValueError, match="does not match its manifest"):
        restore_state(spark, damaged, str(tmp_path / "r2"))


def test_prune_snapshots_retention_and_debris_sweep(
    spark, tmp_path, monkeypatch
):
    """Keep the newest N committed snapshots; sweep crashed publishes
    (``.stage-*`` dirs — the only debris our own publisher can leave,
    since the manifest is committed inside the stage before the rename)
    only past the age gate, and NEVER touch a manifest-less directory
    that does not match the stage naming: it is not ours (r11 advice —
    the old sweep rmtree'd any unrecognized dir in the parent)."""
    from worker_spark.plans import bucketed_state as B

    docs = _docs(spark).limit(30)
    live = IncrementalRetrievalIndex(spark, str(tmp_path / "live"))
    live.apply_batch(docs)
    snaps = tmp_path / "snaps"
    snaps.mkdir()
    clock = [1_000_000.0]
    monkeypatch.setattr(B, "_now", lambda: clock[0])
    for i in range(4):
        clock[0] += 10
        snapshot_state(live.store, str(snaps / f"s{i}"))

    # debris: old crashed stage is swept, young one survives, and a
    # FOREIGN manifest-less dir survives regardless of age
    old_debris = snaps / "s9.stage-deadbeef"
    young = snaps / "s9.stage-cafef00d"
    foreign = snaps / "unrelated_backup"
    shutil.copytree(str(snaps / "s0"), str(old_debris))
    shutil.copytree(str(snaps / "s0"), str(young))
    shutil.copytree(str(snaps / "s0"), str(foreign))
    os.remove(str(old_debris / "_snapshot_manifest"))
    os.remove(str(young / "_snapshot_manifest"))
    os.remove(str(foreign / "_snapshot_manifest"))
    now = clock[0]
    os.utime(str(old_debris), (now - 7200, now - 7200))
    os.utime(str(young), (now, now))
    os.utime(str(foreign), (now - 7200, now - 7200))

    deleted = B.prune_snapshots(str(snaps), keep_last=2)
    assert str(old_debris) in deleted
    assert str(snaps / "s0") in deleted and str(snaps / "s1") in deleted
    left = sorted(os.listdir(str(snaps)))
    assert left == ["s2", "s3", "s9.stage-cafef00d", "unrelated_backup"]
    # the survivors still restore
    restore_state(spark, str(snaps / "s3"), str(tmp_path / "r"))


def test_snapshot_refuses_concurrent_writer(spark, tmp_path, monkeypatch):
    """The single-writer contract is enforced, not just documented (r11
    advice): if any file of the root changes while the copytree runs —
    here simulated by mutating a bucket file from inside a patched
    copytree — the publish discards its stage and refuses to commit,
    leaving no committed snapshot behind."""
    from worker_spark.plans import bucketed_state as B

    docs = _docs(spark).limit(30)
    live = IncrementalRetrievalIndex(spark, str(tmp_path / "live"))
    live.apply_batch(docs)
    victim = next(
        os.path.join(dp, f)
        for dp, _d, fs in os.walk(os.path.join(live.store.root, "postings"))
        for f in fs
    )
    real_copytree = shutil.copytree

    def racing_copytree(*args, **kw):
        # patching shutil.copytree patches its own recursion too —
        # restore first so only the top-level call races
        monkeypatch.setattr(B.shutil, "copytree", real_copytree)
        out = real_copytree(*args, **kw)
        with open(victim, "ab") as fh:  # the "concurrent MERGE"
            fh.write(b"\x00")
        return out

    monkeypatch.setattr(B.shutil, "copytree", racing_copytree)
    snap = str(tmp_path / "snap")
    with pytest.raises(RuntimeError, match="changed while the snapshot"):
        snapshot_state(live.store, snap)
    assert not os.path.exists(snap)
    assert not any(
        ".stage-" in n for n in os.listdir(str(tmp_path))
    ), "refused publish must not leave its stage behind"
