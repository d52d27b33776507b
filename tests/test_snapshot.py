"""Snapshot / restore (ES snapshot API analog): consistent copy with a
segment-listing check, inventory-verified restore, query-equivalence."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from gazetteer_search_spark.index import builder, snapshot
from gazetteer_search_spark.search.engine import SearchEngine, SearchOptions


@pytest.fixture(scope="module")
def idx_dir(spark, tmp_path_factory):
    corpus = spark.range(0, 40).select(
        F.col("id").alias("doc_id"),
        F.lit("org/r").alias("repo"),
        F.format_string("src/%d.py", "id").alias("path"),
        F.lit("c").alias("commit"),
        F.lit("python").alias("lang"),
        F.lit("alpha beta gamma").alias("content"),
    )
    out = str(tmp_path_factory.mktemp("idx_snap"))
    builder.build_index(spark, corpus, out, n_buckets=4)
    return out


def test_snapshot_restore_roundtrip(spark, idx_dir, tmp_path):
    snap = str(tmp_path / "snap")
    meta = snapshot.snapshot_index(idx_dir, snap)
    assert meta["generations"] == 1 and len(meta["files"]) > 5
    assert os.path.exists(os.path.join(snap, "snapshot_meta.json"))

    rest = str(tmp_path / "restored")
    r = snapshot.restore_snapshot(snap, rest)
    assert r["files"] == len(meta["files"])
    # the restored index answers identically
    a = SearchEngine(
        spark, builder.load_index(spark, idx_dir), serving=True
    ).search_hits("alpha", SearchOptions(k=5, prefix=False))
    b = SearchEngine(
        spark, builder.load_index(spark, rest), serving=True
    ).search_hits("alpha", SearchOptions(k=5, prefix=False))
    assert [(h.doc_id, h.score) for h in a] == [
        (h.doc_id, h.score) for h in b
    ]


def test_snapshot_refuses_nonempty_target(idx_dir, tmp_path):
    tgt = tmp_path / "full"
    tgt.mkdir()
    (tgt / "x").write_text("y")
    with pytest.raises(ValueError, match="not empty"):
        snapshot.snapshot_index(idx_dir, str(tgt))


def test_snapshot_rejects_non_index(tmp_path):
    src = tmp_path / "notidx"
    src.mkdir()
    with pytest.raises(ValueError, match="not an index"):
        snapshot.snapshot_index(str(src), str(tmp_path / "o"))


def test_restore_detects_corruption(idx_dir, tmp_path):
    snap = str(tmp_path / "snap2")
    snapshot.snapshot_index(idx_dir, snap)
    # corrupt: truncate one data file inside the snapshot
    meta = json.load(open(os.path.join(snap, "snapshot_meta.json")))
    victim = next(
        p for p, s in meta["files"]
        if p.endswith(".parquet") and s > 0
    )
    with open(os.path.join(snap, victim), "w") as f:
        f.write("")
    with pytest.raises(RuntimeError, match="missing or"):
        snapshot.restore_snapshot(snap, str(tmp_path / "r2"))
