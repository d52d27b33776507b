"""Streaming rollup maintenance: incremental availableNow drains must equal
the batch rollup of the full table across checkpoint restarts (exactly-once
— byte-idempotent per-batch partials, no shared-state merge), and
compaction preserves the consolidated view."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from gazetteer_search_spark.operators import rollup
from gazetteer_search_spark.streaming.rollup_stream import (
    compact_rollup,
    read_rollup,
    stream_rollup,
)


def _events(spark, rows, id0=0):
    return spark.createDataFrame(
        [
            (id0 + i, ts, i % 3, et, v, "{}")
            for i, (ts, et, v) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


ROWS1 = [
    (dt.datetime(2024, 1, 1, 10, 5), "a", 1.0),
    (dt.datetime(2024, 1, 1, 10, 40), "a", 2.0),
    (dt.datetime(2024, 1, 1, 11, 0), "b", 3.0),
]
ROWS2 = [
    (dt.datetime(2024, 1, 1, 10, 50), "a", 10.0),  # touches an OLD bucket
    (dt.datetime(2024, 1, 2, 9, 0), "b", 4.0),     # and a new day
]


def _normalize(df):
    return sorted(
        tuple(r) for r in df.select(
            "bucket", "event_type", "doc_count",
            "value_sum", "value_min", "value_max",
        ).collect()
    )


def _want(spark):
    return rollup.build_rollup(
        _events(spark, ROWS1 + ROWS2), "ts", ["event_type"], ["value"],
        interval="hour",
    )


def test_stream_rollup_matches_batch(spark, tmp_path):
    events_dir = str(tmp_path / "ev")
    rdir = str(tmp_path / "rollup")
    ck = str(tmp_path / "ck")

    _events(spark, ROWS1).write.mode("append").parquet(events_dir)
    r1 = stream_rollup(
        spark, events_dir, rdir, ck, ["event_type"], ["value"]
    )
    assert r1["batches"] == 1 and r1["rollup_rows"] == 2  # (10h a), (11h b)

    # second drain with a restart: only new files process (exactly-once);
    # the 10h bucket's partials CONSOLIDATE across batch dirs
    _events(spark, ROWS2, id0=100).write.mode("append").parquet(events_dir)
    r2 = stream_rollup(
        spark, events_dir, rdir, ck, ["event_type"], ["value"]
    )
    assert r2["batches"] == 1

    got = read_rollup(spark, rdir, ["event_type"], ["value"])
    assert _normalize(got) == _normalize(_want(spark))
    row = {
        (r.bucket, r.event_type): r for r in got.collect()
    }[(dt.datetime(2024, 1, 1, 10, 0), "a")]
    assert row.doc_count == 3 and row.value_sum == 13.0
    assert row.value_min == 1.0 and row.value_max == 10.0

    # draining again with nothing new is a no-op
    r3 = stream_rollup(
        spark, events_dir, rdir, ck, ["event_type"], ["value"]
    )
    assert r3["batches"] == 0
    assert _normalize(
        read_rollup(spark, rdir, ["event_type"], ["value"])
    ) == _normalize(_want(spark))

    # compaction rewrites many batch dirs into one, same consolidated view
    n = compact_rollup(spark, rdir, ["event_type"], ["value"])
    assert n == 3
    bdirs = os.listdir(os.path.join(rdir, "batches"))
    assert len(bdirs) == 1 and bdirs[0].startswith("batch_id=compacted")
    assert _normalize(
        read_rollup(spark, rdir, ["event_type"], ["value"])
    ) == _normalize(_want(spark))


def test_stream_rollup_feeds_rollup_query(spark, tmp_path):
    events_dir = str(tmp_path / "ev2")
    rdir = str(tmp_path / "r2")
    _events(spark, ROWS1 + ROWS2).write.mode("append").parquet(events_dir)
    stream_rollup(
        spark, events_dir, rdir, str(tmp_path / "ck2"),
        ["event_type"], ["value"],
    )
    daily = rollup.rollup_query(
        read_rollup(spark, rdir, ["event_type"], ["value"]),
        "day", ["event_type"], ["value"],
    ).collect()
    by = {(r.bucket, r.event_type): r for r in daily}
    a = by[(dt.datetime(2024, 1, 1), "a")]
    assert a.doc_count == 3 and a.value_sum == 13.0 and a.value_avg == pytest.approx(13.0 / 3, abs=1e-6)


def test_stream_rollup_auto_compaction(spark, tmp_path):
    """Crossing the batch-dir threshold triggers the LSM compaction after
    the drain; the consolidated view is unchanged."""
    events_dir = str(tmp_path / "ev3")
    rdir = str(tmp_path / "r3")
    ck = str(tmp_path / "ck3")
    for i, (ts, et, v) in enumerate(ROWS1):
        _events(spark, [(ts, et, v)], id0=i * 10).write.mode(
            "append"
        ).parquet(events_dir)
        r = stream_rollup(
            spark, events_dir, rdir, ck, ["event_type"], ["value"],
            compact_threshold=1,
        )
    assert r["compacted"] is True
    bdirs = [
        d for d in os.listdir(os.path.join(rdir, "batches"))
        if d.startswith("batch_id=")
    ]
    assert len(bdirs) == 1 and bdirs[0].startswith("batch_id=compacted")
    want = rollup.build_rollup(
        _events(spark, ROWS1), "ts", ["event_type"], ["value"],
        interval="hour",
    )
    assert _normalize(
        read_rollup(spark, rdir, ["event_type"], ["value"])
    ) == _normalize(want)


def test_compaction_crash_windows_never_lose_or_double_count(spark, tmp_path):
    """compact_rollup's two crash windows (regression: old code deleted
    the batch dirs BEFORE publishing the consolidated one — a crash
    between lost the whole rollup):

    1. crash after the compacted dir rename but BEFORE the manifest
       commit: the orphan compacted dir is ignored by readers (old dirs
       stay live — no double count);
    2. crash after the manifest commit but BEFORE the superseded deletes:
       the manifest excludes the superseded dirs (no double count, the
       new dir carries the data)."""
    import shutil

    edir, rdir, ck = (
        str(tmp_path / "ev"), str(tmp_path / "roll"), str(tmp_path / "ck")
    )
    _events(spark, ROWS1).write.mode("append").parquet(edir)
    stream_rollup(spark, edir, rdir, ck, ["event_type"], ["value"])
    _events(spark, ROWS2, id0=100).write.mode("append").parquet(edir)
    stream_rollup(spark, edir, rdir, ck, ["event_type"], ["value"])
    want = _normalize(_want(spark))
    assert _normalize(read_rollup(spark, rdir, ["event_type"], ["value"])) == want

    bpath = os.path.join(rdir, "batches")
    some_batch = sorted(os.listdir(bpath))[0]

    # window 1: orphan compacted dir, no manifest -> ignored
    shutil.copytree(
        os.path.join(bpath, some_batch),
        os.path.join(bpath, "batch_id=compacted_deadbeefcafe"),
    )
    assert _normalize(read_rollup(spark, rdir, ["event_type"], ["value"])) == want
    shutil.rmtree(os.path.join(bpath, "batch_id=compacted_deadbeefcafe"))

    # window 2: committed compaction whose superseded deletes crashed —
    # resurrect a superseded dir next to the active compacted one
    backup = str(tmp_path / "backup_batch")
    shutil.copytree(os.path.join(bpath, some_batch), backup)
    n = compact_rollup(spark, rdir, ["event_type"], ["value"])
    assert n == len(want)
    shutil.copytree(backup, os.path.join(bpath, some_batch))  # failed delete
    assert _normalize(read_rollup(spark, rdir, ["event_type"], ["value"])) == want
    # the NEXT compaction retries the delete and stays exact
    compact_rollup(spark, rdir, ["event_type"], ["value"])
    assert not os.path.isdir(os.path.join(bpath, some_batch))
    assert _normalize(read_rollup(spark, rdir, ["event_type"], ["value"])) == want


def test_week_rollup_cannot_rebucket_to_month(spark):
    """Weeks do not nest into months/years (a week straddling Feb 1 would
    land whole in January) — the re-bucketing algebra is exact only for
    hierarchical pairs, so week->month/year raises (regression: it was
    allowed and mis-assigned straddling weeks)."""
    r = rollup.build_rollup(
        _events(spark, ROWS1), "ts", ["event_type"], ["value"],
        interval="week",
    )
    with pytest.raises(ValueError, match="straddle"):
        rollup.rollup_query(
            r, "month", ["event_type"], ["value"], rollup_interval="week"
        )
    # week -> week passes through; day -> week stays legal (weeks are
    # whole days)
    rollup.rollup_query(
        r, "week", ["event_type"], ["value"], rollup_interval="week"
    ).collect()
    rd = rollup.build_rollup(
        _events(spark, ROWS1), "ts", ["event_type"], ["value"],
        interval="day",
    )
    rollup.rollup_query(
        rd, "week", ["event_type"], ["value"], rollup_interval="day"
    ).collect()
