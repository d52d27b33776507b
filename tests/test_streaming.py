"""Structured Streaming: incremental hourly aggregation ≡ batch twin."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from gazetteer_search_spark.streaming import (
    hourly_event_aggregates,
    run_events_stream_once,
)

SF = "/root/testdata/sf0.001"


def test_stream_matches_batch(spark, tmp_path):
    src = tmp_path / "events_in"
    src.mkdir()
    shutil.copy(f"{SF}/events.parquet", src / "part-000.parquet")

    out = run_events_stream_once(
        spark, str(src), str(tmp_path / "ckpt"), table="t_stream_hourly"
    )
    batch = hourly_event_aggregates(spark.read.parquet(f"{SF}/events.parquet"))

    got = {(r.hour, r.event_type): (r.n, r.total) for r in out.collect()}
    want = {(r.hour, r.event_type): (r.n, r.total) for r in batch.collect()}
    assert got == want and len(got) > 0


def test_stream_incremental_second_batch(spark, tmp_path):
    src = tmp_path / "events_in2"
    src.mkdir()
    shutil.copy(f"{SF}/events.parquet", src / "a.parquet")
    ckpt = str(tmp_path / "ckpt2")
    first = run_events_stream_once(spark, str(src), ckpt, table="t_inc_1")
    n1 = first.agg(F.sum("n")).collect()[0][0]

    # add the same file again -> counts double on re-run from the checkpoint
    shutil.copy(f"{SF}/events.parquet", src / "b.parquet")
    second = run_events_stream_once(spark, str(src), ckpt, table="t_inc_2")
    n2 = second.agg(F.sum("n")).collect()[0][0]
    assert n2 == 2 * n1
