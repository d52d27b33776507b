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


def test_session_stream_appends_sealed_sessions(spark, tmp_path):
    """Stateful session windows in streaming: append mode emits exactly the
    sessions sealed by the watermark; every emitted session matches its batch
    twin (sessions still open at end-of-input stay in state — production
    semantics)."""
    from gazetteer_search_spark.streaming.sessions import (
        run_sessions_stream_once,
        sessionize,
    )

    src = tmp_path / "sess_in"
    src.mkdir()
    shutil.copy(f"{SF}/events.parquet", src / "a.parquet")

    out = run_sessions_stream_once(
        spark, str(src), str(tmp_path / "sess_ckpt"), table="t_sessions"
    )
    got = {
        (r.user_id, r.session_start): (r.n_events, r.total) for r in out.collect()
    }
    batch = sessionize(spark.read.parquet(f"{SF}/events.parquet"))
    want = {
        (r.user_id, r.session_start): (r.n_events, r.total) for r in batch.collect()
    }
    assert len(got) > 0
    assert set(got).issubset(set(want))
    for k, v in got.items():
        assert want[k] == v


def test_stream_dedup_within_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark: duplicate event_ids arriving within the
    watermark horizon are emitted once."""
    from gazetteer_search_spark.streaming.events import read_events_stream
    from gazetteer_search_spark.streaming.sessions import dedup_events

    src = tmp_path / "dd_in"
    src.mkdir()
    shutil.copy(f"{SF}/events.parquet", src / "a.parquet")
    shutil.copy(f"{SF}/events.parquet", src / "b.parquet")  # full duplicate

    dd = dedup_events(read_events_stream(spark, str(src)))
    q = (
        dd.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_dedup")
        .option("checkpointLocation", str(tmp_path / "dd_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    n_unique = spark.read.parquet(f"{SF}/events.parquet").count()
    assert spark.table("t_dedup").count() == n_unique
