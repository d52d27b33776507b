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


def test_custom_stateful_operator_accumulates_across_restarts(spark, tmp_path):
    """applyInPandasWithState: per-user running stats match the batch agg
    after one run, and a SECOND run from the same checkpoint accumulates on
    top of the restored state (the state store is part of the checkpoint)."""
    from pyspark.sql import functions as F

    from gazetteer_search_spark.streaming.events import read_events_stream
    from gazetteer_search_spark.streaming.stateful import running_user_stats

    src = tmp_path / "st_in"
    src.mkdir()
    shutil.copy(f"{SF}/events.parquet", src / "a.parquet")
    ckpt = str(tmp_path / "st_ckpt")

    def run(table):
        # foreachBatch: the update-mode-compatible fault-tolerant sink shape
        # (memory sink cannot recover a checkpoint in update mode)
        results: dict = {}

        def sink(df, _bid):
            for r in df.collect():
                results[r.user_id] = (r.n, round(r.total, 4))

        q = (
            running_user_stats(read_events_stream(spark, str(src)))
            .writeStream.outputMode("update")
            .foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return results

    got = run("t_state_1")
    want = {
        r.user_id: (r.n, round(r.total, 4))
        for r in spark.read.parquet(f"{SF}/events.parquet")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    assert got == want and len(got) > 0

    # second file, same checkpoint: restored state + new increments
    shutil.copy(f"{SF}/events.parquet", src / "b.parquet")
    got2 = run("t_state_2")
    assert got2 == {u: (2 * n, round(2 * t, 4)) for u, (n, t) in want.items()}


def test_stream_percolate_routes_batches(spark, tmp_path):
    """Percolation at ingest (operators/percolate.percolate_stream): the
    streamed match set equals the batch percolate over the same docs, and a
    second drained backlog appends its own matches exactly once."""
    from gazetteer_search_spark.operators.percolate import (
        percolate,
        percolate_stream,
    )
    from gazetteer_search_spark.search.engine import TermGroup

    def g(gid, terms):
        return TermGroup(group_id=gid, terms=tuple(terms), required=True)

    regs = [("evt", [g(0, ["alpha"]), g(1, ["beta"])], 2)]
    docs = spark.createDataFrame(
        [(i, "alpha beta" if i % 3 == 0 else "alpha only") for i in range(30)],
        "doc_id long, content string",
    )
    src = tmp_path / "perc_in"
    src.mkdir()
    docs.write.mode("overwrite").parquet(str(src / "b1"))
    stream = (
        spark.readStream.schema("doc_id long, content string")
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    out, ckpt = str(tmp_path / "perc_out"), str(tmp_path / "perc_ckpt")
    percolate_stream(spark, stream, regs, out, ckpt).awaitTermination(120)
    got = {(r.doc_id, r.query_id) for r in spark.read.parquet(out).collect()}
    want = {(r.doc_id, r.query_id) for r in percolate(spark, docs, regs).collect()}
    assert got == want and len(got) == 10

    more = spark.createDataFrame(
        [(100, "beta alpha again")], "doc_id long, content string"
    )
    more.write.mode("overwrite").parquet(str(src / "b2"))
    stream2 = (
        spark.readStream.schema("doc_id long, content string")
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    percolate_stream(spark, stream2, regs, out, ckpt).awaitTermination(120)
    after = {(r.doc_id, r.query_id) for r in spark.read.parquet(out).collect()}
    assert after == want | {(100, "evt")}
