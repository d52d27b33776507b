"""Sessionization + streaming dedup — stateful streaming ops for the
training-data pipeline (beyond the reference, SURVEY §2.10).

Both are expressed with Spark's BUILT-IN stateful operators rather than a
hand-rolled applyInPandasWithState: ``session_window`` (gap-merged event-time
sessions, state managed by the engine, watermark-evicted) and
``dropDuplicatesWithinWatermark`` (exactly-once event dedup with bounded
state). The identical logical plan runs on a static frame, which is what the
DuckDB oracle checks (gaps-and-islands SQL twin for sessions, distinct-on for
dedup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gazetteer_search_spark.streaming.events import read_events_stream

SESSION_GAP = "30 minutes"


def sessionize(events: DataFrame, gap: str = SESSION_GAP, watermark: str = "2 hours") -> DataFrame:
    """Per-user event-time sessions: events closer than ``gap`` merge; a
    session's span grows with each event (Spark session_window semantics —
    identical to the gaps-and-islands break at diff >= gap). State is
    engine-managed and watermark-evicted in streaming; the same plan runs on
    a batch frame."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("total"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
            "total",
        )
    )


def run_sessions_stream_once(
    spark: SparkSession, path: str, checkpoint: str, table: str = "sessions_stream"
) -> DataFrame:
    """Incremental sessionization over a file-source directory
    (Trigger.AvailableNow). Append mode: a session emits once its window is
    sealed by the watermark — sessions still open at end-of-input are retained
    in state for the next run (exactly the production semantics)."""
    agg = sessionize(read_events_stream(spark, path), watermark="0 seconds")
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(table)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(table)


def dedup_events(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Exactly-once event dedup by event_id. Streaming uses
    dropDuplicatesWithinWatermark (bounded state: an id is remembered for the
    watermark horizon — the at-least-once-source dedup pattern); batch is the
    plain distinct-on."""
    if events.isStreaming:
        return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
            ["event_id"]
        )
    return events.dropDuplicates(["event_id"])
