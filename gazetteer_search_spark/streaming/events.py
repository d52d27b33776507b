"""Structured Streaming surface.

The reference has NO streaming operators (SURVEY §2.10) — its only incremental
semantics are import generations, which we map to the manifest-gated batch
resume in index/builder.py. This module adds the streaming-shaped capability a
large-scale pipeline needs anyway: incremental event aggregation with event
time + watermark, expressed so the same logical plan serves batch and stream
(the events_hourly query in __spark_entry__ is the batch twin).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


def read_events_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream over a *directory* of events parquet files
    (explicit schema — streaming sources never infer; FileStreamSource
    requires a directory, new files are picked up incrementally)."""
    return spark.readStream.schema(EVENTS_SCHEMA).parquet(path)


def hourly_event_aggregates(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1h event-time windows with late-data watermark. Works on both
    a static and a streaming DataFrame (same Catalyst plan shape)."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total"))
        .select(
            F.col("w.start").alias("hour"),
            "event_type",
            "n",
            "total",
        )
    )


def run_events_stream_once(
    spark: SparkSession, path: str, checkpoint: str, table: str = "events_hourly_stream"
) -> DataFrame:
    """Process everything currently in ``path`` incrementally
    (Trigger.AvailableNow), land results in an in-memory table, return it.
    Restarting with the same checkpoint resumes exactly-once."""
    agg = hourly_event_aggregates(read_events_stream(spark, path))
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(table)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(table)
