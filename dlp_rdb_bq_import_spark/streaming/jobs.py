"""Structured Streaming surface.

The reference's only streaming artifact is a processing-time chunking
window before its BigQuery write (DBImportPipeline.java:109-113 —
FixedWindows 30 s + AfterProcessingTime trigger, discarding panes; a
batching idiom, not event-time semantics). Parity: ``chunked_ingest``
reproduces the idiom with ``foreachBatch``. Extension (SURVEY.md §2.10):
real event-time processing over the ``events`` fixture — watermark +
tumbling window, the thing the reference *cannot* do.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def windowed_event_counts(
    spark: SparkSession,
    source_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Event-time tumbling-window aggregation over the events table,
    executed as a real Structured Streaming query (parquet stream source
    → watermark → window agg → memory sink, driven to completion).

    Returns the finished result as a DataFrame with columns
    (window_start string, event_type, n, total_value) — deterministic,
    so it oracle-checks against a plain GROUP BY date_trunc.
    """
    batch_df = spark.read.parquet(source_dir)
    schema = batch_df.schema
    name = f"win_{uuid.uuid4().hex[:12]}"
    # The parquet stream source requires a directory; accept a file path
    # by streaming its parent with a glob filter.
    if source_dir.endswith(".parquet"):
        directory, fname = os.path.split(source_dir)
        reader = spark.readStream.schema(schema).option("pathGlobFilter", fname)
        raw = reader.parquet(directory)
    else:
        raw = spark.readStream.schema(schema).parquet(source_dir)
    if dict(raw.dtypes).get("ts") in ("bigint", "long"):
        # TIMESTAMP(NANOS) parquet read as long (see session config)
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    stream = (
        raw.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), F.col("event_type"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(30,6)")).alias("_tv"),
        )
        .select(
            F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            F.col("_tv").cast("double").alias("total_value"),
        )
    )
    q = (
        stream.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
        return spark.table(name)
    finally:
        q.stop()


def chunked_ingest(
    df_stream: DataFrame,
    write_fn,
    trigger_seconds: int = 30,
):
    """The reference's 30 s chunked-write idiom (DBImportPipeline.java:
    109-113), Spark-natively: micro-batch trigger + foreachBatch, each
    batch an atomic write with task-retry semantics."""
    return (
        df_stream.writeStream.trigger(processingTime=f"{trigger_seconds} seconds")
        .foreachBatch(lambda batch_df, epoch_id: write_fn(batch_df, epoch_id))
        .start()
    )
