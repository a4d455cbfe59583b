"""Structured-Streaming windowed aggregation over event streams.

The reference has no streaming surface (SURVEY.md §2.6); this is the
engine's event-analytics growth path: watermarked tumbling-window
aggregates with late-data tolerance, runnable identically as a stream
(``readStream`` + ``withWatermark`` + ``window``) or as a batch query
(same expressions), so the batch form doubles as the correctness oracle
for the streaming form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def windowed_event_stats(
    events: DataFrame,
    window_duration: str = "1 hour",
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Tumbling-window per-type stats: (window_start, event_type,
    n_events, sum_value). Works on both batch and streaming frames."""
    return (
        events.groupBy(
            F.window(F.col(ts_col), window_duration).alias("w"),
            F.col(type_col).alias("event_type"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(value_col), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def stream_windowed_event_stats(
    spark: SparkSession,
    source_dir: str,
    schema: str,
    out_dir: str,
    checkpoint_dir: str,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
):
    """Streaming flavor: watermarked tumbling windows, complete results
    drained with availableNow into parquet (append mode — closed windows
    only, which is why the watermark matters for late data)."""
    src = spark.readStream.schema(schema).format("parquet").load(source_dir)
    agg = windowed_event_stats(
        src.withWatermark(ts_col, watermark), window_duration, ts_col
    )
    return (
        agg.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
