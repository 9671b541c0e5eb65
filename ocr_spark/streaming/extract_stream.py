"""Structured Streaming surfaces: incremental extraction + windowed aggs.

The reference is batch-only (its generator loops forever but has no
event-time/state semantics — ``/root/reference/DataPreprocess/
DataGenerator.py:399``, SURVEY §2.9). The north rule asks for *checkpoint
resume*; ``ocr_spark.sinks`` provides the manifest-based variant, and this
module provides the engine-managed one: ``Trigger.AvailableNow`` over the
input table with a ``checkpointLocation``. AvailableNow drains everything
available then stops — rerunning after a crash resumes from the
checkpoint's source offsets, giving exactly-once file-sink semantics with
zero custom bookkeeping. At 10^12 documents the same job string runs as a
continuous incremental crawl-ingest by swapping the trigger.

``stream_event_counts`` is the stateful-aggregation surface: event-time
tumbling windows + watermark for late data — the standard telemetry rollup
shape over the ``events`` table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ocr_spark.sources.pages import PAGES_SCHEMA


def stream_extract(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Incremental extraction: parquet page files → extracted parquet.

    File-source streaming (each new file = one micro-batch unit); the fused
    mapInPandas extraction stage is identical to the batch path — one code
    path, two execution modes.
    """
    from ocr_spark.operators.extract_html import extract_pages
    from ocr_spark.sinks.partitioned import with_partition_keys

    pages = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )
    extracted = with_partition_keys(extract_pages(pages)).drop("salt")
    writer = (
        extracted.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("crawl_date", "host_bucket")
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_extract_full(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    recognizer: str = "font",
    available_now: bool = True,
) -> StreamingQuery:
    """Incremental FUSED extraction (html blocks + embedded-image OCR) —
    the streaming twin of ``operators.pipeline.extract_full``, one code
    path for both modes.

    Uses ``foreachBatch`` rather than a streaming aggregation: the fused
    pipeline's only grouping is the per-url reading-order assembly, and a
    page's rows are file-local by construction (one page = one input row),
    so per-micro-batch grouping is exact and needs no watermark state.
    Restart resumes from the checkpoint's source offsets; the per-batch
    parquet append composes with the manifest/lineage sink for
    exactly-once semantics at date granularity.
    """
    from ocr_spark.operators.pipeline import extract_full

    pages = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        extract_full(batch_df, recognizer=recognizer).write.mode(
            "append"
        ).parquet(out_dir)

    writer = (
        pages.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_dedup_extract(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    watermark: str = "24 hours",
) -> StreamingQuery:
    """Incremental extraction with streaming URL dedup.

    ``dropDuplicatesWithinWatermark`` on the canonical url: re-crawls of a
    page arriving within the watermark window are emitted once; state is
    bounded by the watermark (the crawl-frequency knob — at Common Crawl
    cadence a 24h window spans a segment's re-fetches). Dedup runs BEFORE
    extraction so duplicate pages never cost Python kernel time.
    """
    from ocr_spark.functions.url import canonical_url
    from ocr_spark.operators.extract_html import extract_pages
    from ocr_spark.sinks.partitioned import with_partition_keys

    pages = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )
    deduped = (
        pages.withColumn("_curl", canonical_url("url"))
        .withWatermark("warc_ts", watermark)
        .dropDuplicatesWithinWatermark(["_curl"])
        .drop("_curl")
    )
    extracted = with_partition_keys(extract_pages(deduped)).drop("salt")
    return (
        extracted.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("crawl_date", "host_bucket")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def stream_event_counts(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> StreamingQuery:
    """Watermarked tumbling-window rollup over an events stream.

    Late rows beyond the watermark are dropped deterministically; state
    size is bounded by (watermark / window) × group cardinality — the knob
    that keeps a 10^12-event stream's state in memory.
    """
    events = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    ).parquet(input_dir)
    agg = (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    return (
        agg.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def stream_extract_warc(
    spark: SparkSession,
    warc_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Incremental WARC ingestion: newly-landed ``.warc(.gz)`` archives →
    parsed pages → fused extraction → partitioned parquet, exactly-once
    via the checkpoint. The continuous-crawl front door: a production
    deployment points this at the bucket where crawl segments land and
    swaps the trigger; the parse/extract stages are byte-identical to the
    batch ``read_warc`` path (shared ``_warc_pages_fn``)."""
    from ocr_spark.operators.extract_html import extract_pages
    from ocr_spark.sinks.partitioned import with_partition_keys
    from ocr_spark.sources.warc import read_warc_stream

    pages = read_warc_stream(spark, warc_dir)
    extracted = with_partition_keys(extract_pages(pages)).drop("salt")
    writer = (
        extracted.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("crawl_date", "host_bucket")
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
