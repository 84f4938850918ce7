"""Streaming ingest: incremental crawl batches -> extraction -> sink.

The reference is batch-only; its incremental pieces are a chunked
line-streaming reader (streaming-processor.ts:63-168) and per-file
re-ingest (trie.ts:228-254). The Spark-native equivalent: a file-source
Structured Stream over arriving page batches with

- event-time = warc_ts, watermarked for late crawls;
- exactly-once page-level semantics via dropDuplicates on url within
  the watermark (late duplicate fetches collapse);
- foreachBatch running the SAME batch extraction operators per
  micro-batch (single code path for batch + streaming), appending to
  the extracted table — the incremental analogue of per-pass
  checkpointing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.extract import extract_all

PAGES_DDL = ("url string, warc_ts timestamp, html binary, "
             "text string, lang string")


def read_page_stream(spark: SparkSession, input_dir: str,
                     max_files_per_trigger: int = 4) -> DataFrame:
    return (
        spark.readStream.schema(PAGES_DDL)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )


def streaming_extract(pages_stream: DataFrame,
                      watermark: str = "1 hour") -> DataFrame:
    """Dedup late/duplicate urls within the watermark, then extract."""
    deduped = (
        pages_stream
        .withWatermark("warc_ts", watermark)
        .dropDuplicatesWithinWatermark(["url"])
    )
    return extract_all(deduped)


def start_extraction_stream(pages_stream: DataFrame, out_dir: str,
                            checkpoint_dir: str, watermark: str = "1 hour"):
    """foreachBatch sink: each micro-batch is handed to the SAME batch
    extraction operator (extract_all) and appended to the extracted table
    — one code path for batch and streaming. Restart resumes from the
    streaming checkpoint (offset log), complementing the batch pipeline's
    per-pass parquet checkpoints."""
    deduped = (
        pages_stream
        .withWatermark("warc_ts", watermark)
        .dropDuplicatesWithinWatermark(["url"])
    )

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        extract_all(batch_df).write.mode("append").parquet(out_dir)

    return (
        deduped.writeStream
        .foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def windowed_mention_counts(pages_stream: DataFrame,
                            window: str = "1 hour",
                            watermark: str = "2 hours") -> DataFrame:
    """Event-time tumbling-window mention counts (late data handled by
    the watermark) — the streaming analogue of A1 grouped counts.
    warc_ts is carried through the extraction stage so the windowed
    aggregation keys on true event time."""
    from pyspark.sql import functions as F

    ext = extract_all(
        pages_stream.withWatermark("warc_ts", watermark),
        carry_cols=["warc_ts"],
    )
    return (
        ext.filter(F.col("item") == "mention")
        .groupBy(F.window("warc_ts", window).alias("w"), F.col("name"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "name", "n")
    )
