"""Streaming ingest: pages arriving as parquet files → extraction →
per-crawl-day metric windows.

Design notes for the 100-TB continuous-crawl extension:
* the fused kernel is partition-local and stateless, so it lifts to a
  stream unchanged (`mapInPandas` works on streaming DataFrames);
* metrics aggregate over event-time windows of ``warc_ts`` with a
  watermark — late WARC records (re-crawls, delayed uploads) fold into
  their window until the watermark passes;
* the real sink would be ``foreachBatch`` doing the same idempotent
  overwrite-by-partition as the batch job (exactly-once per partition);
  the memory sink here is for tests/demos.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..kernels_spark import EXTRACT_SCHEMA, fused_extract_stage
from ..operators.urls import blocklist_cols
from ..sources.pages_io import PAGES_SCHEMA


def read_pages_stream(spark: SparkSession, path: str, max_files: int = 4) -> DataFrame:
    """File-source stream over a directory of pages parquet files."""
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(path)
    )


def extract_stream(pages_stream: DataFrame) -> DataFrame:
    """The batch kernel, lifted: same schema, same bytes per url."""
    return pages_stream.select("url", "warc_ts", "html", "lang").mapInPandas(
        fused_extract_stage, schema=EXTRACT_SCHEMA
    )


def blocklist_gate_stream(
    pages_stream: DataFrame, blocked_hosts=None, blocked_path_re=None,
    drop: bool = False,
) -> DataFrame:
    """Pre-kernel URL policy gate on the stream: the first gate of a
    continuous crawl — a page under a blocked domain or path must not
    cost a parse, so this sits UPSTREAM of extract_stream, like
    url_dedup_stream. Stateless by construction (the verdict is pure
    column expressions, operators/urls.blocklist_cols): no watermark, no
    state store, no extra shuffle — each micro-batch leaves already
    labeled. ``drop=True`` filters instead of labeling (the production
    composition ``blocklist_gate_stream(s, drop=True) |> extract_stream``);
    the labeled default keeps the audit trail the batch gate emits."""
    c = blocklist_cols(F.col("url"), blocked_hosts, blocked_path_re)
    out = pages_stream.select(
        "*",
        c["host"].alias("host"),
        c["blocked_host"].alias("blocked_host"),
        c["blocked_path"].alias("blocked_path"),
        c["url_pass"].alias("url_pass"),
    )
    # drop mode restores the EXACT input schema (host included): callers
    # append to pages tables and validate against PAGES_SCHEMA
    return out.filter(F.col("url_pass") == 1).drop(
        "host", "blocked_host", "blocked_path", "url_pass"
    ) if drop else out


def windowed_metrics(extracted: DataFrame, window: str = "1 day",
                     watermark: str = "2 days") -> DataFrame:
    """Event-time metric rollup with late-data handling (A10 over time):
    docs, chars in/out and detector hit rate per warc_ts window."""
    return (
        extracted.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), "lang")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("chars_in").alias("chars_in"),
            F.sum("chars_out").alias("chars_out"),
            (F.sum("n_flagged") / F.greatest(F.sum("n_spans"), F.lit(1))).alias(
                "detector_hit_rate"
            ),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "lang", "docs", "chars_in", "chars_out", "detector_hit_rate",
        )
    )


def run_stream_once(spark: SparkSession, input_dir: str, query_name: str = "extract_metrics"):
    """Drive the stream to completion over the files currently present
    (memory sink; tests use this).

    NOTE: complete output mode is demo-only — in complete mode the
    watermark does NOT evict window state (that happens in append/update
    modes), so this form must not run unbounded. The production sink is
    foreachBatch in update mode doing the batch job's idempotent
    overwrite-by-partition, where the watermark bounds state as documented
    in windowed_metrics."""
    stream = read_pages_stream(spark, input_dir)
    metrics = windowed_metrics(extract_stream(stream))
    q = (
        metrics.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")
