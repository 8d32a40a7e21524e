"""Structured Streaming mode of the pipeline.

The reference is a continuous agent: file tailing → process → batched flush
with size/age triggers (core/collection_pipeline/batch/FlushStrategy.h:31-104)
and late-data drop via discard intervals. The Spark-native equivalents:

* file tailing          → ``readStream`` file source (new files per trigger;
                          the InputFile/EventDispatcher analog)
* processor chain       → IDENTICAL stateless transformations as batch —
                          ``build_pipeline`` is reused verbatim
* Batcher/FlushStrategy → trigger intervals + sink file sizing
* at-least-once + resume→ streaming checkpoint (file-source offsets) — a
                          restarted query reprocesses nothing, the streaming
                          twin of checkpoint.py's batch resume
* discard-old-events    → ``withWatermark`` on event_time for windowed aggs

``foreachBatch`` fans out each micro-batch to the per-route sinks (append
mode), mirroring Router.cpp:50-82.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.pipeline import ParserSpec, build_pipeline
from ..operators.route import RouteRule
from ..schema import SEQUENCE_SCHEMA


def stream_sequences(
    spark: SparkSession, input_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    r = spark.readStream.schema(SEQUENCE_SCHEMA)
    if max_files_per_trigger:
        r = r.option("maxFilesPerTrigger", max_files_per_trigger)
    return r.parquet(input_dir)


def stream_sequences_rate(
    spark: SparkSession,
    rows_per_second: int = 1000,
    pool_size: int = 1000,
    seed: int = 42,
) -> DataFrame:
    """Non-file streaming source adapter (SURVEY §2.1's push/pull input row):
    Spark's built-in ``rate`` source drives the pipeline the way a kafka/http
    input drives the reference agent — an unbounded row stream with no files
    involved.  Each tick joins (stream-static broadcast, no shuffle) against a
    deterministic pool of ``synth.gen_rows`` sequences, so the content is the
    SAME parseable nginx/apsara/json/delimiter/kv mix as the batch corpus and
    the token-array invariant stays checkable: row ``value`` carries the pool
    index, doc_id is re-derived from ``value``.

    Swapping in a real kafka topic is the same wiring with
    ``readStream.format("kafka")`` + ``from_json``/decode in place of the pool
    join — the downstream pipeline is identical (stateless projections).
    """
    from ..synth import gen_rows

    pool = spark.createDataFrame(
        [(i, d, t, n, s) for i, (d, t, n, s) in enumerate(gen_rows(pool_size, seed))],
        "idx long, pool_doc_id string, tokens array<int>, n_tok int, source string",
    )
    rate = (
        spark.readStream.format("rate").option("rowsPerSecond", rows_per_second).load()
    )
    return (
        rate.join(F.broadcast(pool), (rate["value"] % pool_size) == pool["idx"])
        .select(
            F.concat(F.lit("doc-"), F.lpad(F.col("value").cast("string"), 12, "0")).alias(
                "doc_id"
            ),
            "tokens",
            "n_tok",
            "source",
        )
    )


def stream_pipeline(
    spark: SparkSession,
    input_dir: str,
    parsers: dict[str, ParserSpec] | None = None,
    routes: list[RouteRule] | None = None,
    **kwargs,
) -> DataFrame:
    """The batch pipeline, streaming: decode → parse → route on a readStream.
    All pipeline stages are stateless projections/filters, so the SAME plan
    builder works unchanged on an unbounded input."""
    return build_pipeline(stream_sequences(spark, input_dir), parsers, routes, **kwargs)


def start_fanout(
    routed: DataFrame,
    out_root: str,
    checkpoint_dir: str,
    available_now: bool = False,
    processing_time: str = "10 seconds",
):
    """foreachBatch fan-out writer: each micro-batch appended to per-route
    directories + a running counts ledger (one parquet row per batch/route —
    the flusher OUT_EVENTS counters)."""

    def _write_batch(batch_df: DataFrame, batch_id: int) -> None:
        df = batch_df
        if "tokens" in df.columns and "content" in df.columns:
            df = df.drop("tokens")  # payload = content (bijective; see sources/io.py)
        df.write.mode("append").partitionBy("route").parquet(os.path.join(out_root, "sinks"))
        (
            batch_df.groupBy("route")
            .agg(F.count(F.lit(1)).alias("n_rows"), F.sum("n_tok").alias("n_tok_sum"))
            .withColumn("batch_id", F.lit(batch_id))
            .coalesce(1)
            .write.mode("append")
            .parquet(os.path.join(out_root, "counts"))
        )

    w = routed.writeStream.foreachBatch(_write_batch).option("checkpointLocation", checkpoint_dir)
    w = w.trigger(availableNow=True) if available_now else w.trigger(processingTime=processing_time)
    return w.start()


def windowed_counts(
    routed: DataFrame,
    window: str = "5 minutes",
    watermark: str = "1 hour",
    time_col: str = "event_time",
) -> DataFrame:
    """Event-time windowed per-sink counts with late-data handling.

    The watermark is the principled version of the reference's
    ilogtail_discard_interval drop (ProcessorParseApsaraNative.cpp:173-199):
    events later than the watermark are dropped from their window instead of
    corrupting closed aggregates. Rows without a parsed event time fall back
    to the ingest clock."""
    with_ts = routed.withColumn(
        "_wts", F.coalesce(F.col(time_col), F.current_timestamp())
    ).withWatermark("_wts", watermark)
    return with_ts.groupBy(F.window("_wts", window).alias("w"), F.col("route")).agg(
        F.count(F.lit(1)).alias("n_rows"), F.sum("n_tok").alias("n_tok_sum")
    )


def session_counts(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    key: str = "user_id",
    time_col: str = "ts",
) -> DataFrame:
    """Streaming sessionization: per-key activity sessions that close after
    ``gap`` of inactivity (``F.session_window`` — Spark merges overlapping
    windows statefully; the watermark bounds the state exactly like the
    windowed counts). The streaming twin of the batch ``events_sessions``
    query (gap sessionization via a lag/cumsum window), so a pipeline can
    move between the two modes with the same session semantics.

    Rows: (session_start, session_end, key, n_events) — append mode emits a
    session only once its window can no longer grow (watermark passed)."""
    with_ts = events.withWatermark(time_col, watermark)
    agg = with_ts.groupBy(
        F.session_window(F.col(time_col), gap).alias("w"), F.col(key)
    ).agg(F.count(F.lit(1)).alias("n_events"))
    return agg.select(
        F.col("w.start").alias("session_start"),
        F.col("w.end").alias("session_end"),
        key,
        "n_events",
    )


def start_windowed_counts(
    routed: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    window: str = "5 minutes",
    watermark: str = "1 hour",
    available_now: bool = False,
):
    agg = windowed_counts(routed, window, watermark)
    flat = agg.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        "route",
        "n_rows",
        "n_tok_sum",
    )
    w = (
        flat.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    w = w.trigger(availableNow=True) if available_now else w.trigger(processingTime="10 seconds")
    return w.start()


def windowed_cms(
    events: DataFrame,
    item_col: str = "user_id",
    window: str = "5 minutes",
    watermark: str = "1 hour",
    time_col: str = "ts",
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Streaming Count-Min sketch per event-time window: the frequency twin
    of ``windowed_counts`` in FIXED state — the aggregation state per window
    is at most depth×width cells no matter the item cardinality, so a
    high-cardinality key (user ids, URLs) never grows streaming state
    unboundedly the way a per-item windowed count does.

    Rows out (append mode, once the watermark closes the window):
    ``(window_start, window_end, r, col, c)`` — per-window sketch cells,
    mergeable across windows by cell addition (CMS linearity), point-queried
    with ``operators.sketch.cms_estimate`` on any window or any SUM of
    windows. Identical md5 cell math to the batch sketch, so a batch replay
    of the same data produces byte-identical cells (pytest-verified).
    """
    from ..operators.sketch import _cms_cells

    with_ts = events.withWatermark(time_col, watermark)
    fan = with_ts.select(
        F.col(time_col).alias("_wts"),
        F.explode(_cms_cells(F.col(item_col).cast("string"), depth, width)).alias("_cell"),
    )
    agg = fan.groupBy(
        F.window("_wts", window).alias("w"),
        F.col("_cell.r").alias("r"),
        F.col("_cell.col").alias("col"),
    ).agg(F.count(F.lit(1)).alias("c"))
    return agg.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        "r",
        "col",
        "c",
    )
