"""Aggregation operators (SURVEY.md §2.5).

The reference's aggregators are batching group-bys; numeric aggregation happens
via SPL ``stats``. Here both map to native ``groupBy().agg()``:

* ``content_value_group`` — aggregator_content_value_group
  (plugins/aggregator/contentvaluegroup/aggregator_content_value_group.go:94-160)
* ``shard_hash``          — aggregator_shardhash md5-bucket sharding
  (plugins/aggregator/shardhash/aggregator_shardhash.go:164-204); this is our
  explicit shuffle/skew control and the write-affinity repartition.
* ``salted_repartition``  — the north-rule salted (source, hash(doc_id))
  repartition defusing source skew: one hot source spreads over S salts.
* ``sink_counts``         — per-sink aggregate counts (the agent's
  self-monitor counters, core/monitor/metric_constants/MetricConstants.h:75,169).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def content_value_group(
    df: DataFrame,
    group_keys: list[str],
    fields_col: str = "fields",
    count_col: str = "n_events",
    bytes_col: str = "n_tok_sum",
) -> DataFrame:
    """Group events by field values; emit per-group event count + token bytes.

    Keys resolve against promoted columns first, else the fields map — promoted
    keys let Catalyst push the shuffle key into the scan.
    """
    keys = [
        (F.col(k) if k in df.columns else F.col(fields_col)[k]).alias(k) for k in group_keys
    ]
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias(count_col), F.sum("n_tok").alias(bytes_col)
    )


def shard_hash(
    df: DataFrame,
    source_keys: list[str],
    shard_count: int,
    connector: str = "_",
    tag_col: str = "__shardhash__",
) -> DataFrame:
    """md5-bucket rows into ``shard_count`` (power of 2) shards on the concat of
    source key values; emits the shard id and repartitions on it so co-located
    rows land in the same output file (sink shard affinity)."""
    assert shard_count & (shard_count - 1) == 0, "shard_count must be a power of 2"
    concat = F.concat_ws(connector, *[F.col(k).cast("string") for k in source_keys])
    # top bits of md5 → shard, mirroring aggregator_shardhash.go:164-204
    shard = (F.conv(F.substring(F.md5(concat.cast("binary")), 1, 8), 16, 10).cast("long") % shard_count).cast("int")
    out = df.withColumn(tag_col, shard)
    return out.repartition(shard_count, F.col(tag_col))


def salted_repartition(
    df: DataFrame, num_partitions: int, salt_buckets: int = 64, doc_id_col: str = "doc_id", source_col: str = "source"
) -> DataFrame:
    """Salted (source, xxhash64(doc_id) % S) repartition.

    A single hot source (the synth makes one ~70% of rows) would otherwise hash
    to one shuffle partition; the salt spreads it over ``salt_buckets`` while
    keeping co-location per (source, salt) for downstream per-source writes.
    """
    salt = F.pmod(F.xxhash64(F.col(doc_id_col)), F.lit(salt_buckets))
    return df.repartition(num_partitions, F.col(source_col), salt)


def sink_counts(routed: DataFrame, route_col: str = "route") -> DataFrame:
    """Per-sink aggregate counts: rows + token sum (the per-sink
    OUT_SUCCESSFUL_EVENTS_TOTAL counters)."""
    return routed.groupBy(route_col).agg(
        F.count(F.lit(1)).alias("n_rows"), F.sum("n_tok").alias("n_tok_sum")
    )
