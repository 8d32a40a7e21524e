"""Multi-value MetricEvent model — UntypedMultiDoubleValues
(core/models/MetricValue.h:47-81: ``map<name, {MetricType counter|gauge,
double}>`` as one event's value) and its natural aggregate semantics, closing
SURVEY §1.1's declared residual.

Spark mapping: one metric row =
``(time, tags map<string,string>, values map<string, struct<mtype:int,
value:double>>)`` with mtype 0 = counter, 1 = gauge (the
UntypedValueMetricType enum order, MetricValue.h:45).

``multi_metric_merge`` is the model's aggregate: within a (tags, window)
group, counters ADD and gauges keep the LATEST observation — the universal
counter/gauge semantic the reference's consumers (Prometheus remote-write,
SLS metricstore) apply to this value type.

Scale shape: the merge explodes each row's values map (bounded by the metric
schema, not the corpus), aggregates map-side-combined per (group, name) —
counters via SUM, gauges via max_by(observation time) — and re-assembles one
map per group with an ordered collect. Two hash aggregates, no window over
the corpus, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

COUNTER = 0
GAUGE = 1


def to_multi_metric(
    df: DataFrame,
    counters: dict[str, Column],
    gauges: dict[str, Column],
    tag_cols: list[str],
    time_col: str = "ts",
) -> DataFrame:
    """Build multi-value metric rows from log/event rows: each named series
    becomes one entry of the ``values`` map (SetValue semantics — a name
    appears once). A name in BOTH ``counters`` and ``gauges`` would produce a
    duplicate map key — ``map_from_entries`` throws under the default
    ``mapKeyDedupPolicy=EXCEPTION`` — so it is rejected up front. Pure
    projection."""
    overlap = sorted(set(counters) & set(gauges))
    if overlap:
        raise ValueError(
            f"to_multi_metric: series name(s) {overlap} appear in both "
            f"counters and gauges — a values-map key holds exactly one typed entry"
        )
    entries = [
        F.struct(
            F.lit(name).alias("key"),
            F.struct(F.lit(COUNTER).alias("mtype"), col.try_cast("double").alias("value")).alias(
                "value"
            ),
        )
        for name, col in counters.items()
    ] + [
        F.struct(
            F.lit(name).alias("key"),
            F.struct(F.lit(GAUGE).alias("mtype"), col.try_cast("double").alias("value")).alias(
                "value"
            ),
        )
        for name, col in gauges.items()
    ]
    tags = F.map_from_arrays(
        F.array(*[F.lit(t) for t in tag_cols]),
        F.array(*[F.col(t).cast("string") for t in tag_cols]),
    )
    return df.select(
        F.col(time_col).alias("time"),
        tags.alias("tags"),
        F.map_from_entries(F.array(*entries)).alias("values"),
    )


def multi_metric_merge(df: DataFrame, group_exprs: dict[str, Column]) -> DataFrame:
    """Merge multi-value metric rows per group: counter entries SUM, gauge
    entries keep the value of the LATEST ``time`` (ties broken by larger
    value for determinism). Returns one row per group with the merged
    ``values`` map (entry order = sorted names) and ``n_obs`` (series observations merged).

    Float caveat: counter SUM is a float aggregation — for oracle-exact
    cross-engine comparisons feed integer-valued counters (the flagship
    pattern: scale to cents/ppm before the sum).

    Type-conflict rule: a series name SHOULD carry one mtype; if observations
    disagree (producer schema drift), the merged entry resolves
    DETERMINISTICALLY to counter semantics (``min(mtype)`` — counter sums its
    counter-typed observations; the stray gauge rows still count in
    ``n_obs``), never to a partition-order-dependent ``first()``."""
    g = df.select(
        *[expr.alias(k) for k, expr in group_exprs.items()],
        "time",
        F.explode("values").alias("name", "v"),
    )
    keys = list(group_exprs)
    per_series = (
        g.groupBy(*keys, "name")
        .agg(
            F.min(F.col("v.mtype")).alias("mtype"),
            F.sum(F.when(F.col("v.mtype") == COUNTER, F.col("v.value"))).alias("_sum"),
            F.max_by(
                F.col("v.value"),
                F.when(
                    F.col("v.mtype") == GAUGE,
                    F.struct(F.col("time").alias("t"), F.col("v.value").alias("val")),
                ),
            ).alias("_last"),
            F.count(F.lit(1)).alias("_n"),
        )
        .select(
            *keys,
            "name",
            "mtype",
            F.when(F.col("mtype") == COUNTER, F.col("_sum"))
            .otherwise(F.col("_last"))
            .alias("value"),
            "_n",
        )
    )
    return (
        per_series.groupBy(*keys)
        .agg(
            F.map_from_entries(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("name").alias("key"),
                            F.struct(
                                F.col("mtype").alias("mtype"), F.col("value").alias("value")
                            ).alias("value"),
                        )
                    )
                )
            ).alias("values"),
            F.sum("_n").alias("n_obs"),
        )
    )
