"""Routing: row-level logstore router + group-level flusher conditions.

* ``route_rows`` — aggregator_logstore_router semantics: anchored full-match
  regexes tried in order, first hit wins, non-matching rows → default sink or
  dropped (plugins/aggregator/logstorerouter/aggregator_router.go:97-133).
  Compiles to ONE chained when/otherwise — a single projection, no shuffle.
* ``sink_conditions`` — Router fan-out semantics
  (core/collection_pipeline/route/Router.cpp:50-82): unconditional sinks always
  receive a copy; conditional sinks receive rows matching their Condition
  (event_type equality or tag equality, Condition.cpp:36-113). A row can go to
  MULTIPLE sinks, so fan-out is one filtered write per sink over a cached
  DataFrame — not ``partitionBy``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class RouteRule:
    regex: str  # full-match on the key's value (anchored automatically)
    sink: str


def _anchor(r: str) -> str:
    # Wrap in a non-capturing group BEFORE anchoring: bare "^" + "json|delimiter"
    # + "$" would anchor only the alternation's outer branches ("^json" OR
    # "delimiter$"), matching 'json2' / 'xdelimiter' — not a full match. The
    # group makes the anchors apply to the whole pattern; redundant inner
    # anchors (a user-supplied "^foo$") stay valid inside the group.
    return rf"^(?:{r})$"


def route_rows(
    df: DataFrame,
    rules: list[RouteRule],
    source_key: str = "source",
    default_sink: str | None = "default",
    route_col: str = "route",
    fields_col: str = "fields",
) -> DataFrame:
    """First-match-wins anchored regex routing into a ``route`` column.

    ``default_sink=None`` reproduces DropDisMatch (aggregator_router.go:97-133):
    non-matching rows are dropped.
    """
    src = F.col(source_key) if source_key in df.columns else F.col(fields_col)[source_key]
    expr: Column | None = None
    for rule in rules:
        cond = src.isNotNull() & src.rlike(_anchor(rule.regex))
        expr = F.when(cond, F.lit(rule.sink)) if expr is None else expr.when(cond, F.lit(rule.sink))
    if expr is None:
        expr = F.lit(default_sink)
    else:
        expr = expr.otherwise(F.lit(default_sink))
    out = df.withColumn(route_col, expr)
    if default_sink is None:
        out = out.filter(F.col(route_col).isNotNull())
    return out


@dataclass(frozen=True)
class SinkCondition:
    """Condition (core/collection_pipeline/route/Condition.cpp).

    type: 'always' (unconditional flusher) | 'event_type' | 'tag' | 'route'.
    """

    sink: str
    type: str = "always"
    key: str = ""
    value: str = ""
    discard_tag: bool = False  # DiscardingTag removes the tag after routing


def sink_predicate(cond: SinkCondition, df_cols: list[str]) -> Column:
    if cond.type == "always":
        return F.lit(True)
    if cond.type == "event_type":
        return F.col("event_type") == F.lit(cond.value)
    if cond.type == "tag":
        return F.col("tags")[cond.key] == F.lit(cond.value)
    if cond.type == "route":
        return F.col("route") == F.lit(cond.value)
    raise ValueError(f"unknown condition type {cond.type!r}")


def fan_out(df: DataFrame, conditions: list[SinkCondition]) -> dict[str, DataFrame]:
    """Router.cpp:50-82 multi-sink duplication: each sink gets the rows its
    condition matches; a row may appear in several sinks. Caller should
    ``df.persist()`` first so the routed plan is computed once."""
    dup = {c.sink for c in conditions if sum(x.sink == c.sink for x in conditions) > 1}
    if dup:
        raise ValueError(
            f"fan_out: duplicate sink name(s) {sorted(dup)} — each later "
            "condition would silently REPLACE the earlier one's rows; give "
            "each condition a distinct sink (or pre-merge the conditions)"
        )
    out: dict[str, DataFrame] = {}
    for c in conditions:
        sunk = df.filter(sink_predicate(c, df.columns))
        if c.type == "tag" and c.discard_tag:
            sunk = sunk.withColumn("tags", F.map_filter(F.col("tags"), lambda k, _: k != F.lit(c.key)))
        out[c.sink] = sunk
    return out
