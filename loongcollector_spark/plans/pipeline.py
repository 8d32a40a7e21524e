"""Config-driven pipeline compiler — the CollectionPipeline::Init analog
(core/collection_pipeline/CollectionPipeline.cpp:140,242): a pipeline spec
(Python dict) is compiled ONCE into a DataFrame DAG; Catalyst is the optimizer
the reference never had.

Key scale decision: per-``source`` parser dispatch happens inside ONE lazy CASE
projection (``parse_by_source``), so the input table is scanned exactly once and
each row evaluates only its own parser — no per-source unions, no repeated IO.

A full pipeline = decode → parse(by source) → filters → enrich → route →
salted repartition → fan-out sinks + per-sink counts.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..codec import with_content
from ..operators import parse as P
from ..operators.route import RouteRule, route_rows


@dataclass(frozen=True)
class ParserSpec:
    """One per-source parser config (the processor config JSON analog,
    example_config/ in the reference)."""

    kind: str  # regex | json | delimiter | apsara | kv
    regex: str = ""
    keys: tuple[str, ...] = ()
    separator: str = "|"
    kv_delimiter: str = "\t"
    kv_separator: str = ":"
    overflow: str = "extend"
    allow_shortened: bool = False
    opts: P.ParserOptions = field(default_factory=P.ParserOptions)


def _branch_fields(
    spec: ParserSpec, src: Column, enabled: Column
) -> tuple[Column, Column, Column | None]:
    """(masked_fields_map, matched, event_ts|None) for one parser spec.

    The map is EMPTY on rows where ``enabled`` is false, and each parser gates
    its input string on ``enabled`` so the expensive work (regex, json parse)
    runs only on its own source's rows."""
    if spec.kind == "regex":
        m, ok = P.regex_fields(src, spec.regex, list(spec.keys), spec.opts, enabled)
        return m, ok, None
    if spec.kind == "json":
        m, ok = P.json_fields(src, spec.opts, enabled)
        return m, ok, None
    if spec.kind == "delimiter":
        m, ok = P.delimiter_fields(
            src, list(spec.keys), spec.separator, spec.overflow, spec.allow_shortened,
            opts=spec.opts, enabled=enabled,
        )
        return m, ok, None
    if spec.kind == "apsara":
        m, ok, ts = P.apsara_fields(src, spec.opts, enabled)
        return m, ok, ts
    if spec.kind == "kv":
        m, ok = P.kv_fields(src, spec.kv_delimiter, spec.kv_separator, enabled)
        return m, ok, None
    raise ValueError(f"unknown parser kind {spec.kind!r}")


def parse_by_source(
    df: DataFrame,
    parsers: dict[str, ParserSpec],
    source_col: str = "source",
    content_col: str = "content",
    fields_col: str = "fields",
    time_col: str = "event_time",
) -> DataFrame:
    """Dispatch parsers per source value in one projection (single scan).

    The fields map is a ``map_concat`` of per-source MASKED maps (empty for
    rows of other sources) — NOT a when/otherwise chain: CASE with map-typed
    branches costs ~5× the map construction itself (see operators/parse.py
    module docstring). Conditionals stay on primitives (source equality, slice
    lengths); per-parser input gating keeps each regex/json evaluation on its
    own source's rows only.

    Rows whose source has no configured parser keep an empty fields map and
    ``_parse_ok = false`` (they still flow — routing decides their sink).
    A pre-existing ``time_col`` is PRESERVED whenever the row's parser emits
    no timestamp (timestamp-less parser kind, or a failed parse) — a parser
    only ever overwrites event time with a value it actually extracted.
    """
    if not parsers:
        raise ValueError("parse_by_source: parsers dict is empty — configure at least one source")
    src = F.col(content_col)
    empty = F.create_map().cast("map<string,string>")
    base = F.coalesce(F.col(fields_col), empty) if fields_col in df.columns else None

    maps: list[Column] = [] if base is None else [base]
    ok_expr: Column | None = None
    ts_expr: Column | None = None
    prev_ts = F.col(time_col) if time_col in df.columns else F.lit(None).cast("timestamp")
    for source_val, spec in parsers.items():
        cond = F.col(source_col) == F.lit(source_val)
        parsed, matched, ts = _branch_fields(spec, src, cond)
        maps.append(parsed)
        ok_expr = F.when(cond, matched) if ok_expr is None else ok_expr.when(cond, matched)
        # fall back to the pre-existing event time, never clobber it with NULL
        branch_ts = (
            F.when(matched, F.coalesce(ts, prev_ts)).otherwise(prev_ts)
            if ts is not None
            else prev_ts
        )
        ts_expr = F.when(cond, branch_ts) if ts_expr is None else ts_expr.when(cond, branch_ts)

    # Per-source parsed maps never collide with EACH OTHER (mutually exclusive
    # source conditions → at most one is non-empty per row), but any of them CAN
    # collide with a pre-existing fields key (e.g. an upstream enrich already set
    # 'status' and the nginx regex extracts it too). merge_maps drops shadowed
    # base entries structurally (last-wins, LogEvent::SetContent semantics)
    # instead of letting map_concat throw DUPLICATE_MAP_KEY under the default
    # mapKeyDedupPolicy=EXCEPTION.
    parsed_maps = maps if base is None else maps[1:]
    parsed_expr = parsed_maps[0] if len(parsed_maps) == 1 else F.map_concat(*parsed_maps)
    fields_expr = parsed_expr if base is None else P.merge_maps(base, parsed_expr)
    ok_expr = F.coalesce(ok_expr.otherwise(F.lit(False)), F.lit(False))
    ts_expr = ts_expr.otherwise(prev_ts)
    return (
        df.withColumn(fields_col, fields_expr)
        .withColumn(P.PARSE_OK, ok_expr)
        .withColumn(time_col, ts_expr)
    )


# ---------------------------------------------------------------------------
# Default flagship pipeline config (SURVEY.md §7.1 minimum end-to-end slice)
# ---------------------------------------------------------------------------

NGINX_REGEX = (
    r'([^ ]*) ([^ ]*) ([^ ]*) \[([^\]]*)\] "(\S+) ([^"]*) (\S*)" '
    r'([^ ]*) ([^ ]*) "([^"]*)" "([^"]*)"'
)
NGINX_KEYS = (
    "ip",
    "ident",
    "auth",
    "timestamp",
    "method",
    "request",
    "http_version",
    "response_code",
    "bytes",
    "referrer",
    "user_agent",
)
DELIM_KEYS = ("ip", "time", "method", "url", "status", "bytes")

DEFAULT_PARSERS: dict[str, ParserSpec] = {
    "nginx": ParserSpec(kind="regex", regex=NGINX_REGEX, keys=NGINX_KEYS),
    "apsara": ParserSpec(kind="apsara"),
    "json": ParserSpec(kind="json"),
    "delimiter": ParserSpec(kind="delimiter", keys=DELIM_KEYS, separator="|", allow_shortened=True),
    "kv": ParserSpec(kind="kv"),
}

# FIXTURES.md §4 routing table (aggregator_logstore_router semantics)
DEFAULT_ROUTES = [
    RouteRule("nginx", "sink_nginx"),
    RouteRule("apsara", "sink_apsara"),
    RouteRule("json|delimiter", "sink_structured"),
]

# Default enrich stage (the north-star broadcast-lookup / desensitize step):
# status code → class via broadcast dict join; last IP octet redacted.
STATUS_CLASSES = [
    ("200", "ok"), ("301", "redirect"), ("403", "client_error"),
    ("404", "client_error"), ("500", "server_error"),
]


def default_enrich(spark) -> "Callable[[DataFrame], DataFrame]":  # noqa: F821
    """processor_dict_map + processor_desensitize over the parsed fields —
    the reference's rename/filter/desensitize enrich line as one composable
    stage. The dict join is broadcast (zero shuffle of the fact side)."""
    from ..operators.enrich import desensitize_const, dict_map

    dict_df = spark.createDataFrame(STATUS_CLASSES, "code string, cls string")

    def _apply(df: DataFrame) -> DataFrame:
        df = dict_map(
            df, dict_df, source_key="response_code", dest_key="status_class", missing="other"
        )
        df = desensitize_const(df, "ip", r"\d+$", "x")  # redact last IP octet
        return df

    return _apply


def build_pipeline(
    df: DataFrame,
    parsers: dict[str, ParserSpec] | None = None,
    routes: list[RouteRule] | None = None,
    default_sink: str | None = "sink_default",
    route_on_parse_fail: str | None = None,
    enrich=None,
) -> DataFrame:
    """decode → parse(by source) → [enrich] → route. ``tokens`` is carried
    untouched.

    ``enrich`` is a DataFrame→DataFrame stage (see ``default_enrich``) applied
    between parse and route — the broadcast-lookup / desensitize line.
    ``route_on_parse_fail`` overrides the route for rows whose parse failed
    (e.g. send malformed lines to a quarantine sink).
    """
    parsers = DEFAULT_PARSERS if parsers is None else parsers
    routes = DEFAULT_ROUTES if routes is None else routes
    out = with_content(df)
    out = parse_by_source(out, parsers)
    if enrich is not None:
        out = enrich(out)
    out = route_rows(out, routes, source_key="source", default_sink=default_sink)
    if route_on_parse_fail is not None:
        out = out.withColumn(
            "route", F.when(~F.col(P.PARSE_OK), F.lit(route_on_parse_fail)).otherwise(F.col("route"))
        )
    return out
