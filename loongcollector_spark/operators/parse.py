"""Parse / projection operators.

Reproduces the semantics of the reference's native parsers (SURVEY.md §2.2):

* ``parse_regex``     — processor_parse_regex_native
                        (core/plugin/processor/ProcessorParseRegexNative.cpp)
* ``parse_json``      — processor_parse_json_native
                        (core/plugin/processor/ProcessorParseJsonNative.cpp:105-202)
* ``parse_delimiter`` — processor_parse_delimiter_native
                        (core/plugin/processor/ProcessorParseDelimiterNative.cpp:206-409)
* ``parse_apsara``    — processor_parse_apsara_native
                        (core/plugin/processor/ProcessorParseApsaraNative.cpp:116-463)
* ``parse_timestamp`` — processor_parse_timestamp_native
                        (core/plugin/processor/ProcessorParseTimestampNative.cpp)
* ``split_key_value`` — processor_split_key_value
                        (plugins/processor/split/keyvalue/key_value_splitter.go:26-52)

Shared **CommonParserOptions** semantics
(core/plugin/processor/CommonParserOptions.h:30-39, .cpp:91-117):
on success the source key is removed unless ``keep_source_on_success`` keeps the
raw under ``renamed_source_key``; on failure the raw is kept
(``keep_source_on_fail``) or the event is **dropped**.

Architecture: each parser exposes an EXPRESSION-LEVEL builder
(``*_exprs(src) -> (parsed_map, matched[, ts])``) plus a thin DataFrame wrapper.
The expression form lets the pipeline compiler dispatch different parsers per
``source`` inside ONE lazy CASE projection — a single scan of the input table,
each row evaluating only its own parser (CASE branches are lazy), no union and
no repeated IO at 100 TB.

Everything here is a native Catalyst expression (whole-stage codegen, zero
Python in the hot path). The regex parser uses a single-pass packing trick —
``regexp_replace(line, anchored, "$1\\x01$2…")`` + ``split`` — so each row costs
two regex evaluations total instead of one per capture key.
"""

from __future__ import annotations

import re as _re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Field separator for the packed-capture trick. \x01 never appears in valid
# UTF-8 log payloads produced by the synth (ASCII printable + \t).
_SEP = "\x01"

PARSE_OK = "_parse_ok"  # transient bookkeeping column, dropped by finalize

EMPTY_MAP = "cast(map() as map<string,string>)"


def _empty_map() -> Column:
    return F.create_map().cast("map<string,string>")


@dataclass(frozen=True)
class ParserOptions:
    """CommonParserOptions (CommonParserOptions.h:30-39)."""

    keep_source_on_success: bool = False
    keep_source_on_fail: bool = True
    renamed_source_key: str = "__raw__"
    copy_raw_on_fail_key: str = "__raw_log__"


def _ensure_fields(df: DataFrame, fields_col: str) -> DataFrame:
    if fields_col not in df.columns:
        df = df.withColumn(fields_col, _empty_map())
    return df


def apply_parser_options(
    parsed_map: Column,
    matched: Column,
    raw: Column,
    base: Column,
    opts: ParserOptions,
) -> Column:
    """fields-map expression under CommonParserOptions keep policy
    (CommonParserOptions.cpp:91-117). Row-drop for ``keep_source_on_fail=False``
    is applied by the DataFrame wrapper (ShouldEraseEvent)."""
    on_ok = F.map_concat(base, parsed_map)
    if opts.keep_source_on_success:
        on_ok = F.map_concat(on_ok, F.create_map(F.lit(opts.renamed_source_key), raw))
    if opts.keep_source_on_fail:
        on_fail = F.map_concat(base, F.create_map(F.lit(opts.copy_raw_on_fail_key), raw))
    else:
        on_fail = base
    return F.when(matched, on_ok).otherwise(on_fail)


def _wrap(
    df: DataFrame,
    parsed_map: Column,
    matched: Column,
    source_col: str,
    fields_col: str,
    opts: ParserOptions,
) -> DataFrame:
    df = _ensure_fields(df, fields_col)
    base = F.coalesce(F.col(fields_col), _empty_map())
    out = df.withColumn(
        fields_col, apply_parser_options(parsed_map, matched, F.col(source_col), base, opts)
    ).withColumn(PARSE_OK, matched)
    if not opts.keep_source_on_fail:
        out = out.filter(matched)  # ShouldEraseEvent → drop unparseable rows
    return out


# ---------------------------------------------------------------------------
# regex (processor_parse_regex_native)
# ---------------------------------------------------------------------------

def anchor_full_match(regex: str) -> str:
    """Emulate boost regex_match (whole-line) with ^...$ anchoring
    (ProcessorParseRegexNative.cpp:227-244)."""
    if not regex.startswith("^"):
        regex = "^" + regex
    if not regex.endswith("$"):
        regex = regex + "$"
    return regex


def regex_exprs(src: Column, regex: str, keys: list[str]) -> tuple[Column, Column]:
    """(parsed_map, matched) for full-line regex capture parse.

    Single regex pass via the packing trick; ``(.*)`` short-circuits to a plain
    copy (ProcessorParseRegexNative.cpp:68,147-148)."""
    if regex in ("(.*)", "^(.*)$") and len(keys) == 1:
        return F.create_map(F.lit(keys[0]), src), src.isNotNull()
    anchored = anchor_full_match(regex)
    matched = src.rlike(anchored)
    repl = _SEP.join(f"${i + 1}" for i in range(len(keys)))
    packed = F.regexp_replace(src, anchored, repl)
    arr = F.split(packed, _SEP, -1)
    parsed = F.map_from_arrays(
        F.array(*[F.lit(k) for k in keys]),
        F.array(*[F.try_element_at(arr, F.lit(i + 1)) for i in range(len(keys))]),
    )
    return parsed, matched


def parse_regex(
    df: DataFrame,
    regex: str,
    keys: list[str],
    source_col: str = "content",
    fields_col: str = "fields",
    opts: ParserOptions = ParserOptions(),
) -> DataFrame:
    parsed, matched = regex_exprs(F.col(source_col), regex, keys)
    return _wrap(df, parsed, matched, source_col, fields_col, opts)


# ---------------------------------------------------------------------------
# json (processor_parse_json_native)
# ---------------------------------------------------------------------------

def json_exprs(src: Column) -> tuple[Column, Column]:
    """(parsed_map, matched): top-level members → string fields; nested values
    stay serialized JSON (ProcessorParseJsonNative.cpp:186-200); non-object /
    malformed → failure (.cpp:167-181).

    Known deviation: numeric leaves are stringified by Java shortest-repr, which
    uses E-notation for |x| < 1e-3 or >= 1e7 ("2.0E-4") where rapidjson prints
    plain ("0.0002"); identical within the plain-notation range."""
    parsed = F.from_json(src, "map<string,string>")
    return F.coalesce(parsed, _empty_map()), parsed.isNotNull()


def parse_json(
    df: DataFrame,
    source_col: str = "content",
    fields_col: str = "fields",
    opts: ParserOptions = ParserOptions(),
) -> DataFrame:
    parsed, matched = json_exprs(F.col(source_col))
    return _wrap(df, parsed, matched, source_col, fields_col, opts)


# ---------------------------------------------------------------------------
# delimiter (processor_parse_delimiter_native)
# ---------------------------------------------------------------------------

def delimiter_exprs(
    src: Column,
    keys: list[str],
    separator: str = "|",
    overflow: str = "extend",  # extend | keep | discard
    allow_shortened: bool = False,
    max_extend_cols: int = 8,
) -> tuple[Column, Column]:
    """(parsed_map, matched). Overflow policies
    (ProcessorParseDelimiterNative.cpp:258-338): ``extend`` → ``__column{N}__``
    extra keys; ``keep`` → remainder glued into ``__column{len(keys)}__``;
    short rows only when ``allow_shortened`` (.cpp:285). Fields are trimmed
    (.cpp:226-242)."""
    n = len(keys)
    arr = F.split(src, _re.escape(separator), -1)
    sz = F.size(arr)
    base_keys = [F.lit(k) for k in keys]
    base_vals = [F.trim(F.try_element_at(arr, F.lit(i + 1))) for i in range(n)]
    matched = sz >= F.lit(1) if allow_shortened else sz >= F.lit(n)

    avail = F.least(sz, F.lit(n))
    short_map = F.map_from_arrays(
        F.slice(F.array(*base_keys), 1, avail), F.slice(F.array(*base_vals), 1, avail)
    )
    if overflow == "extend":
        extra_keys = [F.lit(f"__column{n + j}__") for j in range(max_extend_cols)]
        extra_vals = [F.trim(F.try_element_at(arr, F.lit(n + j + 1))) for j in range(max_extend_cols)]
        extra_cnt = F.least(F.greatest(sz - F.lit(n), F.lit(0)), F.lit(max_extend_cols))
        over_map = F.map_concat(
            short_map,
            F.map_from_arrays(
                F.slice(F.array(*extra_keys), 1, extra_cnt), F.slice(F.array(*extra_vals), 1, extra_cnt)
            ),
        )
    elif overflow == "keep":
        glued = F.array_join(F.slice(arr, n + 1, F.greatest(sz - F.lit(n), F.lit(0))), separator)
        over_map = F.map_concat(short_map, F.create_map(F.lit(f"__column{n}__"), glued))
    else:
        over_map = short_map
    parsed = F.when(sz > F.lit(n), over_map).otherwise(short_map)
    return parsed, matched


def csv_exprs(src: Column, keys: list[str], separator: str, quote: str) -> tuple[Column, Column]:
    """Quoted delimiter mode via from_csv (FSM semantics, .cpp:251-256).
    Also serves processor_csv (plugins/processor/csv/processor_csv.go:30)."""
    schema = ", ".join(f"`{k}` string" for k in keys)
    parsed_struct = F.from_csv(src, schema, {"sep": separator, "quote": quote})
    parsed = F.map_filter(
        F.map_from_arrays(
            F.array(*[F.lit(k) for k in keys]),
            F.array(*[parsed_struct[k] for k in keys]),
        ),
        lambda _, v: v.isNotNull(),
    )
    matched = parsed_struct.isNotNull() & parsed_struct[keys[0]].isNotNull()
    return parsed, matched


def parse_delimiter(
    df: DataFrame,
    keys: list[str],
    separator: str = "|",
    source_col: str = "content",
    fields_col: str = "fields",
    overflow: str = "extend",
    allow_shortened: bool = False,
    quote: str | None = None,
    max_extend_cols: int = 8,
    opts: ParserOptions = ParserOptions(),
) -> DataFrame:
    if quote:
        parsed, matched = csv_exprs(F.col(source_col), keys, separator, quote)
    else:
        parsed, matched = delimiter_exprs(
            F.col(source_col), keys, separator, overflow, allow_shortened, max_extend_cols
        )
    return _wrap(df, parsed, matched, source_col, fields_col, opts)


# ---------------------------------------------------------------------------
# apsara (processor_parse_apsara_native)
# ---------------------------------------------------------------------------

def apsara_exprs(src: Column) -> tuple[Column, Column, Column]:
    """(parsed_map, matched, event_ts) for Apsara format
    ``[time]\\t[LEVEL]\\t[thread]\\t[file:line]\\tk:v…``.

    Positional ``[...]`` base fields classified by charset
    (ProcessorParseApsaraNative.cpp:433-463): all-caps → __LEVEL__, all-digits →
    __THREAD__, contains ``/``/``.`` → __FILE__ + __LINE__ (split on the LAST
    colon). Tab-separated ``k:v`` tail appended; ``microtime`` emitted
    (.cpp:226-232). Fully native array filter/transform over the tab-split line.
    """
    parts = F.split(src, "\t", -1)
    head = F.element_at(parts, 1)
    time_str = F.regexp_extract(head, r"^\[([^\]]*)\]$", 1)
    matched = time_str != F.lit("")

    rest = F.slice(parts, 2, F.greatest(F.size(parts) - 1, F.lit(0)))
    # Bracket test via cheap string predicates (NOT regex — regex inside a HOF
    # lambda is re-evaluated interpreted per element and measured ~50× slower).
    def _is_br(p: Column) -> Column:
        return p.startswith("[") & p.endswith("]")

    # All bracketed blocks re-joined into one string; each classifier is then a
    # single JVM regex pass over that string (first match == reference's
    # first-matching-block rule, .cpp:433-463).
    brs = F.array_join(F.filter(rest, _is_br), "\t")
    kv_map = F.str_to_map(
        F.array_join(F.filter(rest, lambda p: ~_is_br(p)), "\t"), F.lit("\t"), F.lit(":")
    )
    level = F.nullif(F.regexp_extract(brs, r"\[([A-Z]+)\]", 1), F.lit(""))
    thread = F.nullif(F.regexp_extract(brs, r"\[(\d+)\]", 1), F.lit(""))
    # contains '/', or contains both '.' and ':' (either order) — lookaheads
    fileline = F.nullif(
        F.regexp_extract(brs, r"\[(?:(?=[^\]]*/)|(?=[^\]]*\.)(?=[^\]]*:))([^\]]*)\]", 1),
        F.lit(""),
    )
    line_no = F.substring_index(fileline, ":", -1)
    file_path = F.substr(
        fileline, F.lit(1), F.greatest(F.length(fileline) - F.length(line_no) - F.lit(1), F.lit(0))
    )

    is_epoch = time_str.rlike(r"^\d+$")
    ts = F.when(is_epoch, F.to_timestamp(F.from_unixtime(time_str.cast("long")))).otherwise(
        F.to_timestamp(time_str)
    )
    microtime = F.when(is_epoch, (time_str.cast("long") * F.lit(1000000)).cast("string")).otherwise(
        F.unix_micros(ts).cast("string")
    )
    base_map = F.map_filter(
        F.map_from_arrays(
            F.array(
                F.lit("microtime"),
                F.lit("__LEVEL__"),
                F.lit("__THREAD__"),
                F.lit("__FILE__"),
                F.lit("__LINE__"),
            ),
            F.array(
                microtime,
                level,
                thread,
                F.when(fileline.isNotNull(), file_path),
                F.when(fileline.isNotNull(), line_no),
            ),
        ),
        lambda _, v: v.isNotNull(),
    )
    return F.map_concat(base_map, kv_map), matched, ts


def parse_apsara(
    df: DataFrame,
    source_col: str = "content",
    fields_col: str = "fields",
    time_col: str = "event_time",
    opts: ParserOptions = ParserOptions(),
) -> DataFrame:
    df = _ensure_fields(df, fields_col)
    parsed, matched, ts = apsara_exprs(F.col(source_col))
    had_time = time_col in df.columns
    prev_ts = F.col(time_col) if had_time else F.lit(None).cast("timestamp")
    out = _wrap(df, parsed, matched, source_col, fields_col, opts)
    return out.withColumn(time_col, F.when(matched, ts).otherwise(prev_ts))


# ---------------------------------------------------------------------------
# timestamp (processor_parse_timestamp_native / strptime / gotime)
# ---------------------------------------------------------------------------

def parse_timestamp(
    df: DataFrame,
    source_key: str,
    fmt: str,
    source_is_field: bool = True,
    fields_col: str = "fields",
    time_col: str = "event_time",
    discard_before: str | None = None,
) -> DataFrame:
    """strptime SourceKey → event timestamp; ``discard_before`` mirrors dropping
    events older than ilogtail_discard_interval
    (ProcessorParseTimestampNative.cpp:125-171)."""
    src = F.col(fields_col)[source_key] if source_is_field else F.col(source_key)
    ts = F.to_timestamp(src, fmt)
    prev = F.col(time_col) if time_col in df.columns else F.lit(None).cast("timestamp")
    out = df.withColumn(time_col, F.coalesce(ts, prev))
    if discard_before is not None:
        out = out.filter(F.col(time_col) >= F.lit(discard_before).cast("timestamp"))
    return out


# ---------------------------------------------------------------------------
# key/value split (processor_split_key_value)
# ---------------------------------------------------------------------------

def kv_exprs(src: Column, delimiter: str = "\t", separator: str = ":") -> tuple[Column, Column]:
    """(parsed_map, matched). Anomaly synth keys
    (key_value_splitter.go:26-52,98): empty key → ``empty_key_{N}``, token
    without separator → ``no_separator_key_{N}``, N counting anomalies of that
    kind so far in the event — computed natively with an ``aggregate`` fold
    threading two counters through the token array."""
    toks = F.split(src, _re.escape(delimiter), -1)
    fold = F.aggregate(
        toks,
        F.struct(
            F.lit(0).alias("ek"),
            F.lit(0).alias("nk"),
            F.expr("cast(array() as array<struct<key:string,value:string>>)").alias("entries"),
        ),
        lambda acc, t: F.when(
            ~t.contains(separator),
            F.struct(
                acc["ek"].alias("ek"),
                (acc["nk"] + 1).alias("nk"),
                F.concat(
                    acc["entries"],
                    F.array(
                        F.struct(
                            F.concat(F.lit("no_separator_key_"), acc["nk"].cast("string")).alias("key"),
                            t.alias("value"),
                        )
                    ),
                ).alias("entries"),
            ),
        )
        .when(
            F.substring_index(t, separator, 1) == F.lit(""),
            F.struct(
                (acc["ek"] + 1).alias("ek"),
                acc["nk"].alias("nk"),
                F.concat(
                    acc["entries"],
                    F.array(
                        F.struct(
                            F.concat(F.lit("empty_key_"), acc["ek"].cast("string")).alias("key"),
                            F.substr(t, F.lit(len(separator) + 1)).alias("value"),
                        )
                    ),
                ).alias("entries"),
            ),
        )
        .otherwise(
            F.struct(
                acc["ek"].alias("ek"),
                acc["nk"].alias("nk"),
                F.concat(
                    acc["entries"],
                    F.array(
                        F.struct(
                            F.substring_index(t, separator, 1).alias("key"),
                            F.substr(
                                t,
                                F.length(F.substring_index(t, separator, 1)) + F.lit(len(separator) + 1),
                            ).alias("value"),
                        )
                    ),
                ).alias("entries"),
            )
        ),
    )
    return F.map_from_entries(fold["entries"]), src.isNotNull()


def split_key_value(
    df: DataFrame,
    delimiter: str = "\t",
    separator: str = ":",
    source_col: str = "content",
    fields_col: str = "fields",
) -> DataFrame:
    df = _ensure_fields(df, fields_col)
    parsed, matched = kv_exprs(F.col(source_col), delimiter, separator)
    return df.withColumn(
        fields_col, F.map_concat(F.coalesce(F.col(fields_col), _empty_map()), parsed)
    ).withColumn(PARSE_OK, matched)


def finalize(df: DataFrame) -> DataFrame:
    """Drop transient bookkeeping columns after the parse stage."""
    drops = [c for c in df.columns if c == PARSE_OK]
    return df.drop(*drops) if drops else df
