"""Enrichment / transform operators (SURVEY.md §2.4).

* ``dict_map``        — processor_dict_map lookup-table enrich via BROADCAST join
                        (plugins/processor/dictmap/processor_dict_map.go:30-186)
* ``rename_keys``     — processor_rename (plugins/processor/rename/processor_rename.go:26-141)
* ``add_fields``      — processor_add_fields (plugins/processor/addfields/...go:26-85)
* ``appender``        — processor_appender (plugins/processor/appender/...go:31-39)
* ``desensitize``     — processor_desensitize_native const/md5 modes
                        (core/plugin/processor/ProcessorDesensitizeNative.cpp:146-253)
* ``string_replace``  — processor_string_replace (regex/const/unquote)
* ``base64_field`` / ``md5_field`` / ``pack_json`` — small field transforms
* ``log_to_metric``   — processor_log_to_sls_metric reshape
                        (plugins/processor/logtoslsmetric/...go:32-172)

Scale notes: dict_map is ALWAYS a broadcast hash join (dict ≤1000 rows per the
reference's MaxDictSize) — zero shuffle on the fact side. The md5-desensitize
mode needs Python's re.sub with a hash callback → Arrow-batched pandas UDF
(slow path, only when configured).
"""

from __future__ import annotations

import hashlib
import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, pandas_udf
from pyspark.sql import types as T

from .parse import _dedup_entries_last_wins, _entries_map, _opt_entry, merge_maps


def _set_field(base: Column, key: str, value: Column, present: Column) -> Column:
    """fields-map with ``key`` set to ``value`` where ``present`` (else left
    untouched). STRUCTURALLY duplicate-free: the shadowed base entry is
    filtered out before map construction, so this works under any
    ``spark.sql.mapKeyDedupPolicy`` (the driver's harness session carries the
    default EXCEPTION — round 1 lost 3 queries to a LAST_WIN conf dependency).
    Overwrite semantics per LogEvent::SetContent (core/models/LogEvent.h:115-124)."""
    from .parse import _let

    def build(b: Column, v: Column) -> Column:
        def with_cond(cond: Column) -> Column:
            kept = F.filter(F.map_entries(b), lambda e: ~cond | (e["key"] != F.lit(key)))
            return F.map_from_entries(F.concat(kept, _opt_entry(key, v, cond)))

        # cond is read per map entry inside the filter lambda — bind it so the
        # present/value trees evaluate once per row, not once per entry
        return _let(F.coalesce(present & v.isNotNull(), F.lit(False)), with_cond)

    # let-bind: value (often a regex/hash over the field) and base are each
    # referenced 2+ times — interpreted HOFs would re-evaluate them per use
    return _let(base, lambda b: _let(value, lambda v: build(b, v)))


def dict_map(
    df: DataFrame,
    dict_df: DataFrame,
    source_key: str,
    dest_key: str,
    missing: str | None = None,
    mode: str = "overwrite",  # overwrite | fill (only-if-absent)
    fields_col: str = "fields",
    source_is_field: bool = True,
) -> DataFrame:
    """Lookup-table enrich. ``dict_df`` must be 2 columns ``(key, value)``.

    Broadcast hash join on the dict (processor_dict_map.go caps dicts at 1000
    entries, .go:96-146) → no shuffle of the big side, survives any scale-up.
    ``mode='fill'`` writes only when ``dest_key`` is absent; ``missing`` is the
    HandleMissing default (.go:148-186; None → leave row unenriched).
    """
    k, v = dict_df.columns[:2]
    d = broadcast(dict_df.select(F.col(k).alias("__dm_key"), F.col(v).alias("__dm_val")))
    src = F.col(fields_col)[source_key] if source_is_field else F.col(source_key)
    joined = df.join(d, src == F.col("__dm_key"), "left")
    mapped = F.col("__dm_val")
    if missing is not None:
        # HandleMissing fills only rows that HAVE the source key
        mapped = F.when(src.isNotNull(), F.coalesce(mapped, F.lit(missing)))
    base = F.col(fields_col)
    if mode == "fill":
        new_val = F.coalesce(base[dest_key], mapped)
    else:
        new_val = mapped
    out_map = _set_field(base, dest_key, new_val, new_val.isNotNull())
    return joined.withColumn(fields_col, out_map).drop("__dm_key", "__dm_val")


def rename_keys(
    df: DataFrame, source_keys: list[str], dest_keys: list[str], fields_col: str = "fields"
) -> DataFrame:
    """processor_rename: positional key rename inside the fields map."""
    mapping = dict(zip(source_keys, dest_keys))
    pairs = [x for kv in mapping.items() for x in (F.lit(kv[0]), F.lit(kv[1]))]
    lookup = F.create_map(*pairs)
    renamed = F.transform(
        F.map_entries(F.col(fields_col)),
        lambda e: F.struct(
            F.coalesce(lookup[e["key"]], e["key"]).alias("key"), e["value"].alias("value")
        ),
    )
    # renaming onto an existing key must not crash map construction → last-wins
    return df.withColumn(fields_col, F.map_from_entries(_dedup_entries_last_wins(renamed)))


def add_fields(
    df: DataFrame, fields: dict[str, str], ignore_if_exist: bool = False, fields_col: str = "fields"
) -> DataFrame:
    """processor_add_fields: append constant fields."""
    add = F.create_map(*[F.lit(x) for kv in fields.items() for x in kv])
    base = F.col(fields_col)
    if ignore_if_exist:
        # keys already in base are filtered from `add` → concat stays disjoint
        # (key-presence check, not value-null check: null-valued keys count)
        add = F.map_filter(add, lambda k, _: ~F.array_contains(F.map_keys(base), k))
        return df.withColumn(fields_col, F.map_concat(base, add))
    return df.withColumn(fields_col, merge_maps(base, add))


# processor_appender / processor_cloud_meta metadata source. The reference
# reads a live cloud platform API (pkg/helper/platformmeta/interface.go:18-28);
# this deterministic mock stands in — swap a real provider dict in production.
MOCK_CLOUD_META: dict[str, str] = {
    "__cloud_instance_id__": "i-mock0001",
    "__cloud_instance_name__": "mock-instance",
    "__cloud_region__": "mock-region-1",
    "__cloud_zone__": "mock-zone-a",
    "__cloud_instance_type__": "mock.large",
    "__cloud_image_id__": "img-mock",
    "__cloud_vpc_id__": "vpc-mock",
    "__cloud_vswitch_id__": "vsw-mock",
}

_TEMPLATE_RE = re.compile(r"\{\{([^}]*)\}\}")


def expand_appender_template(
    value: str,
    env: dict[str, str] | None = None,
    ip: str = "127.0.0.1",
    host: str = "localhost",
    cloud: dict[str, str] | None = None,
) -> str:
    """Plan-build-time expansion of appender ``{{...}}`` templates
    (processor_appender.go:55-63,118-133): ``{{$NAME}}`` → env var,
    ``{{__ip__}}`` → ip, ``{{__host__}}`` → host, ``{{__cloud_*__}}`` → cloud
    metadata; unknown keys expand to themselves. ``env``/``ip``/``host`` are
    injectable for deterministic tests (the reference reads the live host)."""
    import os

    env = dict(os.environ) if env is None else env
    cloud = MOCK_CLOUD_META if cloud is None else cloud

    def repl(m: re.Match) -> str:
        key = m.group(1)
        if not key:
            return ""
        if key[0] == "$":
            return env.get(key[1:], "")
        if key == "__ip__":
            return ip
        if key == "__host__":
            return host
        if key in cloud:
            return cloud[key]
        return key

    return _TEMPLATE_RE.sub(repl, value)


def sort_labels_value(col: Column) -> Column:
    """SortLabels post-step (processor_appender.go:93-105): parse the value as
    ``k#$#v|k#$#v…`` metric labels and re-emit sorted by key; values without
    any valid ``#$#`` pair are left untouched (MetricLabels.Len()==0 guard)."""
    labels = F.split(col, r"\|")
    valid = F.filter(labels, lambda l: l.contains("#$#"))
    structs = F.transform(
        valid, lambda l: F.struct(F.substring_index(l, "#$#", 1).alias("k"), l.alias("l"))
    )
    sorted_val = F.array_join(F.transform(F.array_sort(structs), lambda s: s["l"]), "|")
    return F.when(F.size(valid) > 0, sorted_val).otherwise(col)


def appender(
    df: DataFrame,
    key: str,
    value: str,
    fields_col: str = "fields",
    sort_labels: bool = False,
    template_vars: dict | None = None,
) -> DataFrame:
    """processor_appender: concatenate ``value`` onto existing field ``key``
    (creating it if absent, .go:76-84). ``{{...}}`` templates expand once at
    plan-build time via expand_appender_template; ``sort_labels`` re-sorts the
    resulting ``k#$#v|…`` label string by key (.go:93-105)."""
    if "{{" in value:
        value = expand_appender_template(value, **(template_vars or {}))
    base = F.col(fields_col)
    new = F.concat(F.coalesce(base[key], F.lit("")), F.lit(value))
    if sort_labels:
        new = sort_labels_value(new)
    return df.withColumn(fields_col, _set_field(base, key, new, F.lit(True)))


def desensitize_const(
    df: DataFrame,
    key: str,
    regex: str,
    replacement: str,
    replace_all: bool = True,
    fields_col: str = "fields",
    source_is_field: bool = True,
) -> DataFrame:
    """processor_desensitize const mode: regex redaction → constant
    (ProcessorDesensitizeNative.cpp:202-207). Native regexp_replace."""
    def first_only(cur):
        # Replace only the FIRST occurrence (Replace vs GlobalReplace,
        # ProcessorDesensitizeNative.cpp:202-207): stitch around the first match.
        # regexp_instr's pattern parameter is a COLUMN (unlike regexp_extract/
        # regexp_replace, which accept str) — a bare str is resolved as a
        # column NAME and fails analysis (found by the redaction differential)
        pos = F.regexp_instr(cur, F.lit(regex))  # 1-based start, 0 if no match
        hit = F.regexp_extract(cur, regex, 0)
        stitched = F.concat(
            F.substr(cur, F.lit(1), pos - F.lit(1)),
            F.lit(replacement),
            F.substr(cur, pos + F.length(hit), F.length(cur)),
        )
        return F.when(pos > 0, stitched).otherwise(cur)

    if source_is_field:
        base = F.col(fields_col)
        cur = base[key]
        new = F.regexp_replace(cur, regex, replacement) if replace_all else first_only(cur)
        return df.withColumn(fields_col, _set_field(base, key, new, cur.isNotNull()))
    new = F.regexp_replace(F.col(key), regex, replacement) if replace_all else first_only(F.col(key))
    return df.withColumn(key, new)


def _md5_sub(series: pd.Series, pattern: str) -> pd.Series:
    rx = re.compile(pattern)  # compiled once per Arrow batch, not per row

    def repl(m: re.Match) -> str:
        return hashlib.md5(m.group(0).encode()).hexdigest()

    return series.map(lambda s: rx.sub(repl, s) if s is not None else None)


def desensitize_md5(
    df: DataFrame, key: str, regex: str, fields_col: str = "fields", source_is_field: bool = True
) -> DataFrame:
    """processor_desensitize md5 mode: matched segment → md5 hex
    (ProcessorDesensitizeNative.cpp:208-248). Pandas UDF (needs callback sub)."""

    @pandas_udf(T.StringType())
    def md5_sub_udf(s: pd.Series) -> pd.Series:
        return _md5_sub(s, regex)

    if source_is_field:
        # the UDF result must land in a real column first: Spark forbids
        # Python-UDF references inside higher-order-function lambdas, and
        # _set_field's structural filter is one
        out = df.withColumn("__dsm_val__", md5_sub_udf(F.col(fields_col)[key]))
        base = F.col(fields_col)
        return out.withColumn(
            fields_col, _set_field(base, key, F.col("__dsm_val__"), base[key].isNotNull())
        ).drop("__dsm_val__")
    return df.withColumn(key, md5_sub_udf(F.col(key)))


def string_replace(
    df: DataFrame,
    key: str,
    method: str,
    match: str = "",
    replacement: str = "",
    dest_key: str | None = None,
    fields_col: str = "fields",
) -> DataFrame:
    """processor_string_replace: regex | const | unquote
    (plugins/processor/stringreplace/processor_string_replace.go:41-55)."""
    base = F.col(fields_col)
    cur = base[key]
    if method == "regex":
        new = F.regexp_replace(cur, match, replacement)
    elif method == "const":
        new = F.replace(cur, F.lit(match), F.lit(replacement))
    elif method == "unquote":
        new = F.regexp_replace(cur, r'^"(.*)"$', "$1")
    else:
        raise ValueError(f"unknown method {method!r}")
    dk = dest_key or key
    return df.withColumn(fields_col, _set_field(base, dk, new, cur.isNotNull()))


# Go base64.StdEncoding shape: 4-char groups, exact '='/'==' tail padding.
# (\r/\n are stripped BEFORE this check — Go's decoder ignores them too.)
_B64_STRICT = r"(?:[A-Za-z0-9+/]{4})*(?:[A-Za-z0-9+/]{2}==|[A-Za-z0-9+/]{3}=)?"


def base64_field(df: DataFrame, key: str, dest_key: str, decode: bool = False, fields_col: str = "fields") -> DataFrame:
    """processor_base64_encoding/_decoding.

    Encode strips the CRLF chunking Spark's ``base64`` inserts every 76 chars
    (MIME line wrap — probed on this build for any payload >57 bytes); Go's
    ``EncodeToString`` never wraps, and a wrapped value would corrupt any
    downstream consumer of the field.

    Decode mirrors ``base64.StdEncoding.DecodeString``'s fail-and-SKIP path
    (processor_base64_decoding.go:49-57) exactly: ``\\r``/``\\n`` are ignored
    like Go's decoder, then a strict shape gate (4-char groups, exact
    padding) rejects what StdEncoding rejects BEFORE ``try_to_binary`` —
    Spark's own base64 parser is MIME-lenient (skips ALL whitespace, accepts
    missing padding; probed) and ``unbase64`` is worse (decodes invalid
    input to garbage bytes)."""
    base = F.col(fields_col)
    cur = base[key]
    if decode:
        cleaned = F.regexp_replace(cur, "[\r\n]", "")
        new = F.when(
            cleaned.rlike(f"^{_B64_STRICT}$"),
            F.try_to_binary(cleaned, F.lit("base64")).cast("string"),
        )
    else:
        new = F.regexp_replace(F.base64(cur.cast("binary")), "[\r\n]", "")
    return df.withColumn(fields_col, _set_field(base, dest_key, new, cur.isNotNull()))


def md5_field(df: DataFrame, key: str, dest_key: str, fields_col: str = "fields") -> DataFrame:
    """processor_md5: md5 hex of field value."""
    base = F.col(fields_col)
    cur = base[key]
    return df.withColumn(
        fields_col, _set_field(base, dest_key, F.md5(cur.cast("binary")), cur.isNotNull())
    )


def pack_json(df: DataFrame, source_keys: list[str], dest_key: str, fields_col: str = "fields") -> DataFrame:
    """processor_packjson: pack listed fields into one JSON object string."""
    base = F.col(fields_col)
    obj = F.to_json(F.struct(*[base[k].alias(k) for k in source_keys]))
    return df.withColumn(fields_col, _set_field(base, dest_key, obj, F.lit(True)))


def gotime(
    df: DataFrame,
    source_key: str,
    source_format: str,
    dest_key: str,
    dest_format: str,
    source_tz: str = "UTC",
    dest_tz: str = "UTC",
    fields_col: str = "fields",
    set_time: bool = True,
    time_col: str = "event_time",
    go_layout: bool = False,
) -> DataFrame:
    """processor_gotime: parse SourceKey with a time format, reformat into
    DestKey with src/dst timezone conversion
    (plugins/processor/gotime/processor_gotime.go:34-52,111-118). With
    ``go_layout=True`` the formats are Go reference layouts exactly as a
    reference config writes them (``"2006-01-02 15:04:05"``), translated via
    :mod:`.gotime_layout`; otherwise raw Spark/JDK patterns."""
    base = F.col(fields_col)
    src_val = base[source_key]
    if go_layout:
        from .gotime_layout import (
            WEEKDAY_STRIP_REGEX,
            go_layout_has_weekday,
            go_layout_needs_pad_collapse,
            go_layout_to_spark,
        )

        if go_layout_has_weekday(source_format):
            # Spark bans 'E' in parse patterns; the day name is redundant
            src_val = F.regexp_replace(src_val, WEEKDAY_STRIP_REGEX, "")
        if go_layout_needs_pad_collapse(source_format):
            # Go's _2 space-pads single digits ("Jan  2"); JDK 'd' rejects the
            # extra space — collapse runs before the parse
            src_val = F.regexp_replace(src_val, r"\s+", " ")
        source_format = go_layout_to_spark(source_format, for_parse=True)
        dest_format = go_layout_to_spark(dest_format)
    ts = F.to_utc_timestamp(F.try_to_timestamp(src_val, F.lit(source_format)), source_tz)
    formatted = F.date_format(F.from_utc_timestamp(ts, dest_tz), dest_format)
    out = df.withColumn(fields_col, _set_field(base, dest_key, formatted, formatted.isNotNull()))
    if set_time:
        prev = F.col(time_col) if time_col in df.columns else F.lit(None).cast("timestamp")
        out = out.withColumn(time_col, F.coalesce(ts, prev))
    return out


def anchor(
    df: DataFrame,
    anchors: list[dict],
    source_key: str = "content",
    fields_col: str = "fields",
    source_is_field: bool = False,
) -> DataFrame:
    """processor_anchor: substring extraction between Start/Stop anchor strings
    per ``{"start":…, "stop":…, "field":…}`` (plugins/processor/anchor/
    anchor.go:46). Empty start → begin of line; empty stop → end of line."""
    src = F.col(fields_col)[source_key] if source_is_field else F.col(source_key)
    base = (
        F.coalesce(F.col(fields_col), F.create_map().cast("map<string,string>"))
        if fields_col in df.columns
        else F.create_map().cast("map<string,string>")
    )
    pairs = []
    for a in anchors:
        start, stop, field = a.get("start", ""), a.get("stop", ""), a["field"]
        # FIRST occurrence of Start (anchor.go:175 uses strings.Index), then
        # Stop searched strictly after it; a non-empty Stop that is absent
        # skips the field entirely (anchor.go:183-188)
        if start:
            sp = F.locate(start, src)  # 1-based, 0 = absent
            after = F.substr(src, sp + F.lit(len(start)), F.length(src))
            found_start = sp > 0
        else:
            after = src
            found_start = F.lit(True)
        if stop:
            ep = F.locate(stop, after)
            val = F.substr(after, F.lit(1), ep - F.lit(1))
            present = src.isNotNull() & found_start & (ep > 0)
        else:
            val = after
            present = src.isNotNull() & found_start
        pairs.append((field, val, present))
    entries = [
        F.slice(
            F.array(F.struct(F.lit(k).alias("key"), v.alias("value"))), 1,
            F.when(p, F.lit(1)).otherwise(F.lit(0)),
        )
        for k, v, p in pairs
    ]
    arr = entries[0] if len(entries) == 1 else F.concat(*entries)
    add = F.coalesce(
        F.map_from_entries(_dedup_entries_last_wins(arr)),
        F.create_map().cast("map<string,string>"),
    )
    return df.withColumn(fields_col, merge_maps(base, add))


def encrypt_fields(
    df: DataFrame, keys: list[str], key_hex: str, iv_hex: str | None = None, fields_col: str = "fields"
) -> DataFrame:
    """processor_encrypt: AES-CBC encrypt listed fields, hex output
    (plugins/processor/encrypt/processor_encrypt.go:41). Native aes_encrypt.
    NOTE: Spark prepends the IV to CBC output — the bytes after the 16-byte
    prefix are the OpenSSL-compatible ciphertext (known-answer test in
    tests/test_parsers.py::test_encrypt_known_answer)."""
    base = F.col(fields_col)
    key_b = F.unhex(F.lit(key_hex))
    iv_b = F.unhex(F.lit(iv_hex)) if iv_hex else F.lit(b"")
    m = base
    for k in keys:
        cur = m[k]
        enc = F.hex(F.aes_encrypt(cur.cast("binary"), key_b, F.lit("CBC"), F.lit("PKCS"), iv_b))
        m = _set_field(m, k, enc, cur.isNotNull())
    return df.withColumn(fields_col, m)


def add_tags(df: DataFrame, tags: dict[str, str], tags_col: str = "tags") -> DataFrame:
    """processor_tag_native: inject host/env tags as group tags
    (core/plugin/processor/inner/ProcessorTagNative.cpp:44-120)."""
    add = F.create_map(*[F.lit(x) for kv in tags.items() for x in kv])
    if tags_col in df.columns:
        return df.withColumn(
            tags_col,
            merge_maps(F.coalesce(F.col(tags_col), F.create_map().cast("map<string,string>")), add),
        )
    return df.withColumn(tags_col, add)


def log_to_metric(
    df: DataFrame,
    metric_values: dict[str, str],  # name field -> value field (or name literal -> value field)
    label_keys: list[str],
    time_key: str | None = None,
    fields_col: str = "fields",
) -> DataFrame:
    """processor_log_to_sls_metric: reshape log rows into metric rows with
    ``__name__``, ``__value__``, sorted ``__labels__`` (k#$#v|...), ``__time_nano__``.
    Name/label validation regexes mirror .go:32-56."""
    base = F.col(fields_col)
    labels = F.array_join(
        F.array_sort(F.array(*[F.concat(F.lit(k), F.lit("#$#"), F.coalesce(base[k], F.lit(""))) for k in label_keys])),
        "|",
    )
    rows = []
    for name_field, value_field in metric_values.items():
        rows.append(
            F.struct(
                F.coalesce(base[name_field], F.lit(name_field)).alias("__name__"),
                base[value_field].alias("__value__"),
            )
        )
    exploded = df.withColumn("__metrics__", F.explode(F.array(*rows)))
    out = exploded.select(
        "*",
        F.col("__metrics__.__name__").alias("__name__"),
        F.col("__metrics__.__value__").alias("__value__"),
    ).drop("__metrics__")
    out = out.withColumn("__labels__", labels)
    if time_key:
        # try_cast both ends: a non-numeric time field must yield null, not an
        # ANSI error — and so must an overflowing one ('1e300' parses as a
        # double, ×1e9 → Infinity, and plain cast(long) of Infinity throws
        # CAST_OVERFLOW under ANSI)
        out = out.withColumn(
            "__time_nano__", (base[time_key].try_cast("double") * 1e9).try_cast("long")
        )
    # strict metric-name validation (logtoslsmetric .go:32-56); the VALUE check
    # mirrors Go's strconv.ParseFloat (.go:172) via try_cast — scientific
    # notation ("1e3") passes, unlike the plain-decimal regex it replaces
    return out.filter(
        F.col("__name__").rlike(r"^[a-zA-Z_:][a-zA-Z0-9_:]*$")
        & F.col("__value__").try_cast("double").isNotNull()
    )


# ---------------------------------------------------------------------------
# geoip (processor_geoip) & cloud_meta (processor_cloud_meta)
# ---------------------------------------------------------------------------

def ipv4_to_long(col: Column) -> Column:
    """Dotted-quad IPv4 → uint32 (null on malformed / out-of-range octets)."""
    valid = col.rlike(r"^\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}$")
    parts = F.split(col, r"\.")
    octs = [parts[i].cast("long") for i in range(4)]
    in_range = octs[0] <= 255
    for o in octs[1:]:
        in_range = in_range & (o <= 255)
    val = octs[0] * 16777216 + octs[1] * 65536 + octs[2] * 256 + octs[3]
    return F.when(valid & in_range, val)


def geoip(
    df: DataFrame,
    geo_df: DataFrame,
    source_key: str,
    keep_source: bool = True,
    ip_value_flag: bool = False,
    no_coordinate: bool = False,
    fields_col: str = "fields",
    source_is_field: bool = True,
) -> DataFrame:
    """processor_geoip (plugins/processor/geoip/processor_geoip.go:35-165)
    re-expressed as a BROADCAST blocked range join — no mmdb reader, the geo
    database is a DataFrame of IP ranges
    ``(ip_start long, ip_end long, city, province, province_code, country,
    country_code, longitude double, latitude double)``.

    Scale shape: each range is exploded into the /16 blocks it spans, the fact
    side joins on ``block = ip >> 16`` equality (BroadcastHashJoin) with the
    range check as a join filter — never a nested-loop range join. Emitted
    keys mirror the reference: ``{source_key}_city_``, ``_province_``,
    ``_province_code_``, ``_country_``, ``_country_code_``, ``_longitude_``,
    ``_latitude_`` (coordinates FormatFloat 'f' 8, .go:160-162); each written
    only when the geo column is non-null. ``ip_value_flag`` treats the source
    as a LITTLE-endian decimal IP (inetNtoa, .go:113-121);
    ``keep_source=False`` drops the source key (.go:98-104)."""
    src = F.col(fields_col)[source_key] if source_is_field else F.col(source_key)
    if ip_value_flag:
        n = src.try_cast("long")  # non-numeric → null (ANSI mode), mirrors inetNtoa's Atoi
        ip_long = F.when(
            n.isNotNull() & (n >= 0) & (n <= 4294967295),
            # inetNtoa byte-reverses the integer
            (n % 256) * 16777216 + ((n / 256).cast("long") % 256) * 65536
            + ((n / 65536).cast("long") % 256) * 256 + (n / 16777216).cast("long"),
        )
    else:
        ip_long = ipv4_to_long(src)
    blocks = F.explode(
        F.sequence(
            (F.col("ip_start") / 65536).cast("long"), (F.col("ip_end") / 65536).cast("long")
        )
    )
    geo_b = geo_df.select(F.struct(*geo_df.columns).alias("__geo"), blocks.alias("__blk"))
    fact = df.withColumn("__ip_long", ip_long).withColumn(
        "__ip_blk", (F.col("__ip_long") / 65536).cast("long")
    )
    joined = fact.join(
        broadcast(geo_b),
        (F.col("__ip_blk") == F.col("__blk"))
        & (F.col("__ip_long") >= F.col("__geo.ip_start"))
        & (F.col("__ip_long") <= F.col("__geo.ip_end")),
        "left",
    )
    g = F.col("__geo")
    # format_string("%.8f", NULL) yields the literal string "null" (Java
    # String.format semantics) — gate on the input, not the formatted output
    coord = lambda c: F.when(g[c].isNotNull(), F.format_string("%.8f", g[c]))  # noqa: E731
    emit: list[tuple[str, Column]] = [
        (f"{source_key}_city_", g["city"]),
        (f"{source_key}_province_", g["province"]),
        (f"{source_key}_province_code_", g["province_code"]),
        (f"{source_key}_country_", g["country"]),
        (f"{source_key}_country_code_", g["country_code"]),
    ]
    if not no_coordinate:
        emit += [
            (f"{source_key}_longitude_", coord("longitude")),
            (f"{source_key}_latitude_", coord("latitude")),
        ]
    base = F.coalesce(F.col(fields_col), F.create_map().cast("map<string,string>"))
    if source_is_field and not keep_source:
        base = F.map_from_entries(
            F.filter(F.map_entries(base), lambda e: e["key"] != F.lit(source_key))
        )
    add = _entries_map(*[_opt_entry(k, v, v.isNotNull()) for k, v in emit])
    out = joined.withColumn(fields_col, merge_maps(base, add))
    return out.drop("__geo", "__blk", "__ip_long", "__ip_blk")


def cloud_meta(
    df: DataFrame,
    metadata: list[str],
    rename: dict[str, str] | None = None,
    json_path: str | None = None,
    provider: dict[str, str] | None = None,
    fields_col: str = "fields",
) -> DataFrame:
    """processor_cloud_meta (plugins/processor/cloudmeta/cloud_meta.go:33-140).

    Append mode (no ``json_path``): selected metadata keys (renamed per
    ``RenameMetadata``) merge into the fields map. JSON mode: the metadata
    merges into the JSON object held in field ``json_path``; a dotted path
    (``data.meta.cloud``) navigates/creates nested objects inside that JSON,
    mirroring the reference's arbitrary-depth JSONPath insert
    (cloud_meta.go:120-140). The top-level form stays a native
    from_json/to_json expression (nested non-string values round-trip as
    serialized JSON); the nested form needs real JSON-object semantics, so it
    is an Arrow-batched pandas UDF (keys emitted sorted for determinism).
    ``provider`` defaults to the deterministic MOCK_CLOUD_META (the container
    has no cloud metadata endpoint)."""
    src = provider or MOCK_CLOUD_META
    rename = rename or {}
    meta = {rename.get(k, k): src[k] for k in metadata if k in src}
    add = F.create_map(*[F.lit(x) for kv in meta.items() for x in kv])
    base = F.coalesce(F.col(fields_col), F.create_map().cast("map<string,string>"))
    if json_path is None:
        return df.withColumn(fields_col, merge_maps(base, add))
    field_key, *inner_path = json_path.split(".")
    if not inner_path:
        obj = F.coalesce(
            F.from_json(base[field_key], "map<string,string>"),
            F.create_map().cast("map<string,string>"),
        )
        packed = F.to_json(merge_maps(obj, add))
        return df.withColumn(fields_col, _set_field(base, field_key, packed, F.lit(True)))

    import json as _json

    import pandas as pd

    @F.pandas_udf("string")
    def insert_nested(s: pd.Series) -> pd.Series:
        def one(txt):
            try:
                obj = _json.loads(txt) if txt else {}
            except (ValueError, TypeError):
                obj = {}
            if not isinstance(obj, dict):
                obj = {}
            node = obj
            for seg in inner_path:  # create intermediate objects as the Go code does
                nxt = node.get(seg)
                if not isinstance(nxt, dict):
                    nxt = {}
                    node[seg] = nxt
                node = nxt
            node.update(meta)
            return _json.dumps(obj, separators=(",", ":"), sort_keys=True)

        return s.map(one)

    # the UDF result must be a plain column before _set_field: Spark rejects
    # Python UDFs inside higher-order-function lambdas
    tmp = "__cloud_meta_packed__"
    out = df.withColumn(tmp, insert_nested(base[field_key]))
    return out.withColumn(
        fields_col, _set_field(base, field_key, F.col(tmp), F.lit(True))
    ).drop(tmp)
