"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship parse→enrich→route→aggregate pipeline smoke check.
``queries()`` — 71 entries, one per implemented operator from SURVEY.md §2 (plus
the training-data-pipeline ops: dedup, ANN similarity, text stats), each a callable
``(spark, sf_dir) -> DataFrame`` built on the ``loongcollector_spark`` operator
library.
``oracle_sql()`` — DuckDB-runnable ANSI SQL equivalents (same column aliases) for
the correctness gate. Non-SQL-expressible ops (MinHash-LSH, SimHash, streaming)
are rows-only checked.

Float determinism: money aggregates are cast to DECIMAL before summing so Spark
and DuckDB agree exactly; cosine similarities are rounded to 6 digits.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from loongcollector_spark.codec import with_content
from loongcollector_spark.operators import parse as P
from loongcollector_spark.operators.enrich import (
    desensitize_const,
    dict_map,
    md5_field,
)
from loongcollector_spark.operators.filters import compile_condition
from loongcollector_spark.operators.route import RouteRule, route_rows


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# entry: flagship pipeline on sf0.001
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: route documents by lang rules (logstore-router semantics) and
    aggregate per-sink counts — the parse→route→aggregate contract in one plan."""
    return q_pipeline_route_counts(spark, "/root/testdata/sf0.001")


# ---------------------------------------------------------------------------
# Routing / aggregation (aggregator_logstore_router + content_value_group)
# ---------------------------------------------------------------------------

LANG_ROUTES = [RouteRule("en", "sink_en"), RouteRule("fr|es", "sink_latin")]


def q_pipeline_route_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    routed = route_rows(d, LANG_ROUTES, source_key="lang", default_sink="sink_default")
    return routed.groupBy("route").agg(
        F.count(F.lit(1)).alias("n_rows"), F.sum("n_chars").alias("n_chars_sum")
    )


def q_route_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    routed = route_rows(d, LANG_ROUTES, source_key="lang", default_sink="sink_default")
    return routed.select("doc_id", "route")


def q_fanout_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Router multi-sink duplication (Router.cpp:50-82): an 'always' audit
    sink receives every row, a conditional sink only matching rows — a row in
    BOTH sinks is the semantics partitionBy cannot express. Flattened to one
    (sink, event_id) frame for the oracle."""
    from loongcollector_spark.operators.route import SinkCondition, fan_out

    e = _t(spark, sf_dir, "events")
    sinks = fan_out(
        e,
        [
            SinkCondition(sink="audit", type="always"),
            SinkCondition(sink="clicks", type="event_type", value="click"),
        ],
    )
    parts = [
        df.select(F.lit(name).alias("sink"), "event_id") for name, df in sorted(sinks.items())
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def q_group_content_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    from loongcollector_spark.operators.aggregate import content_value_group

    d = _t(spark, sf_dir, "documents")
    return content_value_group(d.withColumn("n_tok", F.col("n_chars")), ["source", "lang"])


def q_shard_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from loongcollector_spark.operators.aggregate import shard_hash

    d = _t(spark, sf_dir, "documents").withColumn("doc_id_s", F.col("doc_id").cast("string"))
    sharded = shard_hash(d, ["doc_id_s"], 8)
    return sharded.groupBy("__shardhash__").agg(F.count(F.lit(1)).alias("n_rows")).withColumnRenamed(
        "__shardhash__", "shard"
    )


# ---------------------------------------------------------------------------
# Parse operators
# ---------------------------------------------------------------------------

def q_parse_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    out = P.parse_regex(d, r"(\w+) (\w+) (.*)", ["w1", "w2", "rest"], source_col="text")
    return out.select(
        "doc_id",
        F.col("fields")["w1"].alias("w1"),
        F.col("fields")["w2"].alias("w2"),
        F.length(F.col("fields")["rest"]).alias("rest_len"),
    )


def q_parse_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    out = P.parse_json(e, source_col="props")
    return out.select("event_id", F.col("fields")["k"].alias("k"))


def q_parse_delimiter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    out = P.parse_delimiter(
        d, ["c1", "c2", "c3"], separator=" ", source_col="text", overflow="discard"
    )
    return out.select(
        "doc_id",
        F.col("fields")["c1"].alias("c1"),
        F.col("fields")["c2"].alias("c2"),
        F.col("fields")["c3"].alias("c3"),
    )


def q_parse_apsara(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apsara classification validated against independently constructed lines:
    [ts]\\t[LEVEL]\\t[thread]\\tk:v built from events columns."""
    e = _t(spark, sf_dir, "events")
    line = F.concat(
        F.lit("["),
        F.date_format(F.col("ts"), "yyyy-MM-dd HH:mm:ss"),
        F.lit("]\t["),
        F.upper(F.col("event_type")),
        F.lit("]\t["),
        F.col("user_id").cast("string"),
        F.lit("]\tet:"),
        F.col("event_type"),
    )
    out = P.parse_apsara(e.withColumn("content", line))
    return out.select(
        "event_id",
        F.col("fields")["__LEVEL__"].alias("level"),
        F.col("fields")["__THREAD__"].alias("thread"),
        F.col("fields")["microtime"].alias("microtime"),
        F.col("fields")["et"].alias("et"),
    )


def q_split_key_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    line = F.concat(
        F.lit("user:"), F.col("user_id").cast("string"), F.lit("\ttype:"), F.col("event_type")
    )
    out = P.split_key_value(e.withColumn("content", line))
    return out.select(
        "event_id",
        F.col("fields")["user"].alias("user"),
        F.col("fields")["type"].alias("type"),
    )


def q_parse_timestamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    formatted = e.withColumn("t_str", F.date_format(F.col("ts"), "yyyy-MM-dd HH:mm:ss")).withColumn(
        "fields", F.create_map(F.lit("t"), F.col("t_str"))
    )
    out = P.parse_timestamp(formatted, "t", "yyyy-MM-dd HH:mm:ss")
    return out.select("event_id", F.col("event_time").alias("parsed_ts"))


# ---------------------------------------------------------------------------
# Filters
# ---------------------------------------------------------------------------

def q_filter_expression(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    tree = {
        "operator": "and",
        "operands": [
            {"key": "lang", "exp": "^(en|fr)$"},
            {"operator": "not", "operands": [{"key": "text", "exp": "slow"}]},
        ],
    }
    return d.filter(compile_condition(tree, df_cols=d.columns)).select("doc_id", "lang")


def q_filter_include_exclude(spark: SparkSession, sf_dir: str) -> DataFrame:
    from loongcollector_spark.operators.filters import filter_include_exclude

    d = _t(spark, sf_dir, "documents")
    out = filter_include_exclude(d, include={"text": "spark"}, exclude={"lang": "^zh$"})
    return out.select("doc_id", "lang")


# ---------------------------------------------------------------------------
# Enrichment
# ---------------------------------------------------------------------------

LANG_DICT = [("en", "english"), ("fr", "french"), ("de", "german"), ("es", "spanish")]


def q_dict_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").withColumn(
        "fields", F.create_map().cast("map<string,string>")
    )
    dict_df = spark.createDataFrame(LANG_DICT, "code string, label string")
    out = dict_map(d, dict_df, source_key="lang", dest_key="lang_label", missing="unknown",
                   source_is_field=False)
    return out.select("doc_id", F.col("fields")["lang_label"].alias("lang_label"))


def q_desensitize_const(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    out = desensitize_const(c, "c_name", r"[0-9]", "X", source_is_field=False)
    return out.select("c_custkey", F.col("c_name").alias("redacted"))


def q_md5_field(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").withColumn(
        "fields", F.create_map(F.lit("name"), F.col("c_name"))
    )
    out = md5_field(c, "name", "name_md5")
    return out.select("c_custkey", F.col("fields")["name_md5"].alias("name_md5"))


def q_base64(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    return p.select("p_partkey", F.base64(F.col("p_brand").cast("binary")).alias("brand_b64"))


# ---------------------------------------------------------------------------
# Transform parity ops (rename/add/append/pick/drop/pack/replace/anchor/gotime/
# fields_with_condition/log_to_metric/base64-decode/key-regex filter)
# ---------------------------------------------------------------------------

def _cust_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "customer").withColumn(
        "fields",
        F.create_map(
            F.lit("name"), F.col("c_name"),
            F.lit("segment"), F.col("c_mktsegment"),
            F.lit("bal"), F.col("c_acctbal").cast("string"),
        ),
    )


def q_rename_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    from loongcollector_spark.operators.enrich import rename_keys

    out = rename_keys(_cust_fields(spark, sf_dir), ["name", "segment"], ["customer_name", "mkt"])
    return out.select(
        "c_custkey",
        F.col("fields")["customer_name"].alias("customer_name"),
        F.col("fields")["mkt"].alias("mkt"),
        F.col("fields")["name"].alias("old_name"),
    )


def q_add_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    from loongcollector_spark.operators.enrich import add_fields

    out = add_fields(_cust_fields(spark, sf_dir), {"env": "prod", "dc": "us-east"})
    return out.select(
        "c_custkey", F.col("fields")["env"].alias("env"), F.col("fields")["dc"].alias("dc")
    )


def q_appender(spark: SparkSession, sf_dir: str) -> DataFrame:
    from loongcollector_spark.operators.enrich import appender

    out = appender(_cust_fields(spark, sf_dir), "name", "|suffix")
    return out.select("c_custkey", F.col("fields")["name"].alias("name2"))


def q_pick_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    from loongcollector_spark.operators.filters import pick_keys

    out = pick_keys(_cust_fields(spark, sf_dir), include=["name", "bal"])
    return out.select(
        "c_custkey",
        F.size("fields").alias("n_keys"),
        F.col("fields")["name"].alias("name"),
        F.col("fields")["segment"].alias("segment_gone"),
    )


def q_drop_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    from loongcollector_spark.operators.filters import drop_keys

    out = drop_keys(_cust_fields(spark, sf_dir), ["bal"])
    return out.select(
        "c_custkey", F.size("fields").alias("n_keys"), F.col("fields")["bal"].alias("bal_gone")
    )


def q_drop_last_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    from loongcollector_spark.operators.filters import drop_last_key

    out = drop_last_key(_cust_fields(spark, sf_dir), "name", include=["segment", "bal"])
    return out.select("c_custkey", F.size("fields").alias("n_keys"))


def q_pack_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    from loongcollector_spark.operators.enrich import pack_json

    out = pack_json(_cust_fields(spark, sf_dir), ["name", "segment"], "packed")
    return out.select("c_custkey", F.col("fields")["packed"].alias("packed"))


def q_string_replace(spark: SparkSession, sf_dir: str) -> DataFrame:
    from loongcollector_spark.operators.enrich import string_replace

    out = string_replace(_cust_fields(spark, sf_dir), "name", "regex", r"Customer#0*", "C")
    return out.select("c_custkey", F.col("fields")["name"].alias("short_name"))


def q_anchor(spark: SparkSession, sf_dir: str) -> DataFrame:
    from loongcollector_spark.operators.enrich import anchor

    p = _t(spark, sf_dir, "part")
    out = anchor(
        p.withColumn("content", F.concat(F.lit("type="), F.col("p_type"), F.lit(";brand="), F.col("p_brand"), F.lit(";"))),
        [
            {"start": "type=", "stop": ";", "field": "atype"},
            {"start": "brand=", "stop": ";", "field": "abrand"},
        ],
    )
    return out.select(
        "p_partkey", F.col("fields")["atype"].alias("atype"), F.col("fields")["abrand"].alias("abrand")
    )


def q_gotime(spark: SparkSession, sf_dir: str) -> DataFrame:
    from loongcollector_spark.operators.enrich import gotime

    o = _t(spark, sf_dir, "orders").withColumn(
        "fields", F.create_map(F.lit("od"), F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss"))
    )
    out = gotime(o, "od", "yyyy-MM-dd HH:mm:ss", "od_fmt", "dd/MM/yyyy", set_time=False)
    return out.select("o_orderkey", F.col("fields")["od_fmt"].alias("od_fmt"))


def q_gotime_go(spark: SparkSession, sf_dir: str) -> DataFrame:
    """processor_gotime with Go reference layouts verbatim (config parity:
    plugins/processor/gotime/processor_gotime.go:34-52) — RFC1123-ish source
    text parsed with 'Mon, 02 Jan 2006 15:04:05' and reformatted with the
    nginx CLF layout '02/Jan/2006:15:04:05'."""
    from loongcollector_spark.operators.enrich import gotime

    o = _t(spark, sf_dir, "orders").withColumn(
        "fields",
        F.create_map(F.lit("t"), F.date_format("o_orderdate", "EEE, dd MMM yyyy HH:mm:ss")),
    )
    out = gotime(
        o,
        "t",
        "Mon, 02 Jan 2006 15:04:05",
        "clf",
        "02/Jan/2006:15:04:05",
        go_layout=True,
        set_time=False,
    )
    return out.select("o_orderkey", F.col("fields")["clf"].alias("clf"))


def q_fields_with_condition(spark: SparkSession, sf_dir: str) -> DataFrame:
    from loongcollector_spark.operators.filters import fields_with_condition

    cases = [
        {"condition": {"segment": "BUILDING"}, "add_fields": {"tier": "b"}, "drop_keys": ["bal"]},
        {"condition": {"segment": "MACHINERY"}, "add_fields": {"tier": "m"}},
    ]
    out = fields_with_condition(_cust_fields(spark, sf_dir), cases)
    return out.select(
        "c_custkey",
        F.col("fields")["tier"].alias("tier"),
        F.col("fields")["bal"].alias("bal_maybe"),
    )


def q_filter_key_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    from loongcollector_spark.operators.filters import filter_key_regex

    e = _t(spark, sf_dir, "events").withColumn(
        "fields", F.from_json(F.col("props"), "map<string,string>")
    )
    out = filter_key_regex(e, include=["^k$"], exclude=["^secret"])
    return out.select("event_id")


def q_log_to_metric(spark: SparkSession, sf_dir: str) -> DataFrame:
    from loongcollector_spark.operators.enrich import log_to_metric

    e = _t(spark, sf_dir, "events").withColumn(
        "fields",
        F.create_map(
            F.lit("cpu"), F.round(F.col("value"), 4).cast("string"),
            F.lit("host"), F.concat(F.lit("h"), (F.col("user_id") % 10).cast("string")),
        ),
    )
    out = log_to_metric(e, {"cpu_usage": "cpu"}, label_keys=["host"])
    return out.select(
        "event_id",
        F.col("__name__").alias("metric_name"),
        F.col("__value__").alias("metric_value"),
        F.col("__labels__").alias("labels"),
    )


def q_base64_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    enc = p.withColumn("fields", F.create_map(F.lit("b64"), F.base64(F.col("p_type").cast("binary"))))
    from loongcollector_spark.operators.enrich import base64_field

    out = base64_field(enc, "b64", "decoded", decode=True)
    return out.select("p_partkey", F.col("fields")["decoded"].alias("decoded"))


def q_desensitize_md5_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """md5-mode desensitize (pandas UDF with hash-callback re.sub) — digits
    runs in c_phone are replaced by their md5. Oracle-less (callback replace
    is not SQL-expressible); covered by unit tests."""
    from loongcollector_spark.operators.enrich import desensitize_md5

    c = _t(spark, sf_dir, "customer").withColumn(
        "fields", F.create_map(F.lit("cname"), F.col("c_name"))
    )
    out = desensitize_md5(c, "cname", r"\d{4,}")
    return out.select("c_custkey", F.col("fields")["cname"].alias("redacted_name"))


# ---------------------------------------------------------------------------
# geoip / cloud_meta / metadata_group / context_pack / split_log_regex /
# appender templates / typed grok  (round-2 operator parity additions)
# ---------------------------------------------------------------------------

# Deterministic geo fixture: 3 /16-aligned ranges over 10.0.0.0/8, ips with
# second octet 150-199 deliberately miss (HandleMissing visibility).
GEO_RANGES = [
    (0, 49, "Springfield", "West", "W1", "Freedonia", "FD", -73.5, 41.25),
    (50, 99, "Shelbyville", "East", "E2", "Freedonia", "FD", -71.0, 42.5),
    (100, 149, "Ogdenville", "North", "N3", "Sylvania", "SY", 12.75, 52.125),
]


def _geo_df(spark: SparkSession):
    rows = [
        (10 * 16777216 + a * 65536, 10 * 16777216 + b * 65536 + 65535, c, p, pc, co, cc, lo, la)
        for a, b, c, p, pc, co, cc, lo, la in GEO_RANGES
    ]
    return spark.createDataFrame(
        rows,
        "ip_start long, ip_end long, city string, province string, province_code string,"
        "country string, country_code string, longitude double, latitude double",
    )


def q_geoip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from loongcollector_spark.operators.enrich import geoip

    e = _t(spark, sf_dir, "events").withColumn(
        "fields",
        F.create_map(
            F.lit("client_ip"),
            F.concat(F.lit("10."), (F.col("user_id") % 200).cast("string"), F.lit(".7.33")),
        ),
    )
    out = geoip(e, _geo_df(spark), "client_ip")
    fld = F.col("fields")
    return out.select(
        "event_id",
        fld["client_ip_city_"].alias("city"),
        fld["client_ip_province_code_"].alias("province_code"),
        fld["client_ip_country_"].alias("country"),
        fld["client_ip_longitude_"].alias("longitude"),
        fld["client_ip_latitude_"].alias("latitude"),
    )


def q_cloud_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from loongcollector_spark.operators.enrich import cloud_meta

    out = cloud_meta(
        _cust_fields(spark, sf_dir),
        metadata=["__cloud_instance_id__", "__cloud_region__", "__cloud_zone__"],
        rename={"__cloud_instance_id__": "iid"},
    )
    fld = F.col("fields")
    return out.select(
        "c_custkey",
        fld["iid"].alias("iid"),
        fld["__cloud_region__"].alias("region"),
        fld["__cloud_zone__"].alias("zone"),
    )


def q_cloud_meta_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested JSONPath insert (cloud_meta.go:120-140): metadata lands in a
    created ``meta`` object inside the JSON held at field ``data``. Output
    JSON has sorted keys, so the oracle literal-builds the exact string."""
    from loongcollector_spark.operators.enrich import cloud_meta

    base = _t(spark, sf_dir, "customer").withColumn(
        "fields",
        F.create_map(
            F.lit("data"),
            F.concat(F.lit('{"seg":"'), F.col("c_mktsegment"), F.lit('"}')),
        ),
    )
    out = cloud_meta(
        base,
        metadata=["__cloud_instance_id__", "__cloud_region__"],
        rename={"__cloud_instance_id__": "iid", "__cloud_region__": "region"},
        json_path="data.meta",
    )
    return out.select("c_custkey", F.col("fields")["data"].alias("data_json"))


def q_metadata_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    from loongcollector_spark.operators.aggregate import metadata_group_counts

    d = _t(spark, sf_dir, "documents")
    return metadata_group_counts(d, ["source", "lang"], max_group_events=50, order_col="doc_id")


def q_context_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    from loongcollector_spark.operators.aggregate import context_pack

    d = _t(spark, sf_dir, "documents")
    out = context_pack(d, order_col="doc_id", source_col="source", max_log_count=100)
    return out.select("doc_id", "source", "__pack_id__")


def q_split_log_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    from loongcollector_spark.operators.multiline import split_log_regex

    p = _t(spark, sf_dir, "part").select(
        "p_partkey",
        F.concat(
            F.lit("HDR "), F.col("p_brand"), F.lit("\n  detail one\n  detail two\nHDR "),
            F.col("p_type"),
        ).alias("content"),
    )
    out = split_log_regex(p, r"HDR .*")
    return out.select("p_partkey", "event_seq", "content", "n_lines")


def q_appender_template(spark: SparkSession, sf_dir: str) -> DataFrame:
    from loongcollector_spark.operators.enrich import appender

    out = appender(
        _cust_fields(spark, sf_dir),
        "name",
        "|host={{__host__}}|env={{$MYENV}}|iid={{__cloud_instance_id__}}",
        template_vars={"host": "testhost", "ip": "1.2.3.4", "env": {"MYENV": "prodenv"}},
    )
    return out.select("c_custkey", F.col("fields")["name"].alias("name2"))


def q_appender_sort_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    from loongcollector_spark.operators.enrich import appender

    c = _t(spark, sf_dir, "customer").withColumn(
        "fields",
        F.create_map(
            F.lit("lab"),
            F.concat(
                F.lit("z#$#"), F.col("c_mktsegment"), F.lit("|a#$#"),
                F.col("c_custkey").cast("string"),
            ),
        ),
    )
    out = appender(c, "lab", "|m#$#x", sort_labels=True)
    return out.select("c_custkey", F.col("fields")["lab"].alias("labels"))


GROK_TYPED_PATTERN = "%{WORD:w1} %{NONNEGINT:num:int} %{GREEDYDATA:rest}"


def q_grok_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed grok: the :int hint becomes a CAST top-level column — the
    driver's schema check proves the bigint type."""
    from loongcollector_spark.operators.grok import parse_grok

    e = _t(spark, sf_dir, "events").withColumn(
        "content",
        F.concat(F.col("event_type"), F.lit(" "), F.col("user_id").cast("string"), F.lit(" tail")),
    )
    out = parse_grok(e, [GROK_TYPED_PATTERN], full_match=True, typed_columns=True)
    return out.select("event_id", F.col("fields")["w1"].alias("w1"), F.col("num").alias("num"))


# OpenSSL known-answer vectors for q_encrypt: hex(IV || AES-128-CBC-PKCS7
# ciphertext) of 'Customer#%09d' % k, key=000102..0f, iv=101112..1f —
# precomputed with `openssl enc -aes-128-cbc` (frozen: a drift in
# encrypt_fields fails the oracle hash).
ENCRYPT_KAT: list[tuple[int, str]] = [
    (0, '101112131415161718191A1B1C1D1E1F79AA917FA5534AAB2753669EE074F09F6471A94F8EFC3038DCC1BBBDC381C2B0'),
    (1, '101112131415161718191A1B1C1D1E1F79AA917FA5534AAB2753669EE074F09F3B1194B07E6732129D06987ED4EFDBD4'),
    (2, '101112131415161718191A1B1C1D1E1F79AA917FA5534AAB2753669EE074F09F76C123FEDCBCBCA3671FF5A0BBAB3BEC'),
    (3, '101112131415161718191A1B1C1D1E1F79AA917FA5534AAB2753669EE074F09FB3E4C1A86588F178C06F5B2FE196C02A'),
    (4, '101112131415161718191A1B1C1D1E1F79AA917FA5534AAB2753669EE074F09F9DAFE482EA51033F142E845BE3F5E12E'),
    (5, '101112131415161718191A1B1C1D1E1F79AA917FA5534AAB2753669EE074F09FA11264950B40011986183D34886F1270'),
    (6, '101112131415161718191A1B1C1D1E1F79AA917FA5534AAB2753669EE074F09F6B5521CA3F2A25456F6D88FE979E5B91'),
    (7, '101112131415161718191A1B1C1D1E1F79AA917FA5534AAB2753669EE074F09FB363A5BD8CF80E692A7CF60DE58FA5D8'),
    (8, '101112131415161718191A1B1C1D1E1F79AA917FA5534AAB2753669EE074F09FF71CAF3FC9522F024EAC1E038A5893D2'),
    (9, '101112131415161718191A1B1C1D1E1F79AA917FA5534AAB2753669EE074F09F2054A2CDFE17C4E3F174F7CC9EC2B416'),
    (10, '101112131415161718191A1B1C1D1E1F79AA917FA5534AAB2753669EE074F09FA97C04BE4E392F7C675BB51DF84E315F'),
    (11, '101112131415161718191A1B1C1D1E1F79AA917FA5534AAB2753669EE074F09F293626D563F31C476E1D5054FF73A07D'),
    (12, '101112131415161718191A1B1C1D1E1F79AA917FA5534AAB2753669EE074F09F96945F42578F8DC9879598BBEFF2EE1D'),
    (13, '101112131415161718191A1B1C1D1E1F79AA917FA5534AAB2753669EE074F09FAE95C11E5B2A963DE44084BC45D7CEBB'),
    (14, '101112131415161718191A1B1C1D1E1F79AA917FA5534AAB2753669EE074F09FF706B076FE420CCC13EB004C8D125B41'),
    (15, '101112131415161718191A1B1C1D1E1F79AA917FA5534AAB2753669EE074F09F2A1CD125EC08E54170851B1AB4035028'),
    (16, '101112131415161718191A1B1C1D1E1F79AA917FA5534AAB2753669EE074F09F7DB7FA060F9EA49F288C011217DD9589'),
    (17, '101112131415161718191A1B1C1D1E1F79AA917FA5534AAB2753669EE074F09FA69CAC28345505F6736D42531258E61C'),
    (18, '101112131415161718191A1B1C1D1E1F79AA917FA5534AAB2753669EE074F09F2A0573B45EDE54AA4E4334A56E9058EC'),
    (19, '101112131415161718191A1B1C1D1E1F79AA917FA5534AAB2753669EE074F09F76CD04E942A5D0EFF248FBA658267ACB'),
    (20, '101112131415161718191A1B1C1D1E1F79AA917FA5534AAB2753669EE074F09F500AA8A87F733FAB14EF72B18F84404A'),
    (21, '101112131415161718191A1B1C1D1E1F79AA917FA5534AAB2753669EE074F09FD368E2DED6507DC155C9F014AADDE231'),
    (22, '101112131415161718191A1B1C1D1E1F79AA917FA5534AAB2753669EE074F09FE0F468A98BEEC0ABBBDD77BC7781A895'),
    (23, '101112131415161718191A1B1C1D1E1F79AA917FA5534AAB2753669EE074F09F97E60F03DC0143C04587F4DEAFE79725'),
    (24, '101112131415161718191A1B1C1D1E1F79AA917FA5534AAB2753669EE074F09F059356CD4D6F039A71BDE990698D1615'),
    (25, '101112131415161718191A1B1C1D1E1F79AA917FA5534AAB2753669EE074F09F969FB559095675DAC4C9F842F3AA3996'),
    (26, '101112131415161718191A1B1C1D1E1F79AA917FA5534AAB2753669EE074F09FE6E379E42592A29FBB88755D0E2514F2'),
    (27, '101112131415161718191A1B1C1D1E1F79AA917FA5534AAB2753669EE074F09F3DDFD442E9DE572216C69DCBCD3085A2'),
    (28, '101112131415161718191A1B1C1D1E1F79AA917FA5534AAB2753669EE074F09F69BA1D1D75A42DF52D0B3A056D307D72'),
    (29, '101112131415161718191A1B1C1D1E1F79AA917FA5534AAB2753669EE074F09F7F7A247B7434BA93C81AE13A3FABE07E'),
    (30, '101112131415161718191A1B1C1D1E1F79AA917FA5534AAB2753669EE074F09FE38F16419ABE1A1A6EB505FEFA572479'),
    (31, '101112131415161718191A1B1C1D1E1F79AA917FA5534AAB2753669EE074F09F6DE2517329B3A2A8E8A534444B3D086F'),
    (32, '101112131415161718191A1B1C1D1E1F79AA917FA5534AAB2753669EE074F09F806613F71503AC38C7C431CF4AB59132'),
    (33, '101112131415161718191A1B1C1D1E1F79AA917FA5534AAB2753669EE074F09F1B76D411D44E0F68D23CB994BA2F1B98'),
    (34, '101112131415161718191A1B1C1D1E1F79AA917FA5534AAB2753669EE074F09FB551408E81DEF206D2BCA92096DA3814'),
    (35, '101112131415161718191A1B1C1D1E1F79AA917FA5534AAB2753669EE074F09FB1B5A8174692A67E21DAADAC8079ADEC'),
    (36, '101112131415161718191A1B1C1D1E1F79AA917FA5534AAB2753669EE074F09F626D0BC6989D474D5923D4A2728AB021'),
    (37, '101112131415161718191A1B1C1D1E1F79AA917FA5534AAB2753669EE074F09F03931403AE2EEFA38E7C042F3394D210'),
    (38, '101112131415161718191A1B1C1D1E1F79AA917FA5534AAB2753669EE074F09F92B563F0098165A7A9B488A96125FA58'),
    (39, '101112131415161718191A1B1C1D1E1F79AA917FA5534AAB2753669EE074F09F79825DA945112839623511D946CC5531'),
    (40, '101112131415161718191A1B1C1D1E1F79AA917FA5534AAB2753669EE074F09F344F04947E66C3696B7F9455D626B82F'),
    (41, '101112131415161718191A1B1C1D1E1F79AA917FA5534AAB2753669EE074F09F061AB711D285F40C9D80E8FCE62C3991'),
    (42, '101112131415161718191A1B1C1D1E1F79AA917FA5534AAB2753669EE074F09F9FA9F9203F6A863AE199E5AFFF5C5F76'),
    (43, '101112131415161718191A1B1C1D1E1F79AA917FA5534AAB2753669EE074F09F4E9627206D9604B05F3E07B187096AC6'),
    (44, '101112131415161718191A1B1C1D1E1F79AA917FA5534AAB2753669EE074F09F791DD0C3956159023EA07CF207F3160F'),
    (45, '101112131415161718191A1B1C1D1E1F79AA917FA5534AAB2753669EE074F09F4CF9A7EC1205A2A9E1C07BA6CDD887C1'),
    (46, '101112131415161718191A1B1C1D1E1F79AA917FA5534AAB2753669EE074F09F9D96A0E1EAF4344483882FAEFC518CAB'),
    (47, '101112131415161718191A1B1C1D1E1F79AA917FA5534AAB2753669EE074F09FB9B09948C5818D4C2ACFC1189D674C53'),
    (48, '101112131415161718191A1B1C1D1E1F79AA917FA5534AAB2753669EE074F09FF0F9C27E887604EF0823ED28A42E74D2'),
    (49, '101112131415161718191A1B1C1D1E1F79AA917FA5534AAB2753669EE074F09FFFD915D3CC23029AB86303B51BA50C94'),
    (50, '101112131415161718191A1B1C1D1E1F79AA917FA5534AAB2753669EE074F09F24C702D6854A57254634A6A7F5A73105'),
    (51, '101112131415161718191A1B1C1D1E1F79AA917FA5534AAB2753669EE074F09FA8C1CB835F270BF5B4B331B36B174ED0'),
    (52, '101112131415161718191A1B1C1D1E1F79AA917FA5534AAB2753669EE074F09FB9B55E73D1CC632D029150DA4A8CFA55'),
    (53, '101112131415161718191A1B1C1D1E1F79AA917FA5534AAB2753669EE074F09FE38AAF8666BDF0FC78E89236FA171D19'),
    (54, '101112131415161718191A1B1C1D1E1F79AA917FA5534AAB2753669EE074F09F7643F41DE24DB4E40A65089752456A66'),
    (55, '101112131415161718191A1B1C1D1E1F79AA917FA5534AAB2753669EE074F09F0B9839BBDB3B7323E8977724DB0442EE'),
    (56, '101112131415161718191A1B1C1D1E1F79AA917FA5534AAB2753669EE074F09FC807E1D5DD5F1761742A3E104CC6816F'),
    (57, '101112131415161718191A1B1C1D1E1F79AA917FA5534AAB2753669EE074F09FA57BAE444E8CC9706E4D2A35E3298E3C'),
    (58, '101112131415161718191A1B1C1D1E1F79AA917FA5534AAB2753669EE074F09F36FE44C78AE51290686463AA927122C3'),
    (59, '101112131415161718191A1B1C1D1E1F79AA917FA5534AAB2753669EE074F09F94D16037AE6843CAAA57C8219D52AE4F'),
    (60, '101112131415161718191A1B1C1D1E1F79AA917FA5534AAB2753669EE074F09FE140ED64C2A3BFCB71831EFA40775947'),
    (61, '101112131415161718191A1B1C1D1E1F79AA917FA5534AAB2753669EE074F09F06FB930F9D8114860DECBE8D4040ECB5'),
    (62, '101112131415161718191A1B1C1D1E1F79AA917FA5534AAB2753669EE074F09F1DBCB161BB83391EE91591FAB789CF02'),
    (63, '101112131415161718191A1B1C1D1E1F79AA917FA5534AAB2753669EE074F09FBE85DFFBD03B7342BE684CA5B2B8ADEB'),
]


def q_encrypt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AES-128-CBC/PKCS with explicit IV is deterministic — checked against
    frozen OpenSSL known-answer ciphertexts (``ENCRYPT_KAT``). DuckDB has no
    AES, so the oracle is a VALUES join of the precomputed hex literals; the
    query pins ``c_custkey < 64`` (names are a pure function of custkey and
    identical at every SF) so the answer set is closed."""
    from loongcollector_spark.operators.enrich import encrypt_fields

    out = encrypt_fields(
        _cust_fields(spark, sf_dir).where(F.col("c_custkey") < 64),
        ["name"],
        key_hex="000102030405060708090a0b0c0d0e0f",
        iv_hex="101112131415161718191a1b1c1d1e1f",
    )
    return out.select("c_custkey", F.col("fields")["name"].alias("name_enc"))


# ---------------------------------------------------------------------------
# Dedup / text stats / similarity (training-data pipeline ops)
# ---------------------------------------------------------------------------

def q_dedup_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dup-pair → cluster resolution: edges from two overlapping equality
    relations (20-char text prefix, 20-char suffix — a doc can chain A~B on
    one key and B~C on the other, so the closure is genuinely transitive),
    resolved by min-label-propagation connected components; the oracle
    replays the closure with a recursive CTE."""
    from loongcollector_spark.operators.dedup import dup_clusters

    d = _t(spark, sf_dir, "documents")
    keys = d.select(
        "doc_id",
        F.substring("text", 1, 20).alias("pk"),
        F.expr("right(text, 20)").alias("sk"),
    )

    def eq_pairs(col: str) -> DataFrame:
        a, b = keys.alias("a"), keys.alias("b")
        return a.join(
            b, (F.col(f"a.{col}") == F.col(f"b.{col}")) & (F.col("a.doc_id") < F.col("b.doc_id"))
        ).select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))

    edges = eq_pairs("pk").union(eq_pairs("sk")).distinct()
    return dup_clusters(edges)


def q_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary top-50 by frequency (+document frequency): one
    map-side-combined hash agg, takeOrdered top-k, rank window over k rows."""
    from loongcollector_spark.operators.text import vocab_topk

    return vocab_topk(_t(spark, sf_dir, "documents"), k=50)


def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-source downsampling (keep 50% of src0, 5% of src1,
    20% elsewhere) — membership is a pure function of doc_id, so the oracle,
    a resume, and every parallelism level keep identical rows."""
    from loongcollector_spark.operators.sampling import stratified_sample

    d = _t(spark, sf_dir, "documents")
    out = stratified_sample(
        d, "doc_id", "source", {"src0": 0.5, "src1": 0.05}, default_rate=0.2
    )
    return out.select("doc_id", "source")

def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (GPT-3 appx C style): training docs sharing
    any word n-gram with the 'benchmark' slice (every 50th doc) are flagged.
    Benchmark gram set is broadcast — the check rides the corpus scan.
    n=4 here (vs 13 in GPT-3) so synthetic sf0.01 text yields a non-trivial
    contaminated set (~19 docs) for the oracle to check."""
    from loongcollector_spark.operators.decontam import ngram_contamination

    d = _t(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 50 == 0)
    train = d.filter(F.col("doc_id") % 50 != 0)
    return ngram_contamination(train, bench, n=4)


def q_pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing into 512-token contexts, per source
    shard: one window cumsum per shard, chunk ids are pure arithmetic."""
    from loongcollector_spark.operators.dedup import normalize_text
    from loongcollector_spark.operators.packing import pack_chunks

    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.size(F.split(normalize_text(F.col("text")), " ", -1)).alias("n_tok"),
    )
    return pack_chunks(d, ctx_len=512)


def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub (emails / IPv4s / phones) over deterministic PII-bearing
    text synthesized from events columns — native regexp_replace chain, hit
    counts taken on the pre-redaction text."""
    from loongcollector_spark.operators.text import pii_redact

    e = _t(spark, sf_dir, "events")
    txt = F.concat(
        F.lit("user "),
        F.col("user_id").cast("string"),
        F.lit(" <u"),
        F.col("user_id").cast("string"),
        F.lit("@mail"),
        (F.col("user_id") % 7).cast("string"),
        F.lit(".com> from 10."),
        (F.col("user_id") % 256).cast("string"),
        F.lit("."),
        (F.col("event_id") % 256).cast("string"),
        F.lit(".5 call +1 555 01"),
        F.lpad((F.col("event_id") % 100).cast("string"), 2, "0"),
        F.lit(" re "),
        F.col("event_type"),
    )
    df = e.select("event_id", txt.alias("text"))
    return pii_redact(df).select(
        "event_id", "n_email", "n_ipv4", "n_phone", "text_redacted"
    )


def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style 2-gram repetition features per document (dup-occurrence
    fraction + top-gram share) — two map-side-combined hash aggs."""
    from loongcollector_spark.operators.text import repetition_stats

    return repetition_stats(_t(spark, sf_dir, "documents"), n=2)


def q_mixture_reweight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-α=0.5 domain mixture over the skewed ``lang`` strata (the
    synthetic ``source`` strata are exactly uniform — degenerate): natural
    share p, target share q ∝ p^0.5, downsample-only keep rate."""
    from loongcollector_spark.operators.sampling import mixture_weights

    return mixture_weights(_t(spark, sf_dir, "documents"), "lang", alpha=0.5)


def q_segment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document dedup at 10-word-segment granularity: keep each segment's
    global first occurrence, rebuild cleaned text in position order."""
    from loongcollector_spark.operators.dedup import segment_dedup

    return segment_dedup(_t(spark, sf_dir, "documents"), seg_words=10)


def q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-unigram LM quality score (CCNet-style perplexity proxy): per-doc
    mean negative log-prob under an add-one-smoothed unigram LM fit on the
    corpus — vocabulary agg broadcasts at scale, no window."""
    from loongcollector_spark.operators.text import unigram_logprob

    return unigram_logprob(_t(spark, sf_dir, "documents"))


def q_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document; ranking on the 6-digit-rounded score
    with term-asc tiebreak so Spark and DuckDB order identically."""
    from loongcollector_spark.operators.text import tfidf_top_terms

    return tfidf_top_terms(_t(spark, sf_dir, "documents"), k=3)


def q_length_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile-band outlier cut: keep documents whose n_chars is inside the
    exact [P5, P95] band — thresholds from ONE 1-row aggregate, filter rides
    the scan."""
    from loongcollector_spark.operators.sampling import percentile_band_filter

    d = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return percentile_band_filter(d, "n_chars", 0.05, 0.95)


def q_embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization audit: (dim, scale, integer
    q_sum/q_min/q_max) — the quantized aggregates are exact integers, so the
    oracle check has no float-sum ordering hazard."""
    from loongcollector_spark.operators.ann import quantize_int8

    return quantize_int8(_t(spark, sf_dir, "embeddings"))


def q_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus-curation composite — the 'switch your pipeline to
    this engine' demo, four library stages chained and oracle-replayed as one:

      quality_score ≥ 0.62  →  2-gram dup_gram_frac ≤ 0.05 (Gopher cut)
      →  exact dedup on a 20-char prefix key (keep min doc_id)
      →  deterministic stratified sample (en 80%, others 50%)

    Every stage is the SAME library operator the standalone queries check;
    the oracle chains their SQL twins. Scale shape: two doc-keyed hash-agg
    joins + one tiny groupBy(key) join + a scan-side hash filter — no window,
    no Python."""
    from loongcollector_spark.operators.sampling import stratified_sample
    from loongcollector_spark.operators.text import quality_score, repetition_stats

    d = _t(spark, sf_dir, "documents")
    scored = quality_score(d).filter(F.col("quality") >= 0.62)
    rep = repetition_stats(d, n=2).select("doc_id", "dup_gram_frac")
    kept = scored.join(rep, "doc_id").filter(F.col("dup_gram_frac") <= 0.05)
    kept = kept.withColumn("k", F.substring(F.col("text"), 1, 20))
    reps = kept.groupBy("k").agg(F.min("doc_id").alias("rep_id"))
    deduped = kept.join(reps, "k").filter(F.col("doc_id") == F.col("rep_id"))
    sampled = stratified_sample(deduped, "doc_id", "lang", {"en": 0.8}, default_rate=0.5)
    return sampled.select("doc_id", "lang", "source", "quality", "dup_gram_frac")


def q_winnow_fps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS winnowing fingerprints (3-gram hashes, window 4, rightmost-min):
    the full distinct (doc, fp, pos) set — the oracle replays hash, packing
    and window selection bit-for-bit."""
    from loongcollector_spark.operators.dedup import winnow_fingerprints

    return winnow_fingerprints(_t(spark, sf_dir, "documents"), k=3, w=4)


def q_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial-overlap candidates: docs sharing ≥ 2 winnowing fingerprints
    (boilerplate fps dropped via broadcast anti-join before the self-join)."""
    from loongcollector_spark.operators.dedup import winnow_pairs

    return winnow_pairs(_t(spark, sf_dir, "documents"), k=3, w=4, min_shared=2)


def q_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split (98/1/1 by doc_id hash) — per-split
    per-source counts; the same doc lands in the same split on every rerun."""
    from loongcollector_spark.operators.sampling import hash_split

    d = hash_split(_t(spark, sf_dir, "documents"), "doc_id")
    return d.groupBy("split", "source").agg(F.count(F.lit(1)).alias("n_docs"))


def q_shuffle_head(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First 100 rows of the seeded deterministic corpus permutation (loader
    shuffle order): (rank, doc_id) — the explicit rank makes the ORDER itself
    oracle-checkable under an order-insensitive compare."""
    from loongcollector_spark.operators.sampling import deterministic_shuffle

    d = deterministic_shuffle(_t(spark, sf_dir, "documents").select("doc_id"), "doc_id", seed=42)
    return d.filter(F.col("shuffle_rank") <= 100).select("shuffle_rank", "doc_id")


def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingest dedup against an existing corpus: the simulated new
    batch = re-ingested copies (doc_id%5==0, re-keyed — must be dropped by the
    corpus anti-join) ∪ modified docs (doc_id%5==1, text + suffix — novel,
    kept) ∪ a second copy of the modified docs (re-keyed higher — dropped by
    the within-batch keep-min). Output: surviving (doc_id, dup_key)."""
    from loongcollector_spark.operators.dedup import incremental_dedup

    d = _t(spark, sf_dir, "documents")
    reingest = d.filter(F.col("doc_id") % 5 == 0).withColumn(
        "doc_id", F.col("doc_id") + F.lit(100000)
    )
    modified = d.filter(F.col("doc_id") % 5 == 1).withColumn(
        "text", F.concat(F.col("text"), F.lit(" fresh suffix"))
    )
    dup_copy = modified.withColumn("doc_id", F.col("doc_id") + F.lit(200000))
    new_batch = reingest.unionByName(modified).unionByName(dup_copy)
    out = incremental_dedup(new_batch, d)
    return out.select("doc_id", "dup_key")


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on a normalized key (prefix) — representative = min(doc_id)."""
    d = _t(spark, sf_dir, "documents")
    key = F.substring(F.col("text"), 1, 20)
    return d.groupBy(key.alias("dup_key")).agg(
        F.min("doc_id").alias("rep_doc_id"), F.count(F.lit(1)).alias("dup_cnt")
    )


def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id", F.size(F.split(F.col("text"), " ", -1)).alias("n_words")
    )


def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rate-limit-style top-k per key (processor_rate_limit batch analog)."""
    d = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(F.col("n_chars").desc(), F.col("doc_id"))
    return (
        d.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("source", "doc_id", "n_chars", "rk")
    )


def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 for query vectors vec_id<5 (broadcast the
    queries, single pass over the corpus)."""
    emb = _t(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    joined = emb.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
    dot = F.aggregate(
        F.zip_with(F.col("embedding"), F.col("q_emb"), lambda a, b: a * b),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(F.col(c), F.lit(0.0).cast("double"), lambda acc, x: acc + x * x)
    )
    cos = dot / (norm("embedding") * norm("q_emb"))
    scored = joined.withColumn("cos", cos)
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 10)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), F.round("cos", 6).alias("cos6"), "rk")
    )


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-flat ANN: deterministic coarse quantizer (16 lowest-id vectors),
    nprobe=4 of 16 lists scanned per query — the sub-linear scale path next
    to the brute-force baseline; the oracle replays the identical index."""
    from loongcollector_spark.operators.ann import ann_ivf_topk

    e = _t(spark, sf_dir, "embeddings")
    return ann_ivf_topk(e, query_ids=[100, 101, 102], k=10, n_centroids=16, nprobe=4)


# ---------------------------------------------------------------------------
# Training-data ops v2: normalized dedup, ngram/charset jaccard, minhash-LSH,
# simhash, embedding near-dup, language-ID, quality, fingerprint, BPE count
# ---------------------------------------------------------------------------

def q_dedup_exact_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    from loongcollector_spark.operators.dedup import exact_dedup

    d = _t(spark, sf_dir, "documents")
    out = exact_dedup(d, id_col="doc_id")
    return out.select(
        F.length("dup_key").alias("key_len"), F.col("rep_id").alias("rep_doc_id"), "dup_cnt"
    )


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_doc_grams=100 drops stop-grams (document frequency > 100) from the
    gram sets BEFORE the inverted-index self-join — without it one hot gram
    makes the join quadratic in its doc frequency (round-1: 41.5s at sf0.1).
    The oracle mirrors the same df-filter, so Jaccard over the pruned
    vocabulary stays fully checked."""
    from loongcollector_spark.operators.dedup import ngram_jaccard_pairs

    d = _t(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(d, n=2, threshold=0.3, max_doc_grams=100)


def q_charset_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from loongcollector_spark.operators.dedup import charset_jaccard_pairs

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return charset_jaccard_pairs(d, block_col="lang", threshold=0.9)


def _lsh_fixture(spark: SparkSession) -> DataFrame:
    """Deterministic 60-doc fixture with RECALL-GUARANTEED duplicate structure
    for the xxhash64 LSH families (VERDICT r4 #7: their hashes have no DuckDB
    twin, so the oracle instead brute-forces the EXPECTED PAIR SET): docs come
    in 20 groups of 3 with IDENTICAL text (12 md5-hex words), and word
    vocabularies are disjoint across groups. Identical docs have identical
    signatures → guaranteed band/block collision (recall 1 regardless of hash
    family); cross-group pairs share zero n-grams → exact verify filters any
    chance band collision (precision 1). The LSH output is therefore exactly
    the brute-force pair set, which DuckDB computes independently."""
    return spark.range(60).select(
        F.col("id").alias("doc_id"),
        F.expr(
            "array_join(transform(sequence(1, 12),"
            " j -> substr(md5(cast((id div 3) * 100 + j as string)), 1, 8)), ' ')"
        ).alias("text"),
    )


def q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH with the production xxhash64 hash family, end-to-end
    oracle-checked on the recall-guaranteed fixture (_lsh_fixture): DuckDB
    brute-forces exact bigram Jaccard over all pairs; the banded xxhash LSH
    plan must recover exactly that pair set. (The md5 twin q_minhash_lsh_md5
    additionally replays signatures/banding over real documents.)"""
    from loongcollector_spark.operators.dedup import minhash_lsh_pairs

    d = _lsh_fixture(spark)
    return minhash_lsh_pairs(d, num_hashes=32, bands=16, n=2, threshold=0.5, max_bucket_size=100)


def q_minhash_lsh_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH with the md5 hash family — the auditable twin of
    q_minhash_lsh: DuckDB replays signatures, banding, candidates AND the
    exact-Jaccard verify, so the whole LSH path is oracle-checked."""
    from loongcollector_spark.operators.dedup import minhash_lsh_pairs_md5

    d = _t(spark, sf_dir, "documents")
    return minhash_lsh_pairs_md5(d, num_hashes=16, bands=8, n=2, threshold=0.3, max_bucket_size=100)


def q_simhash_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash (production xxhash64 token hashes) on the
    recall-guaranteed fixture: identical texts → identical signatures →
    hamming 0 through every pigeonhole block; disjoint-vocabulary cross-group
    pairs sit ~32 bits apart (P[≤3] ≈ 2e-15), so the expected output is
    exactly the within-group pairs at hamming 0 — which the oracle emits by
    construction. Checks signatures, blocking, the bucket cap wiring and the
    hamming filter end-to-end without needing xxhash in SQL."""
    from loongcollector_spark.operators.dedup import simhash_dup_pairs

    d = _lsh_fixture(spark)
    return simhash_dup_pairs(d, max_hamming=3, max_bucket_size=100)


def q_simhash_dups_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs with md5 token hashes (60-bit) — the fully
    oracle-checked twin of q_simhash_dups. The stop-bucket cap
    (max_bucket_size=100, VERDICT r4 #3) is mirrored in the DuckDB oracle,
    so the capped plan itself is what the gate checks."""
    from loongcollector_spark.operators.dedup import simhash_dup_pairs_md5

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    return simhash_dup_pairs_md5(d, max_hamming=7, max_bucket_size=100)


def q_embedding_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact all-pairs cosine ≥ 0.4 via chunked GEMM (applyInPandas numpy
    matmul per chunk-pair task) — same pair set as the round-1 nested-loop
    form, but the plan is shuffle-by-task with no BroadcastNestedLoopJoin."""
    from loongcollector_spark.operators.dedup import embedding_dup_pairs_exact

    e = _t(spark, sf_dir, "embeddings")
    return embedding_dup_pairs_exact(e, threshold=0.4, target_chunk=512)


def q_embedding_dups_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sub-quadratic scale path: hyperplane sign-bucket LSH candidates
    (equi-join on (band, bucket)) + exact-cosine verify. The DuckDB oracle
    mirrors the SAME plane literals and banding, so the candidate∩threshold
    semantics are fully checked. At τ=0.4 banded-LSH recall is inherently low
    (~18% with H=8,B=8 — see embedding_dup_pairs_lsh docstring); the operator
    is tuned for the near-dup regime (recall ≈0.91 at cos 0.9, ≈0.998 at
    0.95) where corpus dedup actually runs."""
    from loongcollector_spark.operators.dedup import embedding_dup_pairs_lsh

    e = _t(spark, sf_dir, "embeddings")
    return embedding_dup_pairs_lsh(e, threshold=0.4, bands=8, planes_per_band=8, dim=64)


def q_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from loongcollector_spark.operators.text import language_id

    d = _t(spark, sf_dir, "documents")
    return language_id(d).select("doc_id", "lang_pred")


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from loongcollector_spark.operators.text import quality_score

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    out = quality_score(d)
    return out.select(
        "doc_id", "n_words", "mean_word_len", "punct_ratio", "stopword_ratio", "quality"
    )


def q_token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from loongcollector_spark.operators.text import token_count

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return token_count(d).select("doc_id", "n_ws_tokens", "n_bpe_tokens")


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from loongcollector_spark.operators.text import fingerprint

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return fingerprint(d).select("doc_id", "fp_md5", "fp64")


# ---------------------------------------------------------------------------
# Grok / JSON flatten / windowed agg
# ---------------------------------------------------------------------------

GROK_PATTERN = "%{WORD:w1} %{NOTSPACE:w2} %{GREEDYDATA:rest}"


def q_grok(spark: SparkSession, sf_dir: str) -> DataFrame:
    from loongcollector_spark.operators.grok import parse_grok

    d = _t(spark, sf_dir, "documents")
    out = parse_grok(d, [GROK_PATTERN], source_col="text", full_match=True)
    return out.select(
        "doc_id",
        F.col("fields")["w1"].alias("w1"),
        F.col("fields")["w2"].alias("w2"),
        F.length(F.col("fields")["rest"]).alias("rest_len"),
    )


def q_json_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    from loongcollector_spark.operators.parse import json_flatten

    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") == 1)
    j = F.concat(
        F.lit('{"a": {"b": '), F.col("l_orderkey").cast("string"),
        F.lit('}, "c": "'), F.col("l_returnflag"), F.lit('"}'),
    )
    out = json_flatten(li.withColumn("content", j))
    return out.select(
        "l_orderkey",
        F.col("fields")["a_b"].alias("a_b"),
        F.col("fields")["c"].alias("c"),
    )


def q_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 5-min event-time windows per event_type (the streaming
    windowed-agg plan, executed on the batch table)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_rows"), F.round(F.sum("value"), 4).alias("value_sum"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_rows", "value_sum")
    )


def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.03, 0.05))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            # final decimal aggregates are cast to double: the exact decimal
            # sums are identical in Spark and DuckDB, so the double casts are
            # bit-identical — whereas Decimal survives toPandas as
            # decimal.Decimal (trailing-zero repr) on one side and float64 on
            # the other, which round-1's driver hashed as a mismatch
            F.sum((dec("l_extendedprice") * dec("l_discount")).cast("decimal(28,4)"))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


# ---------------------------------------------------------------------------
# SPL / multiline / rate limit
# ---------------------------------------------------------------------------

SPL_SCRIPT = (
    r"* | parse-regexp text, '(\w+) (\w+)' as w1, w2"
    " | where w1 != ''"
    " | stats count() as n by w1"
    " | sort by n desc, w1"
    " | limit 10"
)


def q_spl_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from loongcollector_spark.plans.spl import compile_spl

    d = _t(spark, sf_dir, "documents")
    return compile_spl(d, SPL_SCRIPT).select("w1", "n")


SPL_KV_SCRIPT = (
    "* | parse-kv line, '&', '=' as user, et"
    " | where et != ''"
    " | pack-fields packed, user, et"
    " | project event_id, user, et, packed"
)


def q_spl_kv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """parse-kv + pack-fields SPL verbs over a synthesized query-string line."""
    from loongcollector_spark.plans.spl import compile_spl

    e = _t(spark, sf_dir, "events").withColumn(
        "line",
        F.concat(
            F.lit("user="), F.col("user_id").cast("string"),
            F.lit("&et="), F.col("event_type"), F.lit("&junk"),
        ),
    )
    return compile_spl(e, SPL_KV_SCRIPT)


SPL_FULL_SCRIPT = (
    "* | parse-csv line as ip, status, bytes"
    " | parse-json jline as k"
    " | extend kb = cast(bytes as bigint) * 2"
    " | project-rename addr = ip"
    " | where status = '250'"
    " | project event_id, addr, status, kb, k"
)


def q_spl_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SPL verbs the other two SPL queries don't exercise, in one compiled
    script: parse-csv, parse-json, extend, project-rename, project (the
    expression form), where — over synthesized CSV + JSON lines."""
    from loongcollector_spark.plans.spl import compile_spl

    e = _t(spark, sf_dir, "events").select(
        "event_id",
        F.concat(
            F.lit("10.0."), (F.col("user_id") % 256).cast("string"), F.lit(".9,"),
            (F.lit(200) + (F.col("event_id") % 3) * 50).cast("string"), F.lit(","),
            (F.col("event_id") % 1000).cast("string"),
        ).alias("line"),
        F.concat(F.lit('{"k":"'), F.col("event_type"), F.lit('"}')).alias("jline"),
    )
    return compile_spl(e, SPL_FULL_SCRIPT)


def q_multiline_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each user's event stream merged into sessions starting at 'signup'
    (merge-multiline semantics over a deterministic line order)."""
    from loongcollector_spark.operators.multiline import merge_multiline

    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lines = e.select(
        F.col("user_id").alias("stream_id"),
        F.row_number().over(w).alias("line_no"),
        F.col("event_type").alias("content"),
    )
    return merge_multiline(lines, r"^signup$")


def q_rate_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from loongcollector_spark.operators.ratelimit import rate_limit_batch

    e = _t(spark, sf_dir, "events")
    out = rate_limit_batch(e, ["user_id"], 2, ts_col="ts", window_sec=3600, tiebreak_cols=["event_id"])
    return out.select("user_id", "event_id")


# ---------------------------------------------------------------------------
# SQL-engine coverage (SPL stats analog): TPC-H-style aggregates & joins
# ---------------------------------------------------------------------------

def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum((dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - dec("l_discount"))).cast("decimal(28,4)")).cast("double").alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey")
        .agg(
            F.sum((dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - dec("l_discount"))).cast("decimal(28,4)")).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
        .withColumn("revenue", F.col("revenue").cast("double"))
    )


def q_tpch_q5ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-join through region/nation (broadcast dims) → revenue per nation."""
    region = _t(spark, sf_dir, "region")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust.select("c_custkey", "c_nationkey")), orders.o_custkey == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.sum((dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - dec("l_discount"))).cast("decimal(28,4)")).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q_events_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: 30-min-gap sessions per user (window lag + running sum)."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = (F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))) > 1800
    new_sess = F.when(gap | F.lag("ts").over(w).isNull(), 1).otherwise(0)
    sess = e.withColumn("sess_start", new_sess).withColumn(
        "sess_id", F.sum("sess_start").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return sess.groupBy("user_id").agg(
        F.max("sess_id").alias("n_sessions"), F.count(F.lit(1)).alias("n_events")
    )


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------



def q_boilerplate_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style boilerplate removal: 2-word spans occurring in >= 25
    distinct documents are stripped from EVERY document (vs segment_dedup's
    first-occurrence keep); docs rebuilt in span order."""
    from loongcollector_spark.operators.text import boilerplate_strip

    return boilerplate_strip(_t(spark, sf_dir, "documents"), span=2, min_docs=25)


def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fastText-shape hashed uni+bigram linear quality classifier — pure
    shuffle-free projection; integer weight sums keep Spark and the oracle
    bit-identical."""
    from loongcollector_spark.operators.text import hashed_ngram_classifier

    d = hashed_ngram_classifier(_t(spark, sf_dir, "documents"), buckets=1024, seed="q")
    return d.select("doc_id", "n_grams", "clf_score")


def q_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated bigram-LM mean NLL per document (CCNet perplexity proxy,
    one order above unigram_logprob)."""
    from loongcollector_spark.operators.text import bigram_logprob

    return bigram_logprob(_t(spark, sf_dir, "documents"), lam=0.7)


def q_length_batching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Loader-side length-bucketed batching: per-shard length-sorted batches
    of 32 rows with per-batch padding-waste stats."""
    from loongcollector_spark.operators.sampling import length_batching

    return length_batching(
        _t(spark, sf_dir, "documents"), length_col="n_chars",
        shard_col="source", id_col="doc_id", batch_rows=32,
    )


def q_bloom_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter ingest pre-check: bitmap built over the full corpus
    (packed 63-bits-per-bigint rows — O(m) regardless of corpus size), probed
    by a simulated new batch = re-ingested copies (must flag maybe_dup) +
    modified docs (novel — false only up to the designed FP rate; FPs are
    deterministic and the oracle replays them exactly)."""
    from loongcollector_spark.operators.dedup import bloom_bitmap, bloom_membership

    d = _t(spark, sf_dir, "documents")
    bitmap = bloom_bitmap(d, m_bits=16384, k=3)
    reingest = d.filter(F.col("doc_id") % 5 == 0).withColumn(
        "doc_id", F.col("doc_id") + F.lit(100000)
    )
    modified = d.filter(F.col("doc_id") % 5 == 1).withColumn(
        "text", F.concat(F.col("text"), F.lit(" fresh suffix"))
    ).withColumn("doc_id", F.col("doc_id") + F.lit(200000))
    batch = reingest.unionByName(modified)
    out = bloom_membership(batch, bitmap, m_bits=16384, k=3)
    return out.select("doc_id", "maybe_dup")





def q_vocab_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize-to-ids with a corpus-built 24-word vocab (the synth corpus
    has 31 distinct words, so the tail IS out-of-vocabulary): per-doc
    token/OOV counts plus the first 16 token ids — the encoding itself is
    checked, not just the stats."""
    from loongcollector_spark.operators.text import vocab_encode

    return vocab_encode(_t(spark, sf_dir, "documents"), vocab_size=24, head=16)


def q_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-distribution Shannon entropy per document (gibberish /
    binary-junk detector)."""
    from loongcollector_spark.operators.text import char_entropy

    return char_entropy(_t(spark, sf_dir, "documents"))


def q_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style per-rule quality booleans (word-count band 20..80 splits
    this corpus' 10..99 range, so both bands actually fire)."""
    from loongcollector_spark.operators.text import gopher_rules

    return gopher_rules(_t(spark, sf_dir, "documents"), min_words=20, max_words=80)


def q_keyword_tag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Taxonomy keyword tagging with the default 3-topic taxonomy (pure
    codegen projection; tie-break = taxonomy declaration order)."""
    from loongcollector_spark.operators.text import keyword_tag

    return keyword_tag(_t(spark, sf_dir, "documents"))


def q_cluster_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-one policy on top of the dedup_cluster closure: survivor = max
    n_chars then min doc_id; everyone else marked is_drop."""
    from loongcollector_spark.operators.dedup import cluster_survivors

    clusters = q_dedup_cluster(spark, sf_dir)
    return cluster_survivors(clusters, _t(spark, sf_dir, "documents"))


def q_skew_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew diagnostic over documents.lang (genuinely skewed in
    the testdata: en ~2.2x the mean): top keys, shares, skew factor and the
    salt-bucket count salted_repartition should use at the given target."""
    from loongcollector_spark.operators.aggregate import skew_probe

    return skew_probe(_t(spark, sf_dir, "documents"), key_col="lang",
                      top_k=10, target_rows_per_task=100)


def q_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf slope/r2 over the top-50 corpus vocabulary."""
    from loongcollector_spark.operators.text import zipf_fit

    return zipf_fit(_t(spark, sf_dir, "documents"), top_v=50)


def q_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source dataset card: volumes, length spread, fixed per-lang doc
    counts (one shuffle to |sources| rows)."""
    from loongcollector_spark.operators.text import dataset_card

    return dataset_card(_t(spark, sf_dir, "documents"))


def q_asof_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: every click event enriched with the user's most recent
    at-or-before purchase (union + keyed window carry-forward, one shuffle on
    user_id — never a range join). Oracle = DuckDB's native ASOF LEFT JOIN."""
    from loongcollector_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "ts", "user_id", "value"
    )
    purchases = ev.filter(F.col("event_type") == "purchase")
    out = asof_join(
        clicks,
        purchases,
        on="user_id",
        ts_col="ts",
        right_cols=["event_id", "value"],
        suffix="_p",
        right_order_col="event_id",
    )
    return out.select(
        "event_id",
        "ts",
        "user_id",
        F.col("value").alias("click_value"),
        F.col("ts_p").alias("purchase_ts"),
        F.col("event_id_p").alias("purchase_event_id"),
        F.col("value_p").alias("purchase_value"),
        # tz-free wall-clock lag (timestampdiff on NTZ == DuckDB epoch_us diff;
        # the old TIMESTAMP→double round-trip broke across DST transitions)
        F.round(
            F.expr("timestampdiff(MICROSECOND, ts_p, ts)") / F.lit(1000000.0), 6
        ).alias("lag_sec"),
    )


def q_hll_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic md5-HLL (p=4, m=16): distinct users per event type, with
    the exact count alongside (audit=True — the gate checks register math AND
    exactness; the production default never shuffles raw items); the harmonic
    sum stays in exact scaled-integer form so Spark and DuckDB agree
    bit-for-bit."""
    from loongcollector_spark.operators.sketch import hll_distinct

    return hll_distinct(
        _t(spark, sf_dir, "events"), F.col("user_id"), ["event_type"], p=4, audit=True
    )


def q_rollup_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup over (source, lang) with char-volume measures: one
    Expand+HashAggregate pass, not a scan per level."""
    from loongcollector_spark.operators.aggregate import rollup_counts

    return rollup_counts(
        _t(spark, sf_dir, "documents"), ["source", "lang"], measure_col="n_chars"
    )


def q_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-word-count filter sweep: kept docs/words per candidate threshold
    from ONE corpus scan (broadcast threshold table + conditional agg)."""
    from loongcollector_spark.operators.text import threshold_sweep

    return threshold_sweep(
        _t(spark, sf_dir, "documents"), thresholds=[0, 20, 40, 60, 80, 100]
    )


def q_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-lang fixed-width word-count histogram (explicit bounds — no min/max
    pre-scan): one projection + one map-combined groupBy."""
    from loongcollector_spark.operators.text import length_histogram

    return length_histogram(
        _t(spark, sf_dir, "documents"), lo=0, hi=100, n_bins=10, group_col="lang"
    )


def q_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a staleness tolerance: purchases older than 1h are
    nulled out (pandas merge_asof semantics) — gate-covers the tolerance
    branch of operators/asof.py, which is otherwise pytest-only."""
    from loongcollector_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "ts", "user_id", "value"
    )
    purchases = ev.filter(F.col("event_type") == "purchase")
    out = asof_join(
        clicks,
        purchases,
        on="user_id",
        ts_col="ts",
        right_cols=["event_id", "value"],
        suffix="_p",
        right_order_col="event_id",
        tolerance_sec=3600.0,
    )
    return out.select(
        "event_id",
        "ts",
        "user_id",
        F.col("ts_p").alias("purchase_ts"),
        F.col("event_id_p").alias("purchase_event_id"),
        F.col("value_p").alias("purchase_value"),
    )


# Messy crawl-style URL synthesized deterministically from doc_id: scheme
# case, www. prefix, explicit default port, trailing slash, tracking params,
# fragments, and query-param order all vary; the canonicalizer collapses all
# seven axes, so groups key on (doc_id%7 host, doc_id%11 path, query class).
_URL_SYNTH = """
    concat(
      case when doc_id % 3 = 0 then 'https://'
           when doc_id % 3 = 1 then 'HTTP://www.' else '' end,
      'Site', cast(doc_id % 7 as {st}), '.Example.COM',
      case when doc_id % 2 = 0 then ':443' else '' end,
      '/Path/', cast(doc_id % 11 as {st}),
      case when doc_id % 4 = 0 then '/?utm_source=x&b=2&a=1'
           when doc_id % 4 = 1 then '?a=1&b=2&utm_campaign=y'
           when doc_id % 4 = 2 then '/' else '' end,
      case when doc_id % 5 = 0 then '#frag' else '' end)
"""


def q_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-URL dedup (crawl pipelines' cheapest, first dedup stage):
    canonicalize scheme/www/port/slash/tracking-param/fragment/param-order
    variants to one key, keep the lowest doc_id per key. Pure-Catalyst
    projection + one map-combinable hash agg + one equi-join
    (operators/url.py)."""
    from loongcollector_spark.operators.url import url_dedup

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_URL_SYNTH.format(st="string")).alias("url")
    )
    return url_dedup(docs)


# Deterministic pre-tokenized sequences synthesized from doc_id — the engine's
# input shape (tokens array<int>, north-rule input_hint) rebuilt identically by
# Spark (`sequence`/`transform`) and DuckDB (`generate_series`/`list_transform`):
# length 24..100, token ids a class-offset arithmetic stream over 16 content
# classes (doc_id % 16), so same-class sequences share aligned k-grams — real
# duplication structure for the dup-rate operator.
_TOK_SYNTH_SPARK = (
    "transform(sequence(1, cast(24 + doc_id % 77 as int)), "
    "i -> cast((31 * (doc_id % 16) + 17 * i + (i * i) % 7) % 512 as int))"
)
_TOK_SYNTH_DUCK = (
    "list_transform(generate_series(1, cast(24 + doc_id % 77 as int)), "
    "i -> cast((31 * (doc_id % 16) + 17 * i + (i * i) % 7) % 512 as int))"
)


def q_token_dup_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-level corpus-duplicated k-gram fraction per sequence (the
    Gopher/RefinedWeb duplicate-n-gram signal computed on the token ints
    directly — no decode). Inverted-index shape: positions → md5 gram keys →
    two map-combined hash aggs → one keyed join; no all-pairs, no window
    (operators/tokens.py::token_ngram_dup_stats)."""
    from loongcollector_spark.operators.tokens import token_ngram_dup_stats

    seqs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_TOK_SYNTH_SPARK).alias("tokens")
    )
    return token_ngram_dup_stats(seqs, k=8)


def q_domain_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style per-domain document cap: keep the 40 lowest-doc_id docs per
    domain, exact, via the salted two-stage top-Q (a hot domain never sorts
    in one task — operators/tokens.py::quota_cap)."""
    from loongcollector_spark.operators.tokens import quota_cap

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.concat(F.lit("site"), (F.col("doc_id") % 7).cast("string")).alias("domain"),
    )
    return quota_cap(docs, key_col="domain", order_col="doc_id", quota=40)


def q_token_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-training tokenized-table audit per source: declared-length
    mismatches, out-of-vocab-range ids, missing EOS, empties — one codegen
    projection + one map-combined groupBy (operators/tokens.py::
    token_integrity). Violations are injected deterministically so every
    counter is exercised: doc_id%13==0 appends an out-of-range 9999 instead
    of EOS 511 (doc_id%5==0 appends nothing), doc_id%17==0 mis-declares
    n_tok by 1."""
    from loongcollector_spark.operators.tokens import token_integrity

    tok = (
        f"concat({_TOK_SYNTH_SPARK}, "
        "case when doc_id % 13 = 0 then array(cast(9999 as int)) "
        "when doc_id % 5 <> 0 then array(cast(511 as int)) "
        "else array() end)"
    )
    seqs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.expr(tok).alias("tokens"),
    ).withColumn(
        "n_tok",
        (F.size("tokens") - F.when(F.col("doc_id") % 17 == 0, 1).otherwise(0)).cast(
            "int"
        ),
    )
    return token_integrity(seqs, vocab_size=512, eos_id=511)


def q_chunk_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window token chunking with overlap (window=32, stride=24,
    min_len=8): the long-document training-prep step — each sequence is cut
    on the stride grid with truncated tails dropped below min_len. Zero
    shuffle: one generate+explode codegen projection per row
    (operators/packing.py::chunk_sliding). Chunks are emitted as exact
    comma-joined token csv so the oracle checks token-level equality."""
    from loongcollector_spark.operators.packing import chunk_sliding

    seqs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_TOK_SYNTH_SPARK).alias("tokens")
    )
    ch = chunk_sliding(seqs, window=32, stride=24, min_len=8)
    return ch.select(
        "doc_id",
        "chunk_id",
        "chunk_start",
        F.array_join(F.transform("chunk", lambda x: x.cast("string")), ",").alias(
            "chunk_csv"
        ),
        F.col("n_chunk_tok").cast("int").alias("n_chunk_tok"),
    )


def q_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-budget mixture selection: visit docs in md5(doc_id)
    hash order and keep while the stratum's running token total ≤ budget
    (src3 capped tighter). Exact distributed prefix sum — bucket by
    the hash's first byte (order-preserving), tiny per-bucket offset agg,
    within-bucket window — never a corpus-wide sort
    (operators/sampling.py::token_budget_sample)."""
    from loongcollector_spark.operators.sampling import token_budget_sample

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "source", (24 + F.col("doc_id") % 77).cast("long").alias("n_tok")
    )
    return token_budget_sample(
        docs, default_budget=900, budgets={"src3": 400}, strata_col="source"
    )


def q_source_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source unigram-token JS divergence vs the corpus mixture (drift
    monitor, computed on token ids with no decode). One corpus-sized explode
    into a map-combined (source, token) agg; all JS math runs on the tiny
    S×V aggregate (operators/tokens.py::source_drift). Source token profiles
    differ by doc_id%16 phase, so divergences are nonzero and distinct."""
    from loongcollector_spark.operators.tokens import source_drift

    seqs = _t(spark, sf_dir, "documents").select(
        "source", F.expr(_TOK_SYNTH_SPARK).alias("tokens")
    )
    return source_drift(seqs)


def q_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup: deterministic spherical k-means (k=8, centroids seeded from
    the 8 lowest vec_ids, 1 Lloyd round) + within-cluster cosine ≥ 0.4
    keep-lowest-id pruning (operators/dedup.py::semdedup). Assignment is a
    zero-shuffle broadcast argmin; the only corpus shuffle is the
    cluster-bounded self-join — the SemDeDup design point. The oracle
    replays the identical float path (round-9 sims/centroids, round-4 pair
    cosines)."""
    from loongcollector_spark.operators.dedup import semdedup

    e = _t(spark, sf_dir, "embeddings")
    return semdedup(e, k=8, iters=1, tau=0.4)


def q_cms_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch point queries over token bigrams: build a 4×512
    sketch (ONE explode + ONE map-combined hash agg onto the fixed cell
    space — the corpus items are never shuffled), then estimate frequencies
    for the distinct bigrams of docs 0–4. Estimates are one-sided overcounts;
    the oracle replays the identical md5 cell math
    (operators/sketch.py::cms_build/cms_estimate)."""
    from loongcollector_spark.operators.sketch import cms_build, cms_estimate

    seqs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_TOK_SYNTH_SPARK).alias("tokens")
    )
    bg = seqs.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(tokens) - 1), i -> "
                "concat(cast(element_at(tokens, i) as string), ',', "
                "cast(element_at(tokens, i + 1) as string)))"
            )
        ).alias("bigram"),
    )
    sketch = cms_build(bg, F.col("bigram"), depth=4, width=512)
    probes = bg.filter("doc_id < 5").select("bigram").distinct()
    return cms_estimate(sketch, probes, F.col("bigram"), depth=4, width=512)


def q_parse_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """processor_csv / quoted-delimiter FSM (from_csv): parse RFC-4180 lines
    with embedded separators AND escaped quotes inside quoted fields —
    constructed deterministically from known parts, so the oracle is the
    round-trip truth (the constructor inputs) while Spark must actually run
    the quote state machine (operators/parse.py::csv_fields,
    ProcessorParseDelimiterNative.cpp:251-256 semantics)."""
    from loongcollector_spark.operators.parse import parse_delimiter

    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.expr(
            "concat('v', cast(doc_id as string), ',',"
            "'\"a,b-', cast(doc_id % 5 as string), '\",',"
            "'\"q\"\"q-', cast(doc_id % 3 as string), '\",',"
            "source)"
        ).alias("content"),
    )
    parsed = parse_delimiter(
        d, keys=["c1", "c2", "c3", "c4"], separator=",", quote='"'
    )
    return parsed.select(
        "doc_id",
        F.try_element_at("fields", F.lit("c1")).alias("c1"),
        F.try_element_at("fields", F.lit("c2")).alias("c2"),
        F.try_element_at("fields", F.lit("c3")).alias("c3"),
        F.try_element_at("fields", F.lit("c4")).alias("c4"),
    )


def q_tag_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """processor_tag_native: inject host/env group tags on every row
    (operators/parse.py::add_tags — merge_maps keeps user tags, fills
    pipeline tags). Emitted as sorted k=v csv for the oracle."""
    from loongcollector_spark.operators.enrich import add_tags

    ev = _t(spark, sf_dir, "events").select(
        "event_id", F.create_map(F.lit("user"), F.col("user_id").cast("string")).alias("tags")
    )
    out = add_tags(ev, {"__hostname__": "spark-node", "__pipeline__": "flagship"})
    return out.select(
        "event_id",
        F.array_join(
            F.transform(
                F.array_sort(F.map_entries("tags")),
                lambda e: F.concat(e["key"], F.lit("="), e["value"]),
            ),
            ",",
        ).alias("tags_csv"),
    )


def q_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source token 6-gram Jaccard contamination matrix — the
    corpus-level leakage audit between every source pair. Inverted-index
    shape: distinct (source, md5-gram) agg, per-gram pair join bounded by S²
    per gram, broadcast size joins (operators/tokens.py::
    source_overlap_matrix)."""
    from loongcollector_spark.operators.tokens import source_overlap_matrix

    seqs = _t(spark, sf_dir, "documents").select(
        "source", F.expr(_TOK_SYNTH_SPARK).alias("tokens")
    )
    return source_overlap_matrix(seqs, k=6)


def q_dup_span_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lee et al. 2022 cross-document duplicated-substring removal, exact via
    8-gram cover (a position is inside a ≥8-token duplicated span iff a
    corpus-duplicated 8-gram covers it). Inverted-index aggs + one keyed
    join + a zero-shuffle index filter; no suffix array, no windows
    (operators/tokens.py::dup_span_strip)."""
    from loongcollector_spark.operators.tokens import dup_span_strip

    seqs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_TOK_SYNTH_SPARK).alias("tokens")
    )
    out = dup_span_strip(seqs, k=8)
    return out.select(
        "doc_id",
        "n_tok",
        "n_removed",
        F.array_join(
            F.transform("tokens_clean", lambda x: x.cast("string")), ","
        ).alias("tokens_clean_csv"),
    )


def q_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source tokenizer fertility panel (tokens/char, tokens/word ratios
    of source totals) — one projection + one map-combined agg
    (operators/tokens.py::tokenizer_fertility)."""
    from loongcollector_spark.operators.tokens import tokenizer_fertility

    d = _t(spark, sf_dir, "documents").select(
        "source", "text", F.expr(_TOK_SYNTH_SPARK).alias("tokens")
    )
    return tokenizer_fertility(d)


def q_event_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal drift monitor: per-DAY event-type distribution vs the
    whole-corpus mix, as JS divergence — the same source_drift operator
    generalized to a time stratum (a day whose divergence spikes is the
    canary for an ingest change). Items are tiny one-element arrays, so the
    corpus pass stays one map-combined (day, type) agg."""
    from loongcollector_spark.operators.tokens import source_drift

    tid = (
        F.when(F.col("event_type") == "click", 0)
        .when(F.col("event_type") == "error", 1)
        .when(F.col("event_type") == "purchase", 2)
        .when(F.col("event_type") == "signup", 3)
        .otherwise(4)
        .cast("int")
    )
    ev = _t(spark, sf_dir, "events").select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"), F.array(tid).alias("tokens")
    )
    return source_drift(ev, strata_col="day")


def q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repeated-line removal (keep first occurrence, original
    order) — zero-shuffle codegen projection (dedup.py::line_dedup). Inputs
    synthesize a 5-line page with a repeated header and a repeated body line,
    so every doc removes exactly the 2 intra-doc repeats."""
    from loongcollector_spark.operators.dedup import line_dedup

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.concat(F.lit("hdr-"), F.col("source")),
            F.col("text"),
            F.concat(F.lit("hdr-"), F.col("source")),
            F.col("text"),
            F.concat(F.lit("tail-"), (F.col("doc_id") % 3).cast("string")),
        ).alias("content"),
    )
    return line_dedup(docs)


def q_batch_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batcher/FlushStrategy batch cuts (FlushStrategy.h:88-104): minute-
    boundary + count-cap batch ids per event_type, emitted as per-batch
    fixture rows (n_events, first/last ts). date_trunc is calendar-field and
    tz-free, so NTZ buckets identically in Spark and DuckDB."""
    from loongcollector_spark.operators.aggregate import batch_cuts

    return batch_cuts(
        _t(spark, sf_dir, "events"), ["event_type"], ts_col="ts",
        order_col="event_id", min_cnt=50,
    )


SYSLOG_GROK = "%{SYSLOGBASE} %{GREEDYDATA:msg}"


def _syslog_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic syslog-shaped lines synthesized from events (the repo
    convention: inputs derive from the shared tables so the DuckDB oracle can
    rebuild the identical corpus)."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    return ev.select(
        "event_id",
        F.concat(
            F.date_format("ts", "MMM dd HH:mm:ss"),
            F.lit(" host-"),
            (F.col("user_id") % 50).cast("string"),
            F.lit(" app-"),
            F.col("event_type"),
            F.lit("["),
            (F.col("event_id") % 997 + 1).cast("string"),
            F.lit("]: value "),
            F.col("value").cast("string"),
        ).alias("content"),
    )


def q_grok_syslog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SYSLOGBASE grok family (SYSLOGTIMESTAMP/SYSLOGHOST/SYSLOGPROG — the
    patterns a log user reaches for first; reference built-ins in
    processor_grok_default_patterns.go, VERDICT r3 missing item #3): parse
    synthesized syslog lines, emit the named captures. The oracle applies the
    SAME compile_grok expansion via DuckDB regexp_extract."""
    from loongcollector_spark.operators.grok import parse_grok

    out = parse_grok(_syslog_lines(spark, sf_dir), [SYSLOG_GROK], full_match=True)
    f = F.col("fields")
    return out.select(
        "event_id",
        f["timestamp"].alias("sl_ts"),
        f["logsource"].alias("logsource"),
        f["program"].alias("program"),
        f["pid"].alias("pid"),
        f["msg"].alias("msg"),
    )


def q_otel_trace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OTLP-JSON trace decode → one row per span (processor_otel_trace,
    plugins/processor/otel/processor_otel_trace.go:56-130 + the SLS span
    conversion in pkg/protocol/decoder/opentelemetry/otlp_trace_parser.go).
    Input is the closed OTEL_TRACE_FIXTURE literal set (encrypt-KAT pattern),
    so the oracle is frozen known-answer VALUES — each row hand-verified
    against the reference conversion field by field."""
    from loongcollector_spark.operators.otel import OTEL_TRACE_FIXTURE, otel_trace_parse

    df = spark.createDataFrame(OTEL_TRACE_FIXTURE, "doc_id int, content string")
    return otel_trace_parse(df)


def q_otel_metric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OTLP-JSON metric decode → SLS metric rows per gauge/sum data point
    (processor_otel_metric → ConvertOtlpMetrics, otlp_metric_parser.go:48-76;
    labels sorted k#$#v|... per pkg/helper MetricLabels)."""
    from loongcollector_spark.operators.otel import OTEL_METRIC_FIXTURE, otel_metric_parse

    df = spark.createDataFrame(OTEL_METRIC_FIXTURE, "doc_id int, content string")
    return otel_metric_parse(df)


def q_percentile_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type value percentile panel (exact type-7 interpolation ==
    DuckDB quantile_cont): the SLO table a log pipeline's stats verb ends in.
    exact=True is the explicit oracle-path opt-in — test-scale groups are
    small and bounded; the operator's DEFAULT is the KLL-sketch
    approx_percentile, the safe form at 100 TB."""
    from loongcollector_spark.operators.aggregate import percentile_panel

    return percentile_panel(
        _t(spark, sf_dir, "events"), "value", ["event_type"], ps=(0.5, 0.9, 0.99),
        exact=True,
    )


def q_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly metrics downsample per event type (calendar-field date_trunc —
    timezone-free, identical bucketing in Spark and DuckDB over NTZ).

    ``decimals=2``: events.value is a 2-decimal grid (FIXTURES.md), so the
    rollup aggregates exact integer cents and divides once — bit-identical
    across engines.  The legacy ``round(avg, 6)`` float path sat on a decimal
    half at sf0.1 (1391.13/32 = 43.4728125) where Spark and DuckDB round to
    different 6th-place ULPs."""
    from loongcollector_spark.operators.aggregate import time_rollup

    return time_rollup(
        _t(spark, sf_dir, "events"), "ts", ["event_type"], value_col="value", every="hour",
        decimals=2,
    )


_CONTAINERD_PARTS = """
    '2024-01-01T' || lpad(cast(event_id % 24 as string), 2, '0') || ':00:00.'
      || lpad(cast((event_id * 7919) % 1000000000 as string), 9, '0') || 'Z'
"""


def _container_src(spark: SparkSession, sf_dir: str):
    """Deterministic per-event containerd-line building blocks, identical in
    the DuckDB oracle (construction-inverse pattern, see q_parse_csv)."""
    return (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_id") < 4000)
        .select(
            "event_id",
            "user_id",
            F.expr(_CONTAINERD_PARTS).alias("t"),
            F.expr(
                "case when event_id % 10 < 7 then 'stdout' else 'stderr' end"
            ).alias("strm"),
            F.expr("'evt=' || event_type || ' u=' || cast(user_id as string)").alias(
                "payload"
            ),
        )
    )


def q_parse_container(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ProcessorParseContainerLogNative, containerd CRI path
    (core/plugin/processor/inner/ProcessorParseContainerLogNative.cpp:180-257):
    lines synthesized from `events` cover full/partial/tagless lines, the
    `P<no-space>` and `PP ` tag corner cases from the reference unit tests,
    an invalid stream, and a space-free failure line. The oracle computes the
    expected output directly from the construction inputs (inverse check) —
    Spark must actually run the three-delimiter scan."""
    from loongcollector_spark.operators.container import parse_container_log

    e = _container_src(spark, sf_dir)
    line = F.expr(
        """
        case event_id % 7
          when 0 then t || ' ' || strm || ' F ' || payload
          when 1 then t || ' ' || strm || ' P ' || payload
          when 2 then t || ' ' || strm || ' ' || payload
          when 3 then t || ' ' || strm || ' P' || payload
          when 4 then t || ' ' || strm || ' PP ' || payload
          when 5 then t || ' badstream F ' || payload
          else t
        end
        """
    )
    parsed = parse_container_log(
        e.select("event_id", line.alias("content")), "containerd"
    )
    return parsed.select(
        "event_id", "_time_", "_source_", "content", "is_partial", "parse_ok"
    )


def q_parse_container_docker(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ProcessorParseContainerLogNative, docker JSON-file path (ParseDockerLog,
    `.cpp:360-462`): valid lines (incl. key reordering, embedded spaces, a
    log value without the trailing newline), plus the reference's failure
    classes — wrong key name, unquoted value, extra key. Construction-inverse
    oracle; failed rows must keep the raw line verbatim
    (KeepingSourceWhenParseFail default)."""
    from loongcollector_spark.operators.container import parse_container_log

    e = _container_src(spark, sf_dir)
    line = F.expr(
        """
        case event_id % 7
          when 0 then '{"log":"' || payload || '\\\\n","stream":"' || strm || '","time":"' || t || '"}'
          when 1 then '{"log":"' || payload || '","stream":"' || strm || '","time":"' || t || '"}'
          when 2 then '{"time":"' || t || '","log":"' || payload || '\\\\n","stream":"' || strm || '"}'
          when 3 then '{ "log" : "' || payload || '\\\\n" , "stream" : "' || strm || '" , "time" : "' || t || '" }'
          when 4 then '{"log1":"' || payload || '\\\\n","stream":"' || strm || '","time":"' || t || '"}'
          when 5 then '{"log":"' || payload || '\\\\n","stream":"' || strm || '","time":' || cast(event_id as string) || '}'
          else '{"log":"' || payload || '\\\\n","stream":"' || strm || '","time":"' || t || '","attrs":"x"}'
        end
        """
    )
    parsed = parse_container_log(
        e.select("event_id", line.alias("content")), "docker_json"
    )
    return parsed.select(
        "event_id", "_time_", "_source_", "content", "is_partial", "parse_ok"
    )


def q_container_stitch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial-line stitching — parse_container_log (containerd) into
    MergeLogsByFlag (ProcessorMergeMultilineLogNative.cpp:113-158): per
    container stream (user_id), runs of P-flagged rows merge with the next
    full row, contents concatenated with no separator; a trailing partial
    run flushes incomplete. Oracle replays the running-count segmentation
    with a SQL window + string_agg."""
    from loongcollector_spark.operators.container import (
        merge_container_partials,
        parse_container_log,
    )

    e = _container_src(spark, sf_dir)
    line = F.expr(
        """
        case event_id % 4
          when 0 then t || ' ' || strm || ' F ' || payload
          when 1 then t || ' ' || strm || ' P ' || payload
          when 2 then t || ' ' || strm || ' P ' || payload
          else t || ' ' || strm || ' ' || payload
        end
        """
    )
    parsed = parse_container_log(
        e.select("event_id", "user_id", line.alias("content")), "containerd"
    )
    return merge_container_partials(
        parsed, stream_col="user_id", order_col="event_id"
    ).select("user_id", "event_seq", "event_id", "content", "n_parts", "complete")


def q_prom_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prometheus exposition-format parse (ProcessorPromParseMetricNative +
    TextParser, core/prometheus/labels/TextParser.cpp:85-330): lines
    synthesized from `events` cover labeled/bare/empty-brace/spaced shapes,
    escape sequences in label values, explicit-vs-default timestamps, the
    trailing exemplar section, plus comment and structurally-invalid lines
    that must be dropped. Construction-inverse oracle (expected rows computed
    from the inputs, incl. the seconds→ms scaling rule)."""
    from loongcollector_spark.operators.prom import prom_parse

    e = _t(spark, sf_dir, "events").filter(F.col("event_id") < 4000)
    src = e.select(
        "event_id",
        F.expr("'m_' || event_type").alias("nm"),
        F.expr("cast(event_id % 997 as string)").alias("v"),
        F.expr("cast(1715829785083 + event_id as string)").alias("tsv"),
        F.expr("'u' || cast(user_id as string)").alias("uid"),
    )
    line = F.expr(
        """
        case event_id % 8
          when 0 then nm || '{method="GET",code="' || uid || '"} ' || v || ' ' || tsv
          when 1 then nm || ' ' || v
          when 2 then nm || '{} ' || v
          when 3 then nm || ' {a="x ' || uid || '",b=""} ' || v
          when 4 then '# HELP ' || nm || ' a counter'
          when 5 then '9bad{x="y"} ' || v
          when 6 then nm || '{esc="a\\\\nb\\\\\\\\c"} ' || v
          else nm || ' ' || v || ' ' || tsv || ' # {trace_id="x"} 1'
        end
        """
    )
    # maps don't canonicalize across engines (dict vs entry-list through
    # Arrow) — project to the sorted k=v join, which also pins entry order
    return prom_parse(
        src.select("event_id", line.alias("content")), default_ts_ms=1700000000000
    ).select(
        "event_id",
        "name",
        F.array_join(
            F.transform(
                F.array_sort(F.map_entries("labels")),
                lambda e: F.concat(e["key"], F.lit("="), e["value"]),
            ),
            ",",
        ).alias("labels"),
        "value",
        "ts_ms",
    )


def q_prom_relabel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prometheus relabeling (ProcessorPromRelabelMetricNative →
    core/prometheus/labels/Relabel.cpp:141-252) over parsed exposition rows:
    keep (regex row filter), replace (anchored $N expansion into a computed
    target label), labelmap (key-pattern fan-out), lowercase, labeldrop and
    hashmod (md5-tail-8-bytes mod N — replayed in DuckDB via the same hex
    arithmetic). The oracle rebuilds the final label map per row."""
    from loongcollector_spark.operators.prom import RelabelRule, prom_parse, prom_relabel

    e = _t(spark, sf_dir, "events").filter(F.col("event_id") < 4000)
    line = F.expr(
        """
        'm_' || event_type || '{method="' || case when event_id % 3 = 0 then 'GET' else 'POST' end
          || '",code="' || cast(200 + (event_id % 4) * 100 as string)
          || '",env="' || case when event_id % 2 = 0 then 'PROD' else 'dev' end || '"} '
          || cast(event_id % 997 as string)
        """
    )
    parsed = prom_parse(
        e.select("event_id", line.alias("content")), default_ts_ms=0
    )
    rules = [
        RelabelRule(action="keep", source_labels=("method",), regex="GET"),
        RelabelRule(action="drop", source_labels=("code",), regex="5.."),
        RelabelRule(
            action="replace",
            source_labels=("__name__", "method"),
            separator="-",
            regex="(.*)-(.*)",
            target_label="endpoint",
            replacement="$1:$2",
        ),
        RelabelRule(action="labelmap", regex="co(de)", replacement="status_$1"),
        RelabelRule(action="lowercase", source_labels=("env",), target_label="env"),
        RelabelRule(action="labeldrop", regex="method"),
        RelabelRule(
            action="hashmod", source_labels=("__name__",), target_label="shard", modulus=17
        ),
    ]
    return prom_relabel(parsed, rules).select(
        "event_id",
        "name",
        F.array_join(
            F.transform(
                F.array_sort(F.map_entries("labels")),
                lambda e: F.concat(e["key"], F.lit("="), e["value"]),
            ),
            ",",
        ).alias("labels"),
        "value",
    )


def q_pq_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (Jégou et al. 2011), asymmetric-distance
    variant: 64-dim embeddings → m=4 subspaces × k=16 deterministic codes
    (the 16 lowest-id vectors' sub-slices, code = id-sorted position), ADC
    top-10 for three probe queries. The ORACLE unrolls the entire index —
    sub-slicing, per-subspace argmin encode, query lookup tables, the
    integer-nano ADC sum and the final rank — in SQL, so the whole PQ path
    (not just the ranking) sits under the gate. Distances are integer nanos
    (skew_probe lesson: float Σ over a SQL group is ULP-unstable)."""
    from loongcollector_spark.operators.ann import pq_ann_topk

    e = _t(spark, sf_dir, "embeddings")
    return pq_ann_topk(e, query_ids=[100, 200, 300], topk=10, m=4, k=16)


def q_parse_pb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLS protobuf LogGroup decode (processor_parse_from_pb_native /
    pkg/protocol/proto/sls_logs.proto wire model): blobs are ENCODED in-plan
    by the pure-Python wire encoder (pandas UDF) from `events` columns, then
    decoded by the mapInPandas operator — the oracle recomputes the expected
    rows directly from the construction inputs, so the gate proves
    decode∘encode = identity across the full field set (varint time, fixed32
    time_ns on even logs, contents, group meta, tags). The wire bytes
    themselves are pinned by hand-derived known-answer vectors in
    tests/test_slspb.py."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from loongcollector_spark.operators.slspb import (
        encode_log,
        encode_log_group,
        parse_sls_pb,
    )

    # NOTE: no type hints — the module's `from __future__ import annotations`
    # stringifies them and pandas_udf can't resolve 'pd.Series' lazily
    @pandas_udf("binary")
    def _enc(event_id, event_type, user_id):
        out = []
        for eid, et, uid in zip(event_id, event_type, user_id):
            logs = [
                encode_log(
                    1700000000 + int(eid) * 2 + j,
                    [("et", str(et)), ("uid", str(int(uid)))],
                    time_ns=(int(eid) % 1000) if j == 0 else None,
                )
                for j in range(2)
            ]
            out.append(
                encode_log_group(
                    logs,
                    category=f"store{int(eid) % 4}",
                    source=f"src{int(uid) % 10}",
                    tags=[("env", "prod" if eid % 2 == 0 else "dev")],
                )
            )
        return pd.Series(out)

    e = _t(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    blobs = e.select(
        "event_id", _enc("event_id", "event_type", "user_id").alias("payload")
    )
    out = parse_sls_pb(blobs)
    return out.select(
        "event_id",
        "log_idx",
        "category",
        "source",
        "time",
        "time_ns",
        F.try_element_at("fields", F.lit("et")).alias("et"),
        F.try_element_at("fields", F.lit("uid")).alias("uid"),
        F.try_element_at("tags", F.lit("env")).alias("env"),
    )


def q_metric_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UntypedMultiDoubleValues model (core/models/MetricValue.h:47-81):
    events → multi-value metric rows (two counters + one gauge in ONE values
    map) → the counter/gauge merge per event_type. Counters are fed
    integer-valued doubles (cents) so the cross-engine sum is exact in any
    aggregation order; the gauge takes the latest (ts, value) observation."""
    from loongcollector_spark.operators.metric_multi import (
        multi_metric_merge,
        to_multi_metric,
    )

    e = _t(spark, sf_dir, "events")
    mm = to_multi_metric(
        e,
        counters={"v_cents": F.round(F.col("value") * 100), "cnt": F.lit(1)},
        gauges={"v_last": F.col("value")},
        tag_cols=["event_type"],
        time_col="ts",
    )
    merged = multi_metric_merge(mm, {"event_type": F.col("tags")["event_type"]})
    v = F.col("values")
    return merged.select(
        "event_type",
        "n_obs",
        v["v_cents"]["value"].alias("v_cents_sum"),
        v["cnt"]["value"].alias("cnt_sum"),
        v["v_last"]["value"].alias("v_last"),
        v["v_cents"]["mtype"].alias("mt_counter"),
        v["v_last"]["mtype"].alias("mt_gauge"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Query registry. ORDER MATTERS: the driver's correctness gate reads only
    the FIRST 50 entries. Round-5 window (tools/driver_check.py --coverage
    enforces the policy):

      1. queries whose code or oracle changed this round + the new ones
         (container/prometheus parsers, pb/metric/pq, LSH fixture-oracle
         twins) — 13;
      2. ALL 33 remaining r2-era stale greens (the record's oldest
         exposure — after r5 nothing is more than two rounds stale);
      3. r3-stale fills for the last 4 slots (the dedup/LSH family twins,
         which share plans with this round's changed ops).

    Out-of-window entries were green at their last check (r3/r4); with 142
    queries and a 50-slot window some staleness is structural — the window
    always carries the never-checked + oldest-stale set first.
    """
    return {
        # --- group 1: changed/new this round ---
        "skew_probe": q_skew_probe,
        "parse_container": q_parse_container,
        "parse_container_docker": q_parse_container_docker,
        "container_stitch": q_container_stitch,
        "prom_parse": q_prom_parse,
        "prom_relabel": q_prom_relabel,
        "minhash_lsh": q_minhash_lsh,
        "simhash_dups": q_simhash_dups,
        "simhash_dups_md5": q_simhash_dups_md5,
        "dup_span_strip": q_dup_span_strip,
        "pq_ann": q_pq_ann,
        "parse_pb": q_parse_pb,
        "metric_multi": q_metric_multi,
        # --- group 2: oldest stale (last green r2) ---
        "dedup_exact": q_dedup_exact,
        "tpch_q1": q_tpch_q1,
        "tpch_q3": q_tpch_q3,
        "tpch_q5ish": q_tpch_q5ish,
        "events_sessions": q_events_sessions,
        "metadata_group": q_metadata_group,
        "context_pack": q_context_pack,
        "split_log_regex": q_split_log_regex,
        "appender_template": q_appender_template,
        "appender_sort_labels": q_appender_sort_labels,
        "cloud_meta": q_cloud_meta,
        "grok_typed": q_grok_typed,
        "token_count": q_token_count,
        "topk_per_group": q_topk_per_group,
        "rename_keys": q_rename_keys,
        "add_fields": q_add_fields,
        "appender": q_appender,
        "pick_keys": q_pick_keys,
        "drop_keys": q_drop_keys,
        "drop_last_key": q_drop_last_key,
        "pack_json": q_pack_json,
        "string_replace": q_string_replace,
        "anchor": q_anchor,
        "gotime": q_gotime,
        "fields_with_condition": q_fields_with_condition,
        "filter_key_regex": q_filter_key_regex,
        "log_to_metric": q_log_to_metric,
        "base64_decode": q_base64_decode,
        "desensitize_md5_mode": q_desensitize_md5_mode,
        "dict_map": q_dict_map,
        "desensitize_const": q_desensitize_const,
        "md5_field": q_md5_field,
        "base64": q_base64,
        # --- group 3: r3-stale fills (dedup/LSH family twins) ---
        "minhash_lsh_md5": q_minhash_lsh_md5,
        "embedding_dups_lsh": q_embedding_dups_lsh,
        "embedding_dups": q_embedding_dups,
        "dedup_cluster": q_dedup_cluster,
        # --- out of window: r3-greens displaced by the r2-era block above
        # (first in line if the window grows) ---
        "json_flatten": q_json_flatten,
        "windowed_counts": q_windowed_counts,
        "tpch_q6": q_tpch_q6,
        "spl_stats": q_spl_stats,
        "spl_kv": q_spl_kv,
        "multiline_merge": q_multiline_merge,
        "rate_limit": q_rate_limit,
        "ngram_jaccard": q_ngram_jaccard,
        "gotime_go": q_gotime_go,
        "encrypt": q_encrypt,
        # --- out of window (vocab_topk/sample_stratified displaced by
        # parse_pb/metric_multi) ---
        "vocab_topk": q_vocab_topk,
        "sample_stratified": q_sample_stratified,
        # --- out of window: green at last check (r3/r4); decontaminate
        # displaced past the 50-boundary by pq_ann ---
        "decontaminate": q_decontaminate,
        "keyword_tag": q_keyword_tag,
        "cluster_survivors": q_cluster_survivors,
        "zipf_fit": q_zipf_fit,
        "dataset_card": q_dataset_card,
        "asof_enrich": q_asof_enrich,
        "asof_tolerance": q_asof_tolerance,
        "percentile_panel": q_percentile_panel,
        "time_rollup": q_time_rollup,
        "hll_users": q_hll_users,
        "rollup_sources": q_rollup_sources,
        "threshold_sweep": q_threshold_sweep,
        "length_histogram": q_length_histogram,
        "url_dedup": q_url_dedup,
        "otel_trace": q_otel_trace,
        "otel_metric": q_otel_metric,
        "grok_syslog": q_grok_syslog,
        "batch_cut": q_batch_cut,
        "token_dup_rate": q_token_dup_rate,
        "domain_quota": q_domain_quota,
        "token_integrity": q_token_integrity,
        "line_dedup": q_line_dedup,
        "chunk_sliding": q_chunk_sliding,
        "token_budget": q_token_budget,
        "source_drift": q_source_drift,
        "semdedup": q_semdedup,
        "cms_counts": q_cms_counts,
        "parse_csv": q_parse_csv,
        "tag_native": q_tag_native,
        "source_overlap": q_source_overlap,
        "fertility": q_fertility,
        "event_drift": q_event_drift,
        "geoip": q_geoip,
        "pipeline_route_counts": q_pipeline_route_counts,
        "route_rows": q_route_rows,
        "fanout_multi": q_fanout_multi,
        "group_content_values": q_group_content_values,
        "ann_ivf_topk": q_ann_ivf_topk,
        "ann_cosine_topk": q_ann_cosine_topk,
        "shard_hash": q_shard_hash,
        "parse_regex": q_parse_regex,
        "parse_json": q_parse_json,
        "parse_delimiter": q_parse_delimiter,
        "parse_apsara": q_parse_apsara,
        "split_key_value": q_split_key_value,
        "parse_timestamp": q_parse_timestamp,
        "filter_expression": q_filter_expression,
        "filter_include_exclude": q_filter_include_exclude,
        "pack_chunks": q_pack_chunks,
        "pii_redact": q_pii_redact,
        "repetition_stats": q_repetition_stats,
        "mixture_reweight": q_mixture_reweight,
        "segment_dedup": q_segment_dedup,
        "unigram_logprob": q_unigram_logprob,
        "tfidf_topk": q_tfidf_topk,
        "length_band": q_length_band,
        "embed_quantize": q_embed_quantize,
        "curation_pipeline": q_curation_pipeline,
        "winnow_fps": q_winnow_fps,
        "winnow_pairs": q_winnow_pairs,
        "hash_split": q_hash_split,
        "shuffle_head": q_shuffle_head,
        "incremental_dedup": q_incremental_dedup,
        "spl_full": q_spl_full,
        "dedup_exact_norm": q_dedup_exact_norm,
        "charset_jaccard": q_charset_jaccard,
        "language_id": q_language_id,
        "quality_score": q_quality_score,
        "token_count_bpe": q_token_count_bpe,
        "fingerprint": q_fingerprint,
        "grok": q_grok,
        "boilerplate_strip": q_boilerplate_strip,
        "quality_classifier": q_quality_classifier,
        "bigram_logprob": q_bigram_logprob,
        "length_batching": q_length_batching,
        "bloom_dedup": q_bloom_dedup,
        "vocab_encode": q_vocab_encode,
        "char_entropy": q_char_entropy,
        "gopher_rules": q_gopher_rules,
        "cloud_meta_nested": q_cloud_meta_nested,
    }


def _geoip_oracle_sql() -> str:
    vals = ", ".join(
        f"({10 * 16777216 + a * 65536}, {10 * 16777216 + b * 65536 + 65535}, "
        f"'{c}', '{pc}', '{co}', {lo!r}, {la!r})"
        for a, b, c, _p, pc, co, _cc, lo, la in GEO_RANGES
    )
    return f"""
        with e as (
          select event_id,
                 cast(10 * 16777216 + (user_id % 200) * 65536 + 7 * 256 + 33 as bigint) as ip
          from events),
        geo(s, en, city, province_code, country, lon, lat) as (values {vals})
        select e.event_id, g.city, g.province_code, g.country,
               case when g.lon is not null then printf('%.8f', g.lon) end as longitude,
               case when g.lat is not null then printf('%.8f', g.lat) end as latitude
        from e left join geo g on e.ip between g.s and g.en
    """


def _lsh_oracle_sql() -> str:
    """DuckDB twin of q_embedding_dups_lsh: identical hyperplane literals →
    identical sign buckets → identical candidate set, then the same
    exact-cosine ≥ τ filter."""
    from loongcollector_spark.operators.dedup import hyperplane_bucket_sql

    bexprs = hyperplane_bucket_sql(64, 8, 8, seed=7, vec_expr="vec")
    band_sel = "\n              union all\n              ".join(
        f"select vec_id, {b} as band, {expr} as bucket from v" for b, expr in enumerate(bexprs)
    )
    return f"""
        with v as (select vec_id, cast(embedding as double[]) as vec from embeddings),
        b as (
              {band_sel}
        ),
        cand as (
          select distinct a.vec_id as id_a, c.vec_id as id_b
          from b a join b c on a.band = c.band and a.bucket = c.bucket and a.vec_id < c.vec_id
        ),
        pairs as (
          select id_a, id_b, round(list_cosine_similarity(va.vec, vb.vec), 4) as cos
          from cand
          join v va on va.vec_id = id_a
          join v vb on vb.vec_id = id_b
        )
        select id_a, id_b, cos from pairs where cos >= 0.4
    """


def oracle_sql() -> dict[str, str]:
    route_case = (
        "case when regexp_matches(lang, '^(en)$') then 'sink_en' "
        "when regexp_matches(lang, '^(fr|es)$') then 'sink_latin' "
        "else 'sink_default' end"
    )
    rev = "cast(cast(l_extendedprice as decimal(18,2)) * (cast(1 as decimal(18,2)) - cast(l_discount as decimal(18,2))) as decimal(28,4))"

    from loongcollector_spark.operators.grok import compile_grok
    from loongcollector_spark.operators.text import STOPWORDS, BPE_ISH

    grok_rx = compile_grok([GROK_PATTERN], full_match=True)[0][0]
    grok_anch = "^" + grok_rx + "$"
    syslog_rx, syslog_keys, _ = compile_grok([SYSLOG_GROK], full_match=True)[0]
    syslog_anch = "^" + syslog_rx + "$"

    def _sgrp(key: str) -> int:  # capture-group index of a named field
        return syslog_keys.index(key) + 1

    sw = {lang: "[" + ", ".join(f"'{w}'" for w in ws) + "]" for lang, ws in STOPWORDS.items()}
    norm = r"trim(regexp_replace(lower(text), '\s+', ' ', 'g'))"
    # hll_users: EXACT same float literal the Spark plan embeds (sketch.py
    # builds alpha * m^2 * 2^s in Python too, so repr round-trips identically)
    from loongcollector_spark.operators.sketch import _alpha as _hll_alpha

    _hll_a16 = _hll_alpha(16) * 16 * 16 * float(1 << 57)
    # Python .split() semantics, mirroring text.py::_words — the list_filter
    # drops the empty EDGE tokens regex-split leaves when text starts/ends
    # with non-space whitespace (trim strips only 0x20), and makes an
    # empty/whitespace-only text count 0 words, not 1. No fixture row is
    # affected (documents.parquet carries no tabs/newlines/empty texts at any
    # SF — verified), but the two engines now agree on ANY data.
    words = r"list_filter(string_split_regex(trim(lower(text)), '\s+'), w -> w <> '')"
    training = {
        "dedup_exact_norm": f"""
            select cast(length(dup_key) as int) as key_len,
                   min(doc_id) as rep_doc_id, count(*) as dup_cnt
            from (select {norm} as dup_key, doc_id from documents)
            group by dup_key
        """,
        "dedup_cluster": """
            with recursive
            k as (select doc_id, substr(text, 1, 20) as pk, right(text, 20) as sk
                  from documents),
            e1 as (select a.doc_id as id_a, b.doc_id as id_b
                   from k a join k b on a.pk = b.pk and a.doc_id < b.doc_id),
            e2 as (select a.doc_id as id_a, b.doc_id as id_b
                   from k a join k b on a.sk = b.sk and a.doc_id < b.doc_id),
            edges as (select * from e1 union select * from e2),
            und as (select id_a as a, id_b as b from edges
                    union select id_b, id_a from edges),
            reach(node, r) as (
                select a, a from und
                union
                select u.a, reach.r from und u join reach on u.b = reach.node
            )
            select node as doc_id, min(r) as rep_doc_id,
                   count(distinct r) as cluster_size
            from reach group by node
        """,
        "vocab_topk": f"""
            with w as (select doc_id, unnest(string_split({norm}, ' ')) as word
                       from documents),
            v as (select word, count(*) as cnt, count(distinct doc_id) as df_cnt
                  from w where word <> '' group by word)
            select word, cnt, df_cnt,
                   row_number() over (order by cnt desc, word) as rank
            from v order by cnt desc, word limit 50
        """,
        "sample_stratified": """
            select doc_id, source from documents
            where ('0x' || substr(md5('strat:' || cast(doc_id as varchar)), 1, 8))::bigint
                  % 10000
                  < case when source = 'src0' then 5000
                         when source = 'src1' then 500 else 2000 end
        """,
        "decontaminate": f"""
            with w as (select doc_id, string_split({norm}, ' ') as ws from documents),
            g as (select distinct doc_id, gram from (
                select doc_id,
                       unnest(list_transform(range(1, len(ws) - 2),
                              i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                                   || ' ' || ws[i+3])) as gram
                from w)),
            tg as (select doc_id, gram from g where doc_id % 50 <> 0),
            bg as (select doc_id as bench_id, gram from g where doc_id % 50 = 0)
            select tg.doc_id,
                   count(distinct tg.gram) as hit_grams,
                   count(distinct bg.bench_id) as bench_docs
            from tg join bg on tg.gram = bg.gram
            group by tg.doc_id
        """,
        "pack_chunks": f"""
            with d as (select doc_id, source,
                              len(string_split({norm}, ' ')) as n_tok
                       from documents),
            p as (select doc_id, source as shard, n_tok,
                         cast(coalesce(sum(n_tok) over (
                             partition by source order by doc_id
                             rows between unbounded preceding and 1 preceding
                         ), 0) as bigint) as start_off
                  from d)
            select doc_id, shard, start_off,
                   start_off // 512 as chunk_first,
                   (start_off + greatest(n_tok, 1) - 1) // 512 as chunk_last,
                   (start_off + greatest(n_tok, 1) - 1) // 512
                       - start_off // 512 + 1 as n_chunks
            from p
        """,
        "pii_redact": r"""
            with t as (
              select event_id,
                     'user ' || cast(user_id as varchar) || ' <u'
                     || cast(user_id as varchar) || '@mail'
                     || cast(user_id % 7 as varchar) || '.com> from 10.'
                     || cast(user_id % 256 as varchar) || '.'
                     || cast(event_id % 256 as varchar) || '.5 call +1 555 01'
                     || lpad(cast(event_id % 100 as varchar), 2, '0')
                     || ' re ' || event_type as text
              from events)
            select event_id,
                   len(regexp_extract_all(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) as n_email,
                   len(regexp_extract_all(text,
                       '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) as n_ipv4,
                   len(regexp_extract_all(text,
                       '\+[0-9][0-9 -]{7,}[0-9]')) as n_phone,
                   regexp_replace(regexp_replace(regexp_replace(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                       '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g'),
                       '\+[0-9][0-9 -]{7,}[0-9]', '<PHONE>', 'g') as text_redacted
            from t
        """,
        "repetition_stats": f"""
            with w as (select doc_id, string_split({norm}, ' ') as ws from documents),
            g as (select doc_id,
                         unnest(list_transform(range(1, greatest(len(ws) - 1, 0) + 1),
                                i -> ws[i] || ' ' || ws[i+1])) as gram
                  from w),
            pg as (select doc_id, gram, count(*) as cnt from g group by doc_id, gram)
            select doc_id, cast(sum(cnt) as bigint) as n_grams,
                   round((sum(cnt) - count(*)) / sum(cnt), 6) as dup_gram_frac,
                   round(max(cnt) / sum(cnt), 6) as top_gram_frac
            from pg group by doc_id
        """,
        "mixture_reweight": """
            with c as (select lang as stratum, count(*) as n_docs
                       from documents group by lang),
            t as (select sum(n_docs) as tot,
                         sum(exp(0.5 * ln(n_docs))) as wtot from c),
            p as (select stratum, n_docs, n_docs / tot as p,
                         exp(0.5 * ln(n_docs)) / wtot as q
                  from c, t),
            m as (select max(q / p) as rmax from p)
            select stratum, n_docs, round(p, 6) as p, round(q, 6) as q,
                   round((q / p) / rmax, 6) as sample_rate
            from p, m
        """,
        "segment_dedup": f"""
            with w as (select doc_id, string_split({norm}, ' ') as ws from documents),
            sp as (select doc_id, ws,
                          unnest(range(0, cast(ceil(len(ws) / 10.0) as int))) as pos
                   from w),
            seg as (select doc_id, pos,
                           array_to_string(list_transform(
                               range(pos*10 + 1, least((pos+1)*10, len(ws)) + 1),
                               j -> ws[j]), ' ') as seg
                    from sp),
            r as (select doc_id, pos, seg,
                         row_number() over (partition by seg
                                            order by doc_id, pos) as rn
                  from seg),
            k as (select doc_id, count(*) as n_kept,
                         string_agg(seg, ' ' order by pos) as text_clean
                  from r where rn = 1 group by doc_id),
            n as (select doc_id, cast(ceil(len(ws) / 10.0) as int) as n_segs from w)
            select n.doc_id, n.n_segs, coalesce(k.n_kept, 0) as n_kept,
                   coalesce(k.text_clean, '') as text_clean
            from n left join k on n.doc_id = k.doc_id
        """,
        "curation_pipeline": r"""
            with ft as (
              select doc_id, lang, source, text,
                     cast(len(list_filter(string_split_regex(trim(lower(text)), '\s+'), w -> w <> '')) as int) as n_words,
                     round((length(text) - (len(list_filter(string_split_regex(trim(lower(text)), '\s+'), w -> w <> '')) - 1)) * 1.0
                           / greatest(len(list_filter(string_split_regex(trim(lower(text)), '\s+'), w -> w <> '')), 1), 6) as mean_word_len,
                     round(length(regexp_replace(text, '[^[:punct:]]', '', 'g')) * 1.0
                           / greatest(length(text), 1), 6) as punct_ratio,
                     round(len(list_filter(string_split_regex(trim(lower(text)), '\s+'), w -> list_contains(['the', 'and', 'of', 'to', 'in', 'is', 'that', 'for', 'with', 'was'], w))) * 1.0
                           / greatest(len(list_filter(string_split_regex(trim(lower(text)), '\s+'), w -> w <> '')), 1), 6) as stopword_ratio
              from documents),
            scored as (
              select doc_id, lang, source, text,
                     round(least(
                       0.4 * stopword_ratio * 2.5
                       + 0.3 * (case when n_words >= 5 and mean_word_len >= 2 and mean_word_len <= 12
                                then 1.0 else 0.0 end)
                       + 0.3 * (1.0 - least(punct_ratio * 4, 1.0)), 1.0), 6) as quality
              from ft where round(least(
                       0.4 * stopword_ratio * 2.5
                       + 0.3 * (case when n_words >= 5 and mean_word_len >= 2 and mean_word_len <= 12
                                then 1.0 else 0.0 end)
                       + 0.3 * (1.0 - least(punct_ratio * 4, 1.0)), 1.0), 6) >= 0.62),
            w as (select doc_id, string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') as ws from documents),
            g as (select doc_id,
                         unnest(list_transform(range(1, greatest(len(ws) - 1, 0) + 1),
                                i -> ws[i] || ' ' || ws[i+1])) as gram
                  from w),
            pg as (select doc_id, gram, count(*) as cnt from g group by doc_id, gram),
            rep as (select doc_id,
                           round((sum(cnt) - count(*)) * 1.0 / sum(cnt), 6) as dup_gram_frac
                    from pg group by doc_id),
            kept as (select s.doc_id, s.lang, s.source, s.quality, rep.dup_gram_frac,
                            substr(s.text, 1, 20) as k
                     from scored s join rep using (doc_id)
                     where rep.dup_gram_frac <= 0.05),
            reps as (select k, min(doc_id) as rep_id from kept group by k),
            deduped as (select kept.* from kept join reps using (k)
                        where kept.doc_id = reps.rep_id)
            select doc_id, lang, source, quality, dup_gram_frac
            from deduped
            where ('0x' || substr(md5('strat:' || cast(doc_id as varchar)), 1, 8))::bigint
                  % 10000
                  < (case when lang = 'en' then 8000 else 5000 end)
        """,
        "spl_full": """
            with t as (
              select event_id,
                     '10.0.' || cast(user_id % 256 as varchar) || '.9,'
                         || cast(200 + (event_id % 3) * 50 as varchar) || ','
                         || cast(event_id % 1000 as varchar) as line,
                     '{"k":"' || event_type || '"}' as jline
              from events),
            p as (select event_id,
                         trim(string_split(line, ',')[1]) as addr,
                         trim(string_split(line, ',')[2]) as status,
                         trim(string_split(line, ',')[3]) as bytes,
                         json_extract_string(jline, '$.k') as k
                  from t)
            select event_id, addr, status,
                   cast(bytes as bigint) * 2 as kb, k
            from p where status = '250'
        """,
        "incremental_dedup": r"""
            with nb as (
              select doc_id + 100000 as doc_id, text from documents where doc_id % 5 = 0
              union all
              select doc_id, text || ' fresh suffix' as text from documents where doc_id % 5 = 1
              union all
              select doc_id + 200000 as doc_id, text || ' fresh suffix' as text
              from documents where doc_id % 5 = 1),
            keyed as (select doc_id,
                             md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) as dup_key
                      from nb),
            corpus as (select distinct md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) as dup_key
                       from documents),
            fresh as (select k.* from keyed k left join corpus c using (dup_key)
                      where c.dup_key is null),
            reps as (select dup_key, min(doc_id) as rep from fresh group by dup_key)
            select f.doc_id, f.dup_key from fresh f join reps using (dup_key)
            where f.doc_id = reps.rep
        """,
        "hash_split": """
            with b as (select source,
                              ('0x' || substr(md5(cast(doc_id as varchar)), 1, 8))::bigint
                                  % 10000 as bkt
                       from documents)
            select case when bkt < 9800 then 'train'
                        when bkt < 9900 then 'val'
                        else 'test' end as split,
                   source, cast(count(*) as bigint) as n_docs
            from b group by 1, 2
        """,
        "shuffle_head": """
            with r as (select doc_id,
                              row_number() over (order by
                                  ('0x' || substr(md5('42-' || cast(doc_id as varchar)), 1, 15))::bigint,
                                  cast(doc_id as varchar)) as shuffle_rank
                       from documents)
            select shuffle_rank, doc_id from r where shuffle_rank <= 100
        """,
        "winnow_fps": f"""
            with w0 as (select doc_id, string_split({norm}, ' ') as ws from documents),
            g as (select doc_id, i - 1 as pos,
                         ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] as gram
                  from w0, unnest(range(1, greatest(len(ws) - 2, 0) + 1)) as t(i)),
            keyed as (select doc_id, pos,
                             (('0x' || substr(md5(gram), 1, 15))::bigint % 1099511627776)
                                 * 1000000 + (999999 - pos) as key
                      from g),
            sel as (select doc_id, pos,
                           min(key) over (partition by doc_id order by pos
                                          rows between 3 preceding and current row) as skey,
                           max(pos) over (partition by doc_id) as maxpos
                    from keyed)
            select distinct doc_id, skey // 1000000 as fp,
                   999999 - (skey % 1000000) as fp_pos
            from sel where pos >= 3 or pos = maxpos
        """,
        "winnow_pairs": f"""
            with w0 as (select doc_id, string_split({norm}, ' ') as ws from documents),
            g as (select doc_id, i - 1 as pos,
                         ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] as gram
                  from w0, unnest(range(1, greatest(len(ws) - 2, 0) + 1)) as t(i)),
            keyed as (select doc_id, pos,
                             (('0x' || substr(md5(gram), 1, 15))::bigint % 1099511627776)
                                 * 1000000 + (999999 - pos) as key
                      from g),
            sel as (select doc_id, pos,
                           min(key) over (partition by doc_id order by pos
                                          rows between 3 preceding and current row) as skey,
                           max(pos) over (partition by doc_id) as maxpos
                    from keyed),
            fps as (select distinct doc_id, skey // 1000000 as fp
                    from sel where pos >= 3 or pos = maxpos),
            hot as (select fp from fps group by fp having count(*) > 50),
            cold as (select * from fps where fp not in (select fp from hot))
            select a.doc_id as id_a, b.doc_id as id_b,
                   cast(count(*) as bigint) as n_shared
            from cold a join cold b on a.fp = b.fp and a.doc_id < b.doc_id
            group by 1, 2 having count(*) >= 2
        """,
        "vocab_encode": f"""
            with w0 as (select doc_id, string_split({norm}, ' ') as ws from documents),
            w as (select doc_id, i - 1 as pos, ws[i] as word
                  from w0, unnest(range(1, len(ws) + 1)) as t(i)
                  where ws[i] <> ''),
            freq as (select word, count(*) as cnt from w group by word),
            topk as (select word, cnt from freq order by cnt desc, word limit 24),
            vocab as (select word,
                             row_number() over (order by cnt desc, word) as tok_id
                      from topk),
            enc as (select doc_id, pos, coalesce(tok_id, 0) as tok_id
                    from w left join vocab using (word))
            select doc_id, cast(count(*) as bigint) as n_tok,
                   cast(sum(case when tok_id = 0 then 1 else 0 end) as bigint) as n_oov,
                   round(sum(case when tok_id = 0 then 1 else 0 end)
                         / cast(count(*) as double), 6) as oov_rate,
                   array_to_string(list_transform(
                       list_slice(array_agg(tok_id order by pos), 1, 16),
                       x -> cast(x as varchar)), ',') as ids_head
            from enc group by doc_id
        """,
        "char_entropy": """
            with c as (select doc_id, unnest(string_split(text, '')) as ch
                       from documents),
            per as (select doc_id, ch, count(*) as cnt from c
                    where ch <> '' group by 1, 2),
            tot as (select doc_id, sum(cnt) as n from per group by 1)
            select per.doc_id, cast(max(n) as bigint) as n_chars_t,
                   round(-sum((cast(cnt as double) / n)
                              * ln(cast(cnt as double) / n)), 6) as entropy
            from per join tot using (doc_id)
            group by per.doc_id
        """,
        "skew_probe": """
            with counts as (select lang as key, count(*) as cnt
                            from documents group by 1),
            totals as (select cast(sum(cnt) as bigint) as n_rows,
                              cast(count(*) as bigint) as n_keys from counts)
            select key, cnt,
                   (cnt * 1000000) // n_rows as share_ppm,
                   (cnt * n_keys * 1000000) // n_rows as skew_ppm,
                   (cnt + 99) // 100 as recommended_salts,
                   n_rows, n_keys
            from counts, totals
            order by cnt desc, key limit 10
        """,
        "zipf_fit": f"""
            with w as (select unnest(string_split({norm}, ' ')) as word
                       from documents),
            freq as (select word, count(*) as cnt from w
                     where word <> '' group by 1),
            top as (select word, cnt,
                           row_number() over (order by cnt desc, word) as rank
                    from freq order by cnt desc, word limit 50)
            select cast(count(*) as bigint) as n_words_fit,
                   round(regr_slope(ln(cnt), ln(rank)), 5) as zipf_slope,
                   round(regr_r2(ln(cnt), ln(rank)), 5) as zipf_r2,
                   min(case when rank = 1 then word end) as top_word,
                   max(case when rank = 1 then cnt end) as top_cnt
            from top
        """,
        "dataset_card": f"""
            select source,
                   cast(count(*) as bigint) as n_docs,
                   cast(sum(len(string_split({norm}, ' '))) as bigint) as n_words,
                   cast(sum(length(text)) as bigint) as n_chars,
                   cast(min(len(string_split({norm}, ' '))) as int) as min_words,
                   cast(max(len(string_split({norm}, ' '))) as int) as max_words,
                   round(avg(len(string_split({norm}, ' '))), 6) as avg_words,
                   cast(sum(case when lang = 'en' then 1 else 0 end) as bigint) as docs_en,
                   cast(sum(case when lang = 'fr' then 1 else 0 end) as bigint) as docs_fr,
                   cast(sum(case when lang = 'es' then 1 else 0 end) as bigint) as docs_es,
                   cast(sum(case when lang = 'de' then 1 else 0 end) as bigint) as docs_de,
                   cast(sum(case when lang = 'zh' then 1 else 0 end) as bigint) as docs_zh
            from documents group by source
        """,
        "gopher_rules": f"""
            with w as (select doc_id, text,
                              string_split({norm}, ' ') as ws
                       from documents),
            ft as (select doc_id,
                          len(ws) as n_words,
                          round(list_sum(list_transform(ws, w -> length(w)))
                                / cast(greatest(len(ws), 1) as double), 6) as mean_word_len,
                          length(regexp_replace(text, '[^!-/:-@\\[-`{{-~]', '', 'g')) as punct,
                          len(list_filter(ws, w -> regexp_matches(w, '[a-z]'))) as alpha_words,
                          len(list_intersect(list_distinct(ws),
                              ['the','and','of','to','in','is','that','for','with','was'])) as sw_hits
                   from w)
            select doc_id, cast(n_words as int) as n_words, mean_word_len,
                   (n_words >= 20 and n_words <= 80) as r_word_count,
                   (mean_word_len >= 2.0 and mean_word_len <= 10.0) as r_mean_word_len,
                   (round(punct / cast(greatest(n_words, 1) as double), 6) <= 0.10) as r_punct,
                   (round(alpha_words / cast(greatest(n_words, 1) as double), 6) >= 0.80) as r_alpha,
                   (sw_hits >= 1) as r_stopword,
                   ((n_words >= 20 and n_words <= 80)
                    and (mean_word_len >= 2.0 and mean_word_len <= 10.0)
                    and (round(punct / cast(greatest(n_words, 1) as double), 6) <= 0.10)
                    and (round(alpha_words / cast(greatest(n_words, 1) as double), 6) >= 0.80)
                    and (sw_hits >= 1)) as keep
            from ft
        """,
        "keyword_tag": f"""
            with w as (select doc_id, string_split({norm}, ' ') as ws from documents),
            h as (select doc_id,
                         len(list_filter(ws, w -> list_contains(
                             ['spark','agg','sort','merge','batch','window'], w))) as compute_hits,
                         len(list_filter(ws, w -> list_contains(
                             ['table','row','part','hash','key','scan'], w))) as storage_hits,
                         len(list_filter(ws, w -> list_contains(
                             ['fast','slow','value','line'], w))) as perf_hits
                  from w)
            select doc_id,
                   cast(compute_hits as bigint) as compute_hits,
                   cast(storage_hits as bigint) as storage_hits,
                   cast(perf_hits as bigint) as perf_hits,
                   cast(compute_hits + storage_hits + perf_hits as bigint) as total_hits,
                   case when compute_hits > 0 and compute_hits >= storage_hits
                             and compute_hits >= perf_hits then 'compute'
                        when storage_hits > 0 and storage_hits >= compute_hits
                             and storage_hits >= perf_hits then 'storage'
                        when perf_hits > 0 and perf_hits >= compute_hits
                             and perf_hits >= storage_hits then 'perf'
                        else 'none' end as top_topic
            from h
        """,
        "cluster_survivors": """
            with recursive
            k as (select doc_id, substr(text, 1, 20) as pk, right(text, 20) as sk
                  from documents),
            e1 as (select a.doc_id as id_a, b.doc_id as id_b
                   from k a join k b on a.pk = b.pk and a.doc_id < b.doc_id),
            e2 as (select a.doc_id as id_a, b.doc_id as id_b
                   from k a join k b on a.sk = b.sk and a.doc_id < b.doc_id),
            edges as (select * from e1 union select * from e2),
            und as (select id_a as a, id_b as b from edges
                    union select id_b, id_a from edges),
            reach(node, r) as (
                select a, a from und
                union
                select u.a, reach.r from und u join reach on u.b = reach.node
            ),
            clusters as (select node as doc_id, min(r) as rep_doc_id
                         from reach group by node),
            m as (select c.doc_id, c.rep_doc_id, d.n_chars
                  from clusters c join documents d using (doc_id)),
            best as (select rep_doc_id, max(n_chars) as survivor_score
                     from m group by 1),
            surv as (select m.rep_doc_id, min(m.doc_id) as survivor_doc_id
                     from m join best using (rep_doc_id)
                     where m.n_chars = best.survivor_score group by 1)
            select m.doc_id, m.rep_doc_id, surv.survivor_doc_id,
                   cast(best.survivor_score as bigint) as survivor_score,
                   m.doc_id <> surv.survivor_doc_id as is_drop
            from m join best using (rep_doc_id) join surv using (rep_doc_id)
        """,
        "url_dedup": f"""
            with u as (
              select doc_id, {_URL_SYNTH.format(st="varchar")} as url
              from documents),
            c as (
              select doc_id,
                     regexp_replace(regexp_replace(url, '#.*$', ''),
                                    '^([A-Za-z][A-Za-z0-9+.\\-]*:)?//', '') as s
              from u),
            p as (
              select doc_id,
                     regexp_replace(regexp_replace(
                         lower(regexp_extract(s, '^([^/?]*)', 1)),
                         '^www\\.', ''), ':(80|443)$', '') as host,
                     regexp_replace(regexp_extract(regexp_replace(s, '^[^/?]*', ''),
                                                   '^([^?]*)', 1), '/+$', '') as path,
                     regexp_extract(regexp_replace(s, '^[^/?]*', ''),
                                    '\\?(.*)$', 1) as q
              from c),
            canon as (
              select doc_id,
                     host || path ||
                     case when qc <> '' then '?' || qc else '' end as url_canon
              from (select doc_id, host, path,
                           array_to_string(list_sort(list_filter(string_split(q, '&'),
                             x -> x <> '' and not regexp_matches(x,
                               '^(utm_[^=]*|gclid|fbclid|ref|mc_eid)(=.*)?$'))),
                             '&') as qc
                    from p))
            select doc_id, url_canon,
                   doc_id = min(doc_id) over (partition by url_canon) as is_kept,
                   count(*) over (partition by url_canon) as n_dups
            from canon
        """,
        "token_dup_rate": f"""
            with seqs as (select doc_id, {_TOK_SYNTH_DUCK} as tokens
                          from documents),
            g as (select doc_id,
                         md5(array_to_string(tokens[i:i+7], ',')) as key
                  from seqs,
                       unnest(range(1, greatest(len(tokens) - 7, 0) + 1)) as t(i)),
            dg as (select doc_id, key, count(*) as c from g group by 1, 2),
            gd as (select key, count(*) as n_docs from dg group by 1),
            pd as (select doc_id, sum(c) as n_grams,
                          sum(case when n_docs >= 2 then c else 0 end) as n_dup
                   from dg join gd using (key) group by 1)
            select s.doc_id,
                   cast(coalesce(pd.n_grams, greatest(len(s.tokens) - 7, 0))
                        as bigint) as n_grams,
                   cast(coalesce(pd.n_dup, 0) as bigint) as n_dup_grams,
                   case when coalesce(pd.n_grams, greatest(len(s.tokens) - 7, 0)) > 0
                        then round(coalesce(pd.n_dup, 0) /
                             cast(coalesce(pd.n_grams,
                                  greatest(len(s.tokens) - 7, 0)) as double), 6)
                        else 0.0 end as dup_rate
            from seqs s left join pd using (doc_id)
        """,
        "domain_quota": """
            with d as (select doc_id, source,
                              'site' || cast(doc_id % 7 as varchar) as domain
                       from documents),
            r as (select doc_id, source, domain,
                         row_number() over (partition by domain
                                            order by doc_id) as kept_rank
                  from d)
            select doc_id, source, domain, cast(kept_rank as int) as kept_rank
            from r where kept_rank <= 40
        """,
        "token_integrity": f"""
            with s as (
              select doc_id, source,
                     list_concat({_TOK_SYNTH_DUCK},
                       case when doc_id % 13 = 0 then [cast(9999 as int)]
                            when doc_id % 5 <> 0 then [cast(511 as int)]
                            else cast([] as int[]) end) as tokens
              from documents),
            n as (select *,
                         len(tokens) - case when doc_id % 17 = 0 then 1 else 0 end
                           as n_tok
                  from s),
            f as (select source,
                         case when n_tok <> len(tokens) then 1 else 0 end as mis,
                         case when len(list_filter(tokens,
                                x -> x < 0 or x >= 512)) > 0 then 1 else 0 end as oor,
                         case when len(tokens) = 0 or tokens[-1] <> 511
                              then 1 else 0 end as noeos,
                         case when len(tokens) = 0 then 1 else 0 end as emp,
                         len(tokens) as ntoks
                  from n)
            select source, count(*) as n_seqs,
                   cast(sum(mis) as bigint) as n_len_mismatch,
                   cast(sum(oor) as bigint) as n_out_of_range,
                   cast(sum(noeos) as bigint) as n_missing_eos,
                   cast(sum(emp) as bigint) as n_empty,
                   cast(0 as bigint) as n_null_payload,
                   cast(sum(ntoks) as bigint) as tok_total
            from f group by source
        """,
        "event_drift": """
            with e as (select strftime(ts, '%Y-%m-%d') as stratum,
                              case event_type when 'click' then 0
                                   when 'error' then 1
                                   when 'purchase' then 2
                                   when 'signup' then 3 else 4 end as t
                       from events),
            tok as (select stratum, t as _t, count(*) as c
                    from e group by 1, 2),
            totals as (select stratum, sum(c) as n_src from tok group by 1),
            gtok as (select _t, sum(c) as c_all from tok group by 1),
            nall as (select sum(c_all) as n_all from gtok),
            j as (select tok.stratum,
                         cast(tok.c as double) / cast(totals.n_src as double) as p,
                         cast(gtok.c_all as double) / cast(nall.n_all as double) as q
                  from tok join totals using (stratum)
                           join gtok using (_t), nall)
            select stratum,
                   cast(max(n_src) as bigint) as n_tok,
                   cast(count(*) as bigint) as n_distinct,
                   round(0.5 * sum(p * ln(2.0 * p / (p + q)))
                         + 0.5 * (sum(q * ln(2.0 * q / (p + q)))
                                  + 0.6931471805599453 * (1.0 - sum(q))), 6)
                     as js_div
            from j join totals using (stratum)
            group by stratum
        """,
        "fertility": f"""
            with d as (select source as stratum, text,
                              {_TOK_SYNTH_DUCK} as tokens
                       from documents),
            b as (select stratum,
                         cast(len(tokens) as bigint) as t,
                         cast(length(text) as bigint) as c,
                         cast(case when length(trim(text)) > 0
                              then len(regexp_split_to_array(trim(text), '\\s+'))
                              else 0 end as bigint) as w
                  from d)
            select stratum,
                   cast(count(*) as bigint) as n_docs,
                   cast(sum(t) as bigint) as tok_total,
                   cast(sum(c) as bigint) as char_total,
                   cast(sum(w) as bigint) as word_total,
                   round(sum(t) / cast(sum(c) as double), 6) as toks_per_char,
                   round(sum(t) / cast(sum(w) as double), 6) as toks_per_word
            from b group by stratum
        """,
        "dup_span_strip": f"""
            with seqs as (select doc_id, {_TOK_SYNTH_DUCK} as tokens
                          from documents),
            pg as (select doc_id, i as pos,
                          md5(array_to_string(tokens[i:i+7], ',')) as key
                   from seqs,
                        unnest(range(1, greatest(len(tokens) - 7, 0) + 1)) as t(i)),
            dk as (select key from (select distinct doc_id, key from pg)
                   group by key having count(*) >= 2),
            cov as (select distinct doc_id, cp
                    from pg join dk using (key),
                         unnest(range(pos, pos + 8)) as u(cp)),
            allpos as (select doc_id, p, tokens[p] as tokval
                       from seqs, unnest(range(1, len(tokens) + 1)) as pp(p)),
            keptpos as (select a.doc_id, a.p, a.tokval
                        from allpos a left join cov
                          on a.doc_id = cov.doc_id and a.p = cov.cp
                        where cov.cp is null),
            agg as (select doc_id,
                           string_agg(cast(tokval as varchar), ',' order by p)
                             as tokens_clean_csv,
                           count(*) as n_kept
                    from keptpos group by doc_id)
            select s.doc_id,
                   cast(len(s.tokens) as bigint) as n_tok,
                   cast(len(s.tokens) - coalesce(agg.n_kept, 0) as bigint)
                     as n_removed,
                   coalesce(agg.tokens_clean_csv, '') as tokens_clean_csv
            from seqs s left join agg using (doc_id)
        """,
        "source_overlap": f"""
            with seqs as (select source, {_TOK_SYNTH_DUCK} as tokens
                          from documents),
            g as (select distinct source as s,
                         md5(array_to_string(tokens[i:i+5], ',')) as key
                  from seqs,
                       unnest(range(1, greatest(len(tokens) - 5, 0) + 1)) as t(i)),
            sizes as (select s, count(*) as n from g group by 1),
            inter as (select a.s as src_a, b.s as src_b, count(*) as inter
                      from g a join g b on a.key = b.key and a.s < b.s
                      group by 1, 2)
            select src_a, src_b,
                   cast(sa.n as bigint) as grams_a,
                   cast(sb.n as bigint) as grams_b,
                   cast(inter as bigint) as inter,
                   round(inter / cast(sa.n + sb.n - inter as double), 6)
                     as jaccard
            from inter join sizes sa on sa.s = src_a
                       join sizes sb on sb.s = src_b
        """,
        "parse_csv": """
            select doc_id,
                   'v' || cast(doc_id as varchar) as c1,
                   'a,b-' || cast(doc_id % 5 as varchar) as c2,
                   'q"q-' || cast(doc_id % 3 as varchar) as c3,
                   source as c4
            from documents
        """,
        "tag_native": """
            select event_id,
                   '__hostname__=spark-node,__pipeline__=flagship,user='
                   || cast(user_id as varchar) as tags_csv
            from events
        """,
        "cms_counts": f"""
            with seqs as (select doc_id, {_TOK_SYNTH_DUCK} as tokens
                          from documents),
            bg as (select doc_id,
                          cast(tokens[i] as varchar) || ',' ||
                          cast(tokens[i + 1] as varchar) as bigram
                   from seqs, unnest(range(1, len(tokens))) as t(i)),
            cells as (select r,
                             cast(('0x' || substr(md5('cms' || cast(r as varchar)
                                  || ':' || bigram), 1, 15))::bigint % 512 as int)
                               as col,
                             count(*) as c
                      from bg, unnest(range(0, 4)) as rr(r)
                      group by 1, 2),
            probes as (select distinct bigram from bg where doc_id < 5),
            fan as (select p.bigram, rr.r,
                           cast(('0x' || substr(md5('cms' || cast(rr.r as varchar)
                                || ':' || p.bigram), 1, 15))::bigint % 512 as int)
                             as col
                    from probes p, unnest(range(0, 4)) as rr(r))
            select fan.bigram,
                   cast(min(coalesce(cells.c, 0)) as bigint) as est
            from fan left join cells on fan.r = cells.r and fan.col = cells.col
            group by fan.bigram
        """,
        "semdedup": """
            with v0 as (select vec_id,
                               list_transform(embedding, x -> cast(x as double)) as e
                        from embeddings),
            n as (select vec_id,
                         list_transform(e, x -> x / sqrt(list_sum(
                             list_transform(e, y -> y * y)))) as v
                  from v0),
            init as (select cast(row_number() over (order by vec_id) - 1 as int)
                              as cid,
                            v as c
                     from (select * from n order by vec_id limit 8)),
            a1 as (select vec_id, v, cid from (
                     select n.vec_id, n.v, i.cid,
                            row_number() over (partition by n.vec_id order by
                                round(-list_sum(list_transform(range(1, 65),
                                      j -> n.v[j] * i.c[j])), 9), i.cid) as rn
                     from n, init i) where rn = 1),
            c1raw as (select cid, j as pos, round(avg(v[j]), 9) as m
                      from a1, unnest(range(1, 65)) as t(j)
                      group by cid, j),
            c1l as (select cid, list(m order by pos) as cm from c1raw group by cid),
            c1 as (select cid, list_transform(cm, x -> x / sqrt(list_sum(
                       list_transform(cm, y -> y * y)))) as c
                   from c1l),
            a2 as (select vec_id, v, cid from (
                     select n.vec_id, n.v, i.cid,
                            row_number() over (partition by n.vec_id order by
                                round(-list_sum(list_transform(range(1, 65),
                                      j -> n.v[j] * i.c[j])), 9), i.cid) as rn
                     from n, c1 i) where rn = 1),
            p as (select b.vec_id, b.cid,
                         max(round(list_sum(list_transform(range(1, 65),
                             j -> a.v[j] * b.v[j])), 4)) as best
                  from a2 a join a2 b on a.cid = b.cid and a.vec_id < b.vec_id
                  group by b.vec_id, b.cid)
            select a2.vec_id, a2.cid as cluster,
                   coalesce(p.best >= 0.4, false) as is_dup,
                   p.best as max_earlier_cos
            from a2 left join p on a2.vec_id = p.vec_id and a2.cid = p.cid
        """,
        "source_drift": f"""
            with seqs as (select source, {_TOK_SYNTH_DUCK} as tokens
                          from documents),
            tok as (select source as stratum, t as _t, count(*) as c
                    from seqs, unnest(tokens) as u(t) group by 1, 2),
            totals as (select stratum, sum(c) as n_src from tok group by 1),
            gtok as (select _t, sum(c) as c_all from tok group by 1),
            nall as (select sum(c_all) as n_all from gtok),
            j as (select tok.stratum,
                         cast(tok.c as double) / cast(totals.n_src as double) as p,
                         cast(gtok.c_all as double) / cast(nall.n_all as double) as q
                  from tok join totals using (stratum)
                           join gtok using (_t), nall)
            select stratum,
                   cast(max(n_src) as bigint) as n_tok,
                   cast(count(*) as bigint) as n_distinct,
                   round(0.5 * sum(p * ln(2.0 * p / (p + q)))
                         + 0.5 * (sum(q * ln(2.0 * q / (p + q)))
                                  + 0.6931471805599453 * (1.0 - sum(q))), 6)
                     as js_div
            from j join totals using (stratum)
            group by stratum
        """,
        "token_budget": """
            with d as (select doc_id, source,
                              cast(24 + doc_id % 77 as bigint) as n_tok,
                              md5(cast(doc_id as varchar)) as h
                       from documents),
            c as (select doc_id, source as stratum, n_tok,
                         sum(n_tok) over (partition by source order by h
                                          rows unbounded preceding) as cum
                  from d)
            select doc_id, stratum, n_tok, cast(cum as bigint) as cum_tok
            from c
            where cum <= case when stratum = 'src3' then 400 else 900 end
        """,
        "chunk_sliding": f"""
            with seqs as (select doc_id, {_TOK_SYNTH_DUCK} as tokens
                          from documents),
            s as (select doc_id, tokens, len(tokens) as n from seqs),
            st as (select doc_id, tokens, n, cast(i as int) as chunk_start,
                          cast(row_number() over (partition by doc_id
                                                  order by i) - 1 as int)
                            as chunk_id
                   from s, unnest(range(1, n + 1, 24)) as t(i)
                   where n - i + 1 >= 8)
            select doc_id, chunk_id, chunk_start,
                   array_to_string(list_transform(
                       tokens[chunk_start:chunk_start + 31],
                       x -> cast(x as varchar)), ',') as chunk_csv,
                   cast(least(32, n - chunk_start + 1) as int) as n_chunk_tok
            from st
        """,
        "line_dedup": """
            with d as (select doc_id,
                              'hdr-' || source || chr(10) || text || chr(10)
                              || 'hdr-' || source || chr(10) || text || chr(10)
                              || 'tail-' || cast(doc_id % 3 as varchar) as content
                       from documents),
            l as (select doc_id, string_split(content, chr(10)) as ls from d),
            e as (select doc_id, i, ls[i] as line, len(ls) as n_lines
                  from l, unnest(range(1, len(ls) + 1)) as t(i)),
            k as (select * from e
                  qualify row_number() over (partition by doc_id, line
                                             order by i) = 1)
            select doc_id, cast(max(n_lines) as int) as n_lines,
                   cast(max(n_lines) - count(*) as int) as n_removed,
                   string_agg(line, chr(10) order by i) as content_clean
            from k group by doc_id
        """,
        "batch_cut": """
            with r as (
              select event_type, date_trunc('minute', ts) as minute, ts, event_id,
                     row_number() over (partition by event_type, date_trunc('minute', ts)
                                        order by ts, event_id) as rn
              from events)
            select event_type, minute, cast(floor((rn - 1) / 50) as bigint) as batch_seq,
                   count(*) as n_events, min(ts) as first_ts, max(ts) as last_ts
            from r group by 1, 2, 3
        """,
        "grok_syslog": f"""
            with lines as (
              select event_id,
                     strftime(ts, '%b %d %H:%M:%S') || ' host-' || (user_id % 50)
                     || ' app-' || event_type || '[' || (event_id % 997 + 1)
                     || ']: value ' || cast("value" as varchar) as content
              from events where event_id < 2000)
            select event_id,
                   regexp_extract(content, '{syslog_anch}', {_sgrp("timestamp")}) as sl_ts,
                   regexp_extract(content, '{syslog_anch}', {_sgrp("logsource")}) as logsource,
                   regexp_extract(content, '{syslog_anch}', {_sgrp("program")}) as program,
                   regexp_extract(content, '{syslog_anch}', {_sgrp("pid")}) as pid,
                   regexp_extract(content, '{syslog_anch}', {_sgrp("msg")}) as msg
            from lines
        """,
        # Frozen known-answer rows for the closed OTEL_TRACE_FIXTURE inputs
        # (hand-verified against otlp_trace_parser.go's conversion): doc 3 is
        # malformed (dropped), doc 4 has an empty resourceSpans (no rows).
        "otel_trace": """
            select * from (values
            (1, 'node-1', 'checkout', '{"debug":"true","env":"prod","replica":"3"}', 'io.otel.http', '1.19.0', '0af7651916cd43dd8448eb211c80319c', '00f067aa0ba902b7', '', 'client', 'charge', '[]', '[]', '', 1700000001100000, 1700000001400000, 300000, '{}', 'ERROR', 'card declined', 1700000001),
            (1, 'node-1', 'checkout', '{"debug":"true","env":"prod","replica":"3"}', 'io.otel.http', '1.19.0', '0af7651916cd43dd8448eb211c80319c', 'b7ad6b7169203331', 'eee19b7ec3c1b174', 'server', 'GET /cart', '[{"attribute":{"peer":"gw"},"spanID":"f067aa0ba902b7e3","traceID":"4bf92f3577b34da6a3ce929d0e0e4736"}]', '[{"attribute":{"tier":"l2"},"name":"cache.hit","time":1700000001200000000}]', 'congo=t61rcWkgMzE', 1700000001000000, 1700000001500000, 500000, '{"http.method":"GET","http.status_code":"200"}', 'OK', '', 1700000001),
            (2, '', '', '{"k8s.pod":"p-9"}', 'manual', '', '11111111111111111111111111111111', '2222222222222222', '', 'producer', 'emit', '[]', '[]', '', 1700000002000000, 1700000002000500, 500, '{}', 'UNSET', '', 1700000002),
            (2, '', '', '{"k8s.pod":"p-9"}', 'manual', '', '11111111111111111111111111111111', '3333333333333333', '2222222222222222', '', 'flush', '[]', '[]', '', 1700000002100000, 1700000002100250, 250, '{}', 'UNSET', '', 1700000002)
            ) as t(doc_id, host, service, resource, otlp_name, otlp_version,
                   "traceID", "spanID", "parentSpanID", kind, name, links, logs,
                   "traceState", start, "end", duration, attribute,
                   "statusCode", "statusMessage", time)
        """,
        "otel_metric": """
            select * from (values
            (1, 'cpu_usage', 'core#$#0|region#$#eu-1|service.name#$#checkout', 1700000003500000000, cast(0.75 as double)),
            (1, 'http_requests', 'code#$#200|region#$#eu-1|service.name#$#checkout', 1700000003000000000, cast(42.0 as double)),
            (1, 'http_requests', 'code#$#500|region#$#eu-1|service.name#$#checkout', 1700000003000000000, cast(7.0 as double))
            ) as t(doc_id, "__name__", "__labels__", "__time_nano__", "__value__")
        """,
        "asof_enrich": """
            select l.event_id, l.ts, l.user_id,
                   l.value as click_value,
                   r.ts as purchase_ts,
                   r.event_id as purchase_event_id,
                   r.value as purchase_value,
                   round((epoch_us(l.ts) - epoch_us(r.ts)) / 1000000.0, 6) as lag_sec
            from (select * from events where event_type = 'click') l
            asof left join (select * from events where event_type = 'purchase') r
              on l.user_id = r.user_id and l.ts >= r.ts
        """,
        "asof_tolerance": """
            with j as (
                select l.event_id, l.ts, l.user_id,
                       r.ts as pts, r.event_id as pid, r.value as pval,
                       epoch_us(l.ts) - epoch_us(r.ts) as lag_us
                from (select * from events where event_type = 'click') l
                asof left join (select * from events where event_type = 'purchase') r
                  on l.user_id = r.user_id and l.ts >= r.ts
            )
            select event_id, ts, user_id,
                   case when lag_us > 3600000000 then null else pts end as purchase_ts,
                   case when lag_us > 3600000000 then null else pid end as purchase_event_id,
                   case when lag_us > 3600000000 then null else pval end as purchase_value
            from j
        """,
        "time_rollup": """
            -- exact integer-cents aggregation + one IEEE division per output:
            -- bit-deterministic vs the Spark side (see q_time_rollup docstring)
            select date_trunc('hour', ts) as bucket,
                   event_type,
                   count(*) as n_rows,
                   sum(c) / 100.0 as sum_v,
                   sum(c) / (count(*) * 100.0) as avg_v,
                   min(c) / 100.0 as min_v,
                   max(c) / 100.0 as max_v
            from (select ts, event_type,
                         cast(round(value * 100) as bigint) as c
                  from events)
            group by 1, 2
        """,
        "percentile_panel": """
            select event_type,
                   count(value) as n,
                   round(min(value), 6) as min_v,
                   round(max(value), 6) as max_v,
                   round(quantile_cont(value, 0.5), 6) as p50,
                   round(quantile_cont(value, 0.9), 6) as p90,
                   round(quantile_cont(value, 0.99), 6) as p99
            from events group by event_type
        """,
        "hll_users": f"""
            with h as (select event_type,
                              ('0x' || substr(md5(cast(user_id as varchar)), 1, 15))::bigint as hv,
                              cast(user_id as varchar) as item
                       from events),
            r as (select event_type, hv & 15 as bucket,
                         case when (hv >> 4) > 0
                              then 56 - length(bin(hv >> 4)) + 1 else 57 end as rho,
                         item from h),
            regs as (select event_type, bucket, max(rho) as max_rho,
                            count(distinct item) as n_exact_b
                     from r group by 1, 2),
            summed as (select event_type,
                              sum((1::bigint) << (57 - max_rho)) as z_nonzero,
                              count(*) as nonzero_buckets,
                              sum(n_exact_b) as n_exact
                       from regs group by 1),
            fin as (select event_type, n_exact, nonzero_buckets,
                           z_nonzero + (16 - nonzero_buckets) * ((1::bigint) << 57) as z,
                           16 - nonzero_buckets as zeros
                    from summed),
            est as (select *, {_hll_a16!r} / cast(z as double) as raw from fin),
            fin2 as (select *,
                            case when raw <= 40.0 and zeros > 0
                                 then 16.0 * ln(16.0 / cast(zeros as double))
                                 else raw end as e
                     from est)
            select event_type,
                   cast(n_exact as bigint) as n_exact,
                   round(e, 2) as n_est,
                   round(abs(e - n_exact) / n_exact, 4) as rel_err,
                   cast(16 as int) as m,
                   cast(nonzero_buckets as bigint) as nonzero_buckets,
                   cast(z as bigint) as z_scaled
            from fin2
        """,
        "rollup_sources": """
            select case when grouping(source) = 1 then '(all)'
                        else coalesce(cast(source as varchar), '(null)') end as source,
                   case when grouping(lang) = 1 then '(all)'
                        else coalesce(cast(lang as varchar), '(null)') end as lang,
                   cast(grouping(source, lang) as bigint) as gid,
                   count(*) as n_rows,
                   cast(sum(n_chars) as bigint) as sum_n_chars,
                   round(avg(n_chars), 6) as avg_n_chars
            from documents group by rollup(source, lang)
        """,
        "threshold_sweep": f"""
            with pd as (select len(string_split({norm}, ' ')) as nw from documents),
            j as (select nw, t.threshold from pd
                  cross join (values (0), (20), (40), (60), (80), (100)) t(threshold))
            select threshold,
                   cast(sum(case when nw >= threshold then 1 else 0 end) as bigint) as kept_docs,
                   cast(sum(case when nw >= threshold then nw else 0 end) as bigint) as kept_words,
                   cast(count(*) as bigint) as total_docs,
                   round(sum(case when nw >= threshold then 1 else 0 end)
                         / cast(count(*) as double), 6) as doc_frac,
                   round(sum(case when nw >= threshold then nw else 0 end)
                         / cast(sum(nw) as double), 6) as word_frac
            from j group by threshold
        """,
        "length_histogram": f"""
            with pd as (select lang, len(string_split({norm}, ' ')) as nw
                        from documents),
            b as (select lang, nw,
                         least(greatest(cast(floor((nw - 0) / 10.0) as int), 0), 9) as bin
                  from pd)
            select lang, bin,
                   round(0 + bin * 10.0, 6) as bin_lo,
                   round(0 + (bin + 1) * 10.0, 6) as bin_hi,
                   count(*) as n_docs,
                   cast(sum(nw) as bigint) as n_words
            from b group by lang, bin
        """,
        "boilerplate_strip": f"""
            with w0 as (select doc_id, string_split({norm}, ' ') as ws from documents),
            segs as (select doc_id, i - 1 as pos,
                            array_to_string(ws[(i-1)*2+1:(i-1)*2+2], ' ') as seg
                     from w0, unnest(range(1, cast(ceil(len(ws)/2.0) as bigint) + 1)) as t(i)),
            hot as (select seg from (select seg, count(distinct doc_id) as nd
                                     from segs group by seg) where nd >= 25),
            kept as (select * from segs where seg not in (select seg from hot)),
            reb as (select doc_id, cast(count(*) as bigint) as n_kept,
                           string_agg(seg, ' ' order by pos) as text_clean
                    from kept group by doc_id),
            tot as (select doc_id, cast(count(*) as bigint) as n_segs from segs group by doc_id)
            select tot.doc_id, tot.n_segs,
                   coalesce(reb.n_kept, 0) as n_kept,
                   coalesce(reb.text_clean, '') as text_clean
            from tot left join reb using (doc_id)
        """,
        "quality_classifier": f"""
            with w0 as (select doc_id, string_split({norm}, ' ') as ws from documents),
            uni as (select doc_id, unnest(ws) as g from w0),
            bi as (select doc_id, ws[i] || ' ' || ws[i+1] as g
                   from w0, unnest(range(1, greatest(len(ws) - 1, 0) + 1)) as t(i)),
            grams as (select * from uni union all select * from bi),
            b as (select doc_id,
                         ('0x' || substr(md5('q:' || g), 1, 8))::bigint % 1024 as bkt
                  from grams),
            s as (select doc_id, count(*) as n_grams,
                         sum(bkt * 2654435761 % 997 - 498) as wsum
                  from b group by doc_id)
            select doc_id, cast(n_grams as int) as n_grams,
                   round(1.0 / (1.0 + exp(-(cast(wsum as double) / (498.0 * n_grams)))), 6)
                       as clf_score
            from s
        """,
        "bigram_logprob": f"""
            with w0 as (select doc_id, string_split({norm}, ' ') as ws from documents),
            bg as (select doc_id, ws[i] as w1, ws[i+1] as w2
                   from w0, unnest(range(1, greatest(len(ws) - 1, 0) + 1)) as t(i)),
            per as (select doc_id, w1, w2, count(*) as tf from bg group by 1, 2, 3),
            big as (select w1, w2, sum(tf) as c12 from per group by 1, 2),
            hist as (select w1, sum(c12) as c1 from big group by 1),
            uni as (select w2, sum(c12) as c2 from big group by 1),
            tot as (select sum(c2) as tot, count(*) as vocab from uni),
            lm as (select w1, w2,
                          ln(cast(0.7 as double) * cast(c12 as double) / c1
                             + (cast(1.0 as double) - cast(0.7 as double))
                               * cast(c2 + 1 as double) / cast(tot + vocab as double)) as lp
                   from big join hist using (w1) join uni using (w2), tot)
            select per.doc_id, cast(sum(per.tf) as bigint) as n_bigrams,
                   round(-sum(per.tf * lm.lp) / sum(per.tf), 6) as avg_nll
            from per join lm using (w1, w2)
            group by per.doc_id
        """,
        "length_batching": """
            with r as (select source, doc_id, cast(n_chars as bigint) as len,
                              row_number() over (partition by source
                                  order by cast(n_chars as bigint),
                                           cast(doc_id as varchar)) as rn
                       from documents),
            b as (select source, (rn - 1) // 32 as batch_id, len from r)
            select source, batch_id, cast(count(*) as bigint) as n_rows,
                   min(len) as min_len, max(len) as max_len,
                   cast(sum(len) as bigint) as sum_len,
                   round(1.0 - cast(sum(len) as double)
                             / cast(count(*) * max(len) as double), 6) as pad_frac
            from b group by 1, 2
        """,
        "bloom_dedup": f"""
            with ck as (select md5({norm}) as key from documents),
            cpos as (select ('0x' || substr(md5(i || ':' || key), 1, 15))::bigint
                                % 16384 as p
                     from ck, unnest([0, 1, 2]) as t(i)),
            bm as (select p // 63 as word_idx,
                          bit_or(1::bigint << cast(p % 63 as int)) as mask
                   from cpos group by 1),
            batch as (select doc_id + 100000 as doc_id, md5({norm}) as key
                      from documents where doc_id % 5 = 0
                      union all
                      select doc_id + 200000 as doc_id,
                             md5(trim(regexp_replace(lower(text || ' fresh suffix'),
                                 '\\s+', ' ', 'g'))) as key
                      from documents where doc_id % 5 = 1),
            probe as (select doc_id,
                             ('0x' || substr(md5(i || ':' || key), 1, 15))::bigint
                                 % 16384 as p
                      from batch, unnest([0, 1, 2]) as t(i)),
            hit as (select doc_id,
                           min(case when ((coalesce(mask, 0) >> cast(p % 63 as int)) & 1) = 1
                                    then 1 else 0 end) as all_hit
                    from probe left join bm on probe.p // 63 = bm.word_idx
                    group by doc_id)
            select doc_id, all_hit = 1 as maybe_dup from hit
        """,
        "unigram_logprob": r"""
            with w as (select doc_id,
                              unnest(string_split(trim(regexp_replace(lower(text),
                                  '\s+', ' ', 'g')), ' ')) as word
                       from documents),
            per as (select doc_id, word, count(*) as tf from w
                    where word <> '' group by doc_id, word),
            lm as (select word, sum(tf) as cnt from per group by word),
            tot as (select sum(cnt) as tot, count(*) as vocab from lm),
            lp as (select word,
                          ln(cast(cnt + 1 as double)
                             / cast(tot + vocab as double)) as lp
                   from lm, tot)
            select per.doc_id, cast(sum(per.tf) as bigint) as n_words,
                   round(-sum(per.tf * lp.lp) / sum(per.tf), 6) as avg_nll
            from per join lp using (word)
            group by per.doc_id
        """,
        "tfidf_topk": r"""
            with w as (select doc_id,
                              unnest(string_split(trim(regexp_replace(lower(text),
                                  '\s+', ' ', 'g')), ' ')) as term
                       from documents),
            per as (select doc_id, term, count(*) as tf from w
                    where term <> '' group by doc_id, term),
            dfreq as (select term, count(*) as df_cnt from per group by term),
            nd as (select count(distinct doc_id) as n from documents),
            scored as (select per.doc_id, per.term,
                              round(per.tf * ln(cast(n as double) / df_cnt), 6)
                                  as score
                       from per join dfreq using (term), nd),
            r as (select doc_id, term, score,
                         row_number() over (partition by doc_id
                                            order by score desc, term) as rk
                  from scored)
            select doc_id, term, score, rk from r where rk <= 3
        """,
        "length_band": """
            with thr as (select quantile_cont(cast(n_chars as double), 0.05) as lo,
                                quantile_cont(cast(n_chars as double), 0.95) as hi
                         from documents)
            select doc_id, n_chars from documents, thr
            where cast(n_chars as double) >= lo and cast(n_chars as double) <= hi
        """,
        "embed_quantize": """
            with v as (select vec_id, len(embedding) as dim,
                              greatest(list_max(list_transform(embedding,
                                  x -> abs(cast(x as double)))), 1e-12) as m,
                              embedding
                       from embeddings),
            q as (select vec_id, dim, m,
                         list_transform(embedding,
                             x -> cast(floor(cast(x as double) * 127.0 / m + 0.5)
                                       as bigint)) as qv
                  from v)
            select vec_id, dim, round(m / 127.0, 6) as scale6,
                   cast(list_sum(qv) as bigint) as q_sum,
                   cast(list_min(qv) as bigint) as q_min,
                   cast(list_max(qv) as bigint) as q_max
            from q
        """,
        "ngram_jaccard": f"""
            with w as (select doc_id, string_split({norm}, ' ') as ws from documents),
            g0 as (
              select distinct doc_id, gram from (
                select doc_id,
                       unnest(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])) as gram
                from w)
            ),
            dfc as (select gram, count(*) as df_cnt from g0 group by 1),
            g as (select g0.doc_id, g0.gram from g0 join dfc using (gram) where df_cnt <= 100),
            sz as (select doc_id, count(*) as sz from g group by 1),
            inter as (
              select a.doc_id as ia, b.doc_id as ib, count(*) as n_inter
              from g a join g b on a.gram = b.gram and a.doc_id < b.doc_id
              group by 1, 2)
            select ia as id_a, ib as id_b,
                   round(n_inter * 1.0 / (sa.sz + sb.sz - n_inter), 6) as jaccard
            from inter
            join sz sa on sa.doc_id = ia
            join sz sb on sb.doc_id = ib
            where round(n_inter * 1.0 / (sa.sz + sb.sz - n_inter), 6) >= 0.3
        """,
        "minhash_lsh_md5": f"""
            with w as (select doc_id, string_split({norm}, ' ') as ws from documents),
            g as (
              select distinct doc_id, gram from (
                select doc_id,
                       unnest(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])) as gram
                from w)
            ),
            sig as (
              select doc_id, j,
                     min(cast(('0x' || substr(md5(gram || '#' || j), 1, 15)) as bigint)) as h
              from g cross join (select unnest(range(16)) as j)
              group by doc_id, j
            ),
            bands as (
              select doc_id, cast(j // 2 as int) as band,
                     cast(('0x' || substr(md5(string_agg(cast(h as varchar), ','
                                                         order by j)), 1, 15)) as bigint) as bh
              from sig group by doc_id, j // 2
            ),
            keepb as (
              select band, bh from bands group by band, bh having count(*) <= 100
            ),
            bands2 as (select b.* from bands b join keepb using (band, bh)),
            cand as (
              select distinct a.doc_id as id_a, b.doc_id as id_b
              from bands2 a join bands2 b
                on a.band = b.band and a.bh = b.bh and a.doc_id < b.doc_id
            ),
            gs as (select doc_id, count(*) as sz from g group by 1),
            inter as (
              select a.doc_id as ia, b.doc_id as ib, count(*) as n_inter
              from g a join g b on a.gram = b.gram and a.doc_id < b.doc_id
              group by 1, 2
            )
            select c.id_a, c.id_b,
                   round(coalesce(i.n_inter, 0) * 1.0
                         / (sa.sz + sb.sz - coalesce(i.n_inter, 0)), 6) as jaccard
            from cand c
            join gs sa on sa.doc_id = c.id_a
            join gs sb on sb.doc_id = c.id_b
            left join inter i on i.ia = c.id_a and i.ib = c.id_b
            where round(coalesce(i.n_inter, 0) * 1.0
                        / (sa.sz + sb.sz - coalesce(i.n_inter, 0)), 6) >= 0.3
        """,
        "charset_jaccard": """
            with ch as (select doc_id, lang, list_distinct(string_split(text, '')) as cs
                        from documents where doc_id < 200)
            select a.doc_id as id_a, b.doc_id as id_b,
                   round(len(list_intersect(a.cs, b.cs)) * 1.0
                         / len(list_distinct(list_concat(a.cs, b.cs))), 6) as jaccard
            from ch a join ch b on a.lang = b.lang and a.doc_id < b.doc_id
            where round(len(list_intersect(a.cs, b.cs)) * 1.0
                        / len(list_distinct(list_concat(a.cs, b.cs))), 6) >= 0.9
        """,
        "simhash_dups_md5": r"""
            with d as (select doc_id, text from documents where doc_id < 500),
            tok as (
              select doc_id, unnest(list_filter(string_split_regex(trim(lower(text)), '\s+'), w -> w <> '')) as tok
              from d where length(trim(text)) > 0),
            h as (select doc_id, cast(('0x' || substr(md5(tok), 1, 15)) as bigint) as h from tok),
            votes as (
              select doc_id, b,
                     sum(case when (h >> b) & 1 = 1 then 1 else -1 end) as vote
              from h cross join (select unnest(range(60)) as b)
              group by 1, 2),
            sim as (
              select doc_id,
                     cast(sum(case when vote > 0 then (cast(1 as bigint) << b) else 0 end)
                          as bigint) as s
              from votes group by 1),
            allsim as (
              select d.doc_id, coalesce(sim.s, 0) as s from d left join sim using (doc_id)),
            blocks0 as (
              select doc_id, s, b as blk, (s >> (b * 7)) & 127 as bits
              from allsim cross join (select unnest(range(8)) as b)),
            bcnt as (select blk, bits, count(*) as c from blocks0 group by 1, 2),
            blocks as (
              select b.doc_id, b.s, b.blk, b.bits
              from blocks0 b join bcnt using (blk, bits) where c <= 100),
            cand as (
              select distinct a.doc_id as id_a, c.doc_id as id_b,
                     bit_count(xor(a.s, c.s)) as hamming
              from blocks a join blocks c
                on a.blk = c.blk and a.bits = c.bits and a.doc_id < c.doc_id)
            select id_a, id_b, cast(hamming as int) as hamming from cand where hamming <= 7
        """,
        "embedding_dups": """
            select a.vec_id as id_a, b.vec_id as id_b,
                   round(list_cosine_similarity(cast(a.embedding as double[]),
                                                cast(b.embedding as double[])), 4) as cos
            from embeddings a join embeddings b on a.vec_id < b.vec_id
            where round(list_cosine_similarity(cast(a.embedding as double[]),
                                               cast(b.embedding as double[])), 4) >= 0.4
        """,
        "embedding_dups_lsh": _lsh_oracle_sql(),
        "language_id": f"""
            with s as (
              select doc_id,
                     len(list_intersect(list_distinct({words}), {sw['en']})) as s_en,
                     len(list_intersect(list_distinct({words}), {sw['fr']})) as s_fr,
                     len(list_intersect(list_distinct({words}), {sw['es']})) as s_es,
                     len(list_intersect(list_distinct({words}), {sw['de']})) as s_de
              from documents)
            select doc_id, case
              when s_en > 0 and s_en >= s_fr and s_en >= s_es and s_en >= s_de then 'en'
              when s_fr > 0 and s_fr >= s_en and s_fr >= s_es and s_fr >= s_de then 'fr'
              when s_es > 0 and s_es >= s_en and s_es >= s_fr and s_es >= s_de then 'es'
              when s_de > 0 and s_de >= s_en and s_de >= s_fr and s_de >= s_es then 'de'
              else 'und' end as lang_pred
            from s
        """,
        "quality_score": f"""
            with ft as (
              select doc_id,
                     cast(len({words}) as int) as n_words,
                     round((length(text) - (len({words}) - 1)) * 1.0
                           / greatest(len({words}), 1), 6) as mean_word_len,
                     round(length(regexp_replace(text, '[^[:punct:]]', '', 'g')) * 1.0
                           / greatest(length(text), 1), 6) as punct_ratio,
                     round(len(list_filter({words}, w -> list_contains({sw['en']}, w))) * 1.0
                           / greatest(len({words}), 1), 6) as stopword_ratio
              from documents)
            select doc_id, n_words, mean_word_len, punct_ratio, stopword_ratio,
                   round(least(
                     0.4 * stopword_ratio * 2.5
                     + 0.3 * (case when n_words >= 5 and mean_word_len >= 2 and mean_word_len <= 12
                              then 1.0 else 0.0 end)
                     + 0.3 * (1.0 - least(punct_ratio * 4, 1.0)), 1.0), 6) as quality
            from ft
        """,
        "token_count_bpe": f"""
            select doc_id, cast(len({words}) as int) as n_ws_tokens,
                   cast(len(regexp_extract_all(text, '{BPE_ISH}')) as int) as n_bpe_tokens
            from documents
        """,
        "fingerprint": f"""
            select doc_id, md5({norm}) as fp_md5,
                   cast(('0x' || substr(md5({norm}), 1, 15)) as bigint) as fp64
            from documents
        """,
        "grok": f"""
            select doc_id,
                   regexp_extract(text, '{grok_anch}', 1) as w1,
                   regexp_extract(text, '{grok_anch}', 2) as w2,
                   cast(length(regexp_extract(text, '{grok_anch}', 3)) as int) as rest_len
            from documents
        """,
        "json_flatten": """
            select l_orderkey, cast(l_orderkey as varchar) as a_b, l_returnflag as c
            from lineitem where l_linenumber = 1
        """,
        "windowed_counts": """
            select make_timestamp(cast(floor(epoch(ts) / 300) * 300 * 1000000 as bigint)) as window_start,
                   event_type, count(*) as n_rows, round(sum("value"), 4) as value_sum
            from events group by 1, 2
        """,
        "tpch_q6": """
            select cast(sum(cast(cast(l_extendedprice as decimal(18,2))
                        * cast(l_discount as decimal(18,2)) as decimal(28,4))) as double) as revenue,
                   count(*) as n_rows
            from lineitem
            where l_shipdate >= timestamp '1995-01-01' and l_shipdate < timestamp '1996-01-01'
              and l_discount between 0.03 and 0.05 and l_quantity < 24
        """,
        "spl_stats": r"""
            with p as (
              select regexp_extract(text, '(\w+) (\w+)', 1) as w1 from documents
            )
            select w1, count(*) as n from p where w1 != ''
            group by w1 order by n desc, w1 limit 10
        """,
        "spl_kv": """
            select event_id, cast(user_id as varchar) as "user", event_type as et,
                   '{"user":"' || cast(user_id as varchar) || '","et":"' || event_type || '"}'
                     as packed
            from events where event_type != ''
        """,
        "multiline_merge": """
            with l as (
              select user_id as stream_id,
                     cast(row_number() over (partition by user_id order by ts, event_id) as int)
                       as line_no,
                     event_type as content
              from events),
            t as (
              select *, sum(case when content = 'signup' then 1 else 0 end)
                          over (partition by stream_id order by line_no
                                rows unbounded preceding) as evt
              from l)
            select stream_id, cast(evt as bigint) as event_seq,
                   cast(min(line_no) as int) as line_no,
                   string_agg(content, chr(10) order by line_no) as content,
                   count(*) as n_lines
            from t
            group by stream_id, evt, case when evt = 0 then line_no end
        """,
        "rate_limit": """
            select user_id, event_id from (
              select user_id, event_id,
                     row_number() over (partition by user_id, floor(epoch(ts) / 3600)
                                        order by ts, event_id) as rn
              from events
            ) where rn <= 2
        """,
        # ------------------------------------------------------------------
        # round-5 adds: container stdout, prometheus, LSH fixture oracles
        # ------------------------------------------------------------------
        "parse_container": """
            with e as (
              select event_id, event_id % 7 as mode,
                '2024-01-01T' || lpad(cast(event_id % 24 as varchar), 2, '0')
                  || ':00:00.' || lpad(cast((event_id * 7919) % 1000000000 as varchar), 9, '0')
                  || 'Z' as t,
                case when event_id % 10 < 7 then 'stdout' else 'stderr' end as strm,
                'evt=' || event_type || ' u=' || cast(user_id as varchar) as payload
              from events where event_id < 4000)
            select event_id,
              case when mode <= 4 then t end as "_time_",
              case when mode <= 4 then strm end as "_source_",
              case mode
                when 3 then 'P' || payload
                when 4 then 'PP ' || payload
                when 5 then t || ' badstream F ' || payload
                when 6 then t
                else payload end as content,
              (mode = 1) as is_partial,
              (mode <= 4) as parse_ok
            from e
        """,
        "parse_container_docker": """
            with e as (
              select event_id, event_id % 7 as mode,
                '2024-01-01T' || lpad(cast(event_id % 24 as varchar), 2, '0')
                  || ':00:00.' || lpad(cast((event_id * 7919) % 1000000000 as varchar), 9, '0')
                  || 'Z' as t,
                case when event_id % 10 < 7 then 'stdout' else 'stderr' end as strm,
                'evt=' || event_type || ' u=' || cast(user_id as varchar) as payload
              from events where event_id < 4000)
            select event_id,
              case when mode <= 3 then t end as "_time_",
              case when mode <= 3 then strm end as "_source_",
              case mode
                when 4 then '{"log1":"' || payload || '\\n","stream":"' || strm
                            || '","time":"' || t || '"}'
                when 5 then '{"log":"' || payload || '\\n","stream":"' || strm
                            || '","time":' || cast(event_id as varchar) || '}'
                when 6 then '{"log":"' || payload || '\\n","stream":"' || strm
                            || '","time":"' || t || '","attrs":"x"}'
                else payload end as content,
              false as is_partial,
              (mode <= 3) as parse_ok
            from e
        """,
        "container_stitch": """
            with e as (
              select event_id, user_id, event_id % 4 as mode,
                'evt=' || event_type || ' u=' || cast(user_id as varchar) as payload
              from events where event_id < 4000),
            seq as (
              select user_id, event_id, payload, (mode in (1, 2)) as is_partial,
                cast(coalesce(sum(case when mode in (1, 2) then 0 else 1 end)
                  over (partition by user_id order by event_id
                        rows between unbounded preceding and 1 preceding), 0) as bigint)
                  as event_seq
              from e)
            select user_id, event_seq, min(event_id) as event_id,
                   string_agg(payload, '' order by event_id) as content,
                   count(*) as n_parts,
                   bool_or(not is_partial) as complete
            from seq group by user_id, event_seq
        """,
        "prom_parse": """
            with e as (
              select event_id, event_id % 8 as mode,
                'm_' || event_type as nm,
                cast(event_id % 997 as double) as v,
                1715829785083 + event_id as tsn,
                'u' || cast(user_id as varchar) as uid
              from events where event_id < 4000)
            select event_id, nm as name,
              case mode
                when 0 then '__name__=' || nm || ',code=' || uid || ',method=GET'
                when 3 then '__name__=' || nm || ',a=x ' || uid || ',b='
                when 6 then '__name__=' || nm || ',esc=a' || chr(10) || 'b\\c'
                else '__name__=' || nm end as labels,
              v as value,
              case when mode in (0, 7) then tsn else 1700000000000 end as ts_ms
            from e where mode not in (4, 5)
        """,
        "prom_relabel": """
            with e as (
              select event_id, 'm_' || event_type as nm,
                case when event_id % 3 = 0 then 'GET' else 'POST' end as meth,
                cast(200 + (event_id % 4) * 100 as varchar) as code,
                case when event_id % 2 = 0 then 'PROD' else 'dev' end as env,
                cast(event_id % 997 as double) as v
              from events where event_id < 4000)
            select event_id, nm as name,
              '__name__=' || nm || ',code=' || code
                || ',endpoint=' || nm || ':' || meth
                || ',env=' || lower(env)
                || ',shard=' || cast(('0x' || substr(md5(nm), 17, 16))::ubigint % 17
                                     as varchar)
                || ',status_de=' || code as labels,
              v as value
            from e where meth = 'GET' and code not like '5%'
        """,
        "minhash_lsh": """
            with ids as (select unnest(range(60)) as i),
            js as (select unnest(range(1, 13)) as j),
            w as (select i, j, substr(md5(cast((i // 3) * 100 + j as varchar)), 1, 8) as w
                  from ids, js),
            g as (select a.i as doc_id, a.w || ' ' || b.w as gram
                  from w a join w b on a.i = b.i and b.j = a.j + 1),
            gd as (select distinct doc_id, gram from g),
            sz as (select doc_id, count(*) as sz from gd group by 1),
            inter as (select a.doc_id as id_a, b.doc_id as id_b, count(*) as inter
                      from gd a join gd b on a.gram = b.gram and a.doc_id < b.doc_id
                      group by 1, 2)
            select id_a, id_b,
                   round(inter * 1.0 / (sa.sz + sb.sz - inter), 6) as jaccard
            from inter
            join sz sa on sa.doc_id = id_a
            join sz sb on sb.doc_id = id_b
            where round(inter * 1.0 / (sa.sz + sb.sz - inter), 6) >= 0.5
        """,
        "simhash_dups": """
            with ids as (select unnest(range(60)) as i)
            select a.i as id_a, b.i as id_b, cast(0 as int) as hamming
            from ids a join ids b on a.i // 3 = b.i // 3 and a.i < b.i
        """,
        "metric_multi": """
            select event_type,
                   cast(count(*) * 3 as bigint) as n_obs,
                   cast(sum(round(value * 100)) as double) as v_cents_sum,
                   cast(count(*) as double) as cnt_sum,
                   (select e2.value from events e2
                    where e2.event_type = e.event_type
                    order by e2.ts desc, e2.value desc limit 1) as v_last,
                   cast(0 as int) as mt_counter,
                   cast(1 as int) as mt_gauge
            from events e group by event_type
        """,
        "parse_pb": """
            with e as (select event_id, event_type, user_id
                       from events where event_id < 2000),
            js as (select unnest(range(2)) as j)
            select event_id, cast(j as int) as log_idx,
                   'store' || cast(event_id % 4 as varchar) as category,
                   'src' || cast(user_id % 10 as varchar) as source,
                   1700000000 + event_id * 2 + j as time,
                   case when j = 0 then event_id % 1000 end as time_ns,
                   event_type as et, cast(user_id as varchar) as uid,
                   case when event_id % 2 = 0 then 'prod' else 'dev' end as env
            from e, js
        """,
        "pq_ann": """
            with v as (select vec_id, cast(embedding as double[]) as v from embeddings),
            js as (select unnest(range(4)) as j),
            cb as (select j, vec_id as code, list_slice(v, j*16+1, (j+1)*16) as sub
                   from v, js where vec_id < 16),
            sub as (select vec_id, j, list_slice(v, j*16+1, (j+1)*16) as s from v, js),
            d as (select s.vec_id, s.j, cb.code,
                    round(list_sum(list_transform(range(1, 17),
                      i -> (s.s[i] - cb.sub[i]) ^ 2)), 9) as d2
                  from sub s join cb on s.j = cb.j),
            enc as (select vec_id, j, code from (
                      select *, row_number() over (partition by vec_id, j
                                                   order by d2, code) as rn from d)
                    where rn = 1),
            q as (select vec_id as query_id, v as qv from v where vec_id in (100, 200, 300)),
            lut as (select q.query_id, cb.j, cb.code,
                      cast(round(list_sum(list_transform(range(1, 17),
                        i -> (list_slice(q.qv, cb.j*16+1, (cb.j+1)*16)[i] - cb.sub[i]) ^ 2))
                        * 1e9) as bigint) as ld
                    from q, cb),
            adc as (select l.query_id, e.vec_id as neighbor_id,
                           cast(sum(l.ld) as bigint) as adc_n9
                    from enc e
                    join lut l on e.j = l.j and e.code = l.code
                    where e.vec_id <> l.query_id
                    group by 1, 2)
            select query_id, neighbor_id, adc_n9, cast(rk as int) as rk from (
              select *, row_number() over (partition by query_id
                                           order by adc_n9, neighbor_id) as rk
              from adc)
            where rk <= 10
        """,
    }
    transforms = {
        "rename_keys": """
            select c_custkey, c_name as customer_name, c_mktsegment as mkt,
                   cast(null as varchar) as old_name
            from customer
        """,
        "add_fields": "select c_custkey, 'prod' as env, 'us-east' as dc from customer",
        "appender": "select c_custkey, c_name || '|suffix' as name2 from customer",
        "pick_keys": """
            select c_custkey, cast(2 as int) as n_keys, c_name as name,
                   cast(null as varchar) as segment_gone
            from customer
        """,
        "drop_keys": """
            select c_custkey, cast(2 as int) as n_keys, cast(null as varchar) as bal_gone
            from customer
        """,
        "drop_last_key": "select c_custkey, cast(2 as int) as n_keys from customer",
        "pack_json": """
            select c_custkey,
                   '{"name":"' || c_name || '","segment":"' || c_mktsegment || '"}' as packed
            from customer
        """,
        "string_replace": """
            select c_custkey, regexp_replace(c_name, 'Customer#0*', 'C', 'g') as short_name
            from customer
        """,
        "anchor": "select p_partkey, p_type as atype, p_brand as abrand from part",
        "gotime": "select o_orderkey, strftime(o_orderdate, '%d/%m/%Y') as od_fmt from orders",
        "gotime_go": (
            "select o_orderkey, strftime(o_orderdate, '%d/%b/%Y:%H:%M:%S') as clf from orders"
        ),
        "fields_with_condition": """
            select c_custkey,
                   case when c_mktsegment = 'BUILDING' then 'b'
                        when c_mktsegment = 'MACHINERY' then 'm' end as tier,
                   case when c_mktsegment = 'BUILDING' then null
                        else cast(c_acctbal as varchar) end as bal_maybe
            from customer
        """,
        "filter_key_regex": """
            select event_id from events
            where len(list_filter(json_keys(props), k -> regexp_matches(k, '^k$'))) > 0
              and len(list_filter(json_keys(props), k -> regexp_matches(k, '^secret'))) = 0
        """,
        "log_to_metric": """
            select event_id, 'cpu_usage' as metric_name,
                   cast(round("value", 4) as varchar) as metric_value,
                   'host#$#h' || cast(user_id % 10 as varchar) as labels
            from events
            where try_cast(cast(round("value", 4) as varchar) as double) is not null
        """,
        "base64_decode": "select p_partkey, p_type as decoded from part",
        "geoip": _geoip_oracle_sql(),
        "cloud_meta": """
            select c_custkey, 'i-mock0001' as iid, 'mock-region-1' as region,
                   'mock-zone-a' as zone
            from customer
        """,
        # nested insert emits sorted-key compact JSON — literal-constructible
        "cloud_meta_nested": """
            select c_custkey,
                   '{"meta":{"iid":"i-mock0001","region":"mock-region-1"},"seg":"'
                     || c_mktsegment || '"}' as data_json
            from customer
        """,
        "metadata_group": """
            select source, lang, cast(floor((rn - 1) / 50) as bigint) as group_seq,
                   count(*) as n_events
            from (select source, lang,
                         row_number() over (partition by source, lang order by doc_id) as rn
                  from documents)
            group by 1, 2, 3
        """,
        "context_pack": """
            select doc_id, source,
                   upper(substr(md5('pipeline-' || source), 1, 16)) || '-' ||
                   upper(hex(cast(floor((rn - 1) / 100) + 1 as bigint))) as __pack_id__
            from (select doc_id, source,
                         row_number() over (partition by source order by doc_id) as rn
                  from documents)
        """,
        "split_log_regex": """
            select p_partkey, cast(1 as bigint) as event_seq,
                   'HDR ' || p_brand || chr(10) || '  detail one' || chr(10) || '  detail two'
                     as content,
                   cast(3 as bigint) as n_lines
            from part
            union all
            select p_partkey, cast(2 as bigint), 'HDR ' || p_type, cast(1 as bigint) from part
        """,
        "appender_template": """
            select c_custkey,
                   c_name || '|host=testhost|env=prodenv|iid=i-mock0001' as name2
            from customer
        """,
        "appender_sort_labels": """
            select c_custkey,
                   'a#$#' || cast(c_custkey as varchar) || '|m#$#x|z#$#' || c_mktsegment
                     as labels
            from customer
        """,
        "grok_typed": """
            select event_id, event_type as w1, cast(user_id as bigint) as num from events
        """,
        # SQL-expressible for this fixture because each c_name has exactly ONE
        # digit run — general callback-replace is not SQL-expressible
        "desensitize_md5_mode": r"""
            select c_custkey,
                   case when regexp_matches(c_name, '\d{4,}')
                        then regexp_replace(c_name, '\d{4,}',
                                            md5(regexp_extract(c_name, '\d{4,}')))
                        else c_name end as redacted_name
            from customer
        """,
    }
    encrypt_vals = ", ".join(f"({k}, '{ct}')" for k, ct in ENCRYPT_KAT)
    return {
        **training,
        **transforms,
        # known-answer check: ciphertexts frozen from OpenSSL (see ENCRYPT_KAT);
        # the join against customer pins the key set to real table rows
        "encrypt": f"""
            select c.c_custkey, v.name_enc
            from customer c
            join (values {encrypt_vals}) v(c_custkey, name_enc)
              on c.c_custkey = v.c_custkey
            where c.c_custkey < 64
        """,
        "pipeline_route_counts": f"""
            select {route_case} as route, count(*) as n_rows,
                   cast(sum(n_chars) as bigint) as n_chars_sum
            from documents group by 1
        """,
        "route_rows": f"select doc_id, {route_case} as route from documents",
        "fanout_multi": """
            select 'audit' as sink, event_id from events
            union all
            select 'clicks', event_id from events where event_type = 'click'
        """,
        "group_content_values": """
            select source, lang, count(*) as n_events,
                   cast(sum(n_chars) as bigint) as n_tok_sum
            from documents group by 1, 2
        """,
        "shard_hash": """
            select cast(cast(('0x' || substr(md5(cast(doc_id as varchar)), 1, 8)) as bigint) % 8 as int) as shard,
                   count(*) as n_rows
            from documents group by 1
        """,
        "parse_regex": r"""
            select doc_id,
                   regexp_extract(text, '^(\w+) (\w+) (.*)$', 1) as w1,
                   regexp_extract(text, '^(\w+) (\w+) (.*)$', 2) as w2,
                   cast(length(regexp_extract(text, '^(\w+) (\w+) (.*)$', 3)) as int) as rest_len
            from documents
        """,
        "parse_json": """
            select event_id, json_extract_string(props, '$.k') as k from events
        """,
        "parse_delimiter": """
            select doc_id, split_part(text, ' ', 1) as c1, split_part(text, ' ', 2) as c2,
                   split_part(text, ' ', 3) as c3
            from documents
        """,
        "parse_apsara": """
            select event_id, upper(event_type) as level, cast(user_id as varchar) as thread,
                   cast(epoch_us(date_trunc('second', ts)) as varchar) as microtime,
                   event_type as et
            from events
        """,
        "split_key_value": """
            select event_id, cast(user_id as varchar) as "user", event_type as type from events
        """,
        "parse_timestamp": """
            select event_id, date_trunc('second', ts) as parsed_ts from events
        """,
        "filter_expression": """
            select doc_id, lang from documents
            where regexp_matches(lang, '^(en|fr)$') and not regexp_matches(text, 'slow')
        """,
        "filter_include_exclude": """
            select doc_id, lang from documents
            where regexp_matches(text, 'spark') and not regexp_matches(lang, '^zh$')
        """,
        "dict_map": """
            select doc_id,
                   case lang when 'en' then 'english' when 'fr' then 'french'
                             when 'de' then 'german' when 'es' then 'spanish'
                             else 'unknown' end as lang_label
            from documents
        """,
        "desensitize_const": """
            select c_custkey, regexp_replace(c_name, '[0-9]', 'X', 'g') as redacted from customer
        """,
        "md5_field": "select c_custkey, md5(c_name) as name_md5 from customer",
        "base64": "select p_partkey, to_base64(encode(p_brand)) as brand_b64 from part",
        "dedup_exact": """
            select substr(text, 1, 20) as dup_key, min(doc_id) as rep_doc_id,
                   count(*) as dup_cnt
            from documents group by 1
        """,
        "token_count": """
            select doc_id, cast(len(string_split(text, ' ')) as int) as n_words from documents
        """,
        "topk_per_group": """
            select source, doc_id, n_chars, cast(rk as int) as rk from (
                select source, doc_id, n_chars,
                       row_number() over (partition by source order by n_chars desc, doc_id) as rk
                from documents
            ) where rk <= 3
        """,
        "ann_cosine_topk": """
            with q as (select vec_id as query_id, cast(embedding as double[]) as q_emb
                       from embeddings where vec_id < 5),
            scored as (
                select q.query_id, e.vec_id as neighbor_id,
                       list_cosine_similarity(cast(e.embedding as double[]), q.q_emb) as cos
                from embeddings e, q where e.vec_id <> q.query_id
            ),
            ranked as (
                select query_id, neighbor_id, round(cos, 6) as cos6,
                       cast(row_number() over (partition by query_id order by cos desc, neighbor_id) as int) as rk
                from scored
            )
            select query_id, neighbor_id, cos6, rk from ranked where rk <= 10
        """,
        "ann_ivf_topk": """
            with v as (select vec_id as id, cast(embedding as double[]) as v from embeddings),
            c as (select id as centroid_id, v as c_vec from v where id < 16),
            asg as (
              select id, centroid_id from (
                select v.id, c.centroid_id,
                       row_number() over (partition by v.id
                         order by round(list_cosine_similarity(v.v, c.c_vec), 6) desc,
                                  c.centroid_id) as rk
                from v cross join c) where rk = 1
            ),
            q as (select id as query_id, v as q_vec from v where id in (100, 101, 102)),
            probes as (
              select query_id, q_vec, centroid_id from (
                select q.query_id, q.q_vec, c.centroid_id,
                       row_number() over (partition by q.query_id
                         order by round(list_cosine_similarity(q.q_vec, c.c_vec), 6) desc,
                                  c.centroid_id) as prk
                from q cross join c) where prk <= 4
            ),
            scored as (
              select p.query_id, v.id, round(list_cosine_similarity(p.q_vec, v.v), 6) as cos6
              from probes p
              join asg on asg.centroid_id = p.centroid_id
              join v on v.id = asg.id
              where v.id != p.query_id
            )
            select query_id, id as neighbor_id, cos6, cast(rk as int) as rk from (
              select *, row_number() over (partition by query_id
                                           order by cos6 desc, id) as rk
              from scored
            ) where rk <= 10
        """,
        "tpch_q1": f"""
            select l_returnflag, l_linestatus,
                   cast(sum(cast(l_quantity as decimal(18,2))) as double) as sum_qty,
                   cast(sum(cast(l_extendedprice as decimal(18,2))) as double) as sum_base_price,
                   cast(sum({rev}) as double) as sum_disc_price,
                   count(*) as count_order
            from lineitem where l_shipdate <= timestamp '1998-09-02'
            group by l_returnflag, l_linestatus
        """,
        "tpch_q3": f"""
            select l_orderkey, cast(revenue as double) as revenue from (
                select l_orderkey, sum({rev}) as revenue
                from lineitem
                join orders on l_orderkey = o_orderkey
                join customer on o_custkey = c_custkey
                where c_mktsegment = 'BUILDING' and o_orderdate < timestamp '1997-01-01'
                group by l_orderkey
                order by revenue desc, l_orderkey
                limit 10
            )
        """,
        "tpch_q5ish": f"""
            select n_name, cast(sum({rev}) as double) as revenue, count(*) as n_items
            from lineitem
            join orders on l_orderkey = o_orderkey
            join customer on o_custkey = c_custkey
            join nation on c_nationkey = n_nationkey
            join region on n_regionkey = r_regionkey
            group by n_name
        """,
        "events_sessions": """
            with g as (
                select user_id, ts, event_id,
                       case when lag(ts) over w is null
                                 or epoch(ts) - epoch(lag(ts) over w) > 1800
                            then 1 else 0 end as sess_start
                from events window w as (partition by user_id order by ts, event_id)
            ),
            s as (
                select user_id,
                       sum(sess_start) over (partition by user_id order by ts, event_id
                                             rows between unbounded preceding and current row) as sess_id
                from g
            )
            select user_id, cast(max(sess_id) as int) as n_sessions, count(*) as n_events
            from s group by user_id
        """,
    }
