"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship parse→enrich→route→aggregate pipeline smoke check.
``queries()`` — one entry per implemented operator from SURVEY.md §2 (plus the
training-data-pipeline ops: dedup, ANN similarity, text stats), each a callable
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
# Dedup / text stats / similarity (training-data pipeline ops)
# ---------------------------------------------------------------------------

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
            F.sum(dec("l_quantity")).alias("sum_qty"),
            F.sum(dec("l_extendedprice")).alias("sum_base_price"),
            F.sum((dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - dec("l_discount"))).cast("decimal(28,4)")).alias("sum_disc_price"),
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
            F.sum((dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - dec("l_discount"))).cast("decimal(28,4)")).alias("revenue"),
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

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "pipeline_route_counts": q_pipeline_route_counts,
        "route_rows": q_route_rows,
        "group_content_values": q_group_content_values,
        "shard_hash": q_shard_hash,
        "parse_regex": q_parse_regex,
        "parse_json": q_parse_json,
        "parse_delimiter": q_parse_delimiter,
        "parse_apsara": q_parse_apsara,
        "split_key_value": q_split_key_value,
        "parse_timestamp": q_parse_timestamp,
        "filter_expression": q_filter_expression,
        "filter_include_exclude": q_filter_include_exclude,
        "dict_map": q_dict_map,
        "desensitize_const": q_desensitize_const,
        "md5_field": q_md5_field,
        "base64": q_base64,
        "dedup_exact": q_dedup_exact,
        "token_count": q_token_count,
        "topk_per_group": q_topk_per_group,
        "ann_cosine_topk": q_ann_cosine_topk,
        "tpch_q1": q_tpch_q1,
        "tpch_q3": q_tpch_q3,
        "tpch_q5ish": q_tpch_q5ish,
        "events_sessions": q_events_sessions,
    }


def oracle_sql() -> dict[str, str]:
    route_case = (
        "case when regexp_matches(lang, '^(en)$') then 'sink_en' "
        "when regexp_matches(lang, '^(fr|es)$') then 'sink_latin' "
        "else 'sink_default' end"
    )
    rev = "cast(cast(l_extendedprice as decimal(18,2)) * (cast(1 as decimal(18,2)) - cast(l_discount as decimal(18,2))) as decimal(28,4))"
    return {
        "pipeline_route_counts": f"""
            select {route_case} as route, count(*) as n_rows,
                   cast(sum(n_chars) as bigint) as n_chars_sum
            from documents group by 1
        """,
        "route_rows": f"select doc_id, {route_case} as route from documents",
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
        "tpch_q1": f"""
            select l_returnflag, l_linestatus,
                   sum(cast(l_quantity as decimal(18,2))) as sum_qty,
                   sum(cast(l_extendedprice as decimal(18,2))) as sum_base_price,
                   sum({rev}) as sum_disc_price,
                   count(*) as count_order
            from lineitem where l_shipdate <= timestamp '1998-09-02'
            group by l_returnflag, l_linestatus
        """,
        "tpch_q3": f"""
            select l_orderkey, sum({rev}) as revenue
            from lineitem
            join orders on l_orderkey = o_orderkey
            join customer on o_custkey = c_custkey
            where c_mktsegment = 'BUILDING' and o_orderdate < timestamp '1997-01-01'
            group by l_orderkey
            order by revenue desc, l_orderkey
            limit 10
        """,
        "tpch_q5ish": f"""
            select n_name, sum({rev}) as revenue, count(*) as n_items
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
