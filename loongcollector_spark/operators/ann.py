"""Approximate-nearest-neighbor search over embedding columns.

Two scale paths over the brute-force baseline (``q_ann_cosine_topk``):

* ``ann_ivf_topk`` — IVF-flat: corpus vectors are assigned to coarse
  centroids (inverted lists); a query ranks centroids and scans only the
  ``nprobe`` nearest lists. Assignment is one O(N·K) linear pass (the index
  build); search touches ~nprobe/K of the corpus. Deterministic coarse
  quantizer: the K lowest-id corpus vectors serve as centroids (production
  would k-means-train them — determinism is required here so a DuckDB oracle
  can replay the exact same index and the correctness gate covers the whole
  path, not just the verify step).
* hyperplane-LSH buckets (``dedup.hyperplane_buckets``) — the other family,
  used by embedding_dup_pairs_lsh.

Everything is native DataFrame ops: centroid fan-out is an explode of a
broadcast K-element array (K ≤ a few hundred), ranking is a window, the
probe join is a broadcast equi-join on centroid id — no cartesian anywhere.
All cosines are rounded to 6 digits BEFORE every argmax/rank so Spark and
DuckDB agree bit-for-bit on ordering decisions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .dedup import cosine


def quantize_int8(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Symmetric per-vector int8 quantization (the standard ANN-index /
    embedding-store compression): scale = max|x| / 127,
    q_i = floor(x_i · 127 / max|x| + 0.5) ∈ [-127, 127].

    Output is audit-shaped: (id, dim, scale6, q_sum, q_min, q_max) — q_* are
    INTEGER aggregates of the quantized vector, so the oracle comparison is
    exact (no float-sum ordering hazard), while scale6 pins the float path.
    ``floor(x + 0.5)`` is used instead of round() because Spark (HALF_UP) and
    DuckDB (half-away-from-zero) disagree on negative .5 boundaries; floor is
    IEEE-identical in both.

    Scale shape: pure per-row array projection (transform/aggregate lambdas,
    whole-stage codegen) — rides the scan, no shuffle, no Python."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    m = F.greatest(F.array_max(F.transform(v, F.abs)), F.lit(1e-12))
    q = F.transform(v, lambda x: F.floor(x * F.lit(127.0) / m + F.lit(0.5)).cast("long"))
    return df.select(
        F.col(id_col),
        F.size(F.col(vec_col)).alias("dim"),
        F.round(m / F.lit(127.0), 6).alias("scale6"),
        F.aggregate(q, F.lit(0).cast("long"), lambda acc, x: acc + x).alias("q_sum"),
        F.array_min(q).alias("q_min"),
        F.array_max(q).alias("q_max"),
    )


def ivf_assign(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, centroid_id) inverted-list assignment: argmax cosine over the
    broadcast centroid set, ties broken by lowest centroid id."""
    c = F.broadcast(
        centroids.select(
            F.col(id_col).alias("centroid_id"), F.col(vec_col).cast("array<double>").alias("c_vec")
        )
    )
    v = df.select(F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v"))
    scored = v.join(c).withColumn("c_cos", F.round(cosine(F.col("v"), F.col("c_vec")), 6))
    # argmax as a hash aggregate (max_by) rather than a row_number window: the
    # window sorts all N·K fan-out rows inside each shuffle partition; the agg
    # does a map-side partial argmax so only K-way reduced rows cross the
    # shuffle — the difference at 10^9 vectors. The ordering key packs
    # (cos, -centroid_id) into ONE bigint so the planner picks HashAggregate
    # (a struct key forces SortAggregate): c_cos is pre-rounded to 6 digits,
    # so round(c_cos*1e6)*10000 is exact and leaves 4 digits of headroom for
    # the low-centroid-id tiebreak (requires K ≤ 10000 centroids).
    order_key = (
        F.round(F.col("c_cos") * 1e6).cast("bigint") * F.lit(10000).cast("bigint")
        - F.col("centroid_id").cast("bigint")
    )
    return scored.groupBy("id").agg(
        F.max_by(F.col("centroid_id"), order_key).alias("centroid_id")
    )


def ann_ivf_topk(
    df: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF top-k: (query_id, neighbor_id, cos6, rk) for each query id.

    Recall < 1 by construction (a true neighbor in an unprobed list is
    missed) — but the WHOLE path (quantizer, assignment, probe ranking,
    candidate scan) is deterministic, so the oracle checks the exact output,
    and recall vs brute force is a measured number, not a hope."""
    centroids = df.filter(F.col(id_col).isin(*[int(q) for q in range(n_centroids)]))
    assign = ivf_assign(df, centroids, id_col, vec_col)
    v = df.select(F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v"))
    corpus = v.join(assign, "id")

    q = v.filter(F.col("id").isin(*[int(x) for x in query_ids])).select(
        F.col("id").alias("query_id"), F.col("v").alias("q_vec")
    )
    # rank centroids per query, keep nprobe
    c = F.broadcast(
        centroids.select(
            F.col(id_col).alias("centroid_id"), F.col(vec_col).cast("array<double>").alias("c_vec")
        )
    )
    qc = q.join(c).withColumn("c_cos", F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6))
    wq = Window.partitionBy("query_id").orderBy(F.col("c_cos").desc(), F.col("centroid_id"))
    probes = (
        qc.withColumn("prk", F.row_number().over(wq))
        .filter(F.col("prk") <= nprobe)
        .select("query_id", "q_vec", "centroid_id")
    )
    cands = probes.join(corpus, "centroid_id").filter(F.col("id") != F.col("query_id"))
    scored = cands.withColumn("cos6", F.round(cosine(F.col("q_vec"), F.col("v")), 6))
    wk = Window.partitionBy("query_id").orderBy(F.col("cos6").desc(), F.col("id"))
    return (
        scored.withColumn("rk", F.row_number().over(wk))
        .filter(F.col("rk") <= k)
        .select("query_id", F.col("id").alias("neighbor_id"), "cos6", "rk")
    )
