"""Deterministic sampling for training-data pipelines.

Not in the reference (a log agent forwards everything); a 100 TB corpus
pipeline needs reproducible downsampling — e.g. keep 5% of a crawl-heavy
source but 50% of a scarce high-quality one — where membership is a pure
function of the row key, so reruns, resumes and the DuckDB oracle all agree
row-for-row (Spark's ``df.sample`` is seed-dependent per-partition and NOT
stable across partitionings, so it can never be oracle-checked).

All native expressions: md5 → 32-bit bucket → threshold compare; no shuffle,
no UDF — the filter rides the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(col: Column, buckets: int = 10_000) -> Column:
    """Deterministic bucket in [0, buckets): first 8 hex chars of md5 of the
    key's string form, mod ``buckets``. Matches the DuckDB expression
    ``('0x' || substr(md5(cast(k as varchar)), 1, 8))::bigint % buckets``."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("long")
        % F.lit(buckets)
    )


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 1.0,
    buckets: int = 10_000,
) -> DataFrame:
    """Keep each row iff hash_bucket(key) < rate(stratum) · buckets.

    ``rates`` maps stratum values (e.g. source names) to keep-fractions;
    unlisted strata use ``default_rate``. The rate table is a tiny CASE
    expression (constant-folded by Catalyst), so this is a scan-side filter —
    at 100 TB it prunes rows before any shuffle ever sees them, and because
    membership is keyed (not positional) the same rows survive at every
    parallelism and on resume."""
    thr: Column = F.lit(int(round(default_rate * buckets)))
    for stratum, rate in sorted(rates.items()):
        thr = F.when(
            F.col(strata_col) == F.lit(stratum), F.lit(int(round(rate * buckets)))
        ).otherwise(thr)
    return df.filter(hash_bucket(F.col(key_col), buckets) < thr)
