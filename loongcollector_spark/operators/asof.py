"""As-of (point-in-time) join — a temporal operator the reference's pipeline
model has no native verb for and Spark lacks as a built-in: attach to every
left row the most recent right row at-or-before its timestamp, per key.  The
canonical uses in a log/training pipeline: enrich events with the
latest-known dimension state (config snapshot, user profile, model version)
without a slowly-changing-dimension range table.

Implemented the scalable way — union + keyed window carry-forward — NOT a
range join:

* the naive form ``l JOIN r ON l.key = r.key AND r.ts <= l.ts`` then argmax
  explodes to |matches| rows per left row (quadratic per hot key) before the
  window prunes it;
* the union form shuffles each row ONCE on the key, sorts within partition by
  (ts, side), and carries the last-seen right payload forward with
  ``last(..., ignorenulls=True)`` over ``rowsBetween(unboundedPreceding, 0)``
  — a running accumulator, not a per-row scan, so cost is O(|l| + |r|) per
  key after one shuffle.  Skewed keys salt exactly like any other keyed
  shuffle (see aggregate.salted_repartition).

Right-side ties on (key, ts) are resolved deterministically by
``right_order_col`` (greatest wins), mirroring what a DuckDB ``ASOF JOIN``
over a (key, ts)-unique build side returns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TAG = "_asof_side"  # right=0 sorts before left=1 at equal ts → at-or-before


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_r",
    right_order_col: str | None = None,
    tolerance_sec: float | None = None,
) -> DataFrame:
    """As-of LEFT join: every ``left`` row, plus ``right_cols`` (renamed with
    ``suffix``) and ``ts_col + suffix`` from the latest ``right`` row with the
    same ``on`` key and ``right.ts <= left.ts``.  Unmatched left rows keep
    nulls.  ``tolerance_sec`` nulls out matches older than the tolerance
    (pandas ``merge_asof`` semantics).  One shuffle on ``on``; no range join.
    """
    rcols = right_cols if right_cols is not None else [
        c for c in right.columns if c not in (on, ts_col)
    ]
    # Deterministic build side: collapse (key, ts) ties by right_order_col.
    r = right
    if right_order_col is not None:
        r = (
            r.withColumn(
                "_rord",
                F.row_number().over(
                    Window.partitionBy(on, ts_col).orderBy(F.col(right_order_col).desc())
                ),
            )
            .filter(F.col("_rord") == 1)
            .drop("_rord")
        )
    # The whole right payload (match ts + every right column) travels as ONE
    # struct carried by a SINGLE last(ignorenulls=True): all right-side fields
    # of an output row always come from the same matched right row, even when
    # some payload column is legitimately NULL there.  Per-column carry would
    # stitch a NULL column's value from an OLDER match (diverging from DuckDB
    # ASOF JOIN / pandas merge_asof).  The struct itself is never null on a
    # right row (ts is non-null), so ignorenulls only skips left rows.
    carried = [ts_col + suffix] + [c + suffix for c in rcols]
    # Enforce the non-null-ts assumption the carry relies on: a right row
    # with NULL ts sorts FIRST under the window's ascending order and its
    # payload would be carried as the "most recent" match to every left row
    # before any real right row — and the tolerance filter can't null it out
    # (timestampdiff(NULL, ts) is NULL, so when(NULL,...) keeps the payload).
    r = r.filter(F.col(ts_col).isNotNull())
    r = r.select(
        F.col(on),
        F.col(ts_col),
        F.struct(
            F.col(ts_col).alias(ts_col + suffix),
            *[F.col(c).alias(c + suffix) for c in rcols],
        ).alias("_asof_payload"),
    ).withColumn(_TAG, F.lit(0))
    l = left.withColumn(_TAG, F.lit(1))
    u = l.unionByName(r, allowMissingColumns=True)

    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts_col).asc(), F.col(_TAG).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn("_asof_payload", F.last("_asof_payload", ignorenulls=True).over(w))
    out = u.filter(F.col(_TAG) == 1).drop(_TAG)
    if tolerance_sec is not None:
        # tz-free lag: timestampdiff computes the wall-clock delta directly on
        # TIMESTAMP_NTZ (and the physical delta on TIMESTAMP) — no session-tz
        # round-trip, so staleness decisions hold across DST transitions where
        # NTZ→TIMESTAMP→double casts are off by the DST offset.
        stale = (
            F.expr(
                f"timestampdiff(MICROSECOND, _asof_payload.`{ts_col + suffix}`, `{ts_col}`)"
            )
            > F.lit(int(round(float(tolerance_sec) * 1_000_000)))
        )
        out = out.withColumn(
            "_asof_payload", F.when(stale, F.lit(None)).otherwise(F.col("_asof_payload"))
        )
    return out.select(
        *[F.col(c) for c in out.columns if c != "_asof_payload"],
        *[F.col(f"_asof_payload.`{c}`").alias(c) for c in carried],
    )
