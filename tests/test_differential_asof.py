"""Seeded differential for ``asof_join`` (operators/asof.py — union + keyed
carry-forward, never a range join) vs ``pandas.merge_asof``, the de-facto
reference implementation of backward as-of semantics.

Covers, on a randomized corpus with forced edge density:

* exact-tie matches (``right.ts == left.ts`` must match — the union sort
  breaks the tie by side tag, right-before-left);
* ``tolerance_sec`` staleness (match exactly AT the tolerance survives,
  one microsecond past it nulls the whole payload);
* whole-payload carry: a matched right row whose payload column is
  legitimately NULL must yield NULL, NOT a value stitched from an OLDER
  right row (the per-column-carry bug class);
* ``right_order_col`` tie-collapse on duplicate (key, ts) build rows
  (greatest order wins, deterministically);
* keys present on only one side.

Timestamps are TIMESTAMP_NTZ end-to-end so the comparison is wall-clock
exact with pandas naive datetime64 — no session/OS timezone conversion
anywhere. Mutation-checked: forward/no-exact-match direction, per-column
carry, tolerance-off, and keep-lowest tie-collapse emulators all disagree
with merge_asof somewhere on the corpus.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta

import pandas as pd
import pytest
from pyspark.sql import types as T

from loongcollector_spark.operators.asof import asof_join

SEED = 20260819
_BASE = datetime(2026, 1, 1)

_LEFT_SCHEMA = T.StructType([
    T.StructField("lid", T.LongType()),
    T.StructField("key", T.StringType()),
    T.StructField("ts", T.TimestampNTZType()),
    T.StructField("lval", T.LongType()),
])
_RIGHT_SCHEMA = T.StructType([
    T.StructField("key", T.StringType()),
    T.StructField("ts", T.TimestampNTZType()),
    T.StructField("rval", T.LongType()),
    T.StructField("rval2", T.StringType()),
    T.StructField("ord", T.LongType()),
])


def _corpus(rng: random.Random):
    keys = [f"k{i}" for i in range(6)] + ["left_only"]
    right_rows = []
    # unique (key, ts) per key except a deliberate duplicate block for the
    # right_order_col config
    seen = set()
    for _ in range(140):
        k = rng.choice(keys[:6])
        s = rng.randrange(0, 5000)
        if (k, s) in seen:
            continue
        seen.add((k, s))
        right_rows.append((
            k,
            _BASE + timedelta(seconds=s),
            rng.randrange(1000),
            None if rng.random() < 0.3 else f"v{rng.randrange(100)}",
            rng.randrange(10),
        ))
    left_rows = []
    for i in range(320):
        k = rng.choice(keys)
        r = rng.random()
        if r < 0.15 and right_rows:
            # force exact ties with a right row of the same key when possible
            cands = [rr for rr in right_rows if rr[0] == k]
            ts = rng.choice(cands)[1] if cands else _BASE + timedelta(seconds=rng.randrange(5000))
        elif r < 0.25 and right_rows:
            # force near-tolerance gaps: right ts + (tolerance ± 1µs/0)
            cands = [rr for rr in right_rows if rr[0] == k]
            if cands:
                base = rng.choice(cands)[1]
                ts = base + timedelta(seconds=300) + timedelta(
                    microseconds=rng.choice([-1, 0, 1])
                )
            else:
                ts = _BASE + timedelta(seconds=rng.randrange(5000))
        else:
            ts = _BASE + timedelta(
                seconds=rng.randrange(5000), microseconds=rng.randrange(1_000_000)
            )
        left_rows.append((i, k, ts, rng.randrange(1000)))
    return left_rows, right_rows


def _pandas_asof(left_rows, right_rows, tolerance_sec=None, dedup_ord=False):
    lf = pd.DataFrame(left_rows, columns=["lid", "key", "ts", "lval"])
    rf = pd.DataFrame(right_rows, columns=["key", "ts", "rval", "rval2", "ord"])
    if dedup_ord:
        rf = (
            rf.sort_values(["key", "ts", "ord"], ascending=[True, True, False])
            .drop_duplicates(["key", "ts"], keep="first")
        )
    else:
        assert not rf.duplicated(["key", "ts"]).any()
    rf = rf.rename(columns={"ts": "ts_r", "rval": "rval_r", "rval2": "rval2_r"})
    out = pd.merge_asof(
        lf.sort_values("ts", kind="mergesort"),
        rf[["key", "ts_r", "rval_r", "rval2_r"]].sort_values("ts_r", kind="mergesort"),
        left_on="ts",
        right_on="ts_r",
        by="key",
        direction="backward",
        allow_exact_matches=True,
        tolerance=None if tolerance_sec is None else pd.Timedelta(seconds=tolerance_sec),
    )
    res = {}
    for r in out.itertuples(index=False):
        ts_r = None if pd.isna(r.ts_r) else r.ts_r.to_pydatetime()
        rv = None if pd.isna(r.rval_r) else int(r.rval_r)
        rv2 = None if (r.rval2_r is None or (isinstance(r.rval2_r, float) and pd.isna(r.rval2_r))) else r.rval2_r
        res[r.lid] = (ts_r, rv, rv2)
    return res


def _spark_asof(spark, left_rows, right_rows, tolerance_sec=None, right_order_col=None):
    lf = spark.createDataFrame(left_rows, _LEFT_SCHEMA)
    rf = spark.createDataFrame(right_rows, _RIGHT_SCHEMA)
    out = asof_join(
        lf,
        rf.drop("ord") if right_order_col is None else rf,
        on="key",
        ts_col="ts",
        right_cols=["rval", "rval2"],
        right_order_col=right_order_col,
        tolerance_sec=tolerance_sec,
    )
    return {
        r["lid"]: (r["ts_r"], r["rval_r"], r["rval2_r"]) for r in out.collect()
    }


def test_asof_differential_plain(spark):
    rng = random.Random(SEED)
    left_rows, right_rows = _corpus(rng)
    got = _spark_asof(spark, left_rows, right_rows)
    want = _pandas_asof(left_rows, right_rows)
    assert got == want, {k: (got[k], want[k]) for k in got if got[k] != want[k]}


def test_asof_differential_tolerance(spark):
    rng = random.Random(SEED + 1)
    left_rows, right_rows = _corpus(rng)
    got = _spark_asof(spark, left_rows, right_rows, tolerance_sec=300)
    want = _pandas_asof(left_rows, right_rows, tolerance_sec=300)
    assert got == want, {k: (got[k], want[k]) for k in got if got[k] != want[k]}
    # the corpus must actually exercise the tolerance boundary
    assert want != _pandas_asof(left_rows, right_rows), "tolerance never fired"


def test_asof_differential_right_order_dedup(spark):
    rng = random.Random(SEED + 2)
    left_rows, right_rows = _corpus(rng)
    # inject duplicate (key, ts) build rows with conflicting payloads/ord
    dups = []
    for k, ts, rv, rv2, o in rng.sample(right_rows, 25):
        dups.append((k, ts, rv + 5000, "dup", o + 10))
        dups.append((k, ts, rv + 9000, None, o + 5))
    right_dup = right_rows + dups
    got = _spark_asof(spark, left_rows, right_dup, right_order_col="ord")
    want = _pandas_asof(left_rows, right_dup, dedup_ord=True)
    assert got == want, {k: (got[k], want[k]) for k in got if got[k] != want[k]}
    # keep-lowest-ord mutant must be distinguishable on this corpus
    rf = pd.DataFrame(right_dup, columns=["key", "ts", "rval", "rval2", "ord"])
    lowest = (
        rf.sort_values(["key", "ts", "ord"], ascending=[True, True, True])
        .drop_duplicates(["key", "ts"], keep="first")
    )
    mutant = _pandas_asof(
        left_rows,
        list(lowest.itertuples(index=False, name=None)),
    )
    assert mutant != want, "corpus never exercises the ord tie-break"


def test_asof_corpus_kills_direction_and_carry_mutants():
    """Pure-pandas mutation check: the corpus distinguishes backward-with-
    exact-match + whole-row carry from (a) no-exact-match, (b) forward
    direction, (c) per-column carry that backfills a NULL payload column
    from an older right row."""
    rng = random.Random(SEED)
    left_rows, right_rows = _corpus(rng)
    want = _pandas_asof(left_rows, right_rows)

    lf = pd.DataFrame(left_rows, columns=["lid", "key", "ts", "lval"]).sort_values(
        "ts", kind="mergesort"
    )
    rf = pd.DataFrame(right_rows, columns=["key", "ts", "rval", "rval2", "ord"])

    def run(allow_exact=True, direction="backward"):
        out = pd.merge_asof(
            lf,
            rf.rename(columns={"ts": "ts_r"}).sort_values("ts_r", kind="mergesort")[
                ["key", "ts_r", "rval", "rval2"]
            ],
            left_on="ts",
            right_on="ts_r",
            by="key",
            direction=direction,
            allow_exact_matches=allow_exact,
        )
        return {
            r.lid: (
                None if pd.isna(r.ts_r) else r.ts_r.to_pydatetime(),
                None if pd.isna(r.rval) else int(r.rval),
                None if (r.rval2 is None or (isinstance(r.rval2, float) and pd.isna(r.rval2))) else r.rval2,
            )
            for r in out.itertuples(index=False)
        }

    assert run(allow_exact=False) != want, "no exact ties in corpus"
    assert run(direction="forward") != want, "direction not exercised"

    # per-column carry mutant: join rval2 from the latest NON-NULL rval2 row
    rf2 = rf[rf["rval2"].notna()]
    out2 = pd.merge_asof(
        lf,
        rf2.rename(columns={"ts": "ts2"}).sort_values("ts2", kind="mergesort")[
            ["key", "ts2", "rval2"]
        ],
        left_on="ts",
        right_on="ts2",
        by="key",
        direction="backward",
    )
    stitched = {
        r.lid: None
        if (r.rval2 is None or (isinstance(r.rval2, float) and pd.isna(r.rval2)))
        else r.rval2
        for r in out2.itertuples(index=False)
    }
    true_rv2 = {k: v[2] for k, v in want.items()}
    assert stitched != true_rv2, "corpus never exposes per-column carry"


if __name__ == "__main__":  # pragma: no cover
    pytest.main([__file__, "-x", "-q"])
