"""Seeded differential for ``rate_limit_batch`` (the deterministic batch
analog of processor_rate_limit) vs a sequential pure-Python fold: per key,
events sorted by (ts, tiebreak) pass while the count inside the current
``floor(epoch_seconds / window_sec)`` bucket is below the limit.

Corpus forces: sub-second timestamp collisions (tiebreak column decides),
bucket boundaries at exact window edges, keys whose traffic is entirely
inside one bucket, window_sec 1 and 5, and limits 1/3. Mutant checks:
a global (non-bucket-resetting) limit and a last-first ordering must each
disagree somewhere.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta, timezone

from pyspark.sql import types as T

from loongcollector_spark.operators.ratelimit import rate_limit_batch

SEED = 20260819
_BASE = datetime(2026, 5, 1, 0, 0, 0, tzinfo=timezone.utc)


def _corpus(rng: random.Random):
    rows = []
    eid = 0
    for key in ("a", "b", "burst"):
        n = {"a": 300, "b": 120, "burst": 40}[key]
        for _ in range(n):
            if key == "burst":
                # everything inside one second, heavy ties
                ts = _BASE + timedelta(microseconds=rng.choice([0, 0, 250_000, 999_999]))
            else:
                ts = _BASE + timedelta(
                    seconds=rng.randint(0, 14),
                    microseconds=rng.choice([0, 0, 1, 500_000, 999_999]),
                )
            rows.append((eid, key, ts))
            eid += 1
    return rows


def _emulate(rows, limit: int, window_sec: int):
    by_key: dict[str, list] = {}
    for eid, key, ts in rows:
        by_key.setdefault(key, []).append((ts, eid))
    kept = set()
    for key, evs in by_key.items():
        evs.sort()
        counts: dict[int, int] = {}
        for ts, eid in evs:
            bucket = int(ts.timestamp()) // window_sec
            if counts.get(bucket, 0) < limit:
                counts[bucket] = counts.get(bucket, 0) + 1
                kept.add(eid)
    return kept


def test_rate_limit_batch_differential(spark):
    rng = random.Random(SEED)
    rows = _corpus(rng)
    df = spark.createDataFrame(
        rows,
        T.StructType([
            T.StructField("event_id", T.LongType()),
            T.StructField("key", T.StringType()),
            T.StructField("ts", T.TimestampType()),
        ]),
    )
    for limit, window_sec in [(1, 1), (3, 1), (3, 5)]:
        out = rate_limit_batch(
            df, ["key"], limit, window_sec=window_sec, tiebreak_cols=["event_id"]
        )
        got = {r["event_id"] for r in out.collect()}
        want = _emulate(rows, limit, window_sec)
        assert got == want, (
            limit, window_sec, sorted(got ^ want)[:20], len(got), len(want),
        )


def test_rate_limit_corpus_kills_mutants():
    rng = random.Random(SEED)
    rows = _corpus(rng)

    def global_limit(rws, limit, window_sec):  # never resets per bucket
        by_key: dict[str, list] = {}
        for eid, key, ts in rws:
            by_key.setdefault(key, []).append((ts, eid))
        kept = set()
        for key, evs in by_key.items():
            evs.sort()
            for ts, eid in evs[:limit]:
                kept.add(eid)
        return kept

    def last_first(rws, limit, window_sec):  # keeps the LATEST per bucket
        by_key: dict[str, list] = {}
        for eid, key, ts in rws:
            by_key.setdefault(key, []).append((ts, eid))
        kept = set()
        for key, evs in by_key.items():
            evs.sort(reverse=True)
            counts: dict[int, int] = {}
            for ts, eid in evs:
                bucket = int(ts.timestamp()) // window_sec
                if counts.get(bucket, 0) < limit:
                    counts[bucket] = counts.get(bucket, 0) + 1
                    kept.add(eid)
        return kept

    for mutant in (global_limit, last_first):
        assert any(
            mutant(rows, lm, ws) != _emulate(rows, lm, ws)
            for lm, ws in [(1, 1), (3, 1), (3, 5)]
        ), f"corpus never exercises: {mutant.__name__}"
