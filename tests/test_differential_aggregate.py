"""Seeded differentials for the batching/lineage folds, checked against
SEQUENTIAL pure-Python folds — a genuinely different algorithm shape from the
operators' row_number/window formulations:

* ``batch_cuts`` (FlushStrategy.h:52,88-104 semantics): a per-group ordered
  fold that cuts a batch on every minute change and every ``min_cnt`` events
  within a minute must produce the same (group, minute, batch_seq, n_events,
  first_ts, last_ts) rows as the (group, minute)-partitioned window.
  Corpus forces ts ties (order-col tie-break), minute-boundary straddles,
  batches cut at exactly min_cnt, and single-event minutes.

* ``metadata_group_counts`` (aggregator_metadata_group.go:48-120): chunk
  sizes from a sequential cap-fold, plus the key-resolution precedence —
  a key present BOTH as promoted column and in the tags map resolves to the
  column; tags-only keys resolve into the map; absent keys group as NULL.

* ``context_pack`` (aggregator_context.go:30-140, util.go:371-385):
  ``{md5(config-source)[:16]:upper}-{batch_seq:X}`` pack ids recomputed per
  row with hashlib + a rank fold, and the order-preservation invariant — in
  every output partition each source's rows are contiguous and (source,
  order)-sorted (the Spark analog of per-source LogGroup append order).
"""

from __future__ import annotations

import hashlib
import random
from datetime import datetime, timedelta

from pyspark.sql import types as T

from loongcollector_spark.operators.aggregate import (
    batch_cuts,
    context_pack,
    metadata_group_counts,
)

SEED = 20260819
_BASE = datetime(2026, 3, 1, 10, 0, 0)


# ---------------------------------------------------------------------------
# batch_cuts
# ---------------------------------------------------------------------------

def _emulate_batch_cuts(events, min_cnt: int):
    """events: list of (group, ts, event_id). Sequential per-group fold:
    new batch on minute change or at min_cnt events."""
    by_group: dict[str, list] = {}
    for g, ts, eid in events:
        by_group.setdefault(g, []).append((ts, eid))
    out = {}
    for g, evs in by_group.items():
        evs.sort()
        cur_minute = None
        seq = -1
        cnt = 0
        for ts, _eid in evs:
            minute = ts.replace(second=0, microsecond=0)
            if minute != cur_minute:
                cur_minute, seq, cnt = minute, 0, 0
            elif cnt == min_cnt:
                seq, cnt = seq + 1, 0
            cnt += 1
            key = (g, minute, seq)
            if key not in out:
                out[key] = [0, ts, ts]
            rec = out[key]
            rec[0] += 1
            rec[1] = min(rec[1], ts)
            rec[2] = max(rec[2], ts)
    return {k: tuple(v) for k, v in out.items()}


def test_batch_cuts_differential(spark):
    rng = random.Random(SEED)
    for min_cnt in (1, 3, 7):
        events = []
        eid = 0
        for g in ("web", "db", "solo"):
            n = {"web": 400, "db": 120, "solo": 1}[g]
            for _ in range(n):
                ts = _BASE + timedelta(
                    minutes=rng.randint(0, 5),
                    seconds=rng.choice([0, 1, 30, 59]),  # boundary-heavy
                    microseconds=rng.choice([0, 0, 123456]),
                )
                events.append((g, ts, eid))
                eid += 1
        # forced exact-duplicate timestamps (tie-break via event_id)
        events += [("web", events[0][1], eid + i) for i in range(5)]
        df = spark.createDataFrame(
            events,
            T.StructType([
                T.StructField("source", T.StringType()),
                T.StructField("ts", T.TimestampType()),
                T.StructField("event_id", T.LongType()),
            ]),
        )
        got = {
            (r["source"], r["minute"], r["batch_seq"]):
                (r["n_events"], r["first_ts"], r["last_ts"])
            for r in batch_cuts(df, ["source"], min_cnt=min_cnt).collect()
        }
        want = _emulate_batch_cuts(events, min_cnt)
        assert got == want, (
            min_cnt,
            {k: (got.get(k), want.get(k)) for k in set(got) | set(want)
             if got.get(k) != want.get(k)},
        )


def test_batch_cuts_corpus_kills_mutants():
    rng = random.Random(SEED)
    events = []
    eid = 0
    for g in ("web", "db", "solo"):
        n = {"web": 400, "db": 120, "solo": 1}[g]
        for _ in range(n):
            ts = _BASE + timedelta(
                minutes=rng.randint(0, 5),
                seconds=rng.choice([0, 1, 30, 59]),
                microseconds=rng.choice([0, 0, 123456]),
            )
            events.append((g, ts, eid))
            eid += 1
    events += [("web", events[0][1], eid + i) for i in range(5)]

    def no_minute_cut(evts, mc):  # count cuts only, minute ignored
        by_group: dict[str, list] = {}
        for g, ts, e in evts:
            by_group.setdefault(g, []).append((ts, e))
        out = {}
        for g, evs in by_group.items():
            evs.sort()
            for i, (ts, _e) in enumerate(evs):
                minute = ts.replace(second=0, microsecond=0)
                key = (g, minute, i // mc)
                rec = out.setdefault(key, [0, ts, ts])
                rec[0] += 1
                rec[1] = min(rec[1], ts)
                rec[2] = max(rec[2], ts)
        return {k: tuple(v) for k, v in out.items()}

    def global_seq(evts, mc):  # batch_seq not reset per minute
        by_group: dict[str, list] = {}
        for g, ts, e in evts:
            by_group.setdefault(g, []).append((ts, e))
        out = {}
        for g, evs in by_group.items():
            evs.sort()
            cur_minute, seq, cnt = None, -1, 0
            for ts, _e in evs:
                minute = ts.replace(second=0, microsecond=0)
                if minute != cur_minute or cnt == mc:
                    cur_minute, seq, cnt = minute, seq + 1, 0
                cnt += 1
                key = (g, minute, seq)
                rec = out.setdefault(key, [0, ts, ts])
                rec[0] += 1
                rec[1] = min(rec[1], ts)
                rec[2] = max(rec[2], ts)
        return {k: tuple(v) for k, v in out.items()}

    # each mutant must be killed by at least one min_cnt config
    assert any(no_minute_cut(events, mc) != _emulate_batch_cuts(events, mc)
               for mc in (1, 3, 7)), "no_minute_cut never exercised"
    assert any(global_seq(events, mc) != _emulate_batch_cuts(events, mc)
               for mc in (1, 3, 7)), "global_seq never exercised"


# ---------------------------------------------------------------------------
# metadata_group_counts
# ---------------------------------------------------------------------------

def test_metadata_group_counts_differential(spark):
    rng = random.Random(SEED + 1)
    rows = []
    for i in range(600):
        host = f"h{rng.randint(0, 3)}"
        tags = {"app": f"a{rng.randint(0, 2)}"}
        if rng.random() < 0.5:
            tags["host"] = "TAG-SHADOW"  # must lose to the promoted column
        if rng.random() < 0.1:
            del tags["app"]  # absent key → NULL group
        rows.append((i, host, tags))
    df = spark.createDataFrame(
        rows,
        T.StructType([
            T.StructField("id", T.LongType()),
            T.StructField("host", T.StringType()),
            T.StructField("tags", T.MapType(T.StringType(), T.StringType())),
        ]),
    )
    cap = 7
    got = {
        (r["host"], r["app"], r["group_seq"]): r["n_events"]
        for r in metadata_group_counts(df, ["host", "app"], max_group_events=cap).collect()
    }
    sizes: dict[tuple, int] = {}
    for _i, host, tags in rows:
        k = (host, tags.get("app"))  # column precedence: host NEVER TAG-SHADOW
        sizes[k] = sizes.get(k, 0) + 1
    want = {}
    for (host, app), n in sizes.items():
        for seq in range(0, (n + cap - 1) // cap):
            want[(host, app, seq)] = min(cap, n - seq * cap)
    assert got == want, {k: (got.get(k), want.get(k))
                         for k in set(got) | set(want) if got.get(k) != want.get(k)}


# ---------------------------------------------------------------------------
# context_pack
# ---------------------------------------------------------------------------

def _pack_prefix(config: str, source: str) -> str:
    return hashlib.md5(f"{config}-{source}".encode()).hexdigest()[:16].upper()


def test_context_pack_differential(spark):
    rng = random.Random(SEED + 2)
    rows = []
    for i in range(500):
        rows.append((i, f"s{rng.randint(0, 4)}"))
    df = spark.createDataFrame(
        rows,
        T.StructType([
            T.StructField("event_id", T.LongType()),
            T.StructField("source", T.StringType()),
        ]),
    )
    cap = 9
    out = context_pack(df, "event_id", max_log_count=cap, config_name="cfg")
    got = {r["event_id"]: r["__pack_id__"] for r in out.collect()}

    ranks: dict[str, int] = {}
    want = {}
    for i, src in sorted(rows):  # event_id order == per-source window order
        ranks[src] = ranks.get(src, 0) + 1
        seq = (ranks[src] - 1) // cap + 1
        want[i] = f"{_pack_prefix('cfg', src)}-{seq:X}"
    assert got == want, {k: (got[k], want[k]) for k in got if got[k] != want[k]}

    # order-preservation invariant: within every partition, each source's
    # rows are contiguous and sorted by (source, event_id)
    def check_part(it):
        prev = None
        seen = set()
        for row in it:
            cur = (row.source, row.event_id)
            if prev is not None and prev[0] == cur[0]:
                assert prev[1] < cur[1], f"order broken: {prev} then {cur}"
            if prev is None or prev[0] != cur[0]:
                assert cur[0] not in seen, f"source {cur[0]} not contiguous"
                seen.add(cur[0])
            prev = cur
        return iter([])

    out.rdd.mapPartitions(check_part).count()
