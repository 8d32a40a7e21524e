"""Seeded differential for route_rows (operators/route.py) — anchored
first-match routing — vs a Python ``re.search("^(?:r)$")`` emulator, over
random rule chains and source values. Guards the alternation-anchoring
translation permanently (bare ``^json|delimiter$`` once matched 'json2';
fixed in-round, now fuzzed): redundant inner anchors, empty patterns, empty
alternation branches, trailing-newline values (Java and Python both let ``$``
match before a final line terminator — pinned here), NULL sources, and both
default-sink and DropDisMatch modes.
"""

from __future__ import annotations

import random
import re

from pyspark.sql import types as T

from loongcollector_spark.operators.route import RouteRule, route_rows

SEED = 20260824

_REGEXES = [
    "json", "json|delimiter", "a.*", ".*2", "x+", "(nginx|apsara)",
    "n[a-z]+x", "", "^foo$", "a|", ".*", "j.son", "[jd].*r?",
]
_VALUES = [
    "json", "json2", "xdelimiter", "delimiter", "nginx", "apsara", "",
    "a", "aa2", "foo", "xfoox", "json\n", "j\nson", None, "xxx", "a2",
]
_SINKS = ["s1", "s2", "s3", "s4"]


def _route_reference(val: str | None, rules: list[RouteRule], default):
    if val is not None:
        for r in rules:
            if re.search(f"^(?:{r.regex})$", val):
                return r.sink
    return default


def test_route_rows_differential(spark):
    rng = random.Random(SEED)
    rows = [(i, rng.choice(_VALUES)) for i in range(200)]
    df = spark.createDataFrame(rows, T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("source", T.StringType()),
    ]))
    for trial in range(12):
        rules = [
            RouteRule(regex=rng.choice(_REGEXES), sink=rng.choice(_SINKS))
            for _ in range(rng.randint(0, 4))
        ]
        for default in ("default", None):
            got = {
                r["id"]: r["route"]
                for r in route_rows(df, rules, default_sink=default).collect()
            }
            want = {}
            for i, v in rows:
                s = _route_reference(v, rules, default)
                if s is not None or default is not None:
                    want[i] = s
            assert got == want, (trial, default, rules, {
                k: (got.get(k), want.get(k), dict(rows)[k])
                for k in set(got) ^ set(want)
                | {k for k in got if k in want and got[k] != want[k]}
            })
