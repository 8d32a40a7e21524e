"""Seeded differential for the SPL ``parse-kv`` verb (plans/spl.py) — the one
verb whose value extraction is a hand-built expression chain (filter on
first-token-before-kvsep equality, then substr past the first kvsep) rather
than a direct builtin — vs a pure-Python emulator, over randomized pair/kv
separators (incl. multi-char and regex-metachar ones), junk tokens without a
kv separator, duplicate keys (first match wins), keys that prefix other keys,
empty values, and values containing the kv separator again.
"""

from __future__ import annotations

import random

from pyspark.sql import types as T

from loongcollector_spark.plans.spl import compile_spl

SEED = 20260822

_KEYS = ["k", "k2", "key", "a", "code"]
_VALS = ["", "v", "10", "x y", "a=b", "p:q", "vv;w", "é"]


def _kv_reference(line: str, psep: str, ksep: str, keys: list[str]):
    toks = line.split(psep)
    out = {}
    for k in keys:
        val = None
        for t in toks:
            head = t.split(ksep, 1)[0] if ksep in t else t
            if head == k:
                val = t[len(head) + len(ksep):] if ksep in t else ""
                break
        out[k] = val
    return out


def _rand_line(rng: random.Random, psep: str, ksep: str) -> str:
    toks = []
    for _ in range(rng.randint(0, 5)):
        r = rng.random()
        if r < 0.7:
            toks.append(f"{rng.choice(_KEYS)}{ksep}{rng.choice(_VALS)}")
        elif r < 0.85:
            toks.append(rng.choice(_KEYS))  # bare key, no kv sep
        else:
            toks.append(rng.choice(["junk", "", " ", "x y z"]))
    return psep.join(toks)


def test_spl_parse_kv_differential(spark):
    rng = random.Random(SEED)
    for psep, ksep in [(";", "="), ("&", ":"), ("||", "=>"), (", ", "=")]:
        keys = rng.sample(_KEYS, 3)
        lines = [_rand_line(rng, psep, ksep) for _ in range(120)]
        df = spark.createDataFrame(
            list(enumerate(lines)), T.StructType([
                T.StructField("id", T.LongType()),
                T.StructField("msg", T.StringType()),
            ]),
        )
        script = (
            f"* | parse-kv msg, '{psep}', '{ksep}' as " + ", ".join(keys)
        )
        got = {
            r["id"]: {k: r[k] for k in keys}
            for r in compile_spl(df, script).collect()
        }
        want = {
            i: _kv_reference(ln, psep, ksep, keys) for i, ln in enumerate(lines)
        }
        assert got == want, (psep, ksep, keys, {
            k: (got[k], want[k], lines[k]) for k in got if got[k] != want[k]
        })
