"""Seeded differential for prom_parse (operators/prom.py) vs a pure-Python
emulator, over randomized exposition lines collected in ONE Spark job.

Hybrid design: the line grammar regex (_LINE/_PAIR) is SHARED with the
operator — grammar acceptance is pinned separately by the TextParserUnittest
fixtures in test_prom.py — while everything downstream of the match is
INDEPENDENTLY reimplemented here: pair extraction, the left-to-right
label-value unescape (valid pairs decode, invalid pairs kept verbatim),
duplicate-label last-wins + __name__ injection, the Inf/NaN value spellings
vs double cast, and the timestamp rules (seconds-vs-ms ×1000 scaling at 2^31,
strict 2^63 long bounds, honor_timestamps' 10-digit-seconds floor, Spark's
NaN-is-largest comparison semantics). The corpus stays inside the
Java↔Python regex-identical construct set (ASCII whitespace only, no raw
newlines) so the differential exercises the semantics, not dialect trivia.
"""

from __future__ import annotations

import math
import random
import re

from pyspark.sql import types as T

from loongcollector_spark.operators.prom import _LINE, _LNAME, _PAIR, prom_parse

SEED = 20260820


# ---------------------------------------------------------------------------
# emulator
# ---------------------------------------------------------------------------

def _unescape_ref(s: str) -> str:
    out, i = [], 0
    while i < len(s):
        if s[i] == "\\" and i + 1 < len(s):
            n = s[i + 1]
            if n == "\\":
                out.append("\\")
            elif n == '"':
                out.append('"')
            elif n == "n":
                out.append("\n")
            else:
                out.append("\\" + n)  # invalid pair kept verbatim
            i += 2
        else:
            out.append(s[i])
            i += 1
    return "".join(out)


_INF_POS = {"inf", "+inf", "infinity", "+infinity"}
_INF_NEG = {"-inf", "-infinity"}
_NAN = {"nan", "+nan", "-nan"}


def _value_ref(tok: str) -> float | None:
    lv = tok.lower()
    if lv in _INF_POS:
        return float("inf")
    if lv in _INF_NEG:
        return float("-inf")
    if lv in _NAN:
        return float("nan")
    try:
        v = float(tok)
    except ValueError:
        return None
    # any float()-parseable inf/nan spelling is in the sets above; a token
    # reaching here is a plain number in both engines
    return v


def _prom_reference(line: str, default_ts_ms: int, honor: bool):
    stripped = re.sub(r"^[ \t]+", "", line)
    if not stripped or stripped.startswith("#"):
        return None
    m = re.search(_LINE, line)
    if not m:
        return None
    name, blk, vs, ts_s = m.group(1), m.group(2) or "", m.group(3), m.group(4) or ""
    labels: dict[str, str] = {}
    for p in re.findall(f"({_PAIR})", blk):
        k = re.match(f"({_LNAME})", p).group(1)
        v = re.search(r'"((?:[^"\\]|\\.)*)"', p).group(1)
        labels[k] = _unescape_ref(v)  # duplicate keys: last wins
    labels["__name__"] = name
    value = _value_ref(vs)
    if value is None:
        return None
    if ts_s:
        try:
            tnum = float(ts_s)
        except ValueError:
            return None
        if math.isnan(tnum):
            return None  # Spark NaN-is-largest: fails the < 2^63 bound
        milli = tnum * 1000 if tnum < float(1 << 31) else tnum
        if not (-float(1 << 63) < milli < float(1 << 63)):
            return None
        if honor:
            if math.floor(milli / 1000) < 1000000000:
                return None
            ts_ms = int(milli)  # double→long cast truncates toward zero
        else:
            ts_ms = default_ts_ms
    else:
        ts_ms = default_ts_ms
    return (name, labels, value, ts_ms)


# ---------------------------------------------------------------------------
# corpus
# ---------------------------------------------------------------------------

_WS = ["", " ", "  ", "\t", " \t"]
_NAMES = ["m", "_m", ":m:x", "http_req_total", "m9", "9bad", "", "na-me"]
_LKEYS = ["a", "code", "_l", "l9", "__name__", "9bad", "le:x"]
_LVALS = [
    "", "v", "GET /x?a=1", 'a\\"b', "a\\\\b", "a\\nb", "a\\xb", "a\\\\nb",
    "中 é", "a,b}c", "tail\\\\", "\\n", "x\x01y",
]
_VALUES = [
    "0", "1", "9.9410452992e+10", "0.5", ".5", "5.", "+4", "-0.25", "1E-3",
    "+Inf", "-Inf", "Inf", "NaN", "nan", "INFINITY", "-Infinity", "+NaN",
    "1a", "e5", "-", "+", "..", "1.2.3", "iN", "Na", "INF8", "1e999",
]
_TSS = [
    "", "123", "1715829785", "1715829785083", "2000000000", "2147483648",
    "99999999999999999999", "9223372036854775807", "-5", "NaN", "Inf", "1e3",
    "1715829785.5", "1.2.3",
]
_TAILS = ["", " ", "\t", " # exemplar x", " #", "#y", ' # {t="x"} 1 2', " 9 9"]


def _rand_labels(rng: random.Random) -> str:
    if rng.random() < 0.25:
        return ""
    n = rng.randint(0, 3)
    pairs = []
    for _ in range(n):
        k = rng.choice(_LKEYS)
        v = rng.choice(_LVALS)
        pairs.append(f'{k}{rng.choice(_WS)}={rng.choice(_WS)}"{v}"')
    body = (rng.choice([",", " ,", ", "])).join(pairs)
    if pairs and rng.random() < 0.3:
        body += rng.choice([",", " ,"])  # trailing comma
    if rng.random() < 0.1:
        body = body.replace('="', "=", 1)  # break a quote → invalid
    if rng.random() < 0.08:
        body = body.replace(",", " ", 1)  # drop a comma → invalid
    return "{" + rng.choice(_WS) + body + rng.choice(_WS) + "}"


def _corpus(rng: random.Random) -> list[str]:
    lines = [
        "", " ", "\t", "# HELP m a metric", " # TYPE m counter", "#",
        "m 1", "m{} 1", 'm{a="1"} 2 123', "{} 1", "1 1", "m", "m ", "m {",
        'm{a="1"', 'm{a=1} 2', 'm{="v"} 2', 'm{a="v" 2', "m 1 2 3",
        'm{a="x",a="y",__name__="z"} 1 1715829785083',
        "m 9.5#ex", "m\t5", "m 5\t1715829785083",
    ]
    for _ in range(700):
        lines.append(
            rng.choice(_WS)
            + rng.choice(_NAMES)
            + rng.choice(_WS)
            + _rand_labels(rng)
            + rng.choice(_WS)
            + rng.choice(_VALUES)
            + rng.choice(["", " ", "  ", "\t"])
            + rng.choice(_TSS)
            + rng.choice(_TAILS)
        )
    return lines


# ---------------------------------------------------------------------------
# test
# ---------------------------------------------------------------------------

def _norm_val(v: float):
    return "nan" if isinstance(v, float) and math.isnan(v) else v


def _run(spark, lines, default_ts_ms, honor):
    df = spark.createDataFrame(
        list(enumerate(lines)), T.StructType([
            T.StructField("id", T.LongType()),
            T.StructField("content", T.StringType()),
        ]),
    )
    out = prom_parse(df, default_ts_ms=default_ts_ms, honor_timestamps=honor)
    got = {
        r["id"]: (r["name"], dict(r["labels"]), _norm_val(r["value"]), r["ts_ms"])
        for r in out.collect()
    }
    want = {}
    for i, line in enumerate(lines):
        r = _prom_reference(line, default_ts_ms, honor)
        if r is not None:
            want[i] = (r[0], r[1], _norm_val(r[2]), r[3])
    assert got == want, {
        k: (got.get(k), want.get(k), lines[k])
        for k in sorted(set(got) ^ set(want) | {k for k in got if k in want and got[k] != want[k]})
    }


def test_prom_parse_differential_honor_ts(spark):
    _run(spark, _corpus(random.Random(SEED)), default_ts_ms=1700000000000, honor=True)


def test_prom_parse_differential_scrape_ts(spark):
    _run(spark, _corpus(random.Random(SEED + 1)), default_ts_ms=42, honor=False)
