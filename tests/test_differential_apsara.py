"""Seeded differential for parse_apsara (operators/parse.py) vs a pure-Python
emulator of the documented ProcessorParseApsaraNative semantics
(.cpp:226-232,433-463): leading ``[time]`` gate, bracketed base-field
classification (first all-caps block → __LEVEL__, first all-digits →
__THREAD__, first with '/' or both '.' and ':' → __FILE__/__LINE__ split on
the LAST colon), tab-separated k:v tail (first-colon split, last-wins dedupe,
kv keys overwrite base keys), microtime emission, epoch bound + try_cast
degradation for oversized digit times, and the keep-raw-on-fail policy.

Time strings in the corpus are digit epochs or clearly unparseable garbage —
non-epoch datetime parsing goes through Spark's try_to_timestamp whose accepted
formats/timezone are engine trivia pinned by fixture tests, not fuzzed here.
event_time is compared as ``unix_micros`` computed Spark-side (tz-independent).
"""

from __future__ import annotations

import random
import re

from pyspark.sql import functions as F
from pyspark.sql import types as T

from loongcollector_spark.operators.parse import _EPOCH_MAX_S, parse_apsara

SEED = 20260823


def _classify(brackets: list[str]):
    level = thread = fileline = None
    for c in brackets:
        if level is None and re.fullmatch(r"[A-Z]+", c):
            level = c
        if thread is None and re.fullmatch(r"\d+", c):
            thread = c
        if fileline is None and ("/" in c or ("." in c and ":" in c)):
            fileline = c
    return level, thread, fileline


def _apsara_reference(line: str | None):
    """(parse_ok, fields dict, event_micros|None); failure keeps the raw."""
    if line is None:
        return (False, {"__raw_log__": None}, None)
    parts = line.split("\t")
    m = re.fullmatch(r"\[([^\]]*)\]", parts[0])
    if not m or m.group(1) == "":
        return (False, {"__raw_log__": line}, None)
    tstr = m.group(1)
    micros = None
    micro_field = None
    if re.fullmatch(r"\d+", tstr):
        el = int(tstr)
        if el <= _EPOCH_MAX_S:
            micros = el * 1_000_000
            micro_field = str(micros)
    # else: non-epoch → try_to_timestamp; corpus keeps these unparseable → None
    rest = parts[1:]
    brackets = [p[1:-1] for p in rest if p.startswith("[") and p.endswith("]")]
    level, thread, fileline = _classify(brackets)
    fields: dict[str, str | None] = {}
    if micro_field is not None:
        fields["microtime"] = micro_field
    if level is not None:
        fields["__LEVEL__"] = level
    if thread is not None:
        fields["__THREAD__"] = thread
    if fileline is not None:
        line_no = fileline.rsplit(":", 1)[-1] if ":" in fileline else fileline
        fields["__FILE__"] = fileline[: max(len(fileline) - len(line_no) - 1, 0)]
        fields["__LINE__"] = line_no
    # kv tail: non-bracket parts re-joined then re-split — when the JOINED
    # tail is the empty string (no parts, or a single empty part) the operator
    # gates the whole kv stage off, so no {'': null} entry is emitted; an
    # empty part BESIDE real ones does produce that entry
    kv_toks = [p for p in rest if not (p.startswith("[") and p.endswith("]"))]
    if "\t".join(kv_toks) != "":
        for tok in kv_toks:
            if ":" in tok:
                k, _, v = tok.partition(":")
                fields[k] = v
            else:
                fields[tok] = None  # bare token → null-valued entry, last wins
    return (True, fields, micros)


_TIMES = [
    "[1715829785]", "[253402300799]", "[253402300800]", "[99999999999999999999]",
    "[0]", "[not a time]", "[]", "1715829785", "[x]y", "plainstart",
]
_PARTS = [
    "[INFO]", "[ERROR]", "[WARNING]", "[12345]", "[0]", "[Ab3]", "[0x2b]",
    "[/path/to/f.cpp:123]", "[file.cpp:88]", "[a.b:c:9]", "[build/debug]",
    "[]", "k:v", "key2:val:ue", ":x", "k:", "plain", "", "microtime:override",
    "__LEVEL__:fake", "ké:vé", "[has space]", "k:v:w:x",
]


def test_apsara_differential(spark):
    rng = random.Random(SEED)
    lines: list[str | None] = [None, "", "\t", "no brackets here", "[1715829785]"]
    for _ in range(500):
        t = rng.choice(_TIMES)
        body = [rng.choice(_PARTS) for _ in range(rng.randint(0, 6))]
        lines.append("\t".join([t] + body))
    df = spark.createDataFrame(
        list(enumerate(lines)), T.StructType([
            T.StructField("id", T.LongType()),
            T.StructField("content", T.StringType()),
        ]),
    )
    out = parse_apsara(df)
    got = {
        r["id"]: (r["_parse_ok"], dict(r["fields"]), r["_ev_us"])
        for r in out.select(
            "id", "_parse_ok", "fields", F.unix_micros("event_time").alias("_ev_us")
        ).collect()
    }
    want = {i: _apsara_reference(ln) for i, ln in enumerate(lines)}
    assert got == want, {
        k: (got[k], want[k], lines[k]) for k in got if got[k] != want[k]
    }
