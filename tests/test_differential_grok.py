"""Value-level seeded differential for ``parse_grok`` end to end.

The pattern EXPANSION is already property-tested (test_property_regex.py:
span preservation, field/capture-count invariant) — this suite tests
everything downstream of it: the ``$1\\x01$2`` pack-split extraction, the
sequential first-hit-wins pattern chain (later patterns gated on earlier
failures), the search-mode ``^.*?(…).*$`` wrap, the KeepSource policy
entries (``__raw__`` on success / ``__raw_log__`` on fail), and the
``typed_columns`` try_cast hints — against Python ``re`` running the SAME
expanded regex (so a disagreement isolates the Spark evaluation path).

Corpus: lines built to hit pattern 1 only, pattern 2 only, BOTH (order
must decide), none, prefix/suffix noise around an embedded match (search
mode), an int-hinted field carrying a decimal (try_cast → NULL column) and
an in-range negative, empty-capture GREEDYDATA, and NULL sources.

Mutation-checked: a last-hit-wins chain and a fullmatch-instead-of-search
evaluator must each disagree somewhere.
"""

from __future__ import annotations

import random
import re

from pyspark.sql import types as T

from loongcollector_spark.operators.grok import compile_grok, parse_grok

SEED = 20260819

_PATTERNS = [
    r"\[%{TIMESTAMP_ISO8601:ts}\] %{LOGLEVEL:lvl} %{GREEDYDATA:msg}",
    r"%{IP:client} %{WORD:method} %{NUMBER:bytes:int}",
    r"err=%{NUMBER:code:int} ratio=%{NUMBER:ratio:float}",
]

_HITS_1 = [
    "[2026-01-02T10:20:30] INFO all good",
    "[2026-01-02 10:20:30] warn low disk",
    "[2026-12-31T23:59:59] ERROR ",          # empty-capture GREEDYDATA
]
_HITS_2 = [
    "10.0.0.1 GET 2048",
    "prefix 192.168.1.9 POST -7 suffix",     # embedded (search mode)
    "8.8.8.8 PUT 3.5",                       # int hint carries a decimal
]
_HITS_3 = ["err=500 ratio=0.25", "noise err=-2 ratio=1e3 tail"]
_BOTH = ["[2026-01-02T10:20:30] INFO 10.0.0.1 GET 42"]  # pattern 1 wins
_MISS = ["plain text", "", "err=x ratio=y", "10.0.0.1 GET notanum"]


def _emulate(line: str | None, compiled):
    """fields map + typed columns per the documented chain semantics."""
    if line is None:
        return {"__raw_log__": None}, {}
    for rx, keys, types in compiled:
        m = re.match(rx, line)
        if m:
            fields = dict(zip(keys, m.groups()))
            fields["__raw__"] = line
            typed = {}
            for f, t in types.items():
                v = fields.get(f)
                if t == "long":
                    typed[f] = int(v) if re.fullmatch(r"[+-]?\d+", v or "") else None
                elif t == "double":
                    try:
                        typed[f] = float(v)
                    except (TypeError, ValueError):
                        typed[f] = None
            return fields, typed
    return {"__raw_log__": line}, {}


def test_grok_differential(spark):
    rng = random.Random(SEED)
    lines: list[str | None] = _HITS_1 + _HITS_2 + _HITS_3 + _BOTH + _MISS + [None]
    # randomized paddings around known hits keep search mode honest
    for _ in range(60):
        core = rng.choice(_HITS_1 + _HITS_2 + _HITS_3 + _MISS)
        pad_l = rng.choice(["", "x ", ">> "])
        pad_r = rng.choice(["", " y", " <<"])
        lines.append(pad_l + core + pad_r)
    df = spark.createDataFrame(
        list(enumerate(lines)),
        T.StructType([
            T.StructField("id", T.LongType()),
            T.StructField("content", T.StringType()),
        ]),
    )
    compiled = compile_grok(_PATTERNS)
    out = parse_grok(df, _PATTERNS, typed_columns=True)
    hinted = sorted({f for _rx, _k, ts in compiled for f in ts})
    got = {
        r["id"]: (r["fields"], {f: r[f] for f in hinted if r[f] is not None})
        for r in out.collect()
    }
    want = {}
    for i, ln in enumerate(lines):
        fields, typed = _emulate(ln, compiled)
        want[i] = (fields, {f: v for f, v in typed.items() if v is not None})
    assert got == want, {
        k: (got[k], want[k], lines[k]) for k in got if got[k] != want[k]
    }


def test_grok_drop_unmatched(spark):
    """ignore_parse_failure=False drops misses entirely."""
    lines = _HITS_1[:1] + _MISS
    df = spark.createDataFrame(
        list(enumerate(lines)),
        T.StructType([
            T.StructField("id", T.LongType()),
            T.StructField("content", T.StringType()),
        ]),
    )
    out = parse_grok(df, _PATTERNS, ignore_parse_failure=False)
    assert {r["id"] for r in out.collect()} == {0}


def test_grok_corpus_kills_mutants():
    compiled = compile_grok(_PATTERNS)
    lines = _HITS_1 + _HITS_2 + _HITS_3 + _BOTH + _MISS

    def last_wins(line, comp):
        res = ({"__raw_log__": line}, {})
        for rx, keys, types in comp:
            m = re.match(rx, line)
            if m:
                f = dict(zip(keys, m.groups()))
                f["__raw__"] = line
                res = (f, {})
        return res[0]

    def fullmatch_core(line, comp):
        for rx, keys, _t in comp:
            # strip the search wrap → pure core fullmatch
            core = rx.removeprefix(r"(?s)^.*?").removesuffix(r".*$")
            m = re.fullmatch(core, line)
            if m:
                f = dict(zip(keys, m.groups()))
                f["__raw__"] = line
                return f
        return {"__raw_log__": line}

    assert any(
        last_wins(ln, compiled) != _emulate(ln, compiled)[0] for ln in lines
    ), "corpus never exercises first-hit-wins"
    assert any(
        fullmatch_core(ln, compiled) != _emulate(ln, compiled)[0] for ln in lines
    ), "corpus never exercises search mode"
