"""Seeded differential for the redaction operators vs Python ``re`` with
``re.ASCII`` (the corpus and pattern pool are restricted to constructs where
Java and Python-ASCII regex agree — the point is the operators' stitch/merge
logic, not dialect trivia):

* ``desensitize_const`` replace_all=True (native regexp_replace) and False —
  the hand-rolled FIRST-occurrence stitch (regexp_instr + regexp_extract +
  substr concat, ProcessorDesensitizeNative.cpp:202-207 Replace vs
  GlobalReplace). Corpus forces matches at start/end/middle, overlapping
  candidates, no-match rows, and a replacement longer than the match.
* ``string_replace`` regex (with $1/$2 group templates), const (ALL literal
  occurrences), unquote (one balanced quote layer), plus dest_key fan-out
  leaving the source untouched.
* ``desensitize_md5`` wiring (null gating, field landing) — the hash itself
  is recomputed independently with hashlib.

Patterns that can match the empty string and empty const needles are
excluded: the reference never configures them and Spark/Python disagree on
empty-match stitching. Absent/NULL source fields must leave the map
untouched in every mode. Mutants (global-replace-when-first-only,
first-only-when-global, shared-group-template-ignored, unquote-greedy-inner)
must each fail somewhere.
"""

from __future__ import annotations

import hashlib
import random
import re

from pyspark.sql import types as T

from loongcollector_spark.operators.enrich import (
    desensitize_const,
    desensitize_md5,
    string_replace,
)

SEED = 20260819

# Java/Python-ASCII-identical pattern pool; none can match empty.
_PATTERNS = [
    r"\d+",
    r"[a-c]{2}",
    r"err(or)?",
    r"a.b",
    r"(foo|ba+r)",
    r"key=(\w+)",
    r"^\w+",
    r"\d+$",
]

_WORDS = ["err", "error", "foo", "bar", "baaar", "key=secret", "axb", "a b",
          "abc", "cab", "12", "9", "007", "", "ERR", "ke y=x", "foofoo"]


def _rand_line(rng: random.Random) -> str | None:
    r = rng.random()
    if r < 0.05:
        return None
    if r < 0.1:
        return ""
    return rng.choice(["", " "]).join(
        rng.choice(_WORDS) for _ in range(rng.randint(1, 6))
    )


def _java_tmpl_to_py(tmpl: str) -> str:
    """$1 → \\1 (the pool has no literal $ or backslash)."""
    return re.sub(r"\$(\d)", r"\\\1", tmpl)


def _apply_const(line, pattern, replacement, replace_all):
    if line is None:
        return None
    rx = re.compile(pattern, re.ASCII)
    return rx.sub(replacement.replace("\\", "\\\\"), line,
                  count=0 if replace_all else 1)


def _make_df(spark, lines):
    rows = [
        (i, {"msg": ln, "other": "keep"} if ln is not None else {"other": "keep"})
        for i, ln in enumerate(lines)
    ]
    df = spark.createDataFrame(
        rows,
        T.StructType([
            T.StructField("id", T.LongType()),
            T.StructField("fields", T.MapType(T.StringType(), T.StringType())),
        ]),
    )
    return df, rows


def test_desensitize_const_differential(spark):
    rng = random.Random(SEED)
    for pattern in _PATTERNS:
        for replace_all in (True, False):
            lines = [_rand_line(rng) for _ in range(120)]
            lines += ["err at start", "ends with 42", "12 34 56", "errorerror"]
            df, rows = _make_df(spark, lines)
            out = desensitize_const(df, "msg", pattern, "<X>", replace_all=replace_all)
            got = {r["id"]: r["fields"] for r in out.collect()}
            want = {}
            for i, f in rows:
                m = dict(f)
                if "msg" in m:
                    m["msg"] = _apply_const(m["msg"], pattern, "<X>", replace_all)
                want[i] = m
            assert got == want, (
                pattern, replace_all,
                {k: (got[k], want[k], lines[k]) for k in got if got[k] != want[k]},
            )


def test_string_replace_differential(spark):
    rng = random.Random(SEED + 1)
    lines = [_rand_line(rng) for _ in range(150)]
    lines += ['"quoted"', '""', '"', '"half', 'mid"dle"', '"a"b"', "key=a key=b"]
    df, rows = _make_df(spark, lines)

    # regex with group templates
    for pattern, tmpl in [(r"key=(\w+)", "key=<$1>"), (r"(foo|ba+r)", "[$1]"),
                          (r"(\d)(\d)", "$2$1")]:
        out = string_replace(df, "msg", "regex", pattern, tmpl)
        got = {r["id"]: r["fields"] for r in out.collect()}
        py = _java_tmpl_to_py(tmpl)
        want = {}
        for i, f in rows:
            m = dict(f)
            if "msg" in m:
                m["msg"] = re.sub(pattern, py, m["msg"], flags=re.ASCII)
            want[i] = m
        assert got == want, (pattern, tmpl,
                             {k: (got[k], want[k]) for k in got if got[k] != want[k]})

    # const: every literal occurrence
    out = string_replace(df, "msg", "const", "err", "E!")
    got = {r["id"]: r["fields"] for r in out.collect()}
    want = {}
    for i, f in rows:
        m = dict(f)
        if "msg" in m:
            m["msg"] = m["msg"].replace("err", "E!")
        want[i] = m
    assert got == want

    # unquote into a dest_key: source untouched, exactly one balanced layer
    out = string_replace(df, "msg", "unquote", dest_key="unq")
    got = {r["id"]: r["fields"] for r in out.collect()}
    want = {}
    for i, f in rows:
        m = dict(f)
        if "msg" in m:
            m["unq"] = re.sub(r'^"(.*)"$', r"\1", m["msg"])
        want[i] = m
    assert got == want, {k: (got[k], want[k]) for k in got if got[k] != want[k]}


def test_desensitize_md5_differential(spark):
    rng = random.Random(SEED + 2)
    lines = [_rand_line(rng) for _ in range(100)]
    df, rows = _make_df(spark, lines)
    pattern = r"key=(\w+)|\d+"
    out = desensitize_md5(df, "msg", pattern)
    got = {r["id"]: r["fields"] for r in out.collect()}
    rx = re.compile(pattern, re.ASCII)
    want = {}
    for i, f in rows:
        m = dict(f)
        if "msg" in m:
            m["msg"] = rx.sub(
                lambda mt: hashlib.md5(mt.group(0).encode()).hexdigest(), m["msg"]
            )
        want[i] = m
    assert got == want, {k: (got[k], want[k]) for k in got if got[k] != want[k]}


def test_redaction_corpus_kills_mutants():
    rng = random.Random(SEED)
    lines = []
    for pattern in _PATTERNS:
        for _ in range(2):
            lines += [_rand_line(rng) for _ in range(120)]
            lines += ["err at start", "ends with 42", "12 34 56", "errorerror"]
    lines = [ln for ln in lines if ln]

    def global_when_first(ln, pattern):
        return _apply_const(ln, pattern, "<X>", True)

    def first_when_global(ln, pattern):
        return _apply_const(ln, pattern, "<X>", False)

    for mutant, mode in ((global_when_first, False), (first_when_global, True)):
        assert any(
            mutant(ln, p) != _apply_const(ln, p, "<X>", mode)
            for p in _PATTERNS for ln in lines
        ), f"corpus never exercises: {mutant.__name__}"

    # group templates must matter
    assert any(
        re.sub(r"(\d)(\d)", r"\2\1", ln, flags=re.ASCII)
        != re.sub(r"(\d)(\d)", r"\1\2", ln, flags=re.ASCII)
        for ln in lines
    ), "corpus never exercises group templates"

    # unquote: lazy inner vs greedy must be indistinguishable ONLY when
    # anchored both ends — the corpus must contain a line where a greedy
    # UNANCHORED variant would differ
    assert any(
        re.sub(r'^"(.*)"$', r"\1", ln) != re.sub(r'"(.*)"', r"\1", ln)
        for ln in lines + ['mid"dle"', '"a"b']
    ), "corpus never exercises unquote anchoring"
