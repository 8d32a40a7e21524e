"""Seeded differential tests for the container stdout parsers and the
P-flag partial stitch (operators/container.py) vs pure-Python reference
emulators implementing the documented semantics of
ProcessorParseContainerLogNative.cpp (CRI three-delimiter scan with the
``pch3 == pch2+2`` single-char-tag rule; docker JSON-file exact-key-set +
quoted-value parse) and ProcessorMergeMultilineLogNative::MergeLogsByFlag.

Same design as test_differential.py: every randomized corpus is collected in
ONE Spark job per test. The docker generator never embeds ``"log"``-shaped
substrings inside VALUES, because the operator's quoted-value check is a
structural regex over the raw line (documented approximation) while the
emulator checks ``isinstance(value, str)`` — the generator stays inside the
region where the two agree, which is everything a container runtime emits.
"""

from __future__ import annotations

import json
import random

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from loongcollector_spark.operators.container import (
    CONTAINERD_TEXT,
    DOCKER_JSON_FILE,
    merge_container_partials,
    parse_container_log,
)

SEED = 20260819


# ---------------------------------------------------------------------------
# pure-Python reference emulators
# ---------------------------------------------------------------------------

def _cri_reference(line: str | None):
    """(time, source, content, partial) on success, None on parse failure —
    the .cpp:180-257 scan in 0-based Python."""
    if line is None:
        return None
    p1 = line.find(" ")
    if p1 == -1:
        return None
    p2 = line.find(" ", p1 + 1)
    if p2 == -1:
        return None
    src = line[p1 + 1 : p2]
    if src not in ("stdout", "stderr"):
        return None
    tag = line[p2 + 1 : p2 + 2]
    p3 = line.find(" ", p2 + 1)
    if tag in ("P", "F") and p3 == p2 + 2:
        return (line[:p1], src, line[p3 + 1 :], tag == "P")
    return (line[:p1], src, line[p2 + 1 :], False)


def _docker_reference(line: str | None):
    """(time, source, content, partial=False) or None — ParseDockerLog
    (.cpp:360-462): exactly the {log, stream, time} pairs, every value a
    string, stream stdout/stderr, ONE trailing newline stripped."""
    if line is None:
        return None
    if not (line.startswith("{") and line.endswith("}")):
        return None  # the reference's outer shape check (.cpp:362-364)
    try:
        obj = json.loads(line)
    except Exception:
        return None
    if not isinstance(obj, dict) or set(obj.keys()) != {"log", "stream", "time"}:
        return None
    if not all(isinstance(obj[k], str) for k in ("log", "stream", "time")):
        return None
    if obj["stream"] not in ("stdout", "stderr"):
        return None
    log = obj["log"]
    if log.endswith("\n"):
        log = log[:-1]
    return (obj["time"], obj["stream"], log, False)


def _expected_rows(lines, reference, keeping_source=True):
    out = []
    for i, line in enumerate(lines):
        r = reference(line)
        if r is None:
            if keeping_source:
                out.append((i, None, None, line, False, False))
        else:
            t, s, c, p = r
            out.append((i, t, s, c, p, True))
    return out


def _run_parser(spark, lines, fmt, **kw):
    df = spark.createDataFrame(
        list(enumerate(lines)), T.StructType([
            T.StructField("id", T.LongType()),
            T.StructField("content", T.StringType()),
        ]),
    )
    got = parse_container_log(df, fmt=fmt, **kw).orderBy("id").collect()
    return [
        (r["id"], r["_time_"], r["_source_"], r["content"], r["is_partial"], r["parse_ok"])
        for r in got
    ]


# ---------------------------------------------------------------------------
# corpora
# ---------------------------------------------------------------------------

_CONTENT_ALPHA = "ab xy01.:=\"{}中é\t"


def _rand_content(rng: random.Random, n_max: int = 12) -> str:
    return "".join(rng.choice(_CONTENT_ALPHA) for _ in range(rng.randint(0, n_max)))


def _cri_corpus(rng: random.Random) -> list[str | None]:
    times = ["2024-01-01T00:00:00.000000000Z", "", "t", "2024-01-01"]
    streams = ["stdout", "stderr", "stdou", "stdoutx", "", "Stdout", "std err", "stderr "]
    tagsegs = ["P ", "F ", "", "P", "F", "PP ", "X ", "P  ", " P ", "Q ", "PF ", "p "]
    lines: list[str | None] = [
        None, "", " ", "  ", "   ", "nospace", "one space", "x ", "x y", "x y ",
        "t stdout", "t stdout ", "t stdout P", "t stdout F", "t stdout P ",
        "t stdout PP 1", "t stderr F hello world", " stdout P x", "t  stdout P x",
    ]
    for _ in range(450):
        t = rng.choice(times)
        s = rng.choice(streams)
        tag = rng.choice(tagsegs)
        body = _rand_content(rng)
        lines.append(f"{t} {s} {tag}{body}")
    for _ in range(60):  # free-form junk
        lines.append(_rand_content(rng, 20))
    return lines


def _docker_corpus(rng: random.Random) -> list[str | None]:
    streams = ["stdout", "stderr", "stdin", "", "Stdout"]
    # value payloads: no double quotes / backslashes except via json.dumps,
    # and never a '"log"'-shaped substring (see module docstring)
    lines: list[str | None] = [
        None, "", "{}", "[]", "null", "not json", "{'log':'a'}",
        '{"log":"a","stream":"stdout","time":"T"}',
        '{"log":"a\\n","stream":"stdout","time":"T"}',
        '{"log":"a\\n\\n","stream":"stderr","time":"T"}',
        '{"log":1,"stream":"stdout","time":"t"}',
        '{"log":"a","stream":"stdout","time":2}',
        '{"log":"a","stream":true,"time":"t"}',
        '{"log":"\\u4e2d\\" x","stream":"stdout","time":"t"}',
        '  {"log":"lead ws","stream":"stdout","time":"t"}',
        '{"log":"a","stream":"stdout","time":"t"} tail',
        '{"log":"a","stream":"stdout"}',
        '{"log":"a","stream":"stdout","time":"t","extra":"e"}',
        '{"LOG":"a","stream":"stdout","time":"t"}',
        '{"log":"a","stream":"stdout","time":"t"',
    ]
    for _ in range(250):
        obj = {}
        keys = ["log", "stream", "time"]
        if rng.random() < 0.1:
            keys = rng.sample(keys, rng.randint(1, 3))
        if rng.random() < 0.1:
            keys = keys + ["attrs"]
        for k in keys:
            if k == "stream":
                obj[k] = rng.choice(streams)
            elif rng.random() < 0.08:
                obj[k] = rng.randint(0, 9)  # non-string value → parse failure
            else:
                v = _rand_content(rng).replace('"', "").replace("\\", "")
                if k == "log" and rng.random() < 0.4:
                    v += "\n" * rng.randint(1, 2)
                obj[k] = v
        lines.append(json.dumps(obj, ensure_ascii=rng.random() < 0.5))
    return lines


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

def test_containerd_differential(spark):
    rng = random.Random(SEED)
    lines = _cri_corpus(rng)
    assert _run_parser(spark, lines, CONTAINERD_TEXT) == _expected_rows(lines, _cri_reference)


def test_containerd_differential_drop_failures(spark):
    rng = random.Random(SEED + 1)
    lines = _cri_corpus(rng)
    got = _run_parser(spark, lines, CONTAINERD_TEXT, keeping_source=False)
    assert got == _expected_rows(lines, _cri_reference, keeping_source=False)


def test_docker_json_differential(spark):
    rng = random.Random(SEED + 2)
    lines = _docker_corpus(rng)
    assert _run_parser(spark, lines, DOCKER_JSON_FILE) == _expected_rows(lines, _docker_reference)


def test_merge_partials_differential(spark):
    """Random P/F sequences per stream vs a Python fold of MergeLogsByFlag:
    a run of partials merges with the first following non-partial; trailing
    runs flush incomplete; carried columns come from the event's FIRST row."""
    rng = random.Random(SEED + 3)
    rows = []
    for stream in ("s0", "s1", "s2", "s3"):
        for line_no in range(rng.randint(0, 40)):
            rows.append((stream, line_no, f"c{stream}#{line_no};", rng.random() < 0.45,
                         f"t{line_no}"))
    df = spark.createDataFrame(rows, "stream_id string, line_no int, content string, "
                                     "is_partial boolean, _time_ string")
    got = sorted(
        (r["stream_id"], r["event_seq"], r["line_no"], r["_time_"], r["content"],
         r["n_parts"], r["complete"])
        for r in merge_container_partials(df).collect()
    )
    # emulator: per-row event seq = count of PRECEDING non-partial rows
    expected = {}
    for stream, line_no, content, partial, tv in sorted(rows):
        seq = sum(1 for s, ln, _, p, _t in rows if s == stream and ln < line_no and not p)
        key = (stream, seq)
        if key not in expected:
            expected[key] = [line_no, tv, "", 0, False]
        ev = expected[key]
        ev[2] += content
        ev[3] += 1
        ev[4] = ev[4] or not partial
    assert got == sorted((s, q, *v) for (s, q), v in expected.items())
