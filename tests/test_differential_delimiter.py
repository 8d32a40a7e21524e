"""Seeded differentials for the two parsers whose output maps are built from
hand-rolled masked-slice / fold chains rather than one builtin call:

* ``parse_delimiter`` (non-quote path, ``delimiter_fields`` —
  ProcessorParseDelimiterNative.cpp:206-409 semantics): literal-separator
  split, space-only trim (tabs survive), all three overflow policies
  (``extend`` with the ``max_extend_cols`` silent cap, ``keep`` gluing the
  UNTRIMMED remainder back with the separator, ``discard``),
  ``allow_shortened`` both ways, and the CommonParserOptions keep-raw-on-fail
  entry — vs a pure-Python emulator over randomized corpora for five
  separator shapes (single char, regex metachar, multi-char, comma, tab).

* ``split_key_value`` (``kv_fields`` — key_value_splitter.go:26-52,98): the
  two-counter anomaly fold (``no_separator_key_{N}`` / ``empty_key_{N}``),
  first-occurrence key split with multi-char separators, and last-wins
  duplicate-key dedup — including corpus rows where a REAL key collides with
  a synthesized anomaly key, so the dedup order itself is under test.

Each emulator is mutation-checked in-test: deliberately wrong variants
(strip-all-whitespace trim, uncapped extend, trimmed keep-glue, shortened-ok,
first-wins dedup, counter-shared anomaly keys) must disagree with the true
emulator somewhere on the corpus, proving the random draw actually exercises
those semantics.
"""

from __future__ import annotations

import random

from pyspark.sql import types as T

from loongcollector_spark.operators.parse import (
    PARSE_OK,
    parse_delimiter,
    split_key_value,
)

SEED = 20260819

# Tokens deliberately include space padding (trimmed), tab padding (NOT
# trimmed — Spark trim is 0x20-only), empties, unicode, and text containing
# the OTHER configs' separators.
_TOKENS = [
    "v", " v ", "", "  ", "\tv\t", " \tx ", "a b", "10", "é π", "k:v",
    "a=b", "x|y", "p,q", "dot.dot", "||", " trailing", "lead ", ":",
]


def _emulate_delimiter(
    src: str | None,
    keys: list[str],
    sep: str,
    overflow: str,
    allow_shortened: bool,
    max_extend: int,
):
    """Pure-Python reference for delimiter_fields + default ParserOptions +
    _finalize_fields on a frame without a pre-existing fields col.

    NULL content follows the library contract already pinned by the apsara
    differential: the keep-raw-on-fail entry is emitted with a NULL value
    (``{'__raw_log__': None}``) and PARSE_OK is NULL (three-valued ``sz >= n``
    over a NULL split), which the strict-drop path filters out like False."""
    if src is None:
        return {"__raw_log__": None}, None
    parts = src.split(sep)
    sz = len(parts)
    n = len(keys)
    ok = (sz >= 1) if allow_shortened else (sz >= n)
    fields: dict[str, str] = {}
    if ok:
        avail = min(sz, n)
        for i in range(avail):
            fields[keys[i]] = parts[i].strip(" ")
        if overflow == "extend":
            ecnt = min(max(sz - n, 0), max_extend)
            for j in range(ecnt):
                fields[f"__column{n + j}__"] = parts[n + j].strip(" ")
        elif overflow == "keep" and sz > n:
            fields[f"__column{n}__"] = sep.join(parts[n:])
    else:
        fields["__raw_log__"] = src  # keep_source_on_fail default
    return fields, ok


def _rand_line(rng: random.Random, sep: str, n: int, max_extend: int) -> str | None:
    r = rng.random()
    if r < 0.04:
        return None
    if r < 0.08:
        return ""
    # part counts span short rows, exact, overflow inside and past the cap
    cnt = rng.randint(1, n + max_extend + 3)
    return sep.join(rng.choice(_TOKENS) for _ in range(cnt))


_CONFIGS = [
    # (separator, keys, overflow, allow_shortened, max_extend)
    ("|", ["a", "b", "c"], "extend", False, 2),
    (",", ["a", "b"], "keep", True, 8),
    ("||", ["a", "b", "c"], "extend", True, 8),
    (".", ["a", "b"], "discard", False, 8),
    ("\t", ["a", "b", "c", "d"], "keep", False, 8),
]


def test_parse_delimiter_differential(spark):
    rng = random.Random(SEED)
    for sep, keys, overflow, allow_shortened, max_extend in _CONFIGS:
        lines = [_rand_line(rng, sep, len(keys), max_extend) for _ in range(150)]
        # pin the interesting deterministic edges alongside the random draw
        lines += [sep, sep * 2, " " + sep.join("xy"), sep.join(_TOKENS)]
        df = spark.createDataFrame(
            list(enumerate(lines)),
            T.StructType([
                T.StructField("id", T.LongType()),
                T.StructField("content", T.StringType()),
            ]),
        )
        out = parse_delimiter(
            df, keys, separator=sep, overflow=overflow,
            allow_shortened=allow_shortened, max_extend_cols=max_extend,
        )
        got = {r["id"]: (r["fields"], r[PARSE_OK]) for r in out.collect()}
        want = {
            i: _emulate_delimiter(ln, keys, sep, overflow, allow_shortened, max_extend)
            for i, ln in enumerate(lines)
        }
        assert got == want, (
            sep, overflow, allow_shortened,
            {k: (got[k], want[k], lines[k]) for k in got if got[k] != want[k]},
        )


def test_delimiter_corpus_kills_mutants():
    """The random corpora must distinguish the true emulator from each
    deliberately wrong one — otherwise the differential proves nothing about
    that semantic."""
    rng = random.Random(SEED)

    def full_strip(src, keys, sep, overflow, a_s, mx):  # trim \t too (wrong)
        f, ok = _emulate_delimiter(src, keys, sep, overflow, a_s, mx)
        return ({k: (v.strip() if v is not None else v) for k, v in f.items()}, ok)

    def uncapped(src, keys, sep, overflow, a_s, mx):  # ignore max_extend cap
        return _emulate_delimiter(src, keys, sep, overflow, a_s, 10_000)

    def keep_trimmed(src, keys, sep, overflow, a_s, mx):  # trim the keep glue
        f, ok = _emulate_delimiter(src, keys, sep, overflow, a_s, mx)
        n = len(keys)
        g = f"__column{n}__"
        if overflow == "keep" and g in f:
            f = dict(f)
            f[g] = sep.join(p.strip(" ") for p in f[g].split(sep))
        return f, ok

    def shortened_ok(src, keys, sep, overflow, a_s, mx):  # ignore allow_shortened
        return _emulate_delimiter(src, keys, sep, overflow, True, mx)

    for mutant in (full_strip, uncapped, keep_trimmed, shortened_ok):
        killed = False
        r2 = random.Random(SEED)
        for sep, keys, overflow, a_s, mx in _CONFIGS:
            lines = [_rand_line(r2, sep, len(keys), mx) for _ in range(150)]
            lines += [sep, sep * 2, " " + sep.join("xy"), sep.join(_TOKENS)]
            for ln in lines:
                if mutant(ln, keys, sep, overflow, a_s, mx) != _emulate_delimiter(
                    ln, keys, sep, overflow, a_s, mx
                ):
                    killed = True
        assert killed, f"corpus never exercises: {mutant.__name__}"
    del rng


# ---------------------------------------------------------------------------
# split_key_value
# ---------------------------------------------------------------------------

def _emulate_kv(src: str | None, delim: str, sep: str):
    if src is None:
        return {}, False
    entries: list[tuple[str, str]] = []
    nk = ek = 0
    for t in src.split(delim):
        if sep not in t:
            entries.append((f"no_separator_key_{nk}", t))
            nk += 1
        elif t.split(sep, 1)[0] == "":
            entries.append((f"empty_key_{ek}", t[len(sep):]))
            ek += 1
        else:
            head = t.split(sep, 1)[0]
            entries.append((head, t[len(head) + len(sep):]))
    return dict(entries), True  # dict() = last-wins


_KV_TOKENS = [
    "k:v", "k: v ", "k:", ":v", ":", "bare", "", "k:v:w", "a b:c",
    "no_separator_key_0:boom", "empty_key_0:z", "no_separator_key_1",
    "é:π", "k=>v", "x:y=>z",
]


def test_split_key_value_differential(spark):
    rng = random.Random(SEED + 1)
    for delim, sep in [("\t", ":"), (";", "=>"), ("&", ":"), ("||", "=")]:
        toks = [t.replace(":", sep) if sep != ":" else t for t in _KV_TOKENS]
        lines: list[str | None] = [
            delim.join(rng.choice(toks) for _ in range(rng.randint(0, 6)))
            for _ in range(150)
        ]
        lines += [None, "", delim, delim.join(toks)]
        df = spark.createDataFrame(
            list(enumerate(lines)),
            T.StructType([
                T.StructField("id", T.LongType()),
                T.StructField("content", T.StringType()),
            ]),
        )
        out = split_key_value(df, delimiter=delim, separator=sep)
        got = {r["id"]: (r["fields"], r[PARSE_OK]) for r in out.collect()}
        want = {i: _emulate_kv(ln, delim, sep) for i, ln in enumerate(lines)}
        assert got == want, (
            delim, sep,
            {k: (got[k], want[k], lines[k]) for k in got if got[k] != want[k]},
        )


def test_kv_corpus_kills_mutants():
    def first_wins(src, delim, sep):
        f, ok = _emulate_kv(src, delim, sep)
        if src is None:
            return f, ok
        entries = []
        nk = ek = 0
        for t in src.split(delim):
            if sep not in t:
                entries.append((f"no_separator_key_{nk}", t)); nk += 1
            elif t.split(sep, 1)[0] == "":
                entries.append((f"empty_key_{ek}", t[len(sep):])); ek += 1
            else:
                head = t.split(sep, 1)[0]
                entries.append((head, t[len(head) + len(sep):]))
        out: dict[str, str] = {}
        for k, v in entries:
            out.setdefault(k, v)
        return out, True

    def shared_counter(src, delim, sep):  # one counter for both anomaly kinds
        if src is None:
            return {}, False
        entries = []
        c = 0
        for t in src.split(delim):
            if sep not in t:
                entries.append((f"no_separator_key_{c}", t)); c += 1
            elif t.split(sep, 1)[0] == "":
                entries.append((f"empty_key_{c}", t[len(sep):])); c += 1
            else:
                head = t.split(sep, 1)[0]
                entries.append((head, t[len(head) + len(sep):]))
        return dict(entries), True

    def last_occurrence_split(src, delim, sep):  # split on LAST separator
        if src is None:
            return {}, False
        entries = []
        nk = ek = 0
        for t in src.split(delim):
            if sep not in t:
                entries.append((f"no_separator_key_{nk}", t)); nk += 1
            elif t.split(sep, 1)[0] == "":
                entries.append((f"empty_key_{ek}", t[len(sep):])); ek += 1
            else:
                head = t.rsplit(sep, 1)[0]
                entries.append((head, t[len(head) + len(sep):]))
        return dict(entries), True

    for mutant in (first_wins, shared_counter, last_occurrence_split):
        killed = False
        rng = random.Random(SEED + 1)
        for delim, sep in [("\t", ":"), (";", "=>"), ("&", ":"), ("||", "=")]:
            toks = [t.replace(":", sep) if sep != ":" else t for t in _KV_TOKENS]
            lines: list[str | None] = [
                delim.join(rng.choice(toks) for _ in range(rng.randint(0, 6)))
                for _ in range(150)
            ]
            lines += [None, "", delim, delim.join(toks)]
            for ln in lines:
                if mutant(ln, delim, sep) != _emulate_kv(ln, delim, sep):
                    killed = True
        assert killed, f"corpus never exercises: {mutant.__name__}"
