"""Seeded differential for ``log_to_metric`` (processor_log_to_sls_metric)
and ``appender``'s sort_labels fold vs Python emulators:

* ``log_to_metric``: one output row per metric_values entry (explode), name
  taken from the named FIELD when present else the literal key, sorted
  ``k#$#v|…`` labels with missing label keys coalesced to empty, the strict
  name charset gate, the ParseFloat value gate (scientific notation passes,
  garbage drops THAT metric row while siblings from the same log survive),
  and ``__time_nano__`` double-path truncation incl. non-numeric → NULL.
* ``appender`` with ``sort_labels``: concat-then-resort of the ``k#$#v``
  label string, appending to both existing and absent fields.

Mutation-checked: an unsorted-labels emulator, a literal-name-always
emulator, and a whole-log-dropped-on-bad-value emulator each fail.
"""

from __future__ import annotations

import random

from pyspark.sql import types as T

from loongcollector_spark.operators.enrich import appender, log_to_metric

SEED = 20260819

_NUMS = ["1", "2.5", "-0.75", "1e3", "0", "  7 ", "abc", "", "1e309", "NaN"]


def _rand_fields(rng: random.Random) -> dict:
    f = {}
    if rng.random() < 0.9:
        f["rt"] = rng.choice(_NUMS)
    if rng.random() < 0.9:
        f["qps"] = rng.choice(_NUMS)
    if rng.random() < 0.5:
        f["mname"] = rng.choice(["good_name", "0bad", "with:colon", "has space", "_ok"])
    if rng.random() < 0.8:
        f["host"] = rng.choice(["h1", "h2", ""])
    if rng.random() < 0.5:
        f["app"] = rng.choice(["web", "db"])
    if rng.random() < 0.7:
        f["t"] = rng.choice(["1700000000", "1700000000.25", "zzz", "1e300", ""])
    return f


def _parse_float(s: str | None):
    if s is None:
        return None
    try:
        return float(s)
    except ValueError:
        return None


def _emulate(fields: dict, metric_values, label_keys, time_key):
    import re
    labels = "|".join(sorted(f"{k}#$#{fields.get(k) or ''}" for k in label_keys))
    tn = None
    if time_key:
        tv = _parse_float(fields.get(time_key))
        if tv is not None:
            n = tv * 1e9
            if n == n and abs(n) < 2 ** 63:  # NaN/overflow → NULL (try_cast)
                tn = int(n)
    out = []
    for name_field, value_field in metric_values.items():
        name = fields.get(name_field) or name_field
        value = fields.get(value_field)
        fv = _parse_float(value)
        if fv is None or fv != fv and value.strip().lower() not in ("nan", "-nan", "+nan"):
            continue
        if not re.fullmatch(r"[a-zA-Z_:][a-zA-Z0-9_:]*", name):
            continue
        out.append((name, value, labels, tn))
    return out


def test_log_to_metric_differential(spark):
    rng = random.Random(SEED)
    rows = [(i, _rand_fields(rng)) for i in range(300)]
    df = spark.createDataFrame(
        rows,
        T.StructType([
            T.StructField("id", T.LongType()),
            T.StructField("fields", T.MapType(T.StringType(), T.StringType())),
        ]),
    )
    metric_values = {"mname": "rt", "qps_total": "qps"}
    out = log_to_metric(df, metric_values, ["host", "app"], time_key="t")
    got: dict[int, list] = {}
    for r in out.collect():
        got.setdefault(r["id"], []).append(
            (r["__name__"], r["__value__"], r["__labels__"], r["__time_nano__"])
        )
    want = {}
    for i, f in rows:
        emitted = _emulate(f, metric_values, ["host", "app"], "t")
        if emitted:
            want[i] = emitted
    got = {k: sorted(v) for k, v in got.items()}
    want = {k: sorted(v) for k, v in want.items()}
    assert got == want, {
        k: (got.get(k), want.get(k), dict(rows[k][1]))
        for k in set(got) | set(want) if got.get(k) != want.get(k)
    }


def test_appender_sort_labels_differential(spark):
    cases = [
        ({"lbl": "z#$#1|a#$#2"}, "|m#$#5"),
        ({"lbl": "b#$#x"}, "|a#$#y|c#$#w"),
        ({}, "k#$#v"),              # absent field: created then sorted
        ({"lbl": ""}, "b#$#2|a#$#1"),
    ]
    rows = [(i, f) for i, (f, _v) in enumerate(cases)]
    df = spark.createDataFrame(
        rows,
        T.StructType([
            T.StructField("id", T.LongType()),
            T.StructField("fields", T.MapType(T.StringType(), T.StringType())),
        ]),
    )
    for i, (f, val) in enumerate(cases):
        out = appender(df.filter(f"id = {i}"), "lbl", val, sort_labels=True)
        got = out.collect()[0]["fields"]["lbl"]
        concat = (f.get("lbl") or "") + val
        want = "|".join(sorted(p for p in concat.split("|") if p))
        assert got == want, (i, got, want)


def test_logmetric_corpus_kills_mutants():
    rng = random.Random(SEED)
    rows = [_rand_fields(rng) for _ in range(300)]
    mv = {"mname": "rt", "qps_total": "qps"}

    def literal_name_always(f):
        g = dict(f)
        g.pop("mname", None)
        return _emulate(g, mv, ["host", "app"], "t")

    def whole_log_dropped(f):
        full = _emulate(f, mv, ["host", "app"], "t")
        return full if len(full) == len(mv) else []

    def unsorted_labels(f):
        # config order (host, app) — genuinely unsorted, since sorted() puts
        # the app#$# entry first
        out = []
        labels = "|".join(f"{k}#$#{f.get(k) or ''}" for k in ["host", "app"])
        for name, value, _l, tn in _emulate(f, mv, ["host", "app"], "t"):
            out.append((name, value, labels, tn))
        return out

    for mutant in (literal_name_always, whole_log_dropped, unsorted_labels):
        assert any(
            mutant(f) != _emulate(f, mv, ["host", "app"], "t") for f in rows
        ), f"corpus never exercises: {mutant.__name__}"
