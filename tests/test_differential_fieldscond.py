"""Seeded differential for ``fields_with_condition``
(processor_fields_with_condition.go:31-160) vs a Python first-match fold:
random case chains across all four relation operators (equals / regexp /
contains / startwith) × and/or logic, cases with EMPTY condition dicts
(always-true catch-alls mid-chain shadow everything after them), add_fields
overwriting existing keys, drop_keys of absent keys, absent condition keys
(coalesced false — an OR across one absent and one matching term must still
fire), drop_if_not_match row filtering, and NULL-value noise.

Mutation-checked: last-match-wins, OR-treated-as-AND, and
absent-key-matches-empty-string emulators each fail somewhere.
"""

from __future__ import annotations

import random
import re

from pyspark.sql import types as T

from loongcollector_spark.operators.filters import fields_with_condition

SEED = 20260819

_VALS = ["err", "error", "warn", "info", "", "x err y", "ERR", "5xx", "500"]


def _rand_fields(rng: random.Random) -> dict:
    f = {}
    for k in ("lvl", "code", "svc"):
        if rng.random() < 0.8:
            f[k] = rng.choice(_VALS)
    return f


def _rand_case(rng: random.Random, idx: int) -> dict:
    rel = rng.choice(["equals", "regexp", "contains", "startwith"])
    logical = rng.choice(["and", "or"])
    cond = {}
    for k in rng.sample(["lvl", "code", "svc", "ghost"], rng.randint(0, 2)):
        if rel == "regexp":
            cond[k] = rng.choice([r"err.*", r"\d+", r"^w"])
        else:
            cond[k] = rng.choice(_VALS)
    case = {"condition": cond, "relation_operator": rel, "logical_operator": logical}
    if rng.random() < 0.8:
        case["add_fields"] = {f"tag{idx}": f"v{idx}", "lvl": f"case{idx}"}
    if rng.random() < 0.5:
        case["drop_keys"] = rng.sample(["code", "svc", "nope"], rng.randint(1, 2))
    return case


def _match(fields: dict, case: dict) -> bool:
    rel = case.get("relation_operator", "equals")
    logical = case.get("logical_operator", "and")
    terms = []
    for k, v in case.get("condition", {}).items():
        fv = fields.get(k)
        if fv is None:
            terms.append(False)
        elif rel == "regexp":
            terms.append(re.search(v, fv) is not None)
        elif rel == "contains":
            terms.append(v in fv)
        elif rel == "startwith":
            terms.append(fv.startswith(v))
        else:
            terms.append(fv == v)
    if not terms:
        return True
    return any(terms) if logical == "or" else all(terms)


def _emulate(fields: dict, cases: list[dict], drop_if_not_match: bool):
    for c in cases:
        if _match(fields, c):
            out = {k: v for k, v in fields.items() if k not in (c.get("drop_keys") or [])}
            out.update(c.get("add_fields") or {})
            return out
    return None if drop_if_not_match else dict(fields)


def test_fields_with_condition_differential(spark):
    rng = random.Random(SEED)
    for trial in range(8):
        cases = [_rand_case(rng, i) for i in range(rng.randint(1, 4))]
        if trial == 3:
            cases.insert(1, {"condition": {}})  # catch-all shadows the tail
        if trial == 5:
            # absent key must NOT match startwith "" (Go: condition key missing
            # → the field condition is false, not an empty-string comparison)
            cases.insert(0, {"condition": {"ghost": ""},
                             "relation_operator": "startwith",
                             "add_fields": {"hit": "1"}})
        rows = [(i, _rand_fields(rng)) for i in range(200)]
        df = spark.createDataFrame(
            rows,
            T.StructType([
                T.StructField("id", T.LongType()),
                T.StructField("fields", T.MapType(T.StringType(), T.StringType())),
            ]),
        )
        for drop in (False, True):
            out = fields_with_condition(df, cases, drop_if_not_match=drop)
            got = {r["id"]: r["fields"] for r in out.collect()}
            want = {}
            for i, f in rows:
                e = _emulate(f, cases, drop)
                if e is not None:
                    want[i] = e
            assert got == want, (
                trial, drop, cases,
                {k: (got.get(k), want.get(k)) for k in set(got) | set(want)
                 if got.get(k) != want.get(k)},
            )


def test_fieldscond_corpus_kills_mutants():
    rng = random.Random(SEED)
    all_cases, all_rows = [], []
    for trial in range(8):
        cases = [_rand_case(rng, i) for i in range(rng.randint(1, 4))]
        if trial == 3:
            cases.insert(1, {"condition": {}})
        if trial == 5:
            cases.insert(0, {"condition": {"ghost": ""},
                             "relation_operator": "startwith",
                             "add_fields": {"hit": "1"}})
        rows = [_rand_fields(rng) for _ in range(200)]
        all_cases.append(cases)
        all_rows.append(rows)
    # crafted trial: one row distinguishes all three mutants regardless of the
    # random draw (a fresh-seed sweep found a draw where no random (case, row)
    # pair exercised the OR-vs-AND difference and the or_as_and mutant
    # survived) — first-match picks hit=or, last-match falls through to the
    # catch-all, AND-coerced OR misses c_or entirely, and absent-pads-empty
    # wrongly fires the ghost-startwith case first
    all_cases.append([
        {"condition": {"ghost": ""}, "relation_operator": "startwith",
         "add_fields": {"hit": "ghost"}},
        {"condition": {"lvl": "err", "ghost": "err"},
         "relation_operator": "equals", "logical_operator": "or",
         "add_fields": {"hit": "or"}},
        {"condition": {}, "add_fields": {"hit": "catchall"}},
    ])
    all_rows.append([{"lvl": "err"}])

    def last_match(fields, cases, drop):
        res = None
        for c in cases:
            if _match(fields, c):
                out = {k: v for k, v in fields.items()
                       if k not in (c.get("drop_keys") or [])}
                out.update(c.get("add_fields") or {})
                res = out
        if res is not None:
            return res
        return None if drop else dict(fields)

    def or_as_and(fields, cases, drop):
        fixed = [dict(c, logical_operator="and") for c in cases]
        return _emulate(fields, fixed, drop)

    def absent_matches_empty(fields, cases, drop):
        padded = dict(fields)
        for c in cases:
            for k in c.get("condition", {}):
                padded.setdefault(k, "")
        got = _emulate(padded, cases, drop)
        if got is not None:
            # remove the padding keys that survived untouched
            got = {k: v for k, v in got.items() if not (k not in fields and v == "")}
        return got

    for mutant in (last_match, or_as_and, absent_matches_empty):
        killed = False
        for cases, rows in zip(all_cases, all_rows):
            for f in rows:
                for drop in (False, True):
                    if mutant(f, cases, drop) != _emulate(f, cases, drop):
                        killed = True
        assert killed, f"corpus never exercises: {mutant.__name__}"
