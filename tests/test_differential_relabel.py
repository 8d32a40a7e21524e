"""Seeded chain-level differential for prom_relabel (operators/prom.py) vs a
pure-Python emulator of the Prometheus relabel semantics the operator claims
(Relabel.cpp:141-252 action set, Go Regexp.Expand template expansion,
md5-tail-8-bytes hashmod, anchored full-match regexes).

Random rule CHAINS (1-4 rules drawn from all 12 actions) are applied to a
shared corpus of label maps; each chain is one Spark job. The regex pool is
restricted to constructs with identical semantics in java.util.regex and
Python re (numeric groups only — Java and Python disagree on named-group
syntax), so the differential exercises the fold/merge/erase plumbing and the
template translation, not dialect trivia. Template expansion is emulated with
Go Expand rules directly (nonexistent group → empty, ``$$`` → ``$``, lone
``$`` literal), independently of the operator's _java_template translation.
"""

from __future__ import annotations

import hashlib
import random
import re

from pyspark.sql import types as T

from loongcollector_spark.operators.prom import RelabelRule, prom_relabel

SEED = 20260821


# Go Regexp.Expand emulation: reuse the canonical reference emulator from
# test_differential.py (argument order there is (match, template)) — two
# drifting copies of the same Go semantics would let a fix to one miss the
# other.
from test_differential import _go_expand as _go_expand_canonical  # noqa: E402


def _go_expand(template: str, match: re.Match) -> str:
    return _go_expand_canonical(match, template)


# ---------------------------------------------------------------------------
# relabel-chain emulator: (labels dict | None if row dropped)
# ---------------------------------------------------------------------------

def _src_val(labels: dict, rule: RelabelRule) -> str:
    if not rule.source_labels:
        return ""
    return rule.separator.join(labels.get(sl, "") for sl in rule.source_labels)


def _apply_rule(labels: dict, rule: RelabelRule) -> dict | None:
    # re.ASCII: Go RE2 (the reference) and Java regex (the product) both
    # treat \w/\d/\s/\b as ASCII classes by default; Python's unicode default
    # made (\w+) fullmatch 'café' here while both engines reject it
    # (fresh-seed differential, round 5).
    full = re.compile(f"^(?:{rule.regex})$", re.ASCII)
    val = _src_val(labels, rule)
    a = rule.action
    if a == "keep":
        return labels if full.search(val) else None
    if a == "drop":
        return None if full.search(val) else labels
    if a == "keepequal":
        return labels if labels.get(rule.target_label, "") == val else None
    if a == "dropequal":
        return labels if labels.get(rule.target_label, "") != val else None
    if a == "dropmetric":
        return None if val in rule.match_list else labels
    if a == "replace":
        m = full.search(val)
        if not m:
            return labels
        newkey = _go_expand(rule.target_label, m)
        newval = _go_expand(rule.replacement, m)
        out = dict(labels)
        if newval == "":
            out.pop(newkey, None)
        else:
            out[newkey] = newval
        return out
    if a in ("lowercase", "uppercase"):
        out = dict(labels)
        out[rule.target_label] = val.lower() if a == "lowercase" else val.upper()
        return out
    if a == "hashmod":
        h = int.from_bytes(hashlib.md5(val.encode("utf-8")).digest()[-8:], "big")
        out = dict(labels)
        out[rule.target_label] = str(h % rule.modulus)
        return out
    if a == "labelmap":
        out = dict(labels)
        for k, v in labels.items():
            m = full.search(k)
            if m:
                out[_go_expand(rule.replacement, m)] = v
        return out
    if a == "labeldrop":
        return {k: v for k, v in labels.items() if not full.search(k)}
    if a == "labelkeep":
        return {k: v for k, v in labels.items() if full.search(k)}
    raise AssertionError(a)


def _apply_chain(labels: dict, rules: list[RelabelRule]) -> dict | None:
    cur = labels
    for r in rules:
        cur = _apply_rule(cur, r)
        if cur is None:
            return None
    return cur


# ---------------------------------------------------------------------------
# generators
# ---------------------------------------------------------------------------

_KEYS = ["a", "b", "code", "__name__", "job", "instance", "x1"]
_VALS = ["", "GET", "POST", "a;b", "10", "x y", "Va$ue", "café", "a_b"]
# java/python-identical constructs, numeric groups only
_REGEXES = [
    "(.*)", "(.+)", "GET|POST", "(a.*)", "([a-z]+)_([a-z]+)", "a;(.*)",
    "x1|code", "(\\w+)", "([A-Z]+)", "", "10|(.*y)", "__(.*)__",
]
_TEMPLATES = ["$1", "l_$1", "x${2}", "$1$2", "kept", "$$1", "${1}0", "$99", "v_$1_z"]
_TARGETS = ["lbl", "code", "l_$1", "job"]
_SEPARATORS = [";", ",", "--"]


def _rand_rule(rng: random.Random) -> RelabelRule:
    a = rng.choice([
        "keep", "drop", "keepequal", "dropequal", "dropmetric", "replace",
        "lowercase", "uppercase", "hashmod", "labelmap", "labeldrop", "labelkeep",
    ])
    src = tuple(rng.sample(_KEYS, rng.randint(0, 2)))
    kw = dict(source_labels=src, separator=rng.choice(_SEPARATORS))
    if a in ("keep", "drop"):
        return RelabelRule(action=a, regex=rng.choice(_REGEXES), **kw)
    if a in ("keepequal", "dropequal"):
        return RelabelRule(action=a, target_label=rng.choice(_KEYS), **kw)
    if a == "dropmetric":
        return RelabelRule(
            action=a, match_list=tuple(rng.sample(_VALS, rng.randint(1, 3))), **kw
        )
    if a == "replace":
        return RelabelRule(
            action=a, regex=rng.choice(_REGEXES),
            target_label=rng.choice(_TARGETS), replacement=rng.choice(_TEMPLATES), **kw
        )
    if a in ("lowercase", "uppercase"):
        return RelabelRule(action=a, target_label=rng.choice(_KEYS), **kw)
    if a == "hashmod":
        return RelabelRule(
            action=a, target_label="shard", modulus=rng.choice([2, 7, 1000]), **kw
        )
    if a == "labelmap":
        return RelabelRule(
            action=a, regex=rng.choice(["(.*)", "__(.*)__", "(a.*)", "([a-z]+)1"]),
            replacement=rng.choice(["m_$1", "$1", "${1}0"]),
        )
    return RelabelRule(  # labeldrop / labelkeep
        action=a, regex=rng.choice(["a|b", "__.*__", "[a-z]+", "x.*", "(.*)"])
    )


def _rand_labels(rng: random.Random) -> dict:
    return {k: rng.choice(_VALS) for k in _KEYS if rng.random() < 0.6}


def test_relabel_chain_differential(spark):
    rng = random.Random(SEED)
    corpus = [_rand_labels(rng) for _ in range(60)] + [{}]
    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("labels", T.MapType(T.StringType(), T.StringType())),
    ])
    df = spark.createDataFrame(list(enumerate(corpus)), schema)
    # guaranteed coverage first: one single-rule chain per action (a random
    # draw left hashmod unexercised — a deliberately-wrong emulator survived),
    # then random multi-rule chains for interaction coverage
    chains: list[list[RelabelRule]] = [
        [RelabelRule(action="keep", source_labels=("code",), regex="(.+)")],
        [RelabelRule(action="drop", source_labels=("a", "b"), regex=".*;.*")],
        [RelabelRule(action="keepequal", source_labels=("a",), target_label="b")],
        [RelabelRule(action="dropequal", source_labels=("a",), target_label="b")],
        [RelabelRule(action="dropmetric", source_labels=("code",), match_list=("GET", "10"))],
        [RelabelRule(action="replace", source_labels=("job", "code"), separator=";",
                     regex="([a-z]*);(.*)", target_label="l_$1", replacement="${2}0")],
        # empty expansion DELETES the target label (nonexistent group → "")
        [RelabelRule(action="replace", source_labels=("a",), regex="(.*)",
                     target_label="code", replacement="$99")],
        # $1 expands empty exactly when the source value is empty → delete
        [RelabelRule(action="replace", source_labels=("b",), regex="(.*)",
                     target_label="lbl", replacement="$1")],
        [RelabelRule(action="lowercase", source_labels=("code",), target_label="lc")],
        [RelabelRule(action="uppercase", source_labels=("code",), target_label="uc")],
        [RelabelRule(action="hashmod", source_labels=("code", "job"), target_label="shard",
                     modulus=7)],
        [RelabelRule(action="hashmod", source_labels=("__name__",), target_label="shard",
                     modulus=1000)],
        [RelabelRule(action="labelmap", regex="__(.*)__", replacement="m_$1")],
        [RelabelRule(action="labeldrop", regex="a|x.*")],
        [RelabelRule(action="labelkeep", regex="[a-z]+")],
    ]
    for _ in range(20):
        chains.append([_rand_rule(rng) for _ in range(rng.randint(1, 4))])
    n_rules = 0
    for chain_i, rules in enumerate(chains):
        n_rules += len(rules)
        got = {
            r["id"]: dict(r["labels"])
            for r in prom_relabel(df, rules).collect()
        }
        want = {}
        for i, labels in enumerate(corpus):
            res = _apply_chain(labels, rules)
            if res is not None:
                want[i] = res
        assert got == want, (chain_i, rules, {
            k: (got.get(k), want.get(k), corpus[k])
            for k in sorted(set(got) ^ set(want)
                            | {k for k in got if k in want and got[k] != want[k]})
        })
    assert n_rules >= 30  # the fuzz actually covered a spread of actions
