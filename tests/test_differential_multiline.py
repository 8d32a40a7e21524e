"""Seeded differential for merge_multiline (operators/multiline.py) vs a
pure-Python fold of the Start-pattern stitching semantics
(ProcessorMergeMultilineLogNative.cpp:161 / SplitMultilineLogStringNative
UnmatchedContentTreatment): a start-matching line opens an event, following
non-start lines join it, and the pre-first-start prefix either becomes
one-line events (``single_line``) or is dropped (``discard``). Random
start-hit sequences over multiple streams, both unmatched modes, and a custom
joiner — one Spark job per mode.
"""

from __future__ import annotations

import random
import re

from loongcollector_spark.operators.multiline import merge_multiline

SEED = 20260825
_START = r"^\d{4}-"  # realistic timestamp leader
_LINES = ["2024-01-01 boom", "2025-12-31 start", "  at stack.frame:1",
          "continuation", "", "2024x not a start", "    tail"]


def _merge_reference(rows, unmatched, joiner):
    """rows: (stream, line_no, content) sorted. → set of result tuples."""
    out = []
    by_stream: dict[str, list] = {}
    for s, ln, c in sorted(rows):
        by_stream.setdefault(s, []).append((ln, c))
    for s, lines in by_stream.items():
        seq = 0
        cur = None  # [event_seq, leader_ln, [contents]]
        for ln, c in lines:
            if re.search(_START, c):
                if cur:
                    out.append((s, cur[0], cur[1], joiner.join(cur[2]), len(cur[2])))
                seq += 1
                cur = [seq, ln, [c]]
            elif cur is None:
                if unmatched == "single_line":
                    out.append((s, 0, ln, c, 1))  # pre-start prefix: solo events
            else:
                cur[2].append(c)
        if cur:
            out.append((s, cur[0], cur[1], joiner.join(cur[2]), len(cur[2])))
    return sorted(out)


def test_merge_multiline_differential(spark):
    rng = random.Random(SEED)
    rows = []
    for s in ("f0", "f1", "f2"):
        for ln in range(rng.randint(0, 50)):
            rows.append((s, ln, rng.choice(_LINES)))
    df = spark.createDataFrame(rows, "stream_id string, line_no int, content string")
    for unmatched, joiner in (("single_line", "\n"), ("discard", "\n"),
                              ("single_line", " | ")):
        got = sorted(
            (r["stream_id"], r["event_seq"], r["line_no"], r["content"], r["n_lines"])
            for r in merge_multiline(
                df, _START, unmatched=unmatched, joiner=joiner
            ).collect()
        )
        assert got == _merge_reference(rows, unmatched, joiner), (unmatched, joiner)
