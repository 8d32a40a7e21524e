"""Token-array-native curation ops (operators/tokens.py): corpus-duplicated
k-gram profile, skew-safe per-key quota cap, tokenized-table integrity audit."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from loongcollector_spark.operators.tokens import (
    quota_cap,
    token_integrity,
    token_ngram_dup_stats,
)


@pytest.fixture(scope="module")
def seqs(spark):
    rows = [
        # docs 1 and 2 are identical 6-token streams → every 4-gram duplicated
        (1, [1, 2, 3, 4, 5, 6]),
        (2, [1, 2, 3, 4, 5, 6]),
        # doc 3 shares only the first 4 tokens with 1/2 → 1 of 3 grams dup
        (3, [1, 2, 3, 4, 9, 9]),
        # doc 4 is unique
        (4, [7, 7, 7, 8, 8, 8]),
        # doc 5 shorter than k → zero grams
        (5, [1, 2]),
    ]
    return spark.createDataFrame(rows, "doc_id int, tokens array<int>")


def test_token_ngram_dup_stats(seqs):
    out = {r["doc_id"]: r for r in token_ngram_dup_stats(seqs, k=4).collect()}
    # 6 tokens, k=4 → 3 gram positions
    assert out[1]["n_grams"] == 3 and out[1]["n_dup_grams"] == 3
    assert out[1]["dup_rate"] == 1.0 and out[2]["dup_rate"] == 1.0
    assert out[3]["n_grams"] == 3 and out[3]["n_dup_grams"] == 1
    assert out[3]["dup_rate"] == round(1 / 3, 6)
    assert out[4]["n_dup_grams"] == 0 and out[4]["dup_rate"] == 0.0
    # short doc: zero grams, rate 0, still present
    assert out[5]["n_grams"] == 0 and out[5]["dup_rate"] == 0.0


def test_token_ngram_within_doc_repeat_not_dup(spark):
    # a gram repeated WITHIN one doc only is not corpus-duplicated
    df = spark.createDataFrame(
        [(1, [5, 6, 5, 6, 5, 6]), (2, [9, 9, 9, 9])], "doc_id int, tokens array<int>"
    )
    out = {r["doc_id"]: r for r in token_ngram_dup_stats(df, k=2).collect()}
    assert out[1]["n_dup_grams"] == 0 and out[2]["n_dup_grams"] == 0


def test_quota_cap_exact_and_salt_invariant(spark):
    rows = [(i, "hot" if i % 3 != 0 else f"cold{i % 5}") for i in range(1, 61)]
    df = spark.createDataFrame(rows, "doc_id int, domain string")
    kept = quota_cap(df, key_col="domain", order_col="doc_id", quota=5).collect()
    by_dom: dict[str, list[int]] = {}
    for r in kept:
        by_dom.setdefault(r["domain"], []).append((r["kept_rank"], r["doc_id"]))
    # hot domain capped at exactly its 5 LOWEST doc_ids, rank = order
    hot = sorted(by_dom["hot"])
    expect = sorted(i for i in range(1, 61) if i % 3 != 0)[:5]
    assert [d for _, d in hot] == expect
    assert [rk for rk, _ in hot] == [1, 2, 3, 4, 5]
    # under-quota domains keep everything
    for dom, lst in by_dom.items():
        if dom != "hot":
            assert len(lst) <= 5
    # result identical across salt_buckets settings (salt is partitioning only)
    kept1 = sorted(
        (r["domain"], r["doc_id"])
        for r in quota_cap(df, "domain", "doc_id", 5, salt_buckets=1).collect()
    )
    kept64 = sorted(
        (r["domain"], r["doc_id"])
        for r in quota_cap(df, "domain", "doc_id", 5, salt_buckets=64).collect()
    )
    assert kept1 == kept64 == sorted((r["domain"], r["doc_id"]) for r in kept)


def test_token_integrity_counters(spark):
    rows = [
        # (doc, source, tokens, n_tok)
        (1, "a", [1, 2, 511], 3),   # clean
        (2, "a", [1, 2, 511], 2),   # declared-length mismatch
        (3, "a", [1, 600, 511], 3),  # out of range (vocab 512)
        (4, "a", [1, 2, 3], 3),     # missing EOS
        (5, "b", [], 0),            # empty (also missing EOS)
        (6, "b", [-1, 511], 2),     # negative id out of range
        (7, "b", None, 5),          # NULL payload — the worst corruption
    ]
    df = spark.createDataFrame(rows, "doc_id int, source string, tokens array<int>, n_tok int")
    out = {r["source"]: r for r in token_integrity(df, vocab_size=512, eos_id=511).collect()}
    a, b = out["a"], out["b"]
    assert a["n_seqs"] == 4 and a["n_len_mismatch"] == 1
    assert a["n_out_of_range"] == 1 and a["n_missing_eos"] == 1 and a["n_empty"] == 0
    assert a["tok_total"] == 3 + 3 + 3 + 3 and a["n_null_payload"] == 0
    assert b["n_seqs"] == 3 and b["n_empty"] == 1
    assert b["n_out_of_range"] == 1 and b["n_missing_eos"] == 1
    assert b["tok_total"] == 2
    assert b["n_null_payload"] == 1  # flagged, not silently skipped


def test_quota_cap_plan_has_two_stage_window(spark):
    df = spark.createDataFrame(
        [(i, f"d{i % 4}") for i in range(40)], "doc_id int, domain string"
    )
    plan = quota_cap(df, "domain", "doc_id", 3)._jdf.queryExecution().executedPlan().toString()
    # two window operators: the salted partial and the per-key final
    assert plan.count("Window") >= 2


def test_line_dedup_within_doc(spark):
    from loongcollector_spark.operators.dedup import line_dedup

    rows = [
        (1, "a\nb\na\nc\nb"),   # a,b repeat → keep a,b,c in first-seen order
        (2, "x\nx\nx"),
        (3, "solo"),
        (4, ""),                # one empty line, nothing removed
    ]
    df = spark.createDataFrame(rows, "doc_id int, content string")
    out = {r["doc_id"]: r for r in line_dedup(df).collect()}
    assert out[1]["content_clean"] == "a\nb\nc"
    assert out[1]["n_lines"] == 5 and out[1]["n_removed"] == 2
    assert out[2]["content_clean"] == "x" and out[2]["n_removed"] == 2
    assert out[3]["n_removed"] == 0 and out[3]["content_clean"] == "solo"
    assert out[4]["n_lines"] == 1 and out[4]["n_removed"] == 0


def test_line_dedup_no_shuffle_plan(spark):
    from loongcollector_spark.operators.dedup import line_dedup

    df = spark.createDataFrame([(1, "a\nb")], "doc_id int, content string")
    plan = line_dedup(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure projection: within-row dedup scope


def test_source_drift_analytic(spark):
    """JS properties: a source matching the corpus mixture has js ~ 0 for the
    degenerate one-source corpus; two token-disjoint sources land at the
    analytic value of JS(P, M) where M is the 50/50 corpus mixture."""
    import math
    from loongcollector_spark.operators.tokens import source_drift

    # one source only: P == Q exactly -> js = 0
    one = spark.createDataFrame([("a", [1, 2, 3, 1]), ("a", [2, 3])],
                                "source string, tokens array<int>")
    r = source_drift(one).collect()
    assert len(r) == 1 and abs(r[0]["js_div"]) < 1e-9
    assert r[0]["n_tok"] == 6 and r[0]["n_distinct"] == 3

    # two disjoint equal-mass sources: corpus q = p/2 on each side's support,
    # js per source = 0.5*ln(4/3) + 0.5*(0.5*ln(2/3) + ln2*0.5)
    two = spark.createDataFrame(
        [("a", [1] * 4), ("b", [2] * 4)], "source string, tokens array<int>"
    )
    expect = 0.5 * math.log(4.0 / 3.0) + 0.5 * (
        0.5 * math.log(2.0 / 3.0) + math.log(2.0) * 0.5
    )
    got = {r["stratum"]: r["js_div"] for r in source_drift(two).collect()}
    assert abs(got["a"] - round(expect, 6)) < 2e-6
    assert got["a"] == got["b"]


def test_source_overlap_matrix(spark):
    from loongcollector_spark.operators.tokens import source_overlap_matrix

    # k=3 grams: a has {123,234}, b has {123,234} + {999,...} disjoint doc,
    # c shares nothing
    rows = [
        ("a", [1, 2, 3, 4]),          # grams 123, 234
        ("b", [1, 2, 3, 4]),          # same two grams
        ("b", [9, 9, 9, 9]),          # gram 999 (x2 positions, distinct->1)
        ("c", [7, 8, 7, 8]),          # grams 787, 878
    ]
    df = spark.createDataFrame(rows, "source string, tokens array<int>")
    out = {(r["src_a"], r["src_b"]): r for r in source_overlap_matrix(df, k=3).collect()}
    ab = out[("a", "b")]
    assert (ab["grams_a"], ab["grams_b"], ab["inter"]) == (2, 3, 2)
    assert abs(ab["jaccard"] - round(2 / 3, 6)) < 1e-9
    # zero-overlap pairs emit no row (inverted index joins on shared grams)
    assert ("a", "c") not in out and ("b", "c") not in out


def test_dup_span_strip(spark):
    from loongcollector_spark.operators.tokens import dup_span_strip

    shared = [1, 2, 3, 4]  # k=3: grams 123,234 duplicated across docs 1,2
    rows = [
        (1, shared + [50, 51]),      # positions 1-4 covered, tail kept
        (2, [60] + shared),          # positions 2-5 covered, head kept
        (3, [70, 71, 72, 73, 74]),   # unique doc: untouched
        (4, [1, 2, 3]),              # exactly one duplicated gram, fully covered
    ]
    df = spark.createDataFrame(rows, "doc_id int, tokens array<int>")
    out = {r["doc_id"]: r for r in dup_span_strip(df, k=3).collect()}
    assert out[1]["tokens_clean"] == [50, 51] and out[1]["n_removed"] == 4
    assert out[2]["tokens_clean"] == [60] and out[2]["n_removed"] == 4
    assert out[3]["tokens_clean"] == [70, 71, 72, 73, 74] and out[3]["n_removed"] == 0
    assert out[4]["tokens_clean"] == [] and out[4]["n_removed"] == 3
    # invariant: n_tok - n_removed == len(tokens_clean)
    for r in out.values():
        assert r["n_tok"] - r["n_removed"] == len(r["tokens_clean"])


def test_gram_hash_twins_agree(spark):
    """xxhash64 fast-path keys give identical RESULTS to the md5 oracle-audit
    keys for every gram-keyed op (keys only partition/join)."""
    from loongcollector_spark.operators.tokens import (
        dup_span_strip,
        source_overlap_matrix,
        token_ngram_dup_stats,
    )

    rows = [
        (i, f"s{i % 3}", [(i * 7 + j) % 40 for j in range(20 + i % 5)])
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "doc_id int, source string, tokens array<int>")
    for op, key in (
        (lambda m: token_ngram_dup_stats(df, k=5, hash_method=m), "doc_id"),
        (lambda m: dup_span_strip(df, k=5, hash_method=m), "doc_id"),
        (lambda m: source_overlap_matrix(df, k=5, hash_method=m), None),
    ):
        a = sorted(map(str, op("md5").collect()))
        b = sorted(map(str, op("xxhash64").collect()))
        assert a == b


def test_dup_span_strip_full_coverage_linear(spark):
    """VERDICT r4 #3 regression: a ~fully-covered long doc must reassemble in
    linear time (array_except gather, not per-position array_contains) and
    strip every covered token. Two identical 4000-token docs → every k-gram
    duplicated → all positions covered → tokens_clean empty; a third distinct
    doc is untouched. The old quadratic form made this fixture visibly slow;
    the linear form finishes instantly and, critically, keeps order."""
    import time

    from loongcollector_spark.operators.tokens import dup_span_strip

    long_toks = [(i * 7 + 3) % 251 for i in range(4000)]
    df = spark.createDataFrame(
        [(1, long_toks), (2, long_toks), (3, [9, 8, 7, 6, 5, 4, 3, 2, 1, 0])],
        "doc_id int, tokens array<int>",
    )
    t0 = time.time()
    out = {r["doc_id"]: r for r in dup_span_strip(df, k=8).collect()}
    assert time.time() - t0 < 60
    assert out[1]["n_tok"] == 4000 and out[1]["n_removed"] == 4000
    assert out[1]["tokens_clean"] == [] and out[2]["tokens_clean"] == []
    assert out[3]["n_removed"] == 0 and out[3]["tokens_clean"] == [9, 8, 7, 6, 5, 4, 3, 2, 1, 0]
    # partial coverage keeps surviving tokens in original order
    a = list(range(100)) + [1, 2, 3, 4, 5, 6, 7, 8] + list(range(200, 240))
    b = [1, 2, 3, 4, 5, 6, 7, 8]
    df2 = spark.createDataFrame([(1, a), (2, b)], "doc_id int, tokens array<int>")
    out2 = {r["doc_id"]: r for r in dup_span_strip(df2, k=8).collect()}
    # covered in doc 1: the embedded span [1..8] AND the matching 1..8 inside range(100)
    expect = [t for i, t in enumerate(a, start=1)
              if not (2 <= i <= 9 or 101 <= i <= 108)]
    assert out2[1]["tokens_clean"] == expect
