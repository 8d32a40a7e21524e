"""Checkpoint / lineage / resume tests (the kill/rerun contract).

Mirrors the reference's exactly-once range-checkpoint behavior
(core/file_server/checkpoint/RangeCheckpoint.h:27-49): a killed run re-invoked
with the same run_id must not reprocess committed stages, and per-stage
lineage must reconcile with the committed sink contents.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from loongcollector_spark.checkpoint import CheckpointLog, ResumableRun
from loongcollector_spark.plans.job import run_job
from loongcollector_spark.synth import ensure_sequences


@pytest.fixture(scope="module")
def seq_path():
    return ensure_sequences(5000)


def test_full_run_commits_all_sinks(spark, seq_path, tmp_path):
    out = str(tmp_path / "job1")
    res = run_job(spark, seq_path, out, run_id="r1")
    assert set(res["counts"]) == {"sink_nginx", "sink_apsara", "sink_structured", "sink_default"}
    assert sum(v["n_rows"] for v in res["counts"].values()) == 5000
    # every sink stage + counts committed
    log = CheckpointLog(out + "/_checkpoint")
    for name in res["sinks"]:
        assert log.committed("r1", f"sink_{name}")
        rec = log.read("r1", f"sink_{name}")
        assert rec["n_rows"] == res["counts"][name]["n_rows"]
        # file lineage reconciles with the stage totals
        assert sum(p["n_rows"] for p in rec["partitions"]) == rec["n_rows"]
        assert sum(p["n_bytes"] for p in rec["partitions"]) == rec["n_bytes"]
    crec = log.read("r1", "counts")
    assert crec["n_rows"] == 5000
    assert len(crec["partitions"]) > 0  # per-partition lineage of the routed data
    # sink contents match the counts
    for name, path in res["sinks"].items():
        assert spark.read.parquet(path).count() == res["counts"][name]["n_rows"]


def test_sink_payload_token_equality(spark, seq_path, tmp_path):
    """Routed-row token equality: re-encoding the sink's content payload must
    reproduce the original token arrays exactly (bijective codec)."""
    out = str(tmp_path / "job2")
    res = run_job(spark, seq_path, out, run_id="r2")
    sink = spark.read.parquet(res["sinks"]["sink_nginx"])
    orig = spark.read.parquet(seq_path)
    rows = (
        sink.select("doc_id", "content")
        .join(orig.select("doc_id", "tokens"), "doc_id")
        .limit(500)
        .collect()
    )
    assert rows, "empty sink"
    for r in rows:
        assert list(r["content"].encode("utf-8")) == list(r["tokens"])


def test_resume_skips_committed_stages(spark, seq_path, tmp_path):
    out = str(tmp_path / "job3")
    res1 = run_job(spark, seq_path, out, run_id="rr")
    assert len(res1["executed"]) == 5  # 4 sinks + counts
    # "kill" after commit: simply rerun with same run_id — nothing reprocessed
    res2 = run_job(spark, seq_path, out, run_id="rr")
    assert res2["executed"] == []
    assert res2["counts"] == res1["counts"]


def test_partial_failure_then_resume(spark, seq_path, tmp_path):
    """Simulate a crash mid-run: commit two stages, die, resume — only the
    remaining stages execute."""
    out = str(tmp_path / "job4")
    run = ResumableRun(spark, out, run_id="crash")
    run.stage("sink_a", lambda d: (1, 1, [{"partition_id": 0, "n_rows": 1, "n_bytes": 1}]))
    run.stage("sink_b", lambda d: (2, 2, []))

    boom = []

    def failing(d):
        boom.append(1)
        raise RuntimeError("killed")

    with pytest.raises(RuntimeError):
        run.stage("sink_c", failing)

    resumed = ResumableRun(spark, out, run_id="crash")
    calls = []

    def fn(name):
        def _f(d):
            calls.append(name)
            return (0, 0, [])
        return _f

    for s in ["sink_a", "sink_b", "sink_c", "counts"]:
        resumed.stage(s, fn(s))
    assert calls == ["sink_c", "counts"]  # a and b resumed over, not re-run


def test_checkpoint_log_dataframe(spark, seq_path, tmp_path):
    out = str(tmp_path / "job5")
    run_job(spark, seq_path, out, run_id="df1")
    log = CheckpointLog(out + "/_checkpoint")
    df = log.as_dataframe(spark)
    assert df.filter(F.col("status") == "committed").count() == 5
    assert {r["stage"] for r in df.select("stage").collect()} == {
        "sink_sink_nginx", "sink_sink_apsara", "sink_sink_structured", "sink_sink_default", "counts",
    }


def test_run_id_separator_rejected(tmp_path):
    """run_id may not contain the '__' catalog separator: 'run1' vs 'run1__x'
    would otherwise cross-list each other's stage files on resume."""
    import pytest
    from loongcollector_spark.checkpoint import CheckpointLog, ResumableRun

    log = CheckpointLog(str(tmp_path / "_cp"))
    with pytest.raises(ValueError):
        log.record("run1__x", "sink_a", 0, 0, [])
    with pytest.raises(ValueError):
        log.stages("bad__id")
    with pytest.raises(ValueError):
        ResumableRun(None, str(tmp_path / "out"), run_id="a__b")
    # clean ids still work
    log.record("run1", "sink_a", 1, 2, [])
    assert log.stages("run1") == ["sink_a"]


def test_run_job_condition_sinks_record_real_counts(spark, seq_path, tmp_path):
    """Condition-named sinks are not route values — their checkpoint records
    and returned counts must reflect the rows actually written, not 0."""
    from loongcollector_spark.operators.route import SinkCondition

    out = str(tmp_path / "jobc")
    res = run_job(
        spark, seq_path, out, run_id="rc",
        conditions=[SinkCondition(sink="all_events", type="always")],
    )
    assert res["counts"]["all_events"]["n_rows"] == 5000
    assert res["counts"]["all_events"]["n_tok_sum"] > 0
    log = CheckpointLog(out + "/_checkpoint")
    assert log.read("rc", "sink_all_events")["n_rows"] == 5000
    # resume returns the same sink-keyed counts from the committed record
    res2 = run_job(
        spark, seq_path, out, run_id="rc",
        conditions=[SinkCondition(sink="all_events", type="always")],
    )
    assert res2["executed"] == [] and res2["counts"]["all_events"]["n_rows"] == 5000


def test_stage_name_validated(tmp_path):
    """Stage names share the run_id's '<run>__<stage>.json' filename rules:
    '/' would fail the catalog write AFTER the sink snapshot committed
    (stage done on disk, unrecorded — rerun loops forever), '__' and a
    leading '_' collide across runs ('a_' + 'x' == 'a' + '_x')."""
    import pytest
    from loongcollector_spark.checkpoint import CheckpointLog

    log = CheckpointLog(str(tmp_path / "_cp"))
    for bad in ("a/b", "a__b", "_x", ""):
        with pytest.raises(ValueError):
            log.record("run1", bad, 0, 0, [])
    with pytest.raises(ValueError):
        log.record("run_", "x", 0, 0, [])  # trailing '_' run_id collides
    log.record("run1", "stage-ok.v2", 1, 2, [])
    assert log.stages("run1") == ["stage-ok.v2"]
