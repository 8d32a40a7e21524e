"""spark-submit entrypoint for the flagship checkpointed job.

Usage (via tools/submit_cluster.sh):
    run_job_cli.py <input-path> <out-root> <run-id>

Builds the session from the cluster-provided conf (no local[] master here —
spark-submit owns deployment), runs/resumes the decode→parse→enrich→route→
fan-out pipeline, and prints the per-sink counts plus wall time as one JSON
line for the N-vs-4N scaling comparison.
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import SparkSession


def main() -> None:
    input_path, out_root, run_id = sys.argv[1:4]
    spark = SparkSession.builder.appName(f"loongcollector-flagship-{run_id}").getOrCreate()
    from loongcollector_spark.plans.job import run_job

    t0 = time.monotonic()
    res = run_job(spark, input_path, out_root, run_id)
    elapsed = time.monotonic() - t0
    n_seq = sum(v["n_rows"] for v in res["counts"].values())
    n_tok = sum(v["n_tok_sum"] for v in res["counts"].values())
    print(
        json.dumps(
            {
                "run_id": res["run_id"],
                "resumed": not res["executed"],
                "sec": round(elapsed, 3),
                "n_seq": n_seq,
                "seqs_per_sec": round(n_seq / elapsed, 1),
                "toks_per_sec": round(n_tok / elapsed, 1),
                "counts": res["counts"],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
