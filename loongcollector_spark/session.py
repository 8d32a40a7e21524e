"""SparkSession construction tuned for the pipeline.

Local mode mirrors a multi-executor cluster via partitioning: every knob set here
(AQE, shuffle partitions, Arrow batching) carries over unchanged to a real cluster
submit (``spark-submit --py-files loongcollector_spark.zip job.py``).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "loongcollector-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``cpus`` controls local parallelism (``local[N]``); shuffle partitions default to
    2×cpus — small enough to avoid tiny-task overhead at test SF, while AQE coalesces
    or splits at runtime so the same setting survives a 100× scale-up.
    """
    cpus = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or max(2 * cpus, 8)
    b = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # big Arrow batches: per-batch Python overhead × many workers was the
        # decode bottleneck (10k-row batches: 20s; 64k: 3.3s at local[32])
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.files.maxPartitionBytes", "128m")
        # local mode: driver heap IS the executor heap — size it for 32
        # concurrent tasks (8g measured 50% slower than 32g from GC thrash)
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        # shuffle/spill on tmpfs: the sandbox VM has one ~300MB/s virtio disk
        # (a serial floor no core count can beat); a real cluster's shuffle
        # bandwidth scales with executors, which tmpfs models honestly here
        .config("spark.local.dir", os.environ.get("SPARK_LOCAL_DIRS", "/dev/shm/spark-local"))
        # Reference allows duplicate event keys (LogEvent.h:115-124); MapType
        # can't — last-wins is the documented deviation (SURVEY.md §7.4).
        .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
