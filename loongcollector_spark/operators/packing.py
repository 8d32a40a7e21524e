"""Sequence packing: assign documents to fixed-length training context
windows (concat-and-chunk, the GPT-style packing used by every large LM
pretraining pipeline: documents are concatenated in a deterministic order and
the stream is cut every ``ctx_len`` tokens; a document may span a chunk
boundary).

Not in the reference (a log agent ships rows, not contexts); for a tokens
pipeline this is the step between "clean corpus" and "training batches".

Scale shape: ONE window aggregation partitioned by the shard column — the
running token offset within each shard. Packing is defined per shard (real
pipelines pack within a shard/file so shards stay independently writable and
the order is reproducible); a global pack order would be a single-reducer
sort, which is exactly what this avoids. Shard count = write parallelism.
Everything downstream (chunk ids) is arithmetic on the offset — no second
shuffle, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_chunks(
    df: DataFrame,
    ctx_len: int,
    count_col: str = "n_tok",
    shard_col: str = "source",
    order_col: str = "doc_id",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc packing assignment: (id, shard, start_off, chunk_first,
    chunk_last, n_chunks).

    ``start_off`` is the document's first-token offset in its shard's
    concatenated token stream (docs ordered by ``order_col``); chunk ids are
    ``floor(offset / ctx_len)`` — a doc spans ``chunk_first..chunk_last``
    and contributes to ``n_chunks`` contexts. Deterministic: a pure function
    of (shard, order, counts), so reruns and the SQL oracle agree exactly."""
    w = (
        Window.partitionBy(shard_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum(count_col).over(w), F.lit(0)).cast("long")
    # last token offset; an (anomalous) empty doc occupies its start chunk
    end = (start + F.greatest(F.col(count_col), F.lit(1)) - 1).cast("long")
    out = (
        df.withColumn("start_off", start)
        .withColumn("chunk_first", F.floor(F.col("start_off") / ctx_len))
        .withColumn("chunk_last", F.floor(end / ctx_len))
    )
    return out.select(
        F.col(id_col),
        F.col(shard_col).alias("shard"),
        "start_off",
        "chunk_first",
        "chunk_last",
        (F.col("chunk_last") - F.col("chunk_first") + 1).alias("n_chunks"),
    )
