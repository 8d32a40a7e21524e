"""Canonical schemas.

Input (per BASELINE.json ``input_hint``): one row per pre-tokenized sequence.
The reference's row model is a dynamic string→string event
(``core/models/LogEvent.h:64`` ordered key/value contents); here the open-ended
parsed fields live in a ``map<string,string>`` column while anything downstream
filters / joins / groups on is promoted to a real column so Catalyst can prune
and push it (SURVEY.md §1.2).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---- raw input table (Iceberg / parquet) ----------------------------------
SEQUENCE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType(), False), False),
        T.StructField("n_tok", T.IntegerType(), False),
        T.StructField("source", T.StringType(), False),
    ]
)

# ---- event row flowing through the pipeline --------------------------------
# tokens is carried untouched end-to-end (per-row invariant: token-array equality
# between input and routed output).
EVENT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType(), False), False),
        T.StructField("n_tok", T.IntegerType(), False),
        T.StructField("source", T.StringType(), False),
        T.StructField("content", T.StringType(), True),  # decoded token payload
        T.StructField("event_time", T.TimestampType(), True),
        T.StructField("fields", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("route", T.StringType(), True),
    ]
)

# Reserved keys mirroring the reference's bookkeeping fields.
RAW_LOG_KEY = "content"  # DEFAULT_CONTENT_KEY, core/plugin/processor/CommonParserOptions.h
RENAMED_SOURCE_KEY = "__raw__"  # default rename target for kept raw
LEVEL_KEY = "__LEVEL__"
THREAD_KEY = "__THREAD__"
FILE_KEY = "__FILE__"
LINE_KEY = "__LINE__"
