"""Token <-> string codec.

Tokens are byte values (bijective byte-level tokenization, FIXTURES.md §1).
Decode paths, fastest first:

* ``decode_arrow`` (DEFAULT) — ``mapInArrow`` over RecordBatches, fully
  vectorized in C: the list<int32> values buffer is cast to uint8 and a string
  array is rebuilt over the SAME offsets — no per-row Python, no pandas
  conversion. Handles arbitrary UTF-8. This is the north-rule
  "vectorized pandas/Arrow UDF" decode stage.
* ``decode_tokens_native`` — pure Catalyst expression (``transform`` + ``char``):
  zero Python hop, valid when payloads are ASCII (token == codepoint). Slower
  per row than the Arrow path (per-element lambda interpretation) but keeps the
  whole plan JVM-side; useful when a stage must stay codegen-only.
* ``decode_tokens_pandas`` — Arrow-batched pandas UDF with per-row
  ``bytes.decode`` (general fallback; the reference treats payloads as raw
  bytes, core/models/RawEvent.h).

All are tested to agree on ASCII inputs. Encode (string → tokens) exists for
round-trip verification of the per-row token-array-equality invariant.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyarrow as pa
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql import types as T


def _decode_batch_column(col: pa.Array) -> pa.Array:
    """list<int*> byte-token column → string column, arrow-vectorized.

    The flattened values are cast int32→uint8 (one SIMD pass), reinterpreted as
    the data buffer of a BinaryArray sharing the list's offsets, then cast to
    utf8. Cost is O(bytes) memcpy-level — no Python per row or per token.
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = col.cast(pa.list_(pa.uint8()))
    # Normalize a possibly-sliced/offset list array so offsets align with values.
    if col.offset != 0:
        col = pa.concat_arrays([col])
    values = col.values.cast(pa.uint8())
    binary = pa.Array.from_buffers(
        pa.binary(),
        len(col),
        [col.buffers()[0], col.buffers()[1], values.buffers()[1]],
    )
    return binary.cast(pa.string())


def decode_arrow(
    df: DataFrame, tokens_col: str = "tokens", out: str = "content"
) -> DataFrame:
    """Attach ``out`` = utf8(bytes(tokens)) via one mapInArrow hop.

    ``tokens`` passes through untouched (per-row token-array-equality
    invariant); all other columns are carried as-is.
    """
    idx = len(df.columns)
    # StructType.add mutates in place — build a fresh schema instead.
    schema = T.StructType(list(df.schema.fields) + [T.StructField(out, T.StringType())])

    def _decode(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            decoded = _decode_batch_column(b.column(tokens_col))
            yield b.add_column(idx, out, decoded)

    return df.mapInArrow(_decode, schema)


def decode_tokens_native(tokens: Column | str) -> Column:
    """array<int> byte-tokens → string, fully JVM-side (ASCII payloads).

    ``char(n)`` maps codepoint→1-char string; for 0–127 byte==codepoint so this
    is exact. Stays inside whole-stage codegen.
    """
    col = F.col(tokens) if isinstance(tokens, str) else tokens
    return F.array_join(F.transform(col, lambda x: F.char(x)), "")


@pandas_udf(T.StringType())
def decode_tokens_pandas(tokens: pd.Series) -> pd.Series:
    """General UTF-8 decode of byte-token arrays (Arrow-batched)."""
    return tokens.map(lambda t: bytes(bytearray(int(x) & 0xFF for x in t)).decode("utf-8", "replace"))


@pandas_udf(T.ArrayType(T.IntegerType()))
def encode_string_pandas(s: pd.Series) -> pd.Series:
    """string → byte-token array (inverse of decode; used in round-trip tests)."""
    return s.map(lambda v: list(v.encode("utf-8")) if v is not None else None)


def with_content(
    df,
    tokens_col: str = "tokens",
    out: str = "content",
    method: str = "arrow",  # arrow | native | pandas
):
    """Attach the decoded payload column, keeping ``tokens`` untouched."""
    if method == "arrow":
        return decode_arrow(df, tokens_col, out)
    if method == "native":
        return df.withColumn(out, decode_tokens_native(tokens_col))
    return df.withColumn(out, decode_tokens_pandas(F.col(tokens_col)))
