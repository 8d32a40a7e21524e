"""Token <-> string codec.

Tokens are byte values (bijective byte-level tokenization, FIXTURES.md §1). Two
decode paths:

* ``decode_tokens_native`` — pure Catalyst expression (whole-stage codegen, zero
  Python): valid when payloads are ASCII (token == codepoint), which the synth
  guarantees. This is the hot path at 100 TB — no JVM↔Python Arrow hop at all.
* ``decode_tokens_pandas`` — Arrow-batched pandas UDF handling arbitrary UTF-8
  byte sequences (the general case; the reference treats payloads as raw bytes,
  core/models/RawEvent.h).

Both are tested to agree on ASCII inputs. Encode (string → tokens) exists for
round-trip verification of the per-row token-array-equality invariant.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql import types as T


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


def with_content(df, tokens_col: str = "tokens", out: str = "content", ascii_only: bool = True):
    """Attach the decoded payload column, keeping ``tokens`` untouched."""
    dec = decode_tokens_native(tokens_col) if ascii_only else decode_tokens_pandas(F.col(tokens_col))
    return df.withColumn(out, dec)
