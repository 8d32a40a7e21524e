"""Seeded differential for ``base64_field`` vs a Python emulator of Go
``base64.StdEncoding`` (processor_base64_encoding/_decoding semantics):

* **encode**: byte-identical to ``base64.b64encode`` INCLUDING payloads far
  past 57 bytes — Spark's ``base64`` MIME-wraps at 76 chars with CRLF on
  this build (probed), which Go never does; the operator must strip it.
* **decode**: accept exactly what ``StdEncoding.DecodeString`` accepts —
  ``\\r``/``\\n`` ignored anywhere, otherwise strict 4-char groups with
  exact ``=``/``==`` tail padding. Rejected inputs SKIP the field (absent
  from the map), mirroring the .go:49-57 error path. Corpus: valid
  encodings of random byte-ish strings (some CRLF-wrapped as a MIME
  producer would emit), missing padding, over-padding, mid-string ``=``,
  embedded SPACES (Go rejects — Spark's lenient parser alone would accept),
  non-alphabet chars, empty string, and absent/NULL source fields.

Mutation-checked: a whitespace-tolerant decoder (Spark's raw semantics) and
a padding-optional decoder must each disagree somewhere on the corpus.
"""

from __future__ import annotations

import base64
import binascii
import random
import string

from pyspark.sql import types as T

from loongcollector_spark.operators.enrich import base64_field

SEED = 20260819


def _go_decode(s: str | None) -> str | None:
    """base64.StdEncoding.DecodeString emulator: \\r\\n ignored, else strict."""
    if s is None:
        return None
    t = s.replace("\r", "").replace("\n", "")
    # strict shape: 4-char groups, exact tail padding
    import re
    if not re.fullmatch(r"(?:[A-Za-z0-9+/]{4})*(?:[A-Za-z0-9+/]{2}==|[A-Za-z0-9+/]{3}=)?", t):
        return None
    try:
        return base64.b64decode(t, validate=True).decode("utf-8", "surrogateescape")
    except (binascii.Error, ValueError):
        return None


def _mime_wrap(s: str) -> str:
    return "\r\n".join(s[i:i + 76] for i in range(0, len(s), 76))


def _corpus(rng: random.Random):
    plain = [
        "", "a", "hi", "hello!", "x" * 57, "y" * 58, "z" * 200,
        "".join(rng.choice(string.printable[:95]) for _ in range(rng.randint(1, 150))),
    ]
    vals: list[str | None] = []
    for p in plain:
        enc = base64.b64encode(p.encode()).decode()
        vals.append(enc)
        if len(enc) > 76:
            vals.append(_mime_wrap(enc))          # CRLF-wrapped: Go accepts
        vals.append(enc.rstrip("="))              # missing padding: Go rejects*
        vals.append(enc + "=")                    # over-padding: rejects
        if len(enc) >= 8:
            vals.append(enc[:4] + " " + enc[4:])  # embedded space: rejects
            vals.append(enc[:4] + "=" + enc[5:])  # mid-string '=': rejects
            vals.append(enc[:4] + "\n" + enc[4:])  # embedded LF: accepts
    vals += ["####", "YQ", "YQ=", "YQ==", "YQ===", None, "aGk=extra"]
    rng.shuffle(vals)
    return vals


def test_base64_decode_differential(spark):
    rng = random.Random(SEED)
    vals = _corpus(rng)
    rows = [
        (i, {"b64": v, "keep": "k"} if v is not None else {"keep": "k"})
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(
        rows,
        T.StructType([
            T.StructField("id", T.LongType()),
            T.StructField("fields", T.MapType(T.StringType(), T.StringType())),
        ]),
    )
    out = base64_field(df, "b64", "decoded", decode=True)
    got = {r["id"]: r["fields"] for r in out.collect()}
    want = {}
    for i, f in rows:
        m = dict(f)
        if "b64" in m:
            d = _go_decode(m["b64"])
            if d is not None:
                m["decoded"] = d
        want[i] = m
    assert got == want, {
        k: (got[k], want[k], vals[k]) for k in got if got[k] != want[k]
    }


def test_base64_encode_differential(spark):
    rng = random.Random(SEED + 1)
    plain = ["", "a", "hi", "x" * 57, "y" * 58, "z" * 500] + [
        "".join(rng.choice(string.ascii_letters) for _ in range(rng.randint(1, 300)))
        for _ in range(40)
    ]
    rows = [(i, {"v": p}) for i, p in enumerate(plain)]
    df = spark.createDataFrame(
        rows,
        T.StructType([
            T.StructField("id", T.LongType()),
            T.StructField("fields", T.MapType(T.StringType(), T.StringType())),
        ]),
    )
    out = base64_field(df, "v", "enc")
    got = {r["id"]: r["fields"]["enc"] for r in out.collect()}
    want = {i: base64.b64encode(p.encode()).decode() for i, p in enumerate(plain)}
    assert got == want, {k: (got[k], want[k]) for k in got if got[k] != want[k]}
    assert not any("\r" in v or "\n" in v for v in got.values())


def test_base64_corpus_kills_mutants():
    rng = random.Random(SEED)
    vals = [v for v in _corpus(rng) if v is not None]

    def whitespace_tolerant(s):  # Spark's raw MIME leniency
        import re
        t = re.sub(r"\s", "", s)
        pad = (-len(t)) % 4
        try:
            return base64.b64decode(t + "=" * pad, validate=True).decode(
                "utf-8", "surrogateescape"
            )
        except (binascii.Error, ValueError):
            return None

    def padding_optional(s):
        t = s.replace("\r", "").replace("\n", "")
        import re
        if not re.fullmatch(r"[A-Za-z0-9+/]*={0,2}", t):
            return None
        pad = (-len(t.rstrip("="))) % 4
        try:
            return base64.b64decode(t.rstrip("=") + "=" * pad, validate=True).decode(
                "utf-8", "surrogateescape"
            )
        except (binascii.Error, ValueError):
            return None

    for mutant in (whitespace_tolerant, padding_optional):
        assert any(mutant(v) != _go_decode(v) for v in vals), \
            f"corpus never exercises: {mutant.__name__}"
