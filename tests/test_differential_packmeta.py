"""Seeded differentials for the JSON-packing enrich operators vs Python
``json`` emulators:

* ``pack_json`` (processor_packjson): ``to_json(struct(...))`` field order
  follows ``source_keys`` order, absent/NULL fields are OMITTED from the
  object (Spark's ignoreNullFields default == Go's map-insert of present
  keys), values with quotes/backslashes/unicode must escape identically to
  ``json.dumps(ensure_ascii=False)`` compact form.
* ``cloud_meta`` (cloud_meta.go:33-140) in all three shapes: append mode
  (rename + merge into the fields map, last-wins over existing keys),
  top-level JSON mode (merge into the JSON object held in a field —
  preserving the existing object's key ORDER for kept keys, overlay
  appended, malformed/absent JSON treated as empty), and nested JSONPath
  mode (dotted path creates intermediate objects, non-dict nodes replaced,
  sort_keys output per the operator contract).

Mutation-checked: a null-as-JSON-null packer, an overlay-first merge
order, and a nested mode that refuses to replace non-dict intermediates
each fail somewhere.
"""

from __future__ import annotations

import json
import random

from pyspark.sql import types as T

from loongcollector_spark.operators.enrich import cloud_meta, pack_json

SEED = 20260819

_VALS = ['plain', 'with "quotes"', "back\\slash", "é π", "", "a,b:{c}", None]


def _rand_fields(rng: random.Random) -> dict:
    f = {}
    for k in ("a", "b", "c", "z"):
        if rng.random() < 0.7:
            v = rng.choice(_VALS)
            if v is not None:
                f[k] = v
    return f


def test_pack_json_differential(spark):
    rng = random.Random(SEED)
    rows = [(i, _rand_fields(rng)) for i in range(200)]
    df = spark.createDataFrame(
        rows,
        T.StructType([
            T.StructField("id", T.LongType()),
            T.StructField("fields", T.MapType(T.StringType(), T.StringType())),
        ]),
    )
    keys = ["b", "a", "c"]  # deliberate non-alphabetical order
    out = pack_json(df, keys, "packed")
    got = {r["id"]: r["fields"]["packed"] for r in out.collect()}
    want = {}
    for i, f in rows:
        obj = {k: f[k] for k in keys if f.get(k) is not None}
        want[i] = json.dumps(obj, separators=(",", ":"), ensure_ascii=False)
    assert got == want, {
        k: (got[k], want[k], rows[k][1]) for k in got if got[k] != want[k]
    }


_META = {"instance_id": "i-mock", "region": "mock-1", "zone": "mock-1a"}


def test_cloud_meta_append_differential(spark):
    rng = random.Random(SEED + 1)
    rows = [(i, _rand_fields(rng)) for i in range(150)]
    rows.append((150, {"region_": "pre-existing"}))  # rename collision: last-wins
    df = spark.createDataFrame(
        rows,
        T.StructType([
            T.StructField("id", T.LongType()),
            T.StructField("fields", T.MapType(T.StringType(), T.StringType())),
        ]),
    )
    out = cloud_meta(
        df, ["instance_id", "region", "nope"], rename={"region": "region_"},
        provider=_META,
    )
    got = {r["id"]: r["fields"] for r in out.collect()}
    want = {}
    for i, f in rows:
        m = dict(f)
        m["instance_id"] = _META["instance_id"]
        m["region_"] = _META["region"]       # renamed; 'nope' absent from provider
        want[i] = m
    assert got == want


def test_cloud_meta_json_top_level_differential(spark):
    objs = [
        '{"keep":"1","instance_id":"old"}',  # overlay overrides, keep-order preserved
        '{"z":"9","a":"0"}',
        "{}", "", None, "not json", "[1,2]",  # malformed/array → treated empty
    ]
    rows = [
        (i, {"blob": o} if o is not None else {"other": "x"})
        for i, o in enumerate(objs)
    ]
    df = spark.createDataFrame(
        rows,
        T.StructType([
            T.StructField("id", T.LongType()),
            T.StructField("fields", T.MapType(T.StringType(), T.StringType())),
        ]),
    )
    out = cloud_meta(df, ["instance_id", "region"], json_path="blob", provider=_META)
    got = {r["id"]: r["fields"]["blob"] for r in out.collect()}
    overlay = {"instance_id": _META["instance_id"], "region": _META["region"]}
    want = {}
    for i, o in enumerate(objs):
        try:
            base = json.loads(o) if o else {}
        except ValueError:
            base = {}
        if not isinstance(base, dict):
            base = {}
        merged = {k: v for k, v in base.items() if k not in overlay}
        merged.update(overlay)
        want[i] = json.dumps(merged, separators=(",", ":"), ensure_ascii=False)
    assert got == want, {k: (got[k], want[k]) for k in got if got[k] != want[k]}


def test_cloud_meta_nested_differential(spark):
    objs = [
        '{"data":{"meta":{"old":"1"}},"top":"t"}',
        '{"data":"not-a-dict"}',             # non-dict node replaced
        '{"data":{"meta":[1]}}',             # non-dict leaf replaced
        "{}", "", "broken{",
    ]
    rows = [(i, {"blob": o}) for i, o in enumerate(objs)]
    df = spark.createDataFrame(
        rows,
        T.StructType([
            T.StructField("id", T.LongType()),
            T.StructField("fields", T.MapType(T.StringType(), T.StringType())),
        ]),
    )
    out = cloud_meta(df, ["region"], json_path="blob.data.meta", provider=_META)
    got = {r["id"]: r["fields"]["blob"] for r in out.collect()}
    want = {}
    for i, o in enumerate(objs):
        try:
            obj = json.loads(o) if o else {}
        except ValueError:
            obj = {}
        if not isinstance(obj, dict):
            obj = {}
        node = obj
        for seg in ("data", "meta"):
            nxt = node.get(seg)
            if not isinstance(nxt, dict):
                nxt = {}
                node[seg] = nxt
            node = nxt
        node.update({"region": _META["region"]})
        want[i] = json.dumps(obj, separators=(",", ":"), sort_keys=True)
    assert got == want, {k: (got[k], want[k]) for k in got if got[k] != want[k]}


def test_packmeta_corpus_kills_mutants():
    rng = random.Random(SEED)
    rows = [_rand_fields(rng) for _ in range(200)]
    keys = ["b", "a", "c"]

    def null_as_json_null(f):
        obj = {k: f.get(k) for k in keys}
        return json.dumps(obj, separators=(",", ":"), ensure_ascii=False)

    def true_pack(f):
        obj = {k: f[k] for k in keys if f.get(k) is not None}
        return json.dumps(obj, separators=(",", ":"), ensure_ascii=False)

    assert any(null_as_json_null(f) != true_pack(f) for f in rows), \
        "corpus never has an absent pack key"

    base = {"keep": "1", "instance_id": "old"}
    overlay = {"instance_id": "i-mock", "region": "mock-1"}
    kept_first = {**{k: v for k, v in base.items() if k not in overlay}, **overlay}
    overlay_first = {**overlay, **{k: v for k, v in base.items() if k not in overlay}}
    assert (json.dumps(kept_first, separators=(",", ":"))
            != json.dumps(overlay_first, separators=(",", ":"))), \
        "merge order must be observable in the serialized object"
