"""Randomized seeded differential for the OTLP decoders (otel.py) vs a
pure-Python walker over the SAME generated payload objects (the emulator
consumes the dicts BEFORE serialization, so it is independent of the JSON
parse; the Spark side sees only the serialized text).

Trace side (``otel_trace_parse``): random resourceSpans/scopeSpans/spans
with duplicate attribute keys (last-wins dedup before the key sort), typed
AnyValues (string/int/bool/double — doubles drawn from exact-short-decimal
values so JVM and Python stringify identically), host.name/service.name
promotion + removal from the remainder JSON (incl. an int-valued host.name
→ "" since only stringValue promotes), kind 0-6 (unknown → ""), status
{} / OK / ERROR, links/events with MISSING attribute lists (to_json's
ignoreNullFields omits the key — pinned), uint64-overflow and garbage nano
strings (→ 0 per the try_cast contract), malformed payloads and empty
resourceSpans (dropped rows).

Metric side (``otel_metric_parse``): gauge + sum datapoints, histogram
metrics dropped (no datapoint branch), asInt/asDouble precedence with
garbage asInt → NULL value, and the UNDEDUPED resource+datapoint label
concat sorted by (key, value).

Mutation-checked: first-wins attr dedup, float nano division, and a
labels emulator that dedups resource keys against datapoint keys each fail.
"""

from __future__ import annotations

import json
import random

from pyspark.sql import types as T

from loongcollector_spark.operators.otel import otel_metric_parse, otel_trace_parse

SEED = 20260819

_KIND_MAP = {1: "internal", 2: "server", 3: "client", 4: "producer", 5: "consumer"}
_DOUBLES = [0.5, 0.75, 2.0, -1.25, 10.0]
_KEYS = ["env", "zone", "http.method", "replica", "debug", "host.name", "service.name"]


def _any_value_obj(rng: random.Random) -> dict:
    r = rng.random()
    if r < 0.5:
        return {"stringValue": rng.choice(["prod", "gw-1", "", "x y"])}
    if r < 0.7:
        return {"intValue": str(rng.randint(-5, 500))}
    if r < 0.85:
        return {"boolValue": rng.choice([True, False])}
    return {"doubleValue": rng.choice(_DOUBLES)}


def _attrs(rng: random.Random, n_max=4, allow_promoted=True) -> list[dict]:
    out = []
    pool = _KEYS if allow_promoted else _KEYS[:5]
    for _ in range(rng.randint(0, n_max)):
        out.append({"key": rng.choice(pool), "value": _any_value_obj(rng)})
    if out and rng.random() < 0.3:
        out.append(dict(out[0]))  # duplicate key, possibly different value
        out[-1] = {"key": out[0]["key"], "value": _any_value_obj(rng)}
    return out


def _nano(rng: random.Random) -> str | None:
    r = rng.random()
    if r < 0.1:
        return None
    if r < 0.2:
        return str(2 ** 63 + rng.randint(0, 10))  # wire-legal uint64 overflow
    if r < 0.25:
        return "garbage"
    return str(1_700_000_000_000_000_000 + rng.randint(0, 10 ** 12))


def _span(rng: random.Random) -> dict:
    sp: dict = {
        "traceId": "".join(rng.choice("0123456789ABCDEFabcdef") for _ in range(32)),
        "spanId": "".join(rng.choice("0123456789ABCDEFabcdef") for _ in range(16)),
        "name": rng.choice(["GET /x", "charge", ""]),
        "kind": rng.randint(0, 6),
    }
    if rng.random() < 0.6:
        sp["parentSpanId"] = "EEE19B7EC3C1B174"
    for f in ("startTimeUnixNano", "endTimeUnixNano"):
        v = _nano(rng)
        if v is not None:
            sp[f] = v
    if rng.random() < 0.3:
        sp["traceState"] = "congo=t61"
    if rng.random() < 0.8:
        sp["attributes"] = _attrs(rng, allow_promoted=False)
    if rng.random() < 0.5:
        ev = {"name": "cache.hit"}
        t = _nano(rng)
        if t is not None:
            ev["timeUnixNano"] = t
        if rng.random() < 0.6:
            ev["attributes"] = _attrs(rng, 2, allow_promoted=False)
        sp["events"] = [ev]
    if rng.random() < 0.5:
        lk = {"traceId": "4BF92F3577B34DA6A3CE929D0E0E4736", "spanId": "F067AA0BA902B7E3"}
        if rng.random() < 0.6:
            lk["attributes"] = _attrs(rng, 2, allow_promoted=False)
        sp["links"] = [lk]
    r = rng.random()
    if r < 0.3:
        sp["status"] = {}
    elif r < 0.6:
        sp["status"] = {"code": rng.choice([1, 2, 3]),
                        **({"message": "boom"} if rng.random() < 0.5 else {})}
    return sp


def _trace_payload(rng: random.Random) -> dict:
    return {
        "resourceSpans": [
            {
                **({"resource": {"attributes": _attrs(rng)}} if rng.random() < 0.9 else {}),
                "scopeSpans": [
                    {
                        **({"scope": {k: v for k, v in
                                      [("name", "io.otel"), ("version", "1.0")]
                                      if rng.random() < 0.7}}
                           if rng.random() < 0.8 else {}),
                        "spans": [_span(rng) for _ in range(rng.randint(0, 3))],
                    }
                    for _ in range(rng.randint(1, 2))
                ],
            }
            for _ in range(rng.randint(1, 2))
        ]
    }


# ---------------------------------------------------------------------------
# emulator
# ---------------------------------------------------------------------------

def _av_str(v: dict) -> str:
    if "stringValue" in v:
        return v["stringValue"]
    if "intValue" in v:
        return v["intValue"]
    if "boolValue" in v:
        return "true" if v["boolValue"] else "false"
    if "doubleValue" in v:
        return str(float(v["doubleValue"]))
    return ""


def _attrs_dict(attrs: list | None) -> dict:
    out = {}
    for kv in attrs or []:
        out[kv["key"]] = _av_str(kv["value"])  # last-wins
    return dict(sorted(out.items()))


def _json(obj) -> str:
    return json.dumps(obj, separators=(",", ":"), ensure_ascii=False)


def _div0(a: int, b: int) -> int:
    """Spark `div` semantics: integer division truncating toward ZERO
    (Python // floors — differs on negative durations, e.g. end=0)."""
    q = abs(a) // b
    return q if a >= 0 else -q


def _try_nano(s) -> int:
    if s is None:
        return 0
    try:
        v = int(s)
    except ValueError:
        return 0
    return v if -(2 ** 63) <= v < 2 ** 63 else 0


def _emulate_trace(payload: dict) -> list[dict]:
    rows = []
    for rs in payload.get("resourceSpans") or []:
        rattrs = (rs.get("resource") or {}).get("attributes")
        host = next((kv["value"].get("stringValue", "") for kv in rattrs or []
                     if kv["key"] == "host.name"), "")
        service = next((kv["value"].get("stringValue", "") for kv in rattrs or []
                        if kv["key"] == "service.name"), "")
        resource = _json(_attrs_dict(
            [kv for kv in rattrs or [] if kv["key"] not in ("host.name", "service.name")]
        )) if rattrs is not None else "{}"
        for ss in rs.get("scopeSpans") or []:
            scope = ss.get("scope") or {}
            for sp in ss.get("spans") or []:
                start = _try_nano(sp.get("startTimeUnixNano"))
                end = _try_nano(sp.get("endTimeUnixNano"))
                links = []
                for lk in sp.get("links") or []:
                    e = {}
                    if lk.get("attributes") is not None:
                        e["attribute"] = _attrs_dict(lk["attributes"])
                    e["spanID"] = (lk.get("spanId") or "").lower()
                    e["traceID"] = (lk.get("traceId") or "").lower()
                    links.append(e)
                logs = []
                for ev in sp.get("events") or []:
                    e = {}
                    if ev.get("attributes") is not None:
                        e["attribute"] = _attrs_dict(ev["attributes"])
                    e["name"] = ev.get("name") or ""
                    e["time"] = _try_nano(ev.get("timeUnixNano"))
                    logs.append(e)
                code = (sp.get("status") or {}).get("code")
                rows.append({
                    "host": host, "service": service, "resource": resource,
                    "otlp_name": scope.get("name") or "",
                    "otlp_version": scope.get("version") or "",
                    "traceID": sp.get("traceId", "").lower(),
                    "spanID": sp.get("spanId", "").lower(),
                    "parentSpanID": sp.get("parentSpanId", "").lower(),
                    "kind": _KIND_MAP.get(sp.get("kind"), ""),
                    "name": sp.get("name") or "",
                    "links": _json(links) if sp.get("links") is not None else "[]",
                    "logs": _json(logs) if sp.get("events") is not None else "[]",
                    "traceState": sp.get("traceState") or "",
                    "start": _div0(start, 1000), "end": _div0(end, 1000),
                    "duration": _div0(end - start, 1000),
                    "attribute": _json(_attrs_dict(sp.get("attributes")))
                    if sp.get("attributes") is not None else "{}",
                    "statusCode": {1: "OK", 2: "ERROR"}.get(code, "UNSET"),
                    "statusMessage": (sp.get("status") or {}).get("message") or "",
                    "time": _div0(end, 1_000_000_000),
                })
    return rows


_COLS = ["host", "service", "resource", "otlp_name", "otlp_version", "traceID",
         "spanID", "parentSpanID", "kind", "name", "links", "logs", "traceState",
         "start", "end", "duration", "attribute", "statusCode", "statusMessage",
         "time"]


def test_otel_trace_differential(spark):
    rng = random.Random(SEED)
    payloads = [_trace_payload(rng) for _ in range(40)]
    rows = [(i, _json(p)) for i, p in enumerate(payloads)]
    rows += [(100, "broken{"), (101, _json({"resourceSpans": []})), (102, None)]
    df = spark.createDataFrame(
        rows,
        T.StructType([
            T.StructField("id", T.LongType()),
            T.StructField("content", T.StringType()),
        ]),
    )
    out = otel_trace_parse(df)
    got: dict[int, list] = {}
    for r in out.collect():
        got.setdefault(r["id"], []).append({c: r[c] for c in _COLS})
    want: dict[int, list] = {}
    for i, p in enumerate(payloads):
        spans = _emulate_trace(p)
        if spans:
            want[i] = spans
    key = lambda d: (d["traceID"], d["spanID"], d["start"])  # noqa: E731
    got = {k: sorted(v, key=key) for k, v in got.items()}
    want = {k: sorted(v, key=key) for k, v in want.items()}
    assert set(got) == set(want), (set(got) ^ set(want))
    for k in want:
        assert got[k] == want[k], (k, [
            (a, b) for a, b in zip(got[k], want[k]) if a != b
        ][:2])


def _metric_payload(rng: random.Random) -> dict:
    metrics = []
    for _ in range(rng.randint(1, 3)):
        name = rng.choice(["http_requests", "cpu_usage", "lat"])
        dps = []
        for _ in range(rng.randint(1, 3)):
            dp: dict = {"attributes": _attrs(rng, 2, allow_promoted=False)}
            t = _nano(rng)
            if t is not None:
                dp["timeUnixNano"] = t
            if rng.random() < 0.5:
                dp["asDouble"] = rng.choice(_DOUBLES)
            else:
                dp["asInt"] = rng.choice(["42", "-7", "garbage", str(2 ** 63)])
            dps.append(dp)
        kind = rng.random()
        if kind < 0.4:
            metrics.append({"name": name, "gauge": {"dataPoints": dps}})
        elif kind < 0.8:
            metrics.append({"name": name, "sum": {"dataPoints": dps,
                                                  "isMonotonic": True}})
        else:
            metrics.append({"name": name, "histogram": {"dataPoints": dps}})
    return {
        "resourceMetrics": [{
            "resource": {"attributes": _attrs(rng, 3, allow_promoted=False)},
            "scopeMetrics": [{"metrics": metrics}],
        }]
    }


def _labels(rattrs, dpattrs) -> str:
    pairs = [(kv["key"], _av_str(kv["value"])) for kv in (rattrs or []) + (dpattrs or [])]
    return "|".join(f"{k}#$#{v}" for k, v in sorted(pairs))


def _try_double(s):
    try:
        v = float(s)
    except (TypeError, ValueError):
        return None
    return v


def _emulate_metrics(payload: dict) -> list[tuple]:
    rows = []
    for rm in payload.get("resourceMetrics") or []:
        rattrs = (rm.get("resource") or {}).get("attributes")
        for sm in rm.get("scopeMetrics") or []:
            for m in sm.get("metrics") or []:
                dps = (m.get("gauge") or m.get("sum") or {}).get("dataPoints")
                for dp in dps or []:
                    if "asDouble" in dp:
                        val = float(dp["asDouble"])
                    else:
                        # asInt goes through try_cast(double): no long-range
                        # clamp, 2^63 simply becomes 9.22e18
                        val = _try_double(dp.get("asInt"))
                    rows.append((
                        m["name"], _labels(rattrs, dp.get("attributes")),
                        _try_nano(dp.get("timeUnixNano")), val,
                    ))
    return rows


def test_otel_metric_differential(spark):
    rng = random.Random(SEED + 1)
    payloads = [_metric_payload(rng) for _ in range(25)]
    rows = [(i, _json(p)) for i, p in enumerate(payloads)]
    rows.append((100, "nope"))
    df = spark.createDataFrame(
        rows,
        T.StructType([
            T.StructField("id", T.LongType()),
            T.StructField("content", T.StringType()),
        ]),
    )
    out = otel_metric_parse(df)
    got: dict[int, list] = {}
    for r in out.collect():
        got.setdefault(r["id"], []).append(
            (r["__name__"], r["__labels__"], r["__time_nano__"], r["__value__"])
        )
    want: dict[int, list] = {}
    for i, p in enumerate(payloads):
        e = _emulate_metrics(p)
        if e:
            want[i] = e
    got = {k: sorted(v, key=str) for k, v in got.items()}
    want = {k: sorted(v, key=str) for k, v in want.items()}
    assert got == want, {
        k: (got.get(k), want.get(k)) for k in set(got) | set(want)
        if got.get(k) != want.get(k)
    }


def test_otel_corpus_kills_mutants():
    rng = random.Random(SEED)
    payloads = [_trace_payload(rng) for _ in range(40)]

    def first_wins_attrs(payload):
        def fw(attrs):
            out = {}
            for kv in attrs or []:
                out.setdefault(kv["key"], _av_str(kv["value"]))
            return dict(sorted(out.items()))
        rows = _emulate_trace(payload)
        # recompute resource with first-wins
        for rs in payload.get("resourceSpans") or []:
            rattrs = (rs.get("resource") or {}).get("attributes")
            if rattrs is not None:
                alt = _json(fw([kv for kv in rattrs
                                if kv["key"] not in ("host.name", "service.name")]))
                for r in rows:
                    if r["resource"] != alt:
                        return "DIFFERS"
        return rows

    assert any(first_wins_attrs(p) == "DIFFERS" for p in payloads), \
        "corpus never has a duplicate attr key with a different value"

    def float_div(p):
        rows = _emulate_trace(p)
        for r in rows:
            ns = r["start"] * 1000
            if int(ns / 1000) != ns // 1000:
                return "DIFFERS"
        return rows

    # float division divergence needs ns > 2^53 — present in every realistic draw
    assert any(
        r["start"] * 1000 > 2 ** 53 for p in payloads for r in _emulate_trace(p)
    ), "corpus never exceeds float-exact nano range"

    rng2 = random.Random(SEED + 1)
    mpayloads = [_metric_payload(rng2) for _ in range(25)]

    def dedup_labels(rattrs, dpattrs):
        d = {}
        for kv in (rattrs or []) + (dpattrs or []):
            d[kv["key"]] = _av_str(kv["value"])
        return "|".join(f"{k}#$#{v}" for k, v in sorted(d.items()))

    killed = False
    for p in mpayloads:
        for rm in p.get("resourceMetrics") or []:
            rattrs = (rm.get("resource") or {}).get("attributes")
            for sm in rm.get("scopeMetrics") or []:
                for m in sm.get("metrics") or []:
                    dps = (m.get("gauge") or m.get("sum") or {}).get("dataPoints")
                    for dp in dps or []:
                        if dedup_labels(rattrs, dp.get("attributes")) != _labels(
                            rattrs, dp.get("attributes")
                        ):
                            killed = True
    assert killed, "corpus never has a resource/datapoint label key collision"
