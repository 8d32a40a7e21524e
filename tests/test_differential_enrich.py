"""Seeded differentials for the two enrich operators built from hand-rolled
Catalyst chains rather than one builtin call:

* ``geoip`` (processor_geoip.go:35-165 semantics re-expressed as a broadcast
  /16-blocked range join): dotted-quad parsing with octet validation,
  ``ip_value_flag`` little-endian decimal IPs through ``try_cast`` (whitespace
  trim, +/- signs, leading zeros accepted; decimals/exponents/hex rejected —
  probed empirically), per-key presence gating on NULL geo columns, ``%.8f``
  coordinate formatting, ``no_coordinate``, ``keep_source=False`` removal, and
  both source shapes (fields-map entry vs top-level column) — vs a pure-Python
  linear range scan. Ranges are generated NON-overlapping (an mmdb is a
  partition of the IP space), some spanning multiple /16 blocks, some packed
  inside one block, with facts drawn ON the range boundaries.

* ``anchor`` (anchor.go:46,175-188): first-occurrence Start, Stop searched
  strictly after it, empty-start/begin-of-line and empty-stop/end-of-line,
  a non-empty absent Stop skipping the field, duplicate target fields
  (last-wins), and the merge over a pre-existing fields map — vs a pure-Python
  ``str.find`` emulator.

Each emulator is mutation-checked in-test: deliberately wrong variants (last
occurrence of Start, Stop searched from line start, exclusive range end,
octet-255 check dropped, big-endian ip_value) must disagree somewhere on the
corpus.
"""

from __future__ import annotations

import random
import re

from pyspark.sql import functions as F
from pyspark.sql import types as T

from loongcollector_spark.operators.enrich import anchor, geoip

SEED = 20260819


# ---------------------------------------------------------------------------
# geoip
# ---------------------------------------------------------------------------

_GEO_SCHEMA = T.StructType([
    T.StructField("ip_start", T.LongType()),
    T.StructField("ip_end", T.LongType()),
    T.StructField("city", T.StringType()),
    T.StructField("province", T.StringType()),
    T.StructField("province_code", T.StringType()),
    T.StructField("country", T.StringType()),
    T.StructField("country_code", T.StringType()),
    T.StructField("longitude", T.DoubleType()),
    T.StructField("latitude", T.DoubleType()),
])


def _rand_ranges(rng: random.Random, n: int):
    """Non-overlapping sorted ranges: alternating multi-/16 spans and
    single-block slivers, with adjacent ranges touching (end+1 == next start)
    half the time so boundary facts are decisive."""
    ranges = []
    cur = rng.randint(0, 1 << 20)
    for i in range(n):
        width = rng.choice([0, 1, rng.randint(2, 900), rng.randint(1 << 17, 1 << 19)])
        start = cur + (0 if rng.random() < 0.5 else rng.randint(1, 1 << 16))
        end = min(start + width, (1 << 32) - 1)
        row = {
            "ip_start": start,
            "ip_end": end,
            "city": f"c{i}" if rng.random() < 0.8 else None,
            "province": f"p{i}" if rng.random() < 0.8 else None,
            "province_code": f"pc{i}" if rng.random() < 0.8 else None,
            "country": f"C{i}" if rng.random() < 0.8 else None,
            "country_code": f"cc{i}" if rng.random() < 0.8 else None,
            "longitude": rng.uniform(-180, 180) if rng.random() < 0.8 else None,
            "latitude": rng.uniform(-90, 90) if rng.random() < 0.8 else None,
        }
        ranges.append(row)
        cur = end + 1
        if cur >= (1 << 32) - (1 << 21):
            break
    return ranges


def _long_to_dotted(v: int) -> str:
    return f"{(v >> 24) & 255}.{(v >> 16) & 255}.{(v >> 8) & 255}.{v & 255}"


def _rand_ips(rng: random.Random, ranges, ip_value_flag: bool):
    """Mostly boundary-adjacent hits/misses plus malformed spellings."""
    vals: list[str | None] = []
    for r in ranges:
        for v in (r["ip_start"], r["ip_end"], r["ip_start"] - 1, r["ip_end"] + 1,
                  (r["ip_start"] + r["ip_end"]) // 2):
            if 0 <= v <= (1 << 32) - 1:
                if ip_value_flag:
                    # inetNtoa input is the byte-REVERSED integer
                    rev = (((v & 255) << 24) | (((v >> 8) & 255) << 16)
                           | (((v >> 16) & 255) << 8) | ((v >> 24) & 255))
                    vals.append(rng.choice([str(rev), f" {rev} ", f"0{rev}"]))
                else:
                    vals.append(_long_to_dotted(v))
    bad = ["256.1.1.1", "1.2.3", "1.2.3.4.5", "a.b.c.d", "1.2.3.999", "",
           "1..2.3", None, "12.5", "9e9", "-1", "+17", "0x10",
           str((1 << 32)), str((1 << 40)), "   "]
    vals.extend(bad)
    rng.shuffle(vals)
    return vals


def _try_cast_long(s: str | None) -> int | None:
    """Spark try_cast(string as long) acceptance, probed empirically:
    trims whitespace, optional +/- sign, digits only."""
    if s is None:
        return None
    t = s.strip()
    if not re.fullmatch(r"[+-]?\d+", t):
        return None
    v = int(t)
    return v if -(1 << 63) <= v < (1 << 63) else None


def _parse_ip(s: str | None, ip_value_flag: bool) -> int | None:
    if s is None:
        return None
    if ip_value_flag:
        n = _try_cast_long(s)
        if n is None or not (0 <= n <= 4294967295):
            return None
        return (((n & 255) << 24) | (((n >> 8) & 255) << 16)
                | (((n >> 16) & 255) << 8) | ((n >> 24) & 255))
    if not re.fullmatch(r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}", s):
        return None
    octs = [int(p) for p in s.split(".")]
    if any(o > 255 for o in octs):
        return None
    return (octs[0] << 24) | (octs[1] << 16) | (octs[2] << 8) | octs[3]


def _emulate_geoip(fields: dict, src_key: str, ranges, *, keep_source: bool,
                   ip_value_flag: bool, no_coordinate: bool) -> dict:
    out = dict(fields)
    if not keep_source:
        out.pop(src_key, None)
    v = _parse_ip(fields.get(src_key), ip_value_flag)
    hit = None
    if v is not None:
        for r in ranges:  # non-overlapping: at most one
            if r["ip_start"] <= v <= r["ip_end"]:
                hit = r
                break
    if hit is None:
        return out
    emit = [("city", "city"), ("province", "province"),
            ("province_code", "province_code"), ("country", "country"),
            ("country_code", "country_code")]
    for suffix, col in emit:
        if hit[col] is not None:
            out[f"{src_key}_{suffix}_"] = hit[col]
    if not no_coordinate:
        for suffix, col in [("longitude", "longitude"), ("latitude", "latitude")]:
            if hit[col] is not None:
                out[f"{src_key}_{suffix}_"] = f"{hit[col]:.8f}"
    return out


_GEO_MODES = [
    # (keep_source, ip_value_flag, no_coordinate)
    (True, False, False),
    (False, False, True),
    (True, True, False),
]


def test_geoip_differential(spark):
    rng = random.Random(SEED)
    ranges = _rand_ranges(rng, 24)
    geo_df = spark.createDataFrame(ranges, _GEO_SCHEMA)
    for keep_source, ip_value_flag, no_coordinate in _GEO_MODES:
        ips = _rand_ips(rng, ranges, ip_value_flag)
        rows = [
            (i, {"ip": ip, "keep": f"k{i}"} if ip is not None else {"keep": f"k{i}"})
            for i, ip in enumerate(ips)
        ]
        df = spark.createDataFrame(
            rows,
            T.StructType([
                T.StructField("id", T.LongType()),
                T.StructField("fields", T.MapType(T.StringType(), T.StringType())),
            ]),
        )
        out = geoip(
            df, geo_df, "ip", keep_source=keep_source,
            ip_value_flag=ip_value_flag, no_coordinate=no_coordinate,
        )
        got = {r["id"]: r["fields"] for r in out.collect()}
        assert len(got) == len(rows), "range overlap duplicated a fact row"
        want = {
            i: _emulate_geoip(f, "ip", ranges, keep_source=keep_source,
                              ip_value_flag=ip_value_flag, no_coordinate=no_coordinate)
            for i, f in rows
        }
        assert got == want, (
            keep_source, ip_value_flag, no_coordinate,
            {k: (got[k], want[k]) for k in got if got[k] != want[k]},
        )


def test_geoip_top_level_column(spark):
    """source_is_field=False reads a top-level column; fields map starts
    empty and receives only geo keys."""
    rng = random.Random(SEED + 7)
    ranges = _rand_ranges(rng, 8)
    geo_df = spark.createDataFrame(ranges, _GEO_SCHEMA)
    ips = _rand_ips(rng, ranges, False)
    df = spark.createDataFrame(
        list(enumerate(ips)),
        T.StructType([
            T.StructField("id", T.LongType()),
            T.StructField("ip", T.StringType()),
        ]),
    ).withColumn("fields", F.lit(None).cast("map<string,string>"))
    out = geoip(df, geo_df, "ip", source_is_field=False)
    got = {r["id"]: r["fields"] for r in out.collect()}
    want = {
        i: _emulate_geoip({"ip": ip} if ip is not None else {}, "ip", ranges,
                          keep_source=True, ip_value_flag=False, no_coordinate=False)
        for i, ip in enumerate(ips)
    }
    # top-level source: the fields map never contains the source key itself
    want = {i: {k: v for k, v in m.items() if k != "ip"} for i, m in want.items()}
    assert got == want, {k: (got[k], want[k]) for k in got if got[k] != want[k]}


def test_geoip_corpus_kills_mutants():
    rng = random.Random(SEED)
    ranges = _rand_ranges(rng, 24)

    def exclusive_end(fields, src_key, rngs, **kw):
        shrunk = [dict(r, ip_end=r["ip_end"] - 1) for r in rngs]
        return _emulate_geoip(fields, src_key, shrunk, **kw)

    def no_octet_check(fields, src_key, rngs, **kw):
        s = fields.get(src_key)
        if s is not None and re.fullmatch(r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}", s):
            octs = [int(p) % 256 for p in s.split(".")]
            fields = dict(fields)
            fields[src_key] = ".".join(str(o) for o in octs)
        return _emulate_geoip(fields, src_key, rngs, **kw)

    def big_endian_value(fields, src_key, rngs, **kw):
        s = fields.get(src_key)
        n = _try_cast_long(s)
        if kw.get("ip_value_flag") and n is not None and 0 <= n <= 4294967295:
            fields = dict(fields)
            rev = (((n & 255) << 24) | (((n >> 8) & 255) << 16)
                   | (((n >> 16) & 255) << 8) | ((n >> 24) & 255))
            fields[src_key] = str(rev)  # double-reverse == identity ⇒ big-endian
        return _emulate_geoip(fields, src_key, rngs, **kw)

    for mutant in (exclusive_end, no_octet_check, big_endian_value):
        killed = False
        r2 = random.Random(SEED)
        _ = _rand_ranges(r2, 24)  # keep the draw sequence aligned
        for keep_source, ip_value_flag, no_coordinate in _GEO_MODES:
            ips = _rand_ips(r2, ranges, ip_value_flag)
            kw = dict(keep_source=keep_source, ip_value_flag=ip_value_flag,
                      no_coordinate=no_coordinate)
            for i, ip in enumerate(ips):
                f = {"ip": ip, "keep": f"k{i}"} if ip is not None else {"keep": f"k{i}"}
                if mutant(f, "ip", ranges, **kw) != _emulate_geoip(f, "ip", ranges, **kw):
                    killed = True
        assert killed, f"corpus never exercises: {mutant.__name__}"


# ---------------------------------------------------------------------------
# anchor
# ---------------------------------------------------------------------------

def _emulate_anchor(src: str | None, fields: dict | None, anchors) -> dict:
    out = dict(fields or {})
    add: dict[str, str] = {}  # dict insert order = last-wins like the entries dedup
    for a in anchors:
        start, stop, field = a.get("start", ""), a.get("stop", ""), a["field"]
        if src is None:
            continue
        if start:
            sp = src.find(start)
            if sp < 0:
                continue
            after = src[sp + len(start):]
        else:
            after = src
        if stop:
            ep = after.find(stop)
            if ep < 0:
                continue
            add[field] = after[:ep]
        else:
            add[field] = after
    out.update(add)
    return out


_ANCHOR_PARTS = ["[", "]", "<", ">", "::", "a", "b", " ", "=", "req=", "ms", ""]


def _rand_anchor_cfg(rng: random.Random):
    anchors = []
    for i in range(rng.randint(1, 4)):
        anchors.append({
            "start": rng.choice(_ANCHOR_PARTS),
            "stop": rng.choice(_ANCHOR_PARTS),
            # deliberate duplicate field names across anchors ~25% of the time
            "field": f"f{rng.randint(0, max(1, i))}",
        })
    return anchors


def _rand_anchor_line(rng: random.Random) -> str | None:
    r = rng.random()
    if r < 0.04:
        return None
    if r < 0.08:
        return ""
    return "".join(rng.choice(_ANCHOR_PARTS) for _ in range(rng.randint(1, 12)))


def test_anchor_differential(spark):
    rng = random.Random(SEED + 3)
    for cfg_i in range(10):
        anchors = _rand_anchor_cfg(rng)
        lines = [_rand_anchor_line(rng) for _ in range(120)]
        base_fields = [{"pre": str(i)} if i % 3 == 0 else None for i in range(len(lines))]
        df = spark.createDataFrame(
            list(zip(range(len(lines)), lines, base_fields)),
            T.StructType([
                T.StructField("id", T.LongType()),
                T.StructField("content", T.StringType()),
                T.StructField("fields", T.MapType(T.StringType(), T.StringType())),
            ]),
        )
        out = anchor(df, anchors)
        got = {r["id"]: r["fields"] for r in out.collect()}
        want = {
            i: _emulate_anchor(ln, bf, anchors)
            for i, (ln, bf) in enumerate(zip(lines, base_fields))
        }
        assert got == want, (
            cfg_i, anchors,
            {k: (got[k], want[k], lines[k]) for k in got if got[k] != want[k]},
        )


def test_anchor_source_is_field(spark):
    """Source read out of the fields map; extraction merges back over it."""
    anchors = [{"start": "[", "stop": "]", "field": "lvl"},
               {"start": "req=", "stop": "", "field": "req"}]
    rows = [
        (0, {"content": "[INFO] req=GET /x", "lvl": "old"}),
        (1, {"content": "no brackets req="}),
        (2, {"other": "x"}),   # source key absent → NULL src, nothing added
        (3, None),
    ]
    df = spark.createDataFrame(
        rows,
        T.StructType([
            T.StructField("id", T.LongType()),
            T.StructField("fields", T.MapType(T.StringType(), T.StringType())),
        ]),
    )
    out = anchor(df, anchors, source_key="content", source_is_field=True)
    got = {r["id"]: r["fields"] for r in out.collect()}
    want = {
        i: _emulate_anchor((f or {}).get("content"), f, anchors)
        for i, f in rows
    }
    assert got == want


def test_anchor_corpus_kills_mutants():
    def last_start(src, fields, anchors):
        out = dict(fields or {})
        add = {}
        for a in anchors:
            start, stop, field = a.get("start", ""), a.get("stop", ""), a["field"]
            if src is None:
                continue
            if start:
                sp = src.rfind(start)
                if sp < 0:
                    continue
                after = src[sp + len(start):]
            else:
                after = src
            if stop:
                ep = after.find(stop)
                if ep < 0:
                    continue
                add[field] = after[:ep]
            else:
                add[field] = after
        out.update(add)
        return out

    def stop_from_line_start(src, fields, anchors):
        out = dict(fields or {})
        add = {}
        for a in anchors:
            start, stop, field = a.get("start", ""), a.get("stop", ""), a["field"]
            if src is None:
                continue
            if start:
                sp = src.find(start)
                if sp < 0:
                    continue
                content_from = sp + len(start)
            else:
                content_from = 0
            if stop:
                ep = src.find(stop)  # WRONG: not restricted to after Start
                if ep < 0:
                    continue
                add[field] = src[content_from:ep] if ep >= content_from else ""
            else:
                add[field] = src[content_from:]
        out.update(add)
        return out

    def first_wins_dup(src, fields, anchors):
        out = dict(fields or {})
        add: dict[str, str] = {}
        for a in anchors:
            start, stop, field = a.get("start", ""), a.get("stop", ""), a["field"]
            if src is None or field in add:
                continue
            if start:
                sp = src.find(start)
                if sp < 0:
                    continue
                after = src[sp + len(start):]
            else:
                after = src
            if stop:
                ep = after.find(stop)
                if ep < 0:
                    continue
                add[field] = after[:ep]
            else:
                add[field] = after
        out.update(add)
        return out

    for mutant in (last_start, stop_from_line_start, first_wins_dup):
        killed = False
        rng = random.Random(SEED + 3)
        for _ in range(10):
            anchors = _rand_anchor_cfg(rng)
            lines = [_rand_anchor_line(rng) for _ in range(120)]
            base_fields = [{"pre": str(i)} if i % 3 == 0 else None for i in range(len(lines))]
            for ln, bf in zip(lines, base_fields):
                if mutant(ln, bf, anchors) != _emulate_anchor(ln, bf, anchors):
                    killed = True
        assert killed, f"corpus never exercises: {mutant.__name__}"
