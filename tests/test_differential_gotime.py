"""Value-level seeded differential for ``gotime(go_layout=True)``.

Random Go reference layouts are assembled from a token LIST (the emulator
consumes the tokens directly; only the joined string goes through the
translator — so the test exercises ``go_layout_to_spark`` + the JDK parse
without sharing a layout scanner with the code under test). A pure-Python
emulator of Go ``time.Format`` renders each random instant into the layout;
Spark must then

* parse back the EXACT instant (``unix_micros`` equality — the corpus
  truncates instants to the layout's fraction resolution up front), and
* re-format it into a second random dest layout byte-identically to the
  emulator's Go rendering of the same instant.

Corpus covers: Y-M-D / M/D/Y / D-MonthName-Y orders, padded + unpadded
numerics, full/abbrev month and weekday names (weekday exercises the
parse-side strip regex), 24h and 12h+PM clocks, fixed ``.000``/``.000000``
and elided ``.999``-style fractions (elided fractions are drawn either empty
or full-width — JDK's optional [.SSS] cannot parse a partially-trimmed
width, a documented translator limitation), ``-0700``/``-07:00``/``Z07:00``
offsets at +00:00/+05:30/-07:00, two-digit years inside the 20xx window
where Go and JDK pivots agree, the ``_2`` space-pad collapse, fixed-zone
source_tz/dest_tz conversion via zoneinfo, and unparseable rows (dest key
absent, event_time NULL).

Known deliberate deviations NOT in the corpus (documented in
gotime_layout.py): lowercase ``pm`` (JDK formats/parses uppercase only),
``MST`` zone-abbreviation parse, zero-trimmed format-side ``.999``.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta, timezone
from zoneinfo import ZoneInfo

from pyspark.sql import functions as F
from pyspark.sql import types as T

from loongcollector_spark.operators.enrich import gotime

SEED = 20260819
_EPOCH = datetime(1970, 1, 1, tzinfo=timezone.utc)


def _micros(inst: datetime) -> int:
    """Exact epoch-micros (float .timestamp() rounds at micro precision)."""
    return (inst - _EPOCH) // timedelta(microseconds=1)

_MONTH_FULL = ["January", "February", "March", "April", "May", "June", "July",
               "August", "September", "October", "November", "December"]
_MONTH_ABBR = [m[:3] for m in _MONTH_FULL]
_WD_FULL = ["Monday", "Tuesday", "Wednesday", "Thursday", "Friday", "Saturday",
            "Sunday"]
_WD_ABBR = [w[:3] for w in _WD_FULL]


def _go_format(tokens: list[str], local: datetime, off_min: int | None) -> str:
    """Emulate Go time.Format for the token subset used here. ``local`` is
    the naive wall time at the rendered zone; ``off_min`` the zone offset."""
    out = []
    h12 = local.hour % 12 or 12
    for t in tokens:
        if t == "2006":
            out.append(f"{local.year:04d}")
        elif t == "06":
            out.append(f"{local.year % 100:02d}")
        elif t == "January":
            out.append(_MONTH_FULL[local.month - 1])
        elif t == "Jan":
            out.append(_MONTH_ABBR[local.month - 1])
        elif t == "01":
            out.append(f"{local.month:02d}")
        elif t == "1":
            out.append(str(local.month))
        elif t == "Monday":
            out.append(_WD_FULL[local.weekday()])
        elif t == "Mon":
            out.append(_WD_ABBR[local.weekday()])
        elif t == "02":
            out.append(f"{local.day:02d}")
        elif t == "2":
            out.append(str(local.day))
        elif t == "_2":
            out.append(f"{local.day:2d}")  # space-padded
        elif t == "15":
            out.append(f"{local.hour:02d}")
        elif t == "03":
            out.append(f"{h12:02d}")
        elif t == "3":
            out.append(str(h12))
        elif t == "04":
            out.append(f"{local.minute:02d}")
        elif t == "4":
            out.append(str(local.minute))
        elif t == "05":
            out.append(f"{local.second:02d}")
        elif t == "5":
            out.append(str(local.second))
        elif t == "PM":
            out.append("PM" if local.hour >= 12 else "AM")
        elif t.startswith(".0"):
            n = len(t) - 1
            out.append("." + f"{local.microsecond:06d}"[:n])
        elif t.startswith(".9"):
            n = len(t) - 1
            frac = f"{local.microsecond:06d}"[:n].rstrip("0")
            out.append("." + frac if frac else "")
        elif t in ("-0700", "-07:00", "Z07:00"):
            assert off_min is not None
            if t == "Z07:00" and off_min == 0:
                out.append("Z")
            else:
                sign = "-" if off_min < 0 else "+"
                a = abs(off_min)
                sep = "" if t == "-0700" else ":"
                out.append(f"{sign}{a // 60:02d}{sep}{a % 60:02d}")
        else:
            out.append(t)  # literal
    return "".join(out)


_DATE_ORDERS = [
    ["2006", "-", "01", "-", "02"],
    ["2006", "-", "1", "-", "2"],
    ["01", "/", "02", "/", "2006"],
    ["02", " ", "Jan", " ", "2006"],
    ["2", " ", "January", " ", "2006"],
    ["06", "/", "01", "/", "02"],  # two-digit year, 20xx window only
]
_TIME_ORDERS = [
    (["15", ":", "04", ":", "05"], False),
    (["3", ":", "04", ":", "05", " ", "PM"], True),
    (["03", ":", "4", ":", "5", " ", "PM"], True),
]
_FRACTIONS = [None, ".000", ".000000", ".999", ".999999"]
_OFFSETS = [None, ("-0700",), ("-07:00",), ("Z07:00",)]
_OFF_MIN = [0, 330, -420]


def _rand_layout(rng: random.Random):
    tokens: list[str] = []
    if rng.random() < 0.3:
        tokens += [rng.choice(["Monday", "Mon"]), ", "]
    tokens += rng.choice(_DATE_ORDERS)
    tokens += [rng.choice([" ", "T"])]
    tt, _ = rng.choice(_TIME_ORDERS)
    tokens += tt
    frac = rng.choice(_FRACTIONS)
    if frac:
        tokens += [frac]
    off = rng.choice(_OFFSETS)
    if off:
        tokens += [" ", off[0]]
    return tokens, frac, off is not None


def _rand_instant(rng: random.Random, frac: str | None, yy: bool) -> datetime:
    year = rng.randint(2020, 2049) if yy else rng.randint(1995, 2068)
    month = rng.randint(1, 12)
    day = rng.randint(1, 28)
    h, m, s = rng.randint(0, 23), rng.randint(0, 59), rng.randint(0, 59)
    if frac is None:
        micro = 0
    else:
        n = len(frac) - 1
        if frac.startswith(".9"):
            # elided: empty or full-width (last digit nonzero) — JDK optional
            # sections cannot parse partially-trimmed widths
            micro = 0 if rng.random() < 0.3 else \
                (rng.randint(0, 10 ** (n - 1) - 1) * 10 + rng.randint(1, 9)) * 10 ** (6 - n)
        else:
            micro = rng.randint(0, 10 ** n - 1) * 10 ** (6 - n)
    return datetime(year, month, day, h, m, s, micro, tzinfo=timezone.utc)


# dest layouts restricted to tokens where JDK format == Go format
_DEST_LAYOUTS = [
    ["2006", "-", "01", "-", "02", " ", "15", ":", "04", ":", "05"],
    ["Mon", ", ", "2", " ", "January", " ", "2006", " ", "3", ":", "04", ":", "05", " ", "PM"],
    ["06", "/", "1", "/", "2", "T", "15", ":", "04", ":", "05", ".000", " ", "Z07:00"],
    ["2006", "01", "02", "15", "04", "05", ".000000", "-07:00"],
]


def test_gotime_differential(spark):
    rng = random.Random(SEED)
    cases = []
    for cid in range(160):
        tokens, frac, has_off = _rand_layout(rng)
        yy = "06" in tokens
        inst = _rand_instant(rng, frac, yy)
        off = rng.choice(_OFF_MIN) if has_off else 0
        local = (inst + timedelta(minutes=off)).replace(tzinfo=None)
        rendered = _go_format(tokens, local, off if has_off else None)
        dest_tokens = _DEST_LAYOUTS[cid % len(_DEST_LAYOUTS)]
        cases.append((cid, tokens, dest_tokens, inst, rendered))

    # group cases by (src_layout, dest_layout) so each config is ONE job
    by_cfg: dict[tuple[str, str], list] = {}
    for cid, tokens, dest_tokens, inst, rendered in cases:
        by_cfg.setdefault(("".join(tokens), "".join(dest_tokens)), []).append(
            (cid, inst, rendered)
        )

    for (src_layout, dest_layout), rows in by_cfg.items():
        data = [(cid, {"t": rendered}) for cid, _, rendered in rows]
        # a garbage row rides along in every config
        data.append((-1, {"t": "not a time"}))
        df = spark.createDataFrame(
            data,
            T.StructType([
                T.StructField("id", T.LongType()),
                T.StructField("fields", T.MapType(T.StringType(), T.StringType())),
            ]),
        )
        out = gotime(df, "t", src_layout, "out", dest_layout, go_layout=True)
        got = {
            r["id"]: (r["micros"], r["fields"].get("out"))
            for r in out.select(
                "id", F.unix_micros(F.col("event_time")).alias("micros"), "fields"
            ).collect()
        }
        for cid, inst, rendered in rows:
            exp_micros = _micros(inst)
            exp_out = _go_format(
                _DEST_LAYOUTS[cid % len(_DEST_LAYOUTS)], inst.replace(tzinfo=None), 0
            )
            assert got[cid] == (exp_micros, exp_out), (
                src_layout, dest_layout, rendered, got[cid], (exp_micros, exp_out)
            )
        assert got[-1] == (None, None), (src_layout, "garbage row must null out")


def test_gotime_pad_collapse(spark):
    """Go's _2 space-pads single-digit days; the parse side collapses the
    run before JDK 'd' sees it."""
    src = ["Jan", " ", "_2", " ", "2006", " ", "15", ":", "04", ":", "05"]
    inst = datetime(2026, 1, 3, 7, 8, 9, tzinfo=timezone.utc)
    rendered = _go_format(src, inst.replace(tzinfo=None), None)
    assert "  3" in rendered  # the pad is really there
    df = spark.createDataFrame(
        [(0, {"t": rendered})],
        T.StructType([
            T.StructField("id", T.LongType()),
            T.StructField("fields", T.MapType(T.StringType(), T.StringType())),
        ]),
    )
    out = gotime(df, "t", "".join(src), "out", "2006-01-02 15:04:05", go_layout=True)
    row = out.select(F.unix_micros("event_time").alias("m"), "fields").collect()[0]
    assert row["m"] == _micros(inst)
    assert row["fields"]["out"] == "2026-01-03 07:08:09"


def test_gotime_fixed_zones(spark):
    """source_tz interprets a zone-less wall time; dest_tz re-renders it —
    checked against zoneinfo for a winter and a summer instant (DST edge
    excluded by construction)."""
    ny, sh = ZoneInfo("America/New_York"), ZoneInfo("Asia/Shanghai")
    for wall in (datetime(2026, 1, 15, 23, 30, 0), datetime(2026, 7, 15, 12, 0, 1)):
        inst = wall.replace(tzinfo=ny)
        exp_dest = inst.astimezone(sh).strftime("%Y-%m-%d %H:%M:%S")
        df = spark.createDataFrame(
            [(0, {"t": wall.strftime("%Y-%m-%d %H:%M:%S")})],
            T.StructType([
                T.StructField("id", T.LongType()),
                T.StructField("fields", T.MapType(T.StringType(), T.StringType())),
            ]),
        )
        out = gotime(
            df, "t", "2006-01-02 15:04:05", "out", "2006-01-02 15:04:05",
            source_tz="America/New_York", dest_tz="Asia/Shanghai", go_layout=True,
        )
        row = out.select(F.unix_micros("event_time").alias("m"), "fields").collect()[0]
        assert row["m"] == _micros(inst)
        assert row["fields"]["out"] == exp_dest


def test_gotime_corpus_kills_mutants():
    """The random corpus must expose classic Go-layout emulator mistakes."""
    rng = random.Random(SEED)
    cases = []
    for _ in range(160):
        tokens, frac, has_off = _rand_layout(rng)
        yy = "06" in tokens
        inst = _rand_instant(rng, frac, yy)
        off = rng.choice(_OFF_MIN) if has_off else 0
        local = (inst + timedelta(minutes=off)).replace(tzinfo=None)
        cases.append((tokens, local, off if has_off else None))

    def hour12_no_noon_fix(tokens, local, off):  # 12:xx PM rendered as 00:xx
        h12 = local.hour % 12
        out = _go_format(tokens, local, off)
        true = _go_format(tokens, local, off)
        if local.hour % 12 == 0 and any(t in ("03", "3") for t in tokens):
            out = true.replace("12:", f"{h12:02d}:" if "03" in tokens else "0:", 1)
        return out

    def offset_sign_flip(tokens, local, off):
        if off not in (None, 0):
            return _go_format(tokens, local, -off)
        return _go_format(tokens, local, off)

    def frac_never_trimmed(tokens, local, off):
        fixed = [t.replace(".9", ".0").replace("9", "0") if t.startswith(".9") else t
                 for t in tokens]
        return _go_format(fixed, local, off)

    for mutant in (hour12_no_noon_fix, offset_sign_flip, frac_never_trimmed):
        assert any(
            mutant(tk, lc, of) != _go_format(tk, lc, of) for tk, lc, of in cases
        ), f"corpus never exercises: {mutant.__name__}"
