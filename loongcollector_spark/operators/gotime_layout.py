"""Go reference-time layout → Spark datetime pattern translation.

The reference's processor_gotime takes *Go* layouts — strings written against
the reference instant ``Mon Jan 2 15:04:05 MST 2006``
(plugins/processor/gotime/processor_gotime.go:34-52 documents the accepted
SourceFormat/DestFormat values). Round 2 shipped :func:`enrich.gotime` with
raw Spark/JDK patterns and a documented deviation ("the config compiler maps
them"); this module IS that mapping, so a reference config's layout strings
work verbatim (``gotime(..., go_layout=True)``).

Translation table (Go token → Spark pattern, both public specs):

======== ========= =============================================
Go        Spark     note
======== ========= =============================================
2006      yyyy      4-digit year
06        yy
January   MMMM      full month name
Jan       MMM
01        MM        zero-padded month
1         M
Monday    EEEE      weekday
Mon       EEE
02        dd        zero-padded day
2         d
_2        d         Go space-pads; parse side collapses the pad
002       DDD       day-of-year
__2       D
15        HH        24h
03        hh        12h zero-padded
3         h
04        mm        minute
4         m
05        ss        second
5         s
PM / pm   a         JDK formats uppercase AM/PM (Go ``pm`` is lower)
MST       zzz       zone abbreviation
-07[:00…] x/xx/…    numeric offset (-0700 → xx, -07:00 → xxx, …)
Z07[:00…] X/XX/…    offset or literal Z for UTC
.000/.999 .SSS/[.SSS] fixed / elided fraction (elided = optional
                    section on parse; JDK cannot trim zeros on format)
======== ========= =============================================

Any other run of ASCII letters is literal text and gets single-quoted for
JDK (``'T'``); embedded quotes escape as ``''``.
"""

from __future__ import annotations

import re

__all__ = [
    "go_layout_to_spark",
    "go_layout_needs_pad_collapse",
    "go_layout_has_weekday",
    "WEEKDAY_STRIP_REGEX",
]

# Spark ≥3 rejects 'E' in PARSE patterns ("can only be used for datetime
# formatting") — the weekday carries no instant information, so the parse
# side drops the token from the pattern and strips the day name from the
# input text with this regex (full names before abbreviations).
WEEKDAY_STRIP_REGEX = (
    "(?:Monday|Tuesday|Wednesday|Thursday|Friday|Saturday|Sunday"
    "|Mon|Tue|Wed|Thu|Fri|Sat|Sun)"
)

# Longest-first at each scan position; ties cannot collide.
_GO_TOKENS: list[tuple[str, str]] = sorted(
    [
        ("2006", "yyyy"),
        ("06", "yy"),
        ("January", "MMMM"),
        ("Jan", "MMM"),
        ("01", "MM"),
        ("1", "M"),
        ("Monday", "EEEE"),
        ("Mon", "EEE"),
        ("002", "DDD"),
        ("__2", "D"),
        ("_2", "d"),
        ("02", "dd"),
        ("2", "d"),
        ("15", "HH"),
        ("03", "hh"),
        ("3", "h"),
        ("04", "mm"),
        ("4", "m"),
        ("05", "ss"),
        ("5", "s"),
        ("PM", "a"),
        ("pm", "a"),
        ("MST", "zzz"),
        ("Z07:00:00", "XXXXX"),
        ("Z070000", "XXXX"),
        ("Z07:00", "XXX"),
        ("Z0700", "XX"),
        ("Z07", "X"),
        ("-07:00:00", "xxxxx"),
        ("-070000", "xxxx"),
        ("-07:00", "xxx"),
        ("-0700", "xx"),
        ("-07", "x"),
    ],
    key=lambda t: -len(t[0]),
)

_FRACTION = re.compile(r"^([.,])(0+|9+)")


def go_layout_has_weekday(layout: str) -> bool:
    return "Monday" in layout or "Mon" in layout


def go_layout_to_spark(layout: str, for_parse: bool = False) -> str:
    """Translate a Go reference-time layout into a Spark datetime pattern.

    ``for_parse=True`` emits the parse-side variant: weekday tokens are
    dropped (Spark bans 'E' when parsing; strip the matching day-name text
    from the input with :data:`WEEKDAY_STRIP_REGEX`)."""
    out: list[str] = []
    lit: list[str] = []  # pending literal letters, to be quoted as one run

    def flush_lit() -> None:
        if lit:
            out.append("'" + "".join(lit).replace("'", "''") + "'")
            lit.clear()

    i = 0
    n = len(layout)
    while i < n:
        m = _FRACTION.match(layout[i:])
        if m:
            flush_lit()
            sep, digits = m.group(1), m.group(2)
            frac = sep + "S" * len(digits)
            # Go ".9…" elides when zero: optional section for the parse side
            out.append(f"[{frac}]" if digits[0] == "9" else frac)
            i += len(m.group(0))
            continue
        for go, spark in _GO_TOKENS:
            if layout.startswith(go, i):
                flush_lit()
                if for_parse and spark in ("EEE", "EEEE"):
                    pass  # weekday dropped on the parse side (see docstring)
                else:
                    out.append(spark)
                i += len(go)
                break
        else:
            ch = layout[i]
            if ch.isalpha() or ch == "'":
                lit.append(ch)
            else:
                flush_lit()
                out.append(ch)
            i += 1
    flush_lit()
    return "".join(out)


def go_layout_needs_pad_collapse(layout: str) -> bool:
    """True when the layout carries a Go space-padded field (``_2``/``__2``)
    whose input may hold runs of spaces a JDK single-``d`` parse rejects."""
    return "_2" in layout
