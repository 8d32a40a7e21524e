"""SPL-subset compiler — processor_spl
(core/plugin/processor/ProcessorSPL.cpp:69-134; verb reference
docs/cn/plugins/processor/spl/processor-spl-native.md:42-48).

The reference ships SPL as a closed-source columnar engine; its pipe verbs map
1:1 onto DataFrame operations, so here the SPL text is COMPILED (once, in the
driver) into a DataFrame plan and Catalyst is the optimizer/executor:

    verb          → DataFrame op
    where         → filter(expr)
    extend        → withColumn
    project       → select (with aliases / exprs)
    project-away  → drop
    project-rename→ withColumnRenamed
    parse-regexp  → regexp_extract per capture key (search semantics)
    parse-json    → get_json_object per requested key
    parse-csv     → split + element_at
    stats         → groupBy().agg()
    sort          → orderBy
    limit         → limit

Deviations from full SPL (documented): expressions are Spark-SQL syntax (the
overlap with SPL's scalar expressions covers =, !=, <, >, and/or/not, LIKE,
arithmetic); ``parse-json`` requires an explicit ``as k1, k2`` key list
(column sets must be static in a compiled plan).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class SPLError(ValueError):
    pass


def _split_pipes(script: str) -> list[str]:
    """Split on top-level '|' respecting single-quoted strings."""
    parts, buf, in_q = [], [], False
    i = 0
    while i < len(script):
        c = script[i]
        if c == "'":
            if in_q and script.startswith("''", i):  # escaped quote
                buf.append("''")
                i += 2
                continue
            in_q = not in_q
            buf.append(c)
        elif c == "|" and not in_q:
            parts.append("".join(buf).strip())
            buf = []
        else:
            buf.append(c)
        i += 1
    parts.append("".join(buf).strip())
    return [p for p in parts if p]


def _split_commas(s: str) -> list[str]:
    """Split on top-level commas (respecting quotes and parens)."""
    out, buf, in_q, depth = [], [], False, 0
    for c in s:
        if c == "'":
            in_q = not in_q
            buf.append(c)
        elif not in_q and c == "(":
            depth += 1
            buf.append(c)
        elif not in_q and c == ")":
            depth -= 1
            buf.append(c)
        elif not in_q and depth == 0 and c == ",":
            out.append("".join(buf).strip())
            buf = []
        else:
            buf.append(c)
    if buf:
        out.append("".join(buf).strip())
    return out


def _unquote(s: str) -> str:
    s = s.strip()
    if s.startswith("'") and s.endswith("'"):
        return s[1:-1].replace("''", "'")
    return s


def _split_keyword(s: str, kw: str) -> list[str]:
    """Split ONCE on the first top-level ``kw`` keyword (case-insensitive,
    whitespace-delimited), respecting single-quoted strings and parens — a
    quoted pattern containing ``' as '`` (e.g. a regex) must not be split.
    Returns ``[s]`` when the keyword is absent at top level."""
    kw_re = re.compile(rf"\s+{re.escape(kw)}\s+", re.IGNORECASE)
    in_q, depth, i, n = False, 0, 0, len(s)
    while i < n:
        c = s[i]
        if c == "'":
            if in_q and s.startswith("''", i):  # escaped quote
                i += 2
                continue
            in_q = not in_q
        elif not in_q:
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            elif depth == 0 and c.isspace():
                m = kw_re.match(s, i)
                if m:
                    return [s[:i], s[m.end():]]
        i += 1
    return [s]


def compile_spl(df: DataFrame, script: str) -> DataFrame:
    """Compile an SPL pipe script against a DataFrame. The leading ``*`` (the
    'from current stream' marker) is required, mirroring the reference's
    query shape ``* | verb | verb …``."""
    stages = _split_pipes(script)
    if not stages or stages[0].strip() != "*":
        raise SPLError("SPL script must start with '*'")
    out = df
    for stage in stages[1:]:
        m = re.match(r"([a-z-]+)\s*(.*)", stage, re.DOTALL | re.IGNORECASE)
        if not m:
            raise SPLError(f"bad stage: {stage!r}")
        verb, rest = m.group(1).lower(), m.group(2).strip()
        if verb == "where":
            out = out.filter(F.expr(rest))
        elif verb == "extend":
            for item in _split_commas(rest):
                name, _, expr = item.partition("=")
                out = out.withColumn(name.strip(), F.expr(expr.strip()))
        elif verb == "project":
            cols: list[Column] = []
            for item in _split_commas(rest):
                if "=" in item and not re.search(r"[<>!=]=|[<>]", item.split("=")[0]):
                    name, _, expr = item.partition("=")
                    cols.append(F.expr(expr.strip()).alias(name.strip()))
                else:
                    cols.append(F.col(item.strip()))
            out = out.select(*cols)
        elif verb == "project-away":
            out = out.drop(*[c.strip() for c in _split_commas(rest)])
        elif verb == "project-rename":
            for item in _split_commas(rest):
                new, _, old = item.partition("=")
                out = out.withColumnRenamed(old.strip(), new.strip())
        elif verb == "parse-regexp":
            parts = _split_keyword(rest, "as")
            if len(parts) != 2:
                raise SPLError(f"parse-regexp needs 'as k1, k2': {stage!r}")
            src_rx, keys_s = parts
            items = _split_commas(src_rx)
            if len(items) != 2:
                raise SPLError(f"parse-regexp needs 'field, ''regex''': {stage!r}")
            field, rx = items[0].strip(), _unquote(items[1])
            keys = [k.strip() for k in _split_commas(keys_s)]
            for i, k in enumerate(keys):
                out = out.withColumn(k, F.regexp_extract(F.col(field), rx, i + 1))
        elif verb == "parse-json":
            parts = _split_keyword(rest, "as")
            if len(parts) != 2:
                raise SPLError(f"parse-json needs 'as k1, k2' (static schema): {stage!r}")
            field = parts[0].strip()
            for k in [k.strip() for k in _split_commas(parts[1])]:
                out = out.withColumn(k, F.get_json_object(F.col(field), f"$.{k}"))
        elif verb == "parse-csv":
            parts = _split_keyword(rest, "as")
            if len(parts) != 2:
                raise SPLError(f"parse-csv needs 'as k1, k2': {stage!r}")
            field = parts[0].strip()
            keys = [k.strip() for k in _split_commas(parts[1])]
            arr = F.split(F.col(field), ",", -1)
            for i, k in enumerate(keys):
                out = out.withColumn(k, F.trim(F.try_element_at(arr, F.lit(i + 1))))
        elif verb == "parse-kv":
            # parse-kv field, 'pair_sep', 'kv_sep' as k1, k2  (static key list —
            # a compiled plan needs a fixed schema, like parse-json above)
            parts = _split_keyword(rest, "as")
            if len(parts) != 2:
                raise SPLError(f"parse-kv needs 'as k1, k2': {stage!r}")
            items = _split_commas(parts[0])
            if len(items) != 3:
                raise SPLError(f"parse-kv needs 'field, ''pairsep'', ''kvsep''': {stage!r}")
            field, psep, ksep = items[0].strip(), _unquote(items[1]), _unquote(items[2])
            toks = F.split(F.col(field), re.escape(psep), -1)
            for k in [k.strip() for k in _split_commas(parts[1])]:
                # try_element_at: a line missing the key yields null, not an
                # ANSI INVALID_ARRAY_INDEX error (Spark 4 defaults ANSI on)
                val = F.try_element_at(
                    F.filter(toks, lambda t: F.substring_index(t, ksep, 1) == F.lit(k)), F.lit(1)
                )
                out = out.withColumn(
                    k,
                    F.when(
                        val.isNotNull(),
                        F.substr(
                            val, F.length(F.substring_index(val, ksep, 1)) + F.lit(len(ksep) + 1)
                        ),
                    ),
                )
        elif verb == "pack-fields":
            # pack-fields dest, k1, k2 — pack listed columns into a JSON object
            items = _split_commas(rest)
            if len(items) < 2:
                raise SPLError(f"pack-fields needs 'dest, k1[, k2…]': {stage!r}")
            dest, keys = items[0].strip(), [k.strip() for k in items[1:]]
            out = out.withColumn(dest, F.to_json(F.struct(*[F.col(k).alias(k) for k in keys])))
        elif verb == "stats":
            parts = _split_keyword(rest, "by")
            aggs_s = parts[0]
            by = [k.strip() for k in _split_commas(parts[1])] if len(parts) == 2 else []
            aggs = []
            for item in _split_commas(aggs_s):
                sub = _split_keyword(item, "as")
                expr = sub[0].strip()
                expr = re.sub(r"count\(\s*\)", "count(1)", expr)
                c = F.expr(expr)
                if len(sub) == 2:
                    c = c.alias(sub[1].strip())
                aggs.append(c)
            out = out.groupBy(*[F.col(k) for k in by]).agg(*aggs) if by else out.agg(*aggs)
        elif verb == "sort":
            rest2 = re.sub(r"^by\s+", "", rest, flags=re.IGNORECASE)
            cols = []
            for item in _split_commas(rest2):
                toks = item.split()
                c = F.col(toks[0])
                if len(toks) > 1 and toks[1].lower() == "desc":
                    c = c.desc()
                cols.append(c)
            out = out.orderBy(*cols)
        elif verb == "limit":
            out = out.limit(int(rest))
        else:
            raise SPLError(f"unsupported SPL verb {verb!r}")
    return out
