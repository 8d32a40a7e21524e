"""Filter / predicate operators (SURVEY.md §2.3).

* ``filter_expression`` — processor_filter_regex_native ConditionExp mode:
  and/or/not expression tree over {key, exp(regex)} leaves
  (core/plugin/processor/ProcessorFilterNative.cpp:378-489).
* ``filter_include_exclude`` — Go processor_filter_regex: every Include regex
  must match AND no Exclude regex may match
  (plugins/processor/filter/regex/processor_filter_regex.go:33-112).
* ``filter_key_regex`` — keep row iff every Include regex matches some KEY NAME
  and no key name matches Exclude
  (plugins/processor/filter/keyregex/processor_filter_key_regex.go:28-100).
* ``sanitize_non_utf8`` — DiscardingNonUTF8 byte rewrite
  (ProcessorFilterNative.cpp:191-213,297-376).
* ``drop_keys`` / ``pick_keys`` / ``drop_last_key`` — projection operators
  (plugins/processor/{drop,pickkey,droplastkey}).
* ``fields_with_condition`` — switch-case field actions
  (plugins/processor/fieldswithcondition/processor_fields_with_condition.go:43).

All filters compile to a single Catalyst boolean expression — Spark pushes it
into the scan where possible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _field(fields_col: str, key: str, df_cols: list[str] | None = None) -> Column:
    """Resolve key against promoted top-level columns first, else the map."""
    if df_cols is not None and key in df_cols:
        return F.col(key)
    return F.col(fields_col)[key]


def compile_condition(node: dict, fields_col: str = "fields", df_cols: list[str] | None = None) -> Column:
    """Compile a ConditionExp JSON tree into one Catalyst boolean column.

    Tree grammar (ProcessorFilterNative.cpp:378-446)::

        {"operator": "and"|"or"|"not", "operands": [...]}
      | {"key": <field>, "exp": <regex>}   # leaf: regex full-search on value

    A leaf is false when the key is absent (node Match, .cpp:448-489).
    """
    if "operator" in node:
        op = node["operator"].lower()
        kids = [compile_condition(c, fields_col, df_cols) for c in node["operands"]]
        if op == "and":
            out = kids[0]
            for k in kids[1:]:
                out = out & k
            return out
        if op == "or":
            out = kids[0]
            for k in kids[1:]:
                out = out | k
            return out
        if op == "not":
            if len(kids) != 1:
                raise ValueError(
                    f"'not' takes exactly one operand, got {len(kids)} — "
                    "extra operands would be silently discarded"
                )
            return ~kids[0]
        raise ValueError(f"unknown operator {op!r}")
    val = _field(fields_col, node["key"], df_cols)
    return val.isNotNull() & val.rlike(node["exp"])


def filter_expression(df: DataFrame, tree: dict, fields_col: str = "fields") -> DataFrame:
    return df.filter(compile_condition(tree, fields_col, df.columns))


def filter_include_exclude(
    df: DataFrame,
    include: dict[str, str] | None = None,
    exclude: dict[str, str] | None = None,
    fields_col: str = "fields",
) -> DataFrame:
    """Keep rows where all Include key→regex match and no Exclude matches."""
    cond = F.lit(True)
    for k, r in (include or {}).items():
        v = _field(fields_col, k, df.columns)
        cond = cond & v.isNotNull() & v.rlike(r)
    for k, r in (exclude or {}).items():
        v = _field(fields_col, k, df.columns)
        cond = cond & ~(v.isNotNull() & v.rlike(r))
    return df.filter(cond)


def filter_key_regex(
    df: DataFrame,
    include: list[str] | None = None,
    exclude: list[str] | None = None,
    fields_col: str = "fields",
) -> DataFrame:
    """Keep row iff every include regex matches SOME key name, none match
    exclude. Each ``exists`` is coalesced to False: on a NULL fields map the
    bare expression is NULL, and under an exclude-only config ``True & ~NULL``
    is NULL — the filter then DROPPED a row no exclude regex matched."""
    keys = F.map_keys(F.col(fields_col))
    cond = F.lit(True)
    for r in include or []:
        cond = cond & F.coalesce(F.exists(keys, lambda k: k.rlike(r)), F.lit(False))
    for r in exclude or []:
        cond = cond & ~F.coalesce(F.exists(keys, lambda k: k.rlike(r)), F.lit(False))
    return df.filter(cond)


def sanitize_utf8_bytes(b: bytes | None) -> str | None:
    """Pure-Python core of the DiscardingNonUTF8 rewrite
    (ProcessorFilterNative.cpp:297-376): valid UTF-8 sequences pass through
    byte-for-byte, every invalid byte becomes exactly ONE space, so the
    output's UTF-8 byte length always equals the input byte length. Module
    level (not nested in the UDF) so property tests can drive it directly."""
    if b is None:
        return None
    out = bytearray()
    i, n = 0, len(b)
    while i < n:
        c = b[i]
        if c < 0x80:
            out.append(c)
            i += 1
            continue
        # multi-byte lead: 110x->1, 1110x->2, 11110x->3 continuations
        need = 1 if 0xC2 <= c <= 0xDF else 2 if 0xE0 <= c <= 0xEF else 3 if 0xF0 <= c <= 0xF4 else -1
        seq = bytes(b[i : i + need + 1]) if need > 0 else b""
        ok = need > 0 and len(seq) == need + 1
        if ok:
            try:
                seq.decode("utf-8")
            except UnicodeDecodeError:
                ok = False
        if ok:
            out.extend(seq)
            i += need + 1
        else:
            out.append(0x20)  # ONE space per invalid byte (.cpp:297-376)
            i += 1
    return out.decode("utf-8")


def sanitize_non_utf8(df: DataFrame, col: str = "content") -> DataFrame:
    """Rewrite invalid UTF-8 bytes to spaces (ProcessorFilterNative.cpp:297-376).

    On a STRING column Arrow has already collapsed invalid bytes to U+FFFD, so
    only the replacement character can be rewritten (byte counts lost). On a
    BINARY column the reference's one-space-PER-BYTE rewrite is reproduced
    exactly with an Arrow-batched UDF walking the UTF-8 state machine — read
    payloads as binary to keep byte fidelity.
    """
    from pyspark.sql.types import BinaryType

    field = df.schema[col]
    if not isinstance(field.dataType, BinaryType):
        return df.withColumn(col, F.regexp_replace(F.col(col), "�", " "))

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def fix_bytes(s):  # pd.Series -> pd.Series (hints omitted: local import)
        return s.map(sanitize_utf8_bytes)

    return df.withColumn(col, fix_bytes(F.col(col)))


def drop_keys(df: DataFrame, keys: list[str], fields_col: str = "fields") -> DataFrame:
    """processor_drop: remove listed keys from the fields map."""
    key_arr = F.array(*[F.lit(k) for k in keys])
    return df.withColumn(
        fields_col, F.map_filter(F.col(fields_col), lambda k, _: ~F.array_contains(key_arr, k))
    )


def pick_keys(
    df: DataFrame,
    include: list[str] | None = None,
    exclude: list[str] | None = None,
    fields_col: str = "fields",
    drop_empty_rows: bool = True,
) -> DataFrame:
    """processor_pick_key: whitelist then blacklist keys; drop rows left empty
    (processor_pick_key.go:67-96)."""
    m = F.col(fields_col)
    if include:
        inc = F.array(*[F.lit(k) for k in include])
        m = F.map_filter(m, lambda k, _: F.array_contains(inc, k))
    if exclude:
        exc = F.array(*[F.lit(k) for k in exclude])
        m = F.map_filter(m, lambda k, _: ~F.array_contains(exc, k))
    out = df.withColumn(fields_col, m)
    if drop_empty_rows:
        out = out.filter(F.size(F.col(fields_col)) > 0)
    return out


def drop_last_key(df: DataFrame, drop_key: str, include: list[str], fields_col: str = "fields") -> DataFrame:
    """processor_drop_last_key: drop ``drop_key`` (typically raw) once all
    ``include`` keys exist (processor_drop_last_key.go:26)."""
    m = F.col(fields_col)
    have_all = F.lit(True)
    for k in include:
        have_all = have_all & m[k].isNotNull()
    return df.withColumn(
        fields_col,
        F.when(have_all, F.map_filter(m, lambda k, _: k != F.lit(drop_key))).otherwise(m),
    )


def fields_with_condition(
    df: DataFrame,
    cases: list[dict],
    drop_if_not_match: bool = False,
    fields_col: str = "fields",
) -> DataFrame:
    """processor_fields_with_condition: first matching case applies field actions.

    Each case: ``{"condition": {key: value, ...},
    "relation_operator": "equals|regexp|contains|startwith",
    "logical_operator": "and|or",
    "add_fields": {...}, "drop_keys": [...]}``
    (processor_fields_with_condition.go:31-160 — relation applies per field
    condition, logical combines them; defaults equals/and). Compiled to one
    chained when/otherwise over the fields map.
    """
    base = F.col(fields_col)

    def case_cond(c: dict) -> Column:
        rel = c.get("relation_operator", "equals")
        logical = c.get("logical_operator", "and")
        terms = []
        for k, v in c.get("condition", {}).items():
            fld = base[k]
            if rel == "regexp":
                t = fld.rlike(v)
            elif rel == "contains":
                t = fld.contains(v)
            elif rel == "startwith":
                t = fld.startswith(v)
            else:
                t = fld == F.lit(v)
            terms.append(F.coalesce(t, F.lit(False)))
        if not terms:
            return F.lit(True)
        cond = terms[0]
        for t in terms[1:]:
            cond = (cond | t) if logical == "or" else (cond & t)
        return cond

    def case_apply(c: dict) -> Column:
        m = base
        if c.get("drop_keys"):
            darr = F.array(*[F.lit(k) for k in c["drop_keys"]])
            m = F.map_filter(m, lambda k, _: ~F.array_contains(darr, k))
        if c.get("add_fields"):
            from .parse import merge_maps

            add = F.create_map(*[F.lit(x) for kv in c["add_fields"].items() for x in kv])
            m = merge_maps(m, add)
        return m

    # CASE WHEN is first-match-wins by construction — re-ANDing each branch
    # with the negation of all prior conditions re-encoded every earlier
    # predicate into every later branch (O(k²) expression size for zero
    # semantic effect).
    new_map = None
    for c in cases:
        cond = case_cond(c)
        applied = case_apply(c)
        new_map = F.when(cond, applied) if new_map is None else new_map.when(cond, applied)
    new_map = new_map.otherwise(base) if new_map is not None else base
    # Match is decided on the ORIGINAL fields, so the drop filter must run
    # BEFORE the map is rewritten: filtering after withColumn re-resolves
    # `base` against the transformed map, and a row whose only matching term
    # was clobbered by its own case's add_fields (e.g. condition lvl~err.*
    # plus add_fields lvl=case0) would be wrongly dropped (fresh-seed
    # differential, round 5).  Filter-first is also the cheaper plan: only
    # survivors pay for the map rewrite.
    out = df
    if drop_if_not_match:
        keep = F.lit(False)
        for c in cases:
            keep = keep | case_cond(c)
        out = out.filter(keep)
    return out.withColumn(fields_col, new_map)
