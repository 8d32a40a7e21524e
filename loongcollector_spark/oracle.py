"""Slow, trusted pure-Python oracle re-implementing the parse/filter/route
semantics row-by-row (FIXTURES.md §5 — the analog of the reference's JSON golden
comparisons, core/unittest/processor/ProcessorParseRegexNativeUnittest.cpp:96-120).

Used ONLY by tests to produce expected per-sink counts, per-sink sum(n_tok), and
exact routed (doc_id, tokens) sets. Never on the Spark execution path.
"""

from __future__ import annotations

import datetime as _dt
import json
import re


def decode(tokens: list[int]) -> str:
    return bytes(bytearray(t & 0xFF for t in tokens)).decode("utf-8", "replace")


def parse_regex(line: str, regex: str, keys: list[str]) -> dict | None:
    m = re.fullmatch(regex, line)
    if not m:
        return None
    return {k: m.group(i + 1) for i, k in enumerate(keys)}


def _jser(v) -> str:
    if isinstance(v, str):
        return v
    if isinstance(v, bool):
        return "true" if v else "false"
    if v is None:
        return "null"
    if isinstance(v, (dict, list)):
        return json.dumps(v, separators=(",", ":"))
    return json.dumps(v)


def parse_json_line(line: str) -> dict | None:
    try:
        obj = json.loads(line)
    except Exception:
        return None
    if not isinstance(obj, dict):
        return None
    return {k: _jser(v) for k, v in obj.items()}


def parse_delimiter(
    line: str, keys: list[str], sep: str = "|", allow_shortened: bool = False, overflow: str = "extend"
) -> dict | None:
    parts = [p.strip() for p in line.split(sep)]
    n = len(keys)
    if len(parts) < n and not allow_shortened:
        return None
    out = {}
    for i, k in enumerate(keys):
        if i < len(parts):
            out[k] = parts[i]
    if len(parts) > n:
        if overflow == "extend":
            for j, v in enumerate(parts[n:]):
                out[f"__column{n + j}__"] = v
        elif overflow == "keep":
            out[f"__column{n}__"] = sep.join(parts[n:])
    return out


def parse_apsara(line: str) -> tuple[dict, _dt.datetime] | None:
    parts = line.split("\t")
    m = re.fullmatch(r"\[([^\]]*)\]", parts[0])
    if not m or not m.group(1):
        return None
    time_str = m.group(1)
    out: dict[str, str] = {}
    if re.fullmatch(r"\d+", time_str):
        ts = _dt.datetime.fromtimestamp(int(time_str), _dt.timezone.utc)
        out["microtime"] = str(int(time_str) * 1_000_000)
    else:
        fmt = "%Y-%m-%d %H:%M:%S.%f" if "." in time_str else "%Y-%m-%d %H:%M:%S"
        ts = _dt.datetime.strptime(time_str, fmt).replace(tzinfo=_dt.timezone.utc)
        out["microtime"] = str(int(ts.timestamp() * 1_000_000))
    bracketed = []
    kv_parts = []
    for p in parts[1:]:
        bm = re.fullmatch(r"\[([^\]]*)\]", p)
        if bm:
            bracketed.append(bm.group(1))
        else:
            kv_parts.append(p)
    for b in bracketed:
        if re.fullmatch(r"[A-Z]+", b):
            out.setdefault("__LEVEL__", b)
        elif re.fullmatch(r"\d+", b):
            out.setdefault("__THREAD__", b)
        elif "/" in b or ("." in b and ":" in b):
            if "__FILE__" not in out:
                file_part, _, line_part = b.rpartition(":")
                out["__FILE__"] = file_part
                out["__LINE__"] = line_part
    for p in kv_parts:
        if ":" in p:
            k, _, v = p.partition(":")
            out[k] = v  # str_to_map keeps FIRST occurrence? Spark: last wins
    return out, ts


def split_kv(line: str, delim: str = "\t", sep: str = ":") -> dict:
    out: dict[str, str] = {}
    ek = nk = 0
    for tok in line.split(delim):
        if sep not in tok:
            out[f"no_separator_key_{nk}"] = tok
            nk += 1
        elif tok.startswith(sep):
            out[f"empty_key_{ek}"] = tok[len(sep):]
            ek += 1
        else:
            k, _, v = tok.partition(sep)
            out[k] = v
    return out


def route(source: str, rules: list[tuple[str, str]], default: str | None = "sink_default") -> str | None:
    """aggregator_logstore_router: anchored full-match, first hit wins."""
    for regex, sink in rules:
        if re.fullmatch(regex, source):
            return sink
    return default


DEFAULT_RULES = [("nginx", "sink_nginx"), ("apsara", "sink_apsara"), ("json|delimiter", "sink_structured")]

# plans/pipeline.py STATUS_CLASSES twin
STATUS_CLASSES = {"200": "ok", "301": "redirect", "403": "client_error",
                  "404": "client_error", "500": "server_error"}


def enrich_fields(fields: dict) -> dict:
    """default_enrich oracle: dict-map status class + redact last IP octet."""
    out = dict(fields)
    rc = out.get("response_code")
    if rc is not None:
        out["status_class"] = STATUS_CLASSES.get(rc, "other")
    ip = out.get("ip")
    if ip is not None:
        out["ip"] = re.sub(r"\d+$", "x", ip)
    return out


def run_pipeline(rows, nginx_regex: str, nginx_keys: list[str], delim_keys: list[str],
                 enrich: bool = False):
    """Full flagship pipeline oracle → list of routed row dicts."""
    out = []
    for doc_id, tokens, n_tok, source in rows:
        line = decode(tokens)
        fields: dict | None
        ts = None
        if source == "nginx":
            fields = parse_regex(line, nginx_regex, nginx_keys)
        elif source == "json":
            fields = parse_json_line(line)
        elif source == "delimiter":
            fields = parse_delimiter(line, delim_keys, "|", allow_shortened=True)
        elif source == "apsara":
            r = parse_apsara(line)
            fields, ts = (r if r else (None, None))
        elif source == "kv":
            fields = split_kv(line)
        else:
            fields = {}
        ok = fields is not None
        if not ok:
            fields = {"__raw_log__": line}  # keep_source_on_fail default
        if enrich:
            fields = enrich_fields(fields)
        sink = route(source, DEFAULT_RULES)
        out.append(
            {
                "doc_id": doc_id,
                "tokens": list(tokens),
                "n_tok": n_tok,
                "source": source,
                "fields": fields,
                "parse_ok": ok,
                "event_time": ts,
                "route": sink,
            }
        )
    return out
