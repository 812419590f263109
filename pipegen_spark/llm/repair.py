"""Fault-tolerant JSON extraction/repair for LLM pipeline generation.

Ports the reference's field-tested repair ladder
(internal/llm/service.go:423-888) — each step targets a real LLM failure
mode observed in the wild:

1. extract the JSON object from markdown (``` fences, ```json blocks,
   or the first balanced {...});
2. convert triple-quoted strings to JSON strings;
3. convert backtick template literals to JSON strings;
4. fix string concatenation ("a" + "b" → "ab");
5. collapse illegal raw newlines inside string values to \\n;
6. strip trailing commas before } / ];
7. last resort: single-quoted keys/strings → double-quoted.

`repair_json` applies steps until `json.loads` succeeds, returning the
parsed object (raises ValueError with the last error if nothing works).
Field coercion (schema/description/optimizations that may arrive as
string, object, or list — service.go:891-1038) lives in `coerce_*`.
"""

from __future__ import annotations

import json
import re


def extract_json_from_markdown(response: str) -> str:
    """Pull the JSON payload out of a prose/markdown response."""
    fence = re.search(r"```(?:json)?\s*\n(.*?)```", response, re.S | re.I)
    if fence:
        return fence.group(1).strip()
    # first balanced top-level object
    start = response.find("{")
    if start == -1:
        return response.strip()
    depth = 0
    in_str = False
    esc = False
    for i in range(start, len(response)):
        ch = response[i]
        if esc:
            esc = False
            continue
        if ch == "\\":
            esc = True
            continue
        if ch == '"':
            in_str = not in_str
            continue
        if in_str:
            continue
        if ch == "{":
            depth += 1
        elif ch == "}":
            depth -= 1
            if depth == 0:
                return response[start : i + 1]
    return response[start:].strip()


def _fix_trailing_commas(s: str) -> str:
    return re.sub(r",\s*([}\]])", r"\1", s)


def _fix_concatenation(s: str) -> str:
    # "abc" + "def"  (possibly with newlines between) → "abcdef"
    pat = re.compile(r'"((?:[^"\\]|\\.)*)"\s*\+\s*"((?:[^"\\]|\\.)*)"', re.S)
    while True:
        new = pat.sub(lambda m: '"' + m.group(1) + m.group(2) + '"', s)
        if new == s:
            return new
        s = new


def _convert_triple_quotes(s: str) -> str:
    pat = re.compile(r'"""(.*?)"""', re.S)
    return pat.sub(lambda m: json.dumps(m.group(1)), s)


def _convert_backticks(s: str) -> str:
    pat = re.compile(r"`([^`]*)`", re.S)
    return pat.sub(lambda m: json.dumps(m.group(1)), s)


def _fix_raw_newlines_in_strings(s: str) -> str:
    """Escape literal newlines that appear inside double-quoted strings."""
    out = []
    in_str = False
    esc = False
    for ch in s:
        if esc:
            out.append(ch)
            esc = False
            continue
        if ch == "\\":
            out.append(ch)
            esc = True
            continue
        if ch == '"':
            in_str = not in_str
            out.append(ch)
            continue
        if in_str and ch == "\n":
            out.append("\\n")
            continue
        if in_str and ch == "\t":
            out.append("\\t")
            continue
        out.append(ch)
    return "".join(out)


def _fix_single_quotes(s: str) -> str:
    """Last resort: 'key': 'value' → "key": "value" (keys + simple values)."""
    s = re.sub(r"'([A-Za-z0-9_ .-]*)'(\s*:)", r'"\1"\2', s)
    s = re.sub(r"(:\s*)'([^']*)'", r'\1"\2"', s)
    return s


_LADDER = [
    lambda s: s,
    _convert_triple_quotes,
    _convert_backticks,
    _fix_concatenation,
    _fix_raw_newlines_in_strings,
    _fix_trailing_commas,
    _fix_single_quotes,
]


def repair_json(response: str):
    """Markdown-extract then apply the repair ladder cumulatively until the
    payload parses. Raises ValueError if unparseable after all repairs."""
    s = extract_json_from_markdown(response)
    last_err: Exception | None = None
    for step in _LADDER:
        s = step(s)
        try:
            return json.loads(s)
        except json.JSONDecodeError as e:
            last_err = e
    raise ValueError(f"could not repair LLM JSON: {last_err}")


# --- flexible field coercion (service.go:891-1038) ---------------------------


def coerce_string_field(value) -> str:
    """Schema/SQL fields may arrive as a string, dict, or list of lines."""
    if value is None:
        return ""
    if isinstance(value, str):
        return value
    if isinstance(value, dict):
        return json.dumps(value, indent=2)
    if isinstance(value, list):
        return "\n".join(coerce_string_field(v) for v in value)
    return str(value)


def coerce_string_list(value) -> list[str]:
    """Optimizations may arrive as a list, newline-joined string, or dict."""
    if value is None:
        return []
    if isinstance(value, list):
        return [coerce_string_field(v) for v in value]
    if isinstance(value, str):
        return [line.strip("-• \t") for line in value.splitlines() if line.strip()]
    if isinstance(value, dict):
        return [f"{k}: {coerce_string_field(v)}" for k, v in value.items()]
    return [str(value)]


def parse_generated_pipeline(response: str) -> dict:
    """Parse a pipeline-generation response into normalized fields:
    input_schema, output_schema, sql_statements (list), sql_files
    (filename → statement, when the model returned the object form the
    prompt asks for), description, optimizations (list)."""
    doc = repair_json(response)
    if not isinstance(doc, dict):
        raise ValueError("LLM response is not a JSON object")
    sql_raw = doc.get("sql_statements") or doc.get("sqlStatements") or []
    sql_files: dict[str, str] = {}
    if isinstance(sql_raw, dict):
        sql_files = {
            str(k): coerce_string_field(v) for k, v in sql_raw.items()
        }
        sql = [sql_files[k] for k in sorted(sql_files)]
    elif isinstance(sql_raw, str):
        sql = [coerce_string_field(sql_raw)]
    else:
        sql = [coerce_string_field(x) for x in sql_raw]
    return {
        "sql_files": sql_files,
        "input_schema": coerce_string_field(
            doc.get("input_schema") or doc.get("inputSchema")
        ),
        "output_schema": coerce_string_field(
            doc.get("output_schema") or doc.get("outputSchema")
        ),
        "sql_statements": sql,
        "description": coerce_string_field(doc.get("description")),
        "optimizations": coerce_string_list(doc.get("optimizations")),
    }
