"""Connector-DDL translation: the reference dialect's
`CREATE TABLE t (cols...) WITH ('connector'='...', ...)` becomes Spark
reader/writer configuration (string-level translation — no Catalyst rule
needed, SURVEY.md §4).

Also rewrites Flink window syntax into Spark's `window()`:
- TVF form: `FROM TABLE(TUMBLE(TABLE t, DESCRIPTOR(ts), INTERVAL '1' HOUR))`
  (docs-site/ai-generation.md:259-275)
- legacy form: `GROUP BY TUMBLE(ts, INTERVAL '5' MINUTE)` with
  TUMBLE_START/TUMBLE_END projections (docs-site/advanced/performance.md).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

# --- Flink type → Spark type -------------------------------------------------

_TYPE_RULES: list[tuple[re.Pattern, str]] = [
    (re.compile(r"^STRING$", re.I), "string"),
    (re.compile(r"^VARCHAR(\(\d+\))?$", re.I), "string"),
    (re.compile(r"^CHAR(\(\d+\))?$", re.I), "string"),
    (re.compile(r"^INT(EGER)?$", re.I), "int"),
    (re.compile(r"^SMALLINT$", re.I), "smallint"),
    (re.compile(r"^TINYINT$", re.I), "tinyint"),
    (re.compile(r"^BIGINT$", re.I), "bigint"),
    (re.compile(r"^FLOAT$", re.I), "float"),
    (re.compile(r"^DOUBLE( PRECISION)?$", re.I), "double"),
    (re.compile(r"^BOOLEAN$", re.I), "boolean"),
    (re.compile(r"^BYTES$", re.I), "binary"),
    (re.compile(r"^VARBINARY(\(\d+\))?$", re.I), "binary"),
    (re.compile(r"^DATE$", re.I), "date"),
    (re.compile(r"^TIMESTAMP(_LTZ)?(\(\d+\))?$", re.I), "timestamp"),
    (re.compile(r"^TIME(\(\d+\))?$", re.I), "string"),  # no TIME in Spark
]

_DECIMAL_RE = re.compile(r"^DECIMAL\((\d+)\s*,\s*(\d+)\)$", re.I)
_ARRAY_RE = re.compile(r"^ARRAY<(.+)>$", re.I)
_MAP_RE = re.compile(r"^MAP<([^,]+),(.+)>$", re.I)


def flink_type_to_spark(t: str) -> str:
    t = t.strip()
    m = _DECIMAL_RE.match(t)
    if m:
        return f"decimal({m.group(1)},{m.group(2)})"
    m = _ARRAY_RE.match(t)
    if m:
        return f"array<{flink_type_to_spark(m.group(1))}>"
    m = _MAP_RE.match(t)
    if m:
        return (
            f"map<{flink_type_to_spark(m.group(1))},"
            f"{flink_type_to_spark(m.group(2))}>"
        )
    for pat, spark_t in _TYPE_RULES:
        if pat.match(t):
            return spark_t
    return "string"  # unknown → string (superset of the reference's fallback)


# --- DDL parsing -------------------------------------------------------------


@dataclass
class TableSpec:
    name: str
    columns: list[tuple[str, str]]  # (name, spark type)
    options: dict[str, str] = field(default_factory=dict)
    watermark: tuple[str, str] | None = None  # (column, delay SQL expr)
    primary_key: list[str] = field(default_factory=list)

    @property
    def connector(self) -> str:
        return self.options.get("connector", "")

    @property
    def fmt(self) -> str:
        return self.options.get("format", "parquet")

    def schema_ddl(self) -> str:
        return ", ".join(f"{n} {t}" for n, t in self.columns)


_CREATE_RE = re.compile(
    r"CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?([\w.`\"]+)\s*\((.*)\)\s*"
    r"WITH\s*\((.*)\)\s*;?\s*$",
    re.I | re.S,
)
_OPTION_RE = re.compile(r"'([^']+)'\s*=\s*'([^']*)'")
_WATERMARK_RE = re.compile(
    r"^WATERMARK\s+FOR\s+(\w+)\s+AS\s+(.+)$", re.I
)
_PK_RE = re.compile(r"^PRIMARY\s+KEY\s*\(([^)]*)\)", re.I)


def _split_top_level(s: str) -> list[str]:
    """Split on commas outside parentheses/angle brackets/quotes."""
    parts, depth, buf, quote = [], 0, [], False
    for ch in s:
        if ch == "'":
            quote = not quote
        if not quote:
            if ch in "(<":
                depth += 1
            elif ch in ")>":
                depth -= 1
            elif ch == "," and depth == 0:
                parts.append("".join(buf).strip())
                buf = []
                continue
        buf.append(ch)
    tail = "".join(buf).strip()
    if tail:
        parts.append(tail)
    return parts


def parse_create_table(sql: str) -> TableSpec:
    flat = " ".join(line.strip() for line in sql.strip().splitlines())
    m = _CREATE_RE.match(flat)
    if not m:
        raise ValueError(f"not a connector CREATE TABLE statement: {sql[:80]}")
    name = m.group(1).strip("`\"")
    cols_raw, opts_raw = m.group(2), m.group(3)
    columns: list[tuple[str, str]] = []
    watermark = None
    pk: list[str] = []
    for part in _split_top_level(cols_raw):
        wm = _WATERMARK_RE.match(part)
        if wm:
            watermark = (wm.group(1), wm.group(2))
            continue
        pkm = _PK_RE.match(part)
        if pkm:
            pk = [c.strip().strip("`") for c in pkm.group(1).split(",")]
            continue
        tokens = part.split(None, 1)
        if len(tokens) == 2:
            col_name = tokens[0].strip("`\"")
            col_type = tokens[1]
            # strip trailing NOT NULL / comments
            col_type = re.sub(
                r"\s+(NOT\s+NULL|NULL|COMMENT\s+'[^']*')\s*$",
                "",
                col_type,
                flags=re.I,
            )
            if col_type.upper().startswith("AS "):
                continue  # computed column — not materialized at scan
            columns.append((col_name, flink_type_to_spark(col_type)))
    options = dict(_OPTION_RE.findall(opts_raw))
    return TableSpec(
        name=name,
        columns=columns,
        options=options,
        watermark=watermark,
        primary_key=pk,
    )


# --- TUMBLE rewrites ---------------------------------------------------------

_UNIT = {
    "SECOND": "seconds",
    "SECONDS": "seconds",
    "MINUTE": "minutes",
    "MINUTES": "minutes",
    "HOUR": "hours",
    "HOURS": "hours",
    "DAY": "days",
    "DAYS": "days",
}

_TVF_RE = re.compile(
    r"TABLE\s*\(\s*TUMBLE\s*\(\s*TABLE\s+(\w+)\s*,\s*DESCRIPTOR\s*\(\s*(\w+)\s*\)\s*,"
    r"\s*INTERVAL\s+'(\d+)'\s+(\w+)\s*\)\s*\)",
    re.I,
)
_LEGACY_RE = re.compile(
    r"TUMBLE\s*\(\s*(\w+)\s*,\s*INTERVAL\s+'(\d+)'\s+(\w+)\s*\)", re.I
)
_TSTART_RE = re.compile(
    r"TUMBLE_START\s*\(\s*(\w+)\s*,\s*INTERVAL\s+'(\d+)'\s+(\w+)\s*\)", re.I
)
_TEND_RE = re.compile(
    r"TUMBLE_END\s*\(\s*(\w+)\s*,\s*INTERVAL\s+'(\d+)'\s+(\w+)\s*\)", re.I
)


def _dur(n: str, unit: str) -> str:
    return f"{n} {_UNIT[unit.upper()]}"


def rewrite_tumble(sql: str) -> str:
    """Source-to-source rewrite of Flink TUMBLE forms to Spark `window()`.

    TVF form: FROM TABLE(TUMBLE(TABLE t, DESCRIPTOR(ts), INTERVAL 'n' U))
    → FROM t; GROUP BY keys window_start/window_end collapse into the
    window(ts, 'n u') struct; SELECT-list occurrences become
    window.start/window.end aliased back to their Flink names (so ORDER BY
    can keep referencing the output aliases unchanged).
    """
    m = _TVF_RE.search(sql)
    if m:
        tbl, ts, n, unit = m.groups()
        win = f"window({ts}, '{_dur(n, unit)}')"
        sql = _TVF_RE.sub(tbl, sql)
        # GROUP BY: drop window_start/window_end keys, add the window struct
        gm = re.search(
            r"GROUP\s+BY\s+(.*?)(?=HAVING|ORDER\s+BY|LIMIT|$)",
            sql,
            re.I | re.S,
        )
        if gm:
            keys = [k.strip() for k in gm.group(1).split(",") if k.strip()]
            keys = [
                k for k in keys if k.lower() not in ("window_start", "window_end")
            ]
            keys.append(win)
            sql = (
                sql[: gm.start()]
                + "GROUP BY "
                + ", ".join(keys)
                + " "
                + sql[gm.end() :]
            )
        # SELECT list only (everything before the first FROM): alias the
        # struct fields back to the Flink column names
        fm = re.search(r"\bFROM\b", sql, re.I)
        head, tail = sql[: fm.start()], sql[fm.start() :]
        head = re.sub(
            r"(?<![\w.])window_start(?![\w.])",
            "window.start AS window_start",
            head,
            flags=re.I,
        )
        head = re.sub(
            r"(?<![\w.])window_end(?![\w.])",
            "window.end AS window_end",
            head,
            flags=re.I,
        )
        sql = head + tail
    # legacy GROUP BY TUMBLE(ts, INTERVAL 'n' U) + TUMBLE_START/END
    sql = _TSTART_RE.sub("window.start", sql)
    sql = _TEND_RE.sub("window.end", sql)
    sql = _LEGACY_RE.sub(
        lambda m: f"window({m.group(1)}, '{_dur(m.group(2), m.group(3))}')",
        sql,
    )
    return sql
