"""CSV column profiling / type inference with the reference's escalation
semantics (internal/generator/csv_analyzer.go:74-250):

- canonical types: int → long → double → boolean → date → timestamp → string,
  widened monotonically per non-null value (int32 overflow → long, etc.);
- empty cell ⇒ nullable (never affects the type);
- caps: 5000 rows scanned, 5 samples, 100 distinct values per column;
- date layouts: YYYY-MM-DD, DD/MM/YYYY, MM/DD/YYYY; timestamp layouts:
  RFC3339, "YYYY-MM-DD HH:MM:SS[.fff]", "YYYY-MM-DDTHH:MM:SS";
- boolean regex: true|false|0|1|yes|no (case-insensitive) — note "0"/"1"
  parse as int first, exactly like the reference;
- a column with no non-null values finalizes as nullable string.

Spark's own `inferSchema` differs (no bool-as-yes/no, single timestamp
format), hence this custom sampler (SURVEY.md §7.2). The driver-side sampler
is intentionally single-pass/streaming; for huge files use
`profile_dataframe`, the distributed equivalent over a DataFrame sample.
"""

from __future__ import annotations

import csv
import json
import re
from dataclasses import dataclass, field
from datetime import datetime

BOOL_RE = re.compile(r"^(?i:true|false|0|1|yes|no)$")

DATE_LAYOUTS = ("%Y-%m-%d", "%d/%m/%Y", "%m/%d/%Y")
TIMESTAMP_LAYOUTS = (
    "%Y-%m-%dT%H:%M:%S%z",  # RFC3339
    "%Y-%m-%d %H:%M:%S",
    "%Y-%m-%d %H:%M:%S.%f",
    "%Y-%m-%dT%H:%M:%S",
)

INT32_MIN, INT32_MAX = -(2**31), 2**31 - 1
INT64_MIN, INT64_MAX = -(2**63), 2**63 - 1

_INT_RE = re.compile(r"^[+-]?\d+$")


def _parse_int(v: str, bits: int) -> bool:
    if not _INT_RE.match(v):
        return False
    n = int(v)
    if bits == 32:
        return INT32_MIN <= n <= INT32_MAX
    return INT64_MIN <= n <= INT64_MAX


def _parse_float(v: str) -> bool:
    try:
        float(v)
        return True
    except ValueError:
        return False


def _parse_date(v: str) -> bool:
    for layout in DATE_LAYOUTS:
        try:
            datetime.strptime(v, layout)
            return True
        except ValueError:
            continue
    return False


def _parse_timestamp(v: str) -> bool:
    for layout in TIMESTAMP_LAYOUTS:
        try:
            datetime.strptime(v, layout)
            return True
        except ValueError:
            continue
    return False


@dataclass
class ColumnProfile:
    name: str
    type: str = "int"  # escalation starts at int
    nullable: bool = False
    row_count: int = 0
    non_null_count: int = 0
    samples: list[str] = field(default_factory=list)
    distinct_cap: int = 100
    distinct: dict[str, int] = field(default_factory=dict)


@dataclass
class AnalysisResult:
    columns: list[ColumnProfile]
    total_rows: int
    header_present: bool


def _escalate(c: ColumnProfile, v: str) -> None:
    """One value's contribution to the column type (csv_analyzer.go:154-250)."""
    t = c.type
    if t == "int":
        if _parse_int(v, 32):
            return
        if _parse_int(v, 64):
            c.type = "long"
        elif _parse_float(v):
            c.type = "double"
        elif BOOL_RE.match(v):
            c.type = "boolean"
        elif _parse_date(v):
            c.type = "date"
        elif _parse_timestamp(v):
            c.type = "timestamp"
        else:
            c.type = "string"
    elif t == "long":
        if _parse_int(v, 64):
            return
        if _parse_float(v):
            c.type = "double"
        else:
            c.type = "string"
    elif t == "double":
        if _parse_float(v):
            return
        c.type = "string"
    elif t == "boolean":
        if BOOL_RE.match(v):
            return
        if _parse_date(v) or _parse_timestamp(v):
            c.type = "string"
        elif _parse_float(v):
            c.type = "double"
        else:
            c.type = "string"
    elif t == "date":
        if _parse_date(v):
            return
        if _parse_timestamp(v):
            c.type = "timestamp"
        else:
            c.type = "string"
    elif t == "timestamp":
        if not _parse_timestamp(v):
            c.type = "string"
    # string absorbs everything


class CSVAnalyzer:
    def __init__(
        self,
        path: str,
        max_rows: int = 5000,
        max_samples: int = 5,
        delimiter: str = ",",
        has_header: bool = True,
    ):
        self.path = path
        self.max_rows = max_rows
        self.max_samples = max_samples
        self.delimiter = delimiter
        self.has_header = has_header

    def analyze(self) -> AnalysisResult:
        with open(self.path, newline="", encoding="utf-8") as fh:
            reader = csv.reader(fh, delimiter=self.delimiter)
            header: list[str] = []
            cols: list[ColumnProfile] = []
            row_index = 0
            for rec in reader:
                if not cols:
                    if self.has_header:
                        header = [h.strip() for h in rec]
                        cols = [ColumnProfile(name=h) for h in header]
                        continue
                    cols = [
                        ColumnProfile(name=f"col_{i}") for i in range(len(rec))
                    ]
                for i, v in enumerate(rec):
                    if i >= len(cols):
                        continue  # ignore extra cells
                    c = cols[i]
                    c.row_count += 1
                    v = v.strip()
                    if v == "":
                        c.nullable = True
                        continue
                    c.non_null_count += 1
                    if len(c.samples) < self.max_samples:
                        c.samples.append(v)
                    if len(c.distinct) < c.distinct_cap:
                        c.distinct[v] = c.distinct.get(v, 0) + 1
                    _escalate(c, v)
                row_index += 1
                if row_index >= self.max_rows:
                    break
        # finalize: all-null columns → nullable string
        for c in cols:
            if c.non_null_count == 0:
                c.type = "string"
                c.nullable = True
        return AnalysisResult(
            columns=cols,
            total_rows=row_index,
            header_present=self.has_header and bool(header),
        )


# --- exports (csv_analyzer.go:285-357) ---------------------------------------

_AVRO_MAP = {
    "int": "int",
    "long": "long",
    "double": "double",
    "boolean": "boolean",
    # date/timestamp intentionally demoted to string, like the reference
    "date": "string",
    "timestamp": "string",
    "string": "string",
}

_SPARK_MAP = {
    "int": "int",
    "long": "bigint",
    "double": "double",
    "boolean": "boolean",
    "date": "date",
    "timestamp": "timestamp",
    "string": "string",
}


def analysis_to_avro(project_name: str, res: AnalysisResult) -> str:
    fields = []
    for c in res.columns:
        at = _AVRO_MAP.get(c.type, "string")
        fields.append(
            {"name": c.name, "type": ["null", at] if c.nullable else at}
        )
    name = re.sub(r"[^A-Za-z0-9_]", "_", project_name) + "_input"
    return json.dumps(
        {
            "type": "record",
            "name": name,
            "namespace": "pipegen.generated",
            "fields": fields,
        },
        indent=2,
    )


def analysis_to_ddl(res: AnalysisResult) -> str:
    """Spark SQL column list (keeps date/timestamp typed, unlike AVRO)."""
    return ", ".join(f"{c.name} {_SPARK_MAP[c.type]}" for c in res.columns)


def analysis_to_markdown(res: AnalysisResult) -> str:
    lines = [
        "| Column | Type | Nullable | Non-Null | Distinct (<=10) | Samples |",
        "|--------|------|----------|----------|-----------------|---------|",
    ]
    for c in res.columns:
        distinct = ",".join(list(c.distinct)[:10])
        lines.append(
            f"| {c.name} | {c.type} | {str(c.nullable).lower()} "
            f"| {c.non_null_count} | {distinct} | {','.join(c.samples)} |"
        )
    return "\n".join(lines) + "\n"


def analysis_for_prompt(res: AnalysisResult, max_cols: int = 0) -> str:
    if max_cols <= 0 or max_cols > len(res.columns):
        max_cols = len(res.columns)
    lines = [f"Columns (up to {max_cols}):", "name,type,nullable,sample_values"]
    for c in res.columns[:max_cols]:
        samples = "|".join(c.samples[:3]).replace(",", " ").replace("\n", " ")
        lines.append(f"{c.name},{c.type},{str(c.nullable).lower()},{samples}")
    if max_cols < len(res.columns):
        lines.append(
            f"... {len(res.columns) - max_cols} more columns omitted for brevity"
        )
    return "\n".join(lines) + "\n"


# --- distributed variant -----------------------------------------------------


def profile_dataframe(df, sample_rows: int = 5000) -> AnalysisResult:
    """Distributed equivalent: profile a string-typed DataFrame sample with
    the same escalation semantics. The sample (bounded) is collected; at
    100 TB you profile a limit() of the file scan, not the whole table."""
    rows = df.limit(sample_rows).collect()
    cols = [ColumnProfile(name=c) for c in df.columns]
    for rec in rows:
        for i, c in enumerate(cols):
            v = rec[i]
            c.row_count += 1
            v = "" if v is None else str(v).strip()
            if v == "":
                c.nullable = True
                continue
            c.non_null_count += 1
            if len(c.samples) < 5:
                c.samples.append(v)
            if len(c.distinct) < c.distinct_cap:
                c.distinct[v] = c.distinct.get(v, 0) + 1
            _escalate(c, v)
    for c in cols:
        if c.non_null_count == 0:
            c.type = "string"
            c.nullable = True
    return AnalysisResult(columns=cols, total_rows=len(rows), header_present=True)
