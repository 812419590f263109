"""SQL statement loading, cleaning, validation, classification.

Reference parity:
- loader/cleaner: internal/pipeline/sql.go:27-130 (read sql/*.sql, strip
  `--` comments, lexicographic order = execution order);
- validator: sql.go:133-167 (reject DROP DATABASE/SCHEMA, TRUNCATE,
  DELETE FROM; require CREATE TABLE / INSERT INTO / SELECT);
- classifier: sql.go:181-196 (CREATE_TABLE/INSERT/CREATE_VIEW/QUERY/OTHER);
- variable substitution: internal/pipeline/flink.go:513-527;
- topic extraction: sql.go:208-266 (regex over CREATE TABLE options).
"""

from __future__ import annotations

import glob
import os
import re
from dataclasses import dataclass

TOPIC_RE = re.compile(r"'topic'\s*=\s*'([^']+)'")

DANGEROUS = ("DROP DATABASE", "DROP SCHEMA", "TRUNCATE", "DELETE FROM")


class StatementValidationError(ValueError):
    pass


@dataclass
class SQLStatement:
    name: str
    content: str
    file_path: str
    order: int


def clean_sql(sql: str) -> str:
    """Strip full-line and inline `--` comments, drop blank lines."""
    out = []
    for line in sql.splitlines():
        line = line.strip()
        if not line or line.startswith("--"):
            continue
        idx = line.find("--")
        if idx != -1:
            line = line[:idx].strip()
        if line:
            out.append(line)
    return "\n".join(out)


def load_statements(project_dir: str, subdir: str = "sql") -> list[SQLStatement]:
    """Ordered statement list from <project>/sql/*.sql (one file = one
    statement, lexicographic filename order = execution order)."""
    sql_dir = os.path.join(project_dir, subdir)
    if not os.path.isdir(sql_dir):
        raise FileNotFoundError(f"SQL directory not found: {sql_dir}")
    stmts = []
    for i, path in enumerate(sorted(glob.glob(os.path.join(sql_dir, "*.sql")))):
        with open(path, encoding="utf-8") as fh:
            content = clean_sql(fh.read())
        name = os.path.splitext(os.path.basename(path))[0]
        stmts.append(
            SQLStatement(name=name, content=content, file_path=path, order=i)
        )
    if not stmts:
        raise FileNotFoundError(f"no .sql files found in {sql_dir}")
    return stmts


def validate_statement(stmt: SQLStatement) -> None:
    sql = stmt.content.upper()
    for op in DANGEROUS:
        if op in sql:
            raise StatementValidationError(
                f"potentially dangerous operation detected: {op}"
            )
    if (
        "CREATE TABLE" not in sql
        and "INSERT INTO" not in sql
        and "SELECT" not in sql
    ):
        raise StatementValidationError(
            "statement must contain CREATE TABLE, INSERT INTO, or SELECT"
        )


def classify_statement(content: str) -> str:
    upper = content.upper()
    if "CREATE TABLE" in upper:
        return "CREATE_TABLE"
    if "INSERT INTO" in upper:
        return "INSERT"
    if "CREATE VIEW" in upper or "CREATE TEMPORARY VIEW" in upper:
        return "CREATE_VIEW"
    if "SELECT" in upper and "CREATE" not in upper:
        return "QUERY"
    return "OTHER"


def substitute_variables(sql: str, variables: dict[str, str]) -> str:
    """${VAR} replacement (flink.go:513-527). Unknown vars are left intact
    so a missing binding is visible downstream rather than silently empty."""
    for key, value in variables.items():
        sql = sql.replace("${" + key + "}", value)
    return sql


def extract_topics(statements: list[SQLStatement]) -> list[str]:
    """Topics from CREATE TABLE `'topic' = '<t>'` options, first-seen order,
    deduplicated. Unresolved `${...}` placeholders are NOT topic
    declarations — they reference the runner-GENERATED resource names
    (the scaffolded 01/02 SQL says `'topic' = '${INPUT_TOPIC}'`), so
    they are skipped; reporting them as topics would make the runner
    create literal `${INPUT_TOPIC}` topics on the broker (round-12 wire
    e2e finding)."""
    seen: set[str] = set()
    topics: list[str] = []
    for stmt in statements:
        if "CREATE TABLE" not in stmt.content.upper():
            continue
        for m in TOPIC_RE.finditer(stmt.content):
            t = m.group(1)
            if t.startswith("${"):
                continue
            if t not in seen:
                seen.add(t)
                topics.append(t)
    return topics
