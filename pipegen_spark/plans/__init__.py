"""Pipeline-as-ordered-SQL-files execution model.

The reference's only IR is the raw SQL string (internal/types/sql.go:4-9);
files execute in filename order through Flink's SQL gateway. Here the same
model drives `spark.sql()`: statements.py loads/cleans/classifies, ddl.py
translates connector DDL into Spark readers/writers, executor.py runs the
plan in-process (no HTTP boundary — Catalyst plans, Tungsten executes).
"""
