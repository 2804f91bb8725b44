"""DB-init script execution — the reference's ECS branch: a `.sql`
file landing in the backup bucket triggers a container that replays the
script against MySQL (`2.1 leader-lambda-for-mysql.py:190-236`). The
Spark-first twin replays the script against the session catalog
(CREATE DATABASE/TABLE/VIEW, INSERT, SET — anything Spark SQL accepts),
closing the `db_init` route that registry.route_column emits.

Scale posture: DDL is driver-side metadata work; any embedded
INSERT ... SELECT runs distributed like any other Spark SQL. Statement
splitting is deliberately simple (';' at line ends, '--' comments
stripped) — matching the reference's mysql-client usage, not a full SQL
lexer.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def split_statements(script: str) -> list[str]:
    """Split a SQL script into executable statements: strip `--`
    comments, join lines, split on trailing ';'."""
    lines = []
    for raw in script.splitlines():
        line = raw.split("--", 1)[0].rstrip()
        if line.strip():
            lines.append(line)
    stmts = []
    for chunk in "\n".join(lines).split(";"):
        if chunk.strip():
            stmts.append(chunk.strip())
    return stmts


def run_init_script(spark: SparkSession, path: str) -> int:
    """Execute every statement in the script; returns how many ran.
    Fails fast on the first bad statement (the reference's ECS task
    aborts the same way)."""
    with open(path, encoding="utf-8") as f:
        script = f.read()
    stmts = split_statements(script)
    for stmt in stmts:
        spark.sql(stmt)
    return len(stmts)
