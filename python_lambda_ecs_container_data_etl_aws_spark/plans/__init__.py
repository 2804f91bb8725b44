"""The declared query catalog: every entry pairs a Spark DataFrame
builder with a DuckDB oracle-SQL twin (SURVEY.md §2.10)."""

from .core import ORACLE, QUERIES

__all__ = ["QUERIES", "ORACLE"]
