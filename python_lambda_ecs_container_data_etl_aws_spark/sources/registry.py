"""Filename/bucket/extension routing — the reference's table router as data.

Reference semantics (cited for parity, no code copied):
- table identity from filename substring: ``'price' in name or 'index'
  in name`` → the priceindex table (`2.1 leader-lambda-for-mysql.py:528-558`,
  `2.2 loading-lambda-for-mysql.py:663-693`, `3. loading-lambda-for-dynamodb.py:517-569`)
- bucket/extension gate: upload bucket + csv/txt → ETL; backup bucket +
  sql → DB-init branch (`2.1:185,278-287`, `3:150`)
- ``converted_`` prefix guard against self-trigger loops (`3:150,400`)
- unknown names → reject + notify (`2.1:546-552`) — our quarantine route.

One rule table renders to BOTH dialects (a Spark Column and a DuckDB
CASE expression) so the declared query Q03 and the ingest library share
a single definition — the contract can't drift between engines.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

# Route labels (stable contract values — these appear in hashed results).
ROUTE_SKIP_CONVERTED = "skip_converted"
ROUTE_DB_INIT = "db_init"
ROUTE_LOAD_PRICEINDEX = "load_priceindex"
ROUTE_QUARANTINE = "quarantine"
ROUTE_IGNORED = "ignored"


@dataclass(frozen=True)
class TableSpec:
    """Schema-registry entry: filename patterns → canonical table."""

    table: str
    name_substrings: tuple[str, ...]  # any-match, on lowercased filename
    canonical_columns: tuple[str, ...]


# The reference's one concrete schema: the 15-column StatCan CPI extract
# (`2.2 loading-lambda-for-mysql.py:501,538`).
PRICEINDEX = TableSpec(
    table="priceindex",
    name_substrings=("price", "index"),
    canonical_columns=(
        "Date",
        "GEO",
        "DGUID",
        "Products",
        "UOM",
        "UOM_ID",
        "SCALAR_FACTOR",
        "SCALAR_ID",
        "VECTOR",
        "COORDINATE",
        "VALUE",
        "STATUS",
        "SYMBOL",
        "TERMINATED",
        "DECIMALS",
    ),
)

REGISTRY: tuple[TableSpec, ...] = (PRICEINDEX,)

LOADABLE_EXTS = ("csv", "txt")


def route_column(
    filename: Column, bucket: Column, ext: Column
) -> Column:
    """Routing decision as a Spark Column (whole-stage-codegen friendly)."""
    fname_l = F.lower(filename)
    is_loadable = bucket.contains("upload") & ext.isin(*LOADABLE_EXTS)
    known = F.lit(False)
    for spec in REGISTRY:
        hit = F.lit(False)
        for sub in spec.name_substrings:
            hit = hit | fname_l.contains(sub)
        known = known | hit
    return (
        F.when(fname_l.startswith("converted_"), F.lit(ROUTE_SKIP_CONVERTED))
        .when(bucket.contains("backup") & (ext == "sql"), F.lit(ROUTE_DB_INIT))
        .when(is_loadable & known, F.lit(ROUTE_LOAD_PRICEINDEX))
        .when(is_loadable, F.lit(ROUTE_QUARANTINE))
        .otherwise(F.lit(ROUTE_IGNORED))
    )


def route_sql(filename: str = "filename", bucket: str = "bucket", ext: str = "ext") -> str:
    """The same routing decision as ANSI SQL (DuckDB oracle dialect)."""
    subs = " OR ".join(
        f"lower({filename}) LIKE '%{sub}%'"
        for spec in REGISTRY
        for sub in spec.name_substrings
    )
    exts = ", ".join(f"'{e}'" for e in LOADABLE_EXTS)
    loadable = f"({bucket} LIKE '%upload%' AND {ext} IN ({exts}))"
    return f"""CASE
        WHEN lower({filename}) LIKE 'converted\\_%' ESCAPE '\\' THEN '{ROUTE_SKIP_CONVERTED}'
        WHEN {bucket} LIKE '%backup%' AND {ext} = 'sql' THEN '{ROUTE_DB_INIT}'
        WHEN {loadable} AND ({subs}) THEN '{ROUTE_LOAD_PRICEINDEX}'
        WHEN {loadable} THEN '{ROUTE_QUARANTINE}'
        ELSE '{ROUTE_IGNORED}'
    END"""


def lookup_table(filename: str) -> TableSpec | None:
    """Driver-side registry lookup used by the ingest path."""
    low = filename.lower()
    if low.startswith("converted_"):
        return None
    for spec in REGISTRY:
        if any(sub in low for sub in spec.name_substrings):
            return spec
    return None
