"""Cross-engine comparison harness: thin assert-style wrapper over the
package's own :mod:`python_lambda_ecs_container_data_etl_aws_spark.verify` (the logic moved
in-package in round 5 so the CLI ``verify`` subcommand and the test
suite share one canonicalizer — a drift between them would hide
driver-visible mismatches)."""

from __future__ import annotations

from python_lambda_ecs_container_data_etl_aws_spark.verify import (  # noqa: F401  (re-exports)
    canon_cell,
    canon_rows,
    compare_frames,
    duck_connect,
    result_hash,
)


def compare(spark_df, duck_con, sql: str, name: str = "") -> None:
    r = compare_frames(spark_df, duck_con, sql, name)
    assert r.schema_match, (
        f"{name}: column order mismatch spark={list(spark_df.columns)}"
    )
    assert r.rows_match, (
        f"{name}: row count mismatch spark={r.spark_rows} oracle={r.oracle_rows}"
    )
    assert r.hash_match, f"{name}: value hash mismatch; first diffs {r.diffs}"
