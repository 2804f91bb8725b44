"""Completion detection (ST6) — "all of today's files loaded ⇒ build
the report" (`2.2 loading-lambda-for-mysql.py:344-360`, the
check_remaining_files logic `2.2:579-661`).

Spark has no native primitive for this; the reference's listing scan is
reborn as a tiny bookkeeping state owned by a foreachBatch hook: the
tracker learns which expected inputs have arrived (from the batch's
input_file_name lineage or an explicit key column) and fires the
completion callback exactly once when the expected set is covered.

State lives in memory for a single run and can be snapshotted to a
parquet/state dir for restarts — at stream scale this is one row per
expected file, not per record.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class CompletionTracker:
    """foreachBatch hook: track arrival of expected logical inputs.

    ``key_expr`` maps batch rows to arrival keys (default: source file
    basename via input_file_name lineage must be captured upstream —
    pass an explicit column for robustness).
    """

    def __init__(
        self,
        expected: set[str],
        on_complete: Callable[[set[str]], None],
        key_col: str = "source_file",
    ) -> None:
        self.expected = set(expected)
        self.arrived: set[str] = set()
        self.fired = False
        self._on_complete = on_complete
        self._key_col = key_col

    def remaining(self) -> set[str]:
        return self.expected - self.arrived

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        keys = [
            r[0]
            for r in batch_df.select(self._key_col).distinct().collect()
            if r[0] is not None
        ]
        self.arrived.update(keys)
        if not self.fired and not self.remaining():
            self.fired = True
            self._on_complete(self.arrived)


def with_source_file(df: DataFrame, col_name: str = "source_file") -> DataFrame:
    """Append the source file basename (the arrival key the reference
    routes on) from scan lineage."""
    return df.withColumn(
        col_name,
        F.element_at(F.split(F.input_file_name(), "/"), -1),
    )
