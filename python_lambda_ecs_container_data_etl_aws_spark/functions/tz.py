"""Wall-clock timezone conversion (F11) — the reference pins its
runtime to America/New_York because its recency windows are wall-clock
based (`2.1 leader-lambda-for-mysql.py:103-107`,
`2.2 loading-lambda-for-mysql.py:596-604`: convert UTC now → EST, then
"modified within the last 30 minutes" against local file times).

The engine stores instants as epoch-µs BIGINTs (tz-free by design);
these helpers are the explicit seam where wall-clock semantics enter:
convert once, extract/compare, never store the converted value.

Determinism note: ``from_utc_timestamp`` reads its input's *rendered*
naive value, which depends on ``spark.sql.session.timeZone`` — the
package pins it to UTC (session.RUNTIME_CONFS), making
``timestamp_micros(ts_us)`` render exactly the UTC wall-clock and the
conversion a pure function of the integer instant.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_TZ = "America/New_York"


def to_wallclock(ts_us: Column | str, tz: str = DEFAULT_TZ) -> Column:
    """Epoch-µs BIGINT → naive TIMESTAMP showing the wall clock in
    ``tz`` (DST-aware, via the JVM tz database)."""
    c = F.col(ts_us) if isinstance(ts_us, str) else ts_us
    return F.from_utc_timestamp(F.timestamp_micros(c), tz)


def wallclock_recency_gate(
    df: DataFrame,
    ts_us_col: str = "ts_us",
    tz: str = DEFAULT_TZ,
    window_minutes: int = 30,
    now_us: int | None = None,
) -> DataFrame:
    """The reference's wall-clock freshness gate: keep rows whose ``tz``
    wall-clock falls within ``window_minutes`` of "now"'s wall-clock in
    the same zone. ``now_us`` defaults to the data's max instant (the
    deterministic stand-in the whole catalog uses for "now").

    Because both sides convert through the same zone, the gate equals
    the instant gate *except* across DST transitions — which is exactly
    the behavior the reference opted into by comparing local times; this
    operator reproduces it faithfully rather than silently fixing it.
    """
    if now_us is None:
        mx = df.agg(F.max(ts_us_col).alias("__now_us"))
        df = df.crossJoin(F.broadcast(mx))
    else:
        df = df.withColumn("__now_us", F.lit(int(now_us)).cast("bigint"))
    row_wc = F.unix_micros(to_wallclock(ts_us_col, tz))
    now_wc = F.unix_micros(to_wallclock("__now_us", tz))
    keep = row_wc >= now_wc - F.lit(window_minutes * 60_000_000)
    return df.filter(keep).drop("__now_us")
