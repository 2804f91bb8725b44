"""HTTP collection source — the reference's cron collector
(`1. data-collection-from-data-source.py:19,26-52`): GET a public URL,
save under a dated local folder, hand off to the landing path.

Driver-side by design: ingestion parallelism starts at the landing
directory (Spark's file source), not at the fetch. stdlib urllib only —
no third-party HTTP dependency; ``file://`` URLs make it testable
offline. Errors raise — the caller (cron/orchestrator) owns retry
policy, exactly as the reference's collector does.
"""

from __future__ import annotations

import datetime as dt
import os
import urllib.request


def collect(url: str, landing_root: str, filename: str | None = None,
            date: dt.date | None = None, timeout: float = 30.0) -> str:
    """Download ``url`` into ``<landing_root>/<YYYY-MM-DD>/<filename>``;
    returns the saved path. Filename defaults to the URL basename
    (the reference's rfind('/') slice, `1.:44-47`)."""
    if filename is None:
        filename = url.rstrip("/").rsplit("/", 1)[-1] or "download"
    day = (date or dt.date.today()).isoformat()
    dest_dir = os.path.join(landing_root, day)
    os.makedirs(dest_dir, exist_ok=True)
    dest = os.path.join(dest_dir, filename)
    with urllib.request.urlopen(url, timeout=timeout) as resp, open(dest, "wb") as out:
        out.write(resp.read())
    return dest
