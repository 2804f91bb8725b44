"""Post-ingest archival — the reference's backup-then-delete move of
processed inputs (`2.1 leader-lambda-for-mysql.py:582-603`,
`3. loading-lambda-for-dynamodb.py:593-614`) and its idempotent dated
folder creation (`2.1:484-525`).

Local-FS/object-store-agnostic: paths are strings; on an object store
the "folders" are prefixes and creation is a no-op (Spark writes create
them). Structured Streaming's ``cleanSource='archive'`` option does the
same thing natively for streaming inputs — this helper is the batch
twin.
"""

from __future__ import annotations

import datetime as dt
import os
import shutil


def dated_backup_dir(backup_root: str, date: dt.date | None = None) -> str:
    """backup/<YYYY-MM-DD>/ — idempotent creation."""
    d = (date or dt.date.today()).isoformat()
    path = os.path.join(backup_root, d)
    os.makedirs(path, exist_ok=True)
    return path


def archive_file(src_path: str, backup_root: str, date: dt.date | None = None) -> str:
    """Move one processed input into the dated backup dir; returns the
    new path. Idempotent: re-archiving an already-moved file is a no-op
    if the destination exists."""
    dest_dir = dated_backup_dir(backup_root, date)
    dest = os.path.join(dest_dir, os.path.basename(src_path))
    if os.path.exists(dest) and not os.path.exists(src_path):
        return dest
    shutil.move(src_path, dest)
    return dest
