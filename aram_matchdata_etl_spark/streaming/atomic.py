"""Atomic versioned parquet table: write-new-version + pointer swap.

Replaces the read-merge-OVERWRITE pattern (the reference's
replace_one(upsert=True) emulation, db/mongodb.py:52-56) whose failure
modes are real: overwriting the directory a live plan still reads from
relies on cache pinning (eviction mid-write recomputes from deleted
files), and a crash mid-overwrite loses previously-merged history that
checkpoint replay cannot restore (replay re-adds only the current batch).

Here every commit writes a FRESH ``v-<uuid>`` subdirectory, then
atomically replaces the ``_CURRENT`` pointer file (``os.replace`` is
atomic on POSIX). Readers resolve the pointer first, so at every instant
there is one complete, immutable current version:

* crash before the pointer swap → pointer still names the old version,
  old data fully intact; the half-written new dir is pruned next commit;
* crash after the swap → new version is complete (parquet written and
  closed before the swap).

Stale versions are pruned only AFTER the swap, so the merge plan (which
reads the previous version) never has its input deleted underneath it —
no cache()+count() pinning needed.

On a lakehouse table (Delta/Iceberg) this entire module is replaced by a
transactional ``MERGE INTO`` / snapshot commit; the pointer file is a
poor man's transaction log with a single-writer assumption, which holds
here because foreachBatch invocations of one streaming query are serial.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

POINTER = "_CURRENT"
LOG = "_LOG"  # append-only commit order (one version name per line)


def current_version_path(base_dir: str) -> str | None:
    """Resolve the pointer to the current version directory, or None if
    the table does not exist yet (or the pointer names a missing dir)."""
    try:
        with open(os.path.join(base_dir, POINTER)) as fh:
            version = fh.read().strip()
    except FileNotFoundError:
        return None
    path = os.path.join(base_dir, version)
    return path if os.path.isdir(path) else None


def read_current(spark: SparkSession, base_dir: str) -> DataFrame | None:
    """Read the current version of the table, or None before first commit."""
    path = current_version_path(base_dir)
    return None if path is None else spark.read.parquet(path)


def list_versions(base_dir: str) -> list[str]:
    """Commit-ordered version names that still exist on disk (oldest
    first). The append-only log records every commit; retention may have
    pruned older directories."""
    try:
        with open(os.path.join(base_dir, LOG)) as fh:
            logged = [line.strip() for line in fh if line.strip()]
    except FileNotFoundError:
        return []
    return [v for v in logged if os.path.isdir(os.path.join(base_dir, v))]


def read_version(spark: SparkSession, base_dir: str, n_back: int = 0) -> DataFrame | None:
    """Time travel: the current snapshot (n_back=0) or an earlier retained
    one (n_back=1 is the previous commit). None if not retained — retention
    is bounded by commit_version's keep_versions."""
    versions = list_versions(base_dir)
    if n_back >= len(versions):
        return None
    return spark.read.parquet(os.path.join(base_dir, versions[-1 - n_back]))


def commit_version(df: DataFrame, base_dir: str, keep_versions: int = 1) -> str:
    """Write ``df`` as a new immutable version and atomically swap the
    pointer to it. Returns the new version path. ``df`` may freely read
    from the previous version — it is pruned only after the swap.

    ``keep_versions`` retains that many committed snapshots (newest
    included) for time travel / incremental-consumer catch-up — the poor
    man's form of a lakehouse table's snapshot retention; 1 keeps only
    the current version (the streaming sinks' default)."""
    os.makedirs(base_dir, exist_ok=True)
    version = f"v-{uuid.uuid4().hex[:12]}"
    path = os.path.join(base_dir, version)
    df.write.mode("overwrite").parquet(path)

    log_path = os.path.join(base_dir, LOG)
    with open(log_path, "a") as fh:
        fh.write(version + "\n")
        fh.flush()
        os.fsync(fh.fileno())

    tmp = os.path.join(base_dir, f".{POINTER}.tmp")
    with open(tmp, "w") as fh:
        fh.write(version)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, os.path.join(base_dir, POINTER))

    keep = set(list_versions(base_dir)[-max(keep_versions, 1):]) | {version}
    for name in os.listdir(base_dir):
        stale = os.path.join(base_dir, name)
        if name.startswith("v-") and name not in keep and os.path.isdir(stale):
            shutil.rmtree(stale, ignore_errors=True)
    return path
