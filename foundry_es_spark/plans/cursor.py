"""Shared change-feed-cursor helpers for incremental maintainers.

Both `DerivedTablePipeline` (plans/derived.py) and
`IncrementalDedupPipeline` (plans/dedup_maintain.py) consume a source
table's change feed behind a committed cursor; the window-validity rule
they share lives here so a fix lands once.
"""

from __future__ import annotations

from foundry_es_spark.lake import log as commitlog
from foundry_es_spark.lake.log import SnapshotExpired


def window_invalidated(table_dir: str, from_version: int, to_version: int) -> bool:
    """True when the feed window (from_version..to_version] cannot be
    folded incrementally: a commit in it is a rollback marker (the feed
    would contain undone changes) or has been expired out of retention
    (the feed can no longer prove which keys changed). Either way the
    maintainer must recompute from truth — never silently skip history."""
    for v in range(from_version, to_version + 1):
        try:
            if "rolled_back_to" in commitlog.read_commit(table_dir, v):
                return True
        except SnapshotExpired:
            return True
    return False
