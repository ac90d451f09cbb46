"""Atomic JSON commit log for the LocalLakeBackend.

One file per table version under ``<table>/_log/v{n:08d}.json``. Commit is
write-tmp → fsync → hard-link to the final name: `os.link` fails if the
version already exists, which is the optimistic-concurrency check (the
local stand-in for an Iceberg catalog's atomic snapshot swap —
SURVEY.md §4.4).
"""

from __future__ import annotations

import json
import os
import uuid


class CommitConflict(Exception):
    """Another writer committed this version first."""


class ConcurrentWriteConflict(Exception):
    """A concurrent commit invalidated this write's read snapshot in a way
    that cannot be rebased onto the new table state: a bucket this
    copy-on-write merge rewrote also changed, a compaction's input files
    were themselves rewritten, or the schema/bucket layout moved. The
    operation must be re-planned from the current state (it read stale
    data, so blindly re-committing would lose the concurrent writes).
    Append-shaped commits never hit this — they rebase automatically."""


class EpochAlreadyFenced(ConcurrentWriteConflict):
    """Another writer fenced this (pipeline_id, epoch_id) while this write
    was in flight — committing would double-apply the epoch. The staged
    files are discarded; the epoch is already durable."""


class SnapshotExpired(ValueError):
    """The requested version's commit record was removed by
    expire_snapshots — time travel / change feeds below the retention
    floor fail loudly instead of silently skipping history."""


def log_dir(table_dir: str) -> str:
    return os.path.join(table_dir, "_log")


def _version_path(table_dir: str, version: int) -> str:
    return os.path.join(log_dir(table_dir), f"v{version:08d}.json")


def _head_path(table_dir: str) -> str:
    return os.path.join(log_dir(table_dir), "HEAD")


def current_version(table_dir: str) -> int | None:
    """Latest committed version — O(1) via the HEAD pointer, not an
    O(versions) directory listing (VERDICT r2 item 7: at 10^4 epochs the
    per-epoch listdir was a growing driver cost). HEAD is written AFTER
    the version link and is therefore never ahead of reality; a crash
    between link and HEAD update leaves it at most a few versions behind,
    which the forward probe repairs. Missing/corrupt HEAD falls back to
    the full listing."""
    d = log_dir(table_dir)
    if not os.path.isdir(d):
        return None
    v: int | None = None
    try:
        with open(_head_path(table_dir)) as fh:
            v = int(fh.read().strip())
        if not os.path.exists(_version_path(table_dir, v)):
            v = None  # corrupt/ahead HEAD: distrust it
    except (OSError, ValueError):
        v = None
    if v is None:
        versions = [
            int(f[1:-5])
            for f in os.listdir(d)
            if f.startswith("v") and f.endswith(".json")
        ]
        return max(versions) if versions else None
    while os.path.exists(_version_path(table_dir, v + 1)):
        v += 1
    return v


def read_commit(table_dir: str, version: int) -> dict:
    try:
        with open(_version_path(table_dir, version)) as fh:
            return json.load(fh)
    except FileNotFoundError:
        cur = current_version(table_dir)
        if cur is not None and version <= cur:
            raise SnapshotExpired(
                f"commit {version} of {table_dir} was expired by "
                f"expire_snapshots; earliest retained is "
                f"{earliest_version(table_dir)}"
            ) from None
        raise


def list_versions(table_dir: str) -> list[int]:
    """All retained commit versions (full listing — maintenance only)."""
    d = log_dir(table_dir)
    if not os.path.isdir(d):
        return []
    return sorted(
        int(f[1:-5])
        for f in os.listdir(d)
        if f.startswith("v") and f.endswith(".json")
    )


def earliest_version(table_dir: str) -> int | None:
    vs = list_versions(table_dir)
    return vs[0] if vs else None


def delete_commit(table_dir: str, version: int) -> None:
    try:
        os.remove(_version_path(table_dir, version))
    except FileNotFoundError:
        pass


def write_commit(table_dir: str, record: dict) -> None:
    """Atomically publish `record` as version record['version']."""
    d = log_dir(table_dir)
    os.makedirs(d, exist_ok=True)
    final = _version_path(table_dir, record["version"])
    tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex}.json")
    with open(tmp, "w") as fh:
        json.dump(record, fh)
        fh.flush()
        os.fsync(fh.fileno())
    try:
        os.link(tmp, final)
    except FileExistsError as exc:  # pragma: no cover - concurrency guard
        raise CommitConflict(f"version {record['version']} already committed") from exc
    finally:
        os.unlink(tmp)
    # Advance HEAD (best-effort, atomic replace). Concurrent writers may
    # race; HEAD only ever lags, and current_version probes forward.
    try:
        htmp = os.path.join(d, f".head-{uuid.uuid4().hex}")
        with open(htmp, "w") as fh:
            fh.write(str(record["version"]))
        os.replace(htmp, _head_path(table_dir))
    except OSError:  # pragma: no cover - HEAD is an optimization only
        pass
