"""Iceberg-semantics snapshot log: append-only commit lineage for an index.

The reference keeps a per-index lifecycle audit trail — IndexBackfill rows
record who built what and when, and every harvest job leaves a provenance
record (share/models/index_backfill.py:35-146, share/models/jobs.py) — but
its ES index is mutable in place, so "the index as of last Tuesday" is not
a answerable question there.  The north-star target is an Iceberg table,
whose metadata IS answerable: an append-only snapshot list with parent
pointers, each snapshot naming exactly the data files it can see, plus
`expire_snapshots` to reclaim files unreachable from retained snapshots.

This module grafts those semantics onto the index directory:

- ``snapshots.jsonl`` holds one JSON record per COMMIT — initial build,
  incremental generation, expel, compaction.  A record carries the
  snapshot id (monotonic), parent id, operation, the generation list as of
  the commit with each generation's build nonce, the tombstone-table
  version it sees, and a free-form metrics summary (the "build metrics
  written alongside each snapshot" of the brief).
- tombstone tables are IMMUTABLE VERSIONS (``tombstones_v{sid}``): a merge
  writes a new version instead of rewriting in place, so an old snapshot's
  delete-state stays readable after later deletes.  The top-level manifest
  points at the current version.
- ``IndexReader.open(..., snapshot_id=)`` reconstructs the reader exactly
  as of a commit (time travel); :func:`expire_snapshots` deletes data
  directories unreachable from the retained records (and nothing the
  current manifest still references).

Commit protocol: single writer; each commit APPENDS one fsynced line
(O(1) — a rewrite-per-commit would be quadratic over 10^5+ micro-batch
commits), write-ahead of the manifest swap that makes the commit visible
(share_spark/index/build.py ``commit_manifest``).  Only the pruning path
(:func:`expire_snapshots`) rewrites the log, via tmp-write + ``os.replace``.
"""

from __future__ import annotations

import json
import os
import shutil
from datetime import datetime, timezone

LOG_NAME = "snapshots.jsonl"
LEGACY_TOMBSTONES = "tombstones"


class SnapshotExpiredError(ValueError):
    """The snapshot exists in the log but its data files are gone (expired
    by :func:`expire_snapshots` / a history-dropping compaction) or were
    rebuilt under the same generation number (nonce mismatch)."""


def log_path(index_dir: str) -> str:
    return os.path.join(index_dir, LOG_NAME)


def read_snapshots(index_dir: str) -> list[dict]:
    """All retained snapshot records, oldest first ([] when no log).

    Tolerates a torn FINAL line (a crash mid-append): the commit it
    belonged to never completed, so dropping it is exactly correct.  A
    torn line anywhere else is real corruption and raises."""
    path = log_path(index_dir)
    if not os.path.exists(path):
        return []
    with open(path) as f:
        lines = [ln for ln in f.read().splitlines() if ln.strip()]
    records = []
    for i, ln in enumerate(lines):
        try:
            records.append(json.loads(ln))
        except json.JSONDecodeError:
            if i == len(lines) - 1:
                break
            raise ValueError(
                f"corrupt snapshot log {path}: undecodable record {i} "
                f"of {len(lines)}"
            )
    return records


def current_snapshot(index_dir: str) -> dict | None:
    recs = read_snapshots(index_dir)
    return recs[-1] if recs else None


def snapshot_by_id(index_dir: str, snapshot_id: int) -> dict:
    for rec in read_snapshots(index_dir):
        if rec["snapshot_id"] == snapshot_id:
            return rec
    raise ValueError(
        f"snapshot {snapshot_id} not in {log_path(index_dir)} "
        "(never committed, or expired and removed from the log)"
    )


def next_snapshot_id(index_dir: str) -> int:
    cur = current_snapshot(index_dir)
    return (cur["snapshot_id"] + 1) if cur else 0


def _write_log(index_dir: str, records: list[dict]) -> None:
    tmp = log_path(index_dir) + ".tmp"
    with open(tmp, "w") as f:
        for rec in records:
            f.write(json.dumps(rec, sort_keys=True) + "\n")
    os.replace(tmp, log_path(index_dir))


def _gen_nonce(index_dir: str, generation: int) -> str | None:
    with open(
        os.path.join(index_dir, f"gen{generation}", "manifest.json")
    ) as f:
        return json.load(f).get("build_id")


def commit_snapshot(
    index_dir: str,
    operation: str,
    generations: list[int],
    tombstones: str | None = None,
    summary: dict | None = None,
) -> dict:
    """Append one commit record; returns it.  `operation` follows Iceberg's
    vocabulary: "append" (new generation), "delete" (tombstones only),
    "replace" (compaction rewrote the data)."""
    records = read_snapshots(index_dir)
    parent = records[-1]["snapshot_id"] if records else None
    rec = {
        "snapshot_id": (parent + 1) if parent is not None else 0,
        "parent_id": parent,
        "committed_at": datetime.now(timezone.utc).isoformat(
            timespec="seconds"
        ),
        "operation": operation,
        "generations": sorted(int(g) for g in generations),
        "gen_nonces": {
            str(g): _gen_nonce(index_dir, g) for g in sorted(generations)
        },
        "tombstones": tombstones,
        "summary": summary or {},
    }
    # O(1) append, not a rewrite: at 10^5+ micro-batch commits a
    # rewrite-per-commit would be quadratic in cumulative metadata IO.
    # This append is a WRITE-AHEAD record: it lands before the manifest
    # swap that makes the commit visible (commit_manifest ordering note).
    # Crash mid-append leaves a torn final line, which read_snapshots
    # drops — that commit never swapped its manifest, so dropping it is
    # exactly correct.
    path = log_path(index_dir)
    if os.path.exists(path):
        # repair a torn tail from a crashed append (file not ending in
        # newline): truncate back to the last complete record so the
        # garbage never ends up mid-file
        with open(path, "rb+") as f:
            f.seek(0, os.SEEK_END)
            size = f.tell()
            if size:
                f.seek(size - 1)
                if f.read(1) != b"\n":
                    f.seek(0)
                    keep = f.read().rfind(b"\n") + 1
                    f.truncate(keep)
    line = json.dumps(rec, sort_keys=True) + "\n"
    with open(path, "a") as f:
        f.write(line)
        f.flush()
        os.fsync(f.fileno())
    return rec


def resolve_tombstone_dir(index_dir: str, manifest: dict | None = None) -> str | None:
    """Current tombstone dir NAME: the manifest pointer, falling back to
    the pre-snapshot in-place layout (indexes built before versioning)."""
    if manifest is None:
        mpath = os.path.join(index_dir, "manifest.json")
        if not os.path.exists(mpath):
            manifest = {}
        else:
            with open(mpath) as f:
                manifest = json.load(f)
    name = manifest.get("tombstones")
    if name is None and os.path.exists(
        os.path.join(index_dir, LEGACY_TOMBSTONES)
    ):
        name = LEGACY_TOMBSTONES
    return name


def verify_snapshot_readable(index_dir: str, rec: dict) -> None:
    """Raise SnapshotExpiredError unless every data dir the record names
    still exists with the same build nonce."""
    for g in rec["generations"]:
        gman = os.path.join(index_dir, f"gen{g}", "manifest.json")
        if not os.path.exists(gman):
            raise SnapshotExpiredError(
                f"snapshot {rec['snapshot_id']}: gen{g} no longer on disk "
                "(expired or compacted away)"
            )
        nonce = _gen_nonce(index_dir, g)
        want = rec["gen_nonces"].get(str(g))
        if want is not None and nonce != want:
            raise SnapshotExpiredError(
                f"snapshot {rec['snapshot_id']}: gen{g} was rebuilt under "
                f"the same number (nonce {nonce} != {want}); the bytes this "
                "snapshot saw are gone"
            )
    tomb = rec.get("tombstones")
    if tomb and not os.path.exists(os.path.join(index_dir, tomb)):
        raise SnapshotExpiredError(
            f"snapshot {rec['snapshot_id']}: tombstone version {tomb} "
            "no longer on disk (expired)"
        )


def expire_snapshots(index_dir: str, keep_last: int = 1) -> dict:
    """Drop all but the newest `keep_last` snapshots and delete data dirs
    unreachable from the retained ones — Iceberg's ``expire_snapshots``.

    Never deletes anything the CURRENT manifest references, whatever the
    log says (belt and braces for a log/manifest mismatch after a crash).
    Returns {"expired": [ids], "deleted_dirs": [names]}.
    """
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1 (the current snapshot)")
    records = read_snapshots(index_dir)
    if len(records) <= keep_last:
        return {"expired": [], "deleted_dirs": []}
    expired, retained = records[:-keep_last], records[-keep_last:]

    with open(os.path.join(index_dir, "manifest.json")) as f:
        manifest = json.load(f)
    keep_gens = {int(g) for g in manifest.get("generations", [])}
    for rec in retained:
        keep_gens.update(int(g) for g in rec["generations"])
    keep_tombs = {
        rec["tombstones"] for rec in retained if rec.get("tombstones")
    }
    cur_tomb = resolve_tombstone_dir(index_dir, manifest)
    if cur_tomb:
        keep_tombs.add(cur_tomb)

    deleted: list[str] = []
    for rec in expired:
        for g in rec["generations"]:
            name = f"gen{int(g)}"
            path = os.path.join(index_dir, name)
            if int(g) not in keep_gens and os.path.exists(path):
                shutil.rmtree(path)
                deleted.append(name)
        tomb = rec.get("tombstones")
        if tomb and tomb not in keep_tombs:
            path = os.path.join(index_dir, tomb)
            if os.path.exists(path):
                shutil.rmtree(path)
                deleted.append(tomb)
    # a legacy in-place tombstone dir orphaned by the first versioned merge
    legacy = os.path.join(index_dir, LEGACY_TOMBSTONES)
    if (
        LEGACY_TOMBSTONES not in keep_tombs
        and cur_tomb != LEGACY_TOMBSTONES
        and os.path.exists(legacy)
    ):
        shutil.rmtree(legacy)
        deleted.append(LEGACY_TOMBSTONES)

    _write_log(index_dir, retained)
    return {
        "expired": [rec["snapshot_id"] for rec in expired],
        "deleted_dirs": sorted(set(deleted)),
    }
