"""Per-partition checkpoint manifests for the exactly-once sink.

A lake directory is laid out as::

    lake/
      part=0000/data.parquet
      part=0001/data.parquet
      _manifests/part-0000.json     {"partition", "watermark", "rows", "state_sha256"}
      ...

Commits are atomic per partition: data is written to a temp file and
``os.replace``d into place, then the manifest is replaced the same way.
A partition whose manifest watermark already covers the incoming
change-ordinal range is skipped entirely, and changes at or below the
watermark are dropped before merge — so replaying a prefix of the
stream (task retry, resumed run) can neither duplicate an upsert nor
resurrect a deleted key. This is the engine's exactly-once mechanism
(north rule; the reference's analogue is whole-file overwrite
idempotence, reference: src/pipeline.zig:470-479).
"""

from __future__ import annotations

import json
import os
import threading
import uuid
from contextlib import contextmanager
from typing import Optional

# thread-local set of leases this thread already holds — the delta
# sink's inline compaction (compact_every) re-enters the same
# partition's lease, and flock would otherwise self-deadlock between
# two fds of one file
_HELD = threading.local()


def _lease_path(lake_dir: str, part: int) -> str:
    return os.path.join(lake_dir, "_manifests", f"part-{part:04d}.lock")


@contextmanager
def partition_lease(lake_dir: str, part: int):
    """Per-partition writer mutual exclusion: ingest apply, delta
    commit, and compaction each hold the lease for their whole
    read-fold-commit critical section, so a compaction racing an ingest
    wave on the same partition serializes instead of losing deltas
    between the manifest read and ``os.replace`` (round-4 ADVICE).

    Mechanism: ``flock`` on a per-partition lock file — advisory,
    blocking, and released by the kernel if the holder dies (no stale
    lock files to reap). Reentrant per thread. Scope: every writer
    sharing the lake filesystem (all Ray workers on one node, or a
    shared FS whose flock is coherent, e.g. NFSv4); a multi-node
    object-store deployment would swap this for a manifest CAS /
    lease-service implementation behind the same context manager."""
    import fcntl

    key = (os.path.abspath(lake_dir), int(part))
    held = getattr(_HELD, "keys", None)
    if held is None:
        held = _HELD.keys = {}
    if key in held:
        held[key] += 1
        try:
            yield
        finally:
            held[key] -= 1
            if not held[key]:
                del held[key]
        return
    os.makedirs(os.path.join(lake_dir, "_manifests"), exist_ok=True)
    fd = os.open(_lease_path(lake_dir, part), os.O_CREAT | os.O_RDWR, 0o644)
    try:
        fcntl.flock(fd, fcntl.LOCK_EX)
        held[key] = 1
        try:
            yield
        finally:
            del held[key]
    finally:
        os.close(fd)  # close releases the flock


def partition_dir(lake_dir: str, part: int) -> str:
    return os.path.join(lake_dir, f"part={part:04d}")


def manifest_path(lake_dir: str, part: int) -> str:
    return os.path.join(lake_dir, "_manifests", f"part-{part:04d}.json")


def read_manifest(lake_dir: str, part: int) -> Optional[dict]:
    try:
        with open(manifest_path(lake_dir, part)) as f:
            return json.load(f)
    except FileNotFoundError:
        return None


def read_all_manifests(lake_dir: str) -> list[dict]:
    mdir = os.path.join(lake_dir, "_manifests")
    if not os.path.isdir(mdir):
        return []
    out = []
    for name in sorted(os.listdir(mdir)):
        # partition manifests only — the _frontier.json commit-frontier
        # marker and any future lake-level metadata are not partitions
        if name.endswith(".json") and name.startswith("part-"):
            with open(os.path.join(mdir, name)) as f:
                out.append(json.load(f))
    return out


def delta_path(lake_dir: str, part: int, watermark: int) -> str:
    return os.path.join(
        partition_dir(lake_dir, part), f"delta-{watermark:020d}-{uuid.uuid4().hex[:8]}.parquet"
    )


def delta_watermark_of(path: str) -> int:
    """Watermark embedded in a delta file name."""
    base = os.path.basename(path)
    return int(base.split("-")[1])


def list_delta_files(lake_dir: str, part: int, compacted_through: int = -1) -> list[str]:
    """This partition's live delta files in commit order. Files at or
    below ``compacted_through`` are already folded into the base — a
    compaction that crashed between the base rewrite and the cleanup
    leaves them behind, and re-applying them over the newer base would
    resurrect stale values, so they are ignored (and removed by the
    next compaction)."""
    import glob

    files = sorted(glob.glob(os.path.join(partition_dir(lake_dir, part), "delta-*.parquet")))
    return [f for f in files if delta_watermark_of(f) > compacted_through]


def commit_delta(lake_dir: str, part: int, table, watermark: int, key_cols=None) -> dict:
    """Append one delta file (LWW-reduced change rows, still carrying
    ordinal/event_row_index/dml) instead of folding + rewriting the
    partition base — the low-write-amplification sink for small
    frequent batches at scale. Exactly-once rides on the same manifest
    watermark; ``rows`` is unknown (-1) until the next compaction or
    fold-on-read."""
    import pyarrow.parquet as pq

    pdir = partition_dir(lake_dir, part)
    os.makedirs(pdir, exist_ok=True)
    os.makedirs(os.path.join(lake_dir, "_manifests"), exist_ok=True)

    # the delta file + manifest RMW run under the partition lease, so a
    # compaction committing in between can no longer be overwritten
    # with a stale compacted_through (round-4 ADVICE: the single-writer
    # contract is now enforced, not just stated)
    with partition_lease(lake_dir, part):
        dest = delta_path(lake_dir, part, watermark)
        tmp = dest + f".tmp-{uuid.uuid4().hex}"
        pq.write_table(table, tmp, compression="zstd")
        os.replace(tmp, dest)

        prev = read_manifest(lake_dir, part) or {}
        manifest = {
            "partition": part,
            "watermark": max(int(watermark), int(prev.get("watermark", -1))),
            "rows": -1,
            "state_sha256": "",
            "deltas": int(prev.get("deltas", 0)) + 1,
            "compacted_through": int(prev.get("compacted_through", -1)),
            # authoritative per-partition key columns: compaction (which may
            # run without any table config, e.g. the CLI compact mode)
            # folds by these
            "key_cols": list(key_cols) if key_cols else prev.get("key_cols"),
        }
        mpath = manifest_path(lake_dir, part)
        mtmp = mpath + f".tmp-{uuid.uuid4().hex}"
        with open(mtmp, "w") as f:
            json.dump(manifest, f)
        os.replace(mtmp, mpath)
        return manifest


def frontier_path(lake_dir: str) -> str:
    return os.path.join(lake_dir, "_manifests", "_frontier.json")


def read_frontier(lake_dir: str) -> int:
    """The lake's commit frontier: every change with ordinal at or
    below it is fully committed across ALL partitions. -1 until the
    first wave publishes. Per-partition manifests alone cannot provide
    this guarantee — partitions commit independently within a wave, and
    a partition with no changes in a wave never advances — so the
    ingest pipelines publish it once per fully-committed wave/window
    (the delta-log-head analogue every CDC consumer tails)."""
    try:
        with open(frontier_path(lake_dir)) as f:
            return int(json.load(f)["watermark"])
    except (FileNotFoundError, KeyError, ValueError):
        return -1


def publish_frontier(lake_dir: str, watermark: int) -> int:
    """Advance the commit frontier (monotonic max, atomic replace,
    flock-serialized against concurrent publishers). Call ONLY after
    every partition of the wave/window has committed."""
    import fcntl

    os.makedirs(os.path.join(lake_dir, "_manifests"), exist_ok=True)
    lock = frontier_path(lake_dir) + ".lock"
    fd = os.open(lock, os.O_CREAT | os.O_RDWR, 0o644)
    try:
        fcntl.flock(fd, fcntl.LOCK_EX)
        w = max(read_frontier(lake_dir), int(watermark))
        tmp = frontier_path(lake_dir) + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump({"watermark": w}, f)
        os.replace(tmp, frontier_path(lake_dir))
        return w
    finally:
        os.close(fd)


def commit_base_rewrite(
    lake_dir: str,
    part: int,
    table,
    watermark: int,
    compacted_through: int,
    n_live: int,
    key_cols=None,
) -> dict:
    """Partial-compaction commit: atomically replace the partition base
    with the fold of everything ``<= compacted_through`` while LATER
    delta files stay live — the retention-aware compaction shape (time
    travel above the horizon survives). The manifest remains a delta
    commit (rows/state sha unknown) until a full compaction seals it."""
    import pyarrow.parquet as pq

    pdir = partition_dir(lake_dir, part)
    os.makedirs(pdir, exist_ok=True)
    os.makedirs(os.path.join(lake_dir, "_manifests"), exist_ok=True)

    with partition_lease(lake_dir, part):
        tmp = os.path.join(pdir, f".tmp-{uuid.uuid4().hex}.parquet")
        pq.write_table(table, tmp, compression="zstd")
        os.replace(tmp, os.path.join(pdir, "data.parquet"))

        manifest = {
            "partition": part,
            "watermark": int(watermark),
            "rows": -1,
            "state_sha256": "",
            "deltas": int(n_live),
            "compacted_through": int(compacted_through),
            "key_cols": list(key_cols) if key_cols else None,
        }
        mpath = manifest_path(lake_dir, part)
        mtmp = mpath + f".tmp-{uuid.uuid4().hex}"
        with open(mtmp, "w") as f:
            json.dump(manifest, f)
        os.replace(mtmp, mpath)
        return manifest


def commit_partition(
    lake_dir: str,
    part: int,
    table,
    watermark: int,
    state_sha256: str,
    key_cols=None,
) -> dict:
    """Atomically replace a partition's data file and manifest."""
    import pyarrow.parquet as pq

    pdir = partition_dir(lake_dir, part)
    os.makedirs(pdir, exist_ok=True)
    os.makedirs(os.path.join(lake_dir, "_manifests"), exist_ok=True)

    with partition_lease(lake_dir, part):
        tmp = os.path.join(pdir, f".tmp-{uuid.uuid4().hex}.parquet")
        pq.write_table(table, tmp, compression="zstd")
        os.replace(tmp, os.path.join(pdir, "data.parquet"))

        manifest = {
            "partition": part,
            "watermark": int(watermark),
            "rows": table.num_rows,
            "state_sha256": state_sha256,
            "deltas": 0,
            # everything ≤ watermark is folded into the base, so any delta
            # file at or below it is stale (see list_delta_files)
            "compacted_through": int(watermark),
            "key_cols": list(key_cols) if key_cols else None,
        }
        mpath = manifest_path(lake_dir, part)
        mtmp = mpath + f".tmp-{uuid.uuid4().hex}"
        with open(mtmp, "w") as f:
            json.dump(manifest, f)
        os.replace(mtmp, mpath)
        return manifest
