"""Round-5 lake hardening: the per-partition writer lease (concurrent
compaction + ingest == serial), rewrite-over-delta cleanup, and the
library-independent IPC state digest.

All at the apply_arrow level — no Ray session needed: the lease is
flock-based, so two THREADS of one process contend exactly like two
worker processes would (flock conflicts between separate fds of the
same file even within one process).
"""

from __future__ import annotations

import glob
import os
import threading
import time

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from myzql_binlog_connector_ray.stages.apply_arrow import (
    ApplyPartitionArrow,
    _state_sha,
    compact_partition,
    verify_parts,
)

KEYS = ["id"]
FINAL = ["id", "val"]
TYPES = {"id": pa.int64(), "val": pa.int64()}


def _wave(ordinal_base: int, ids: list[int], vals: list[int], dml: str = "UPDATE") -> pa.Table:
    n = len(ids)
    return pa.table(
        {
            "id": pa.array(ids, pa.int64()),
            "val": pa.array(vals, pa.int64()),
            "dml": pa.array([dml] * n, pa.string()),
            "ordinal": pa.array([ordinal_base + i for i in range(n)], pa.int64()),
            "event_row_index": pa.array([0] * n, pa.int64()),
            "part": pa.array([0] * n, pa.int32()),
        }
    )


def _applier(lake: str, sink: str = "delta") -> ApplyPartitionArrow:
    return ApplyPartitionArrow(
        lake_dir=lake,
        write=True,
        final_columns=FINAL,
        final_types=TYPES,
        key_cols=KEYS,
        sink_mode=sink,
    )


def _final_state(lake: str) -> list[tuple]:
    t = pq.read_table(os.path.join(lake, "part=0000", "data.parquet"))
    t = t.take(pc.sort_indices(t, sort_keys=[("id", "ascending")]))
    return list(zip(t["id"].to_pylist(), t["val"].to_pylist()))


def _waves(n_waves: int = 30, n_keys: int = 20) -> list[pa.Table]:
    waves = []
    for w in range(n_waves):
        ids = [(w * 7 + i) % n_keys for i in range(8)]
        # dedup ids within the wave (LWW per key by ordinal handles it,
        # but keep the expected-state bookkeeping simple)
        ids = sorted(set(ids))
        waves.append(_wave(1000 * (w + 1), ids, [w * 100 + i for i in ids]))
    return waves


def test_concurrent_delta_ingest_and_compaction(tmp_path):
    """A compaction loop racing delta-ingest waves on the SAME partition
    must produce the identical final lake as serial execution — the
    round-4 VERDICT's done-bar for the manifest lease."""
    waves = _waves()

    serial = str(tmp_path / "serial")
    a = _applier(serial)
    for w in waves:
        a(w)
    compact_partition(serial, 0, key_cols=KEYS, final_columns=FINAL, final_types=TYPES)
    want = _final_state(serial)

    conc = str(tmp_path / "concurrent")
    done = threading.Event()
    errors: list[BaseException] = []

    def ingest():
        try:
            b = _applier(conc)
            for w in waves:
                b(w)
                time.sleep(0.002)
        except BaseException as e:  # noqa: BLE001
            errors.append(e)
        finally:
            done.set()

    def compactor():
        try:
            while not done.is_set():
                compact_partition(conc, 0, key_cols=KEYS, final_columns=FINAL, final_types=TYPES)
                time.sleep(0.001)
        except BaseException as e:  # noqa: BLE001
            errors.append(e)

    t1 = threading.Thread(target=ingest)
    t2 = threading.Thread(target=compactor)
    t1.start(), t2.start()
    t1.join(), t2.join()
    assert not errors, errors
    compact_partition(conc, 0, key_cols=KEYS, final_columns=FINAL, final_types=TYPES)
    assert _final_state(conc) == want
    # and the sealed lake verifies clean
    res = verify_parts(pa.table({"part": pa.array([0], pa.int32())}), lake_dir=conc)
    assert res["ok"].to_pylist() == [True]
    assert res["detail"].to_pylist() == ["ok"]


def test_concurrent_rewrite_ingest_and_compaction(tmp_path):
    """Rewrite-mode waves racing a compactor: the lease serializes the
    base rewrite against the fold, so no committed wave is lost."""
    waves = _waves(n_waves=12)

    serial = str(tmp_path / "serial")
    a = _applier(serial, sink="rewrite")
    for w in waves:
        a(w)
    want = _final_state(serial)

    conc = str(tmp_path / "concurrent")
    # seed a delta history so the compactor has something to race on
    _applier(conc, sink="delta")(waves[0])
    done = threading.Event()
    errors: list[BaseException] = []

    def ingest():
        try:
            b = _applier(conc, sink="rewrite")
            for w in waves[1:]:
                b(w)
                time.sleep(0.002)
        except BaseException as e:  # noqa: BLE001
            errors.append(e)
        finally:
            done.set()

    def compactor():
        try:
            while not done.is_set():
                compact_partition(conc, 0, key_cols=KEYS, final_columns=FINAL, final_types=TYPES)
                time.sleep(0.001)
        except BaseException as e:  # noqa: BLE001
            errors.append(e)

    t1, t2 = threading.Thread(target=ingest), threading.Thread(target=compactor)
    t1.start(), t2.start()
    t1.join(), t2.join()
    assert not errors, errors
    compact_partition(conc, 0, key_cols=KEYS, final_columns=FINAL, final_types=TYPES)
    assert _final_state(conc) == want


def test_rewrite_over_delta_history_unlinks_stale_deltas(tmp_path):
    """Round-4 ADVICE (medium): after a rewrite-mode commit folds a
    delta-mode history into the new base, the superseded delta files
    must be gone — a plain ``read_parquet`` over the lake dir must not
    see duplicate keys or raw change-row columns."""
    lake = str(tmp_path / "lake")
    _applier(lake, sink="delta")(_wave(1000, [1, 2, 3], [10, 20, 30]))
    _applier(lake, sink="delta")(_wave(2000, [2, 3, 4], [21, 31, 41]))
    assert len(glob.glob(os.path.join(lake, "part=0000", "delta-*.parquet"))) == 2

    _applier(lake, sink="rewrite")(_wave(3000, [1, 5], [12, 52]))
    assert glob.glob(os.path.join(lake, "part=0000", "delta-*.parquet")) == []
    got = _final_state(lake)
    assert got == [(1, 12), (2, 21), (3, 31), (4, 41), (5, 52)]
    # plain dir read (read_lake) sees exactly the final state
    t = pq.read_table(os.path.join(lake, "part=0000"))
    assert t.num_rows == 5 and sorted(t.column_names) == ["id", "val"]


def test_state_sha_ipc_canonical():
    """The content-free state digest is derived from Arrow IPC bytes of
    the schema-ordered single-chunk table: stable across chunking and
    column order, sensitive to any value change."""
    a = pa.table({"id": pa.array([1, 2, 3], pa.int64()), "val": pa.array([9, 8, 7], pa.int64())})
    chunked = pa.concat_tables([a.slice(0, 1), a.slice(1, 2)])
    reordered = a.select(["val", "id"])
    assert _state_sha(a) == _state_sha(chunked) == _state_sha(reordered)
    b = pa.table({"id": pa.array([1, 2, 3], pa.int64()), "val": pa.array([9, 8, 6], pa.int64())})
    assert _state_sha(a) != _state_sha(b)
    # pandas-origin metadata must not perturb the digest
    import pandas as pd

    c = pa.Table.from_pandas(a.to_pandas(), preserve_index=False)
    assert _state_sha(c) == _state_sha(a)


def test_partition_lease_reentrant_and_exclusive(tmp_path):
    """The lease re-enters within a thread (inline compact_every) and
    excludes across threads."""
    from myzql_binlog_connector_ray.state.manifest import partition_lease

    lake = str(tmp_path / "lake")
    with partition_lease(lake, 0):
        with partition_lease(lake, 0):  # reentrant: no deadlock
            pass
        acquired = threading.Event()
        released = threading.Event()

        def other():
            with partition_lease(lake, 0):
                acquired.set()
            released.set()

        t = threading.Thread(target=other)
        t.start()
        time.sleep(0.1)
        assert not acquired.is_set()  # blocked while we hold it
    t.join(timeout=5)
    assert acquired.is_set() and released.is_set()
