"""GTID-set type + GTID auto-positioned resume (round-5 north-rule
extension; the reference only enumerates the GTID event types,
src/event_parser.zig:74-76)."""

from __future__ import annotations

import os

import pytest

from myzql_binlog_connector_ray.kernel.gtid import GtidSet
from myzql_binlog_connector_ray.sources.binlog_tail import (
    gtid_executed_of_segments,
    tail_binlog_to_segments,
)
from myzql_binlog_connector_ray.sources.mysql_wire import MysqlConnection

from replay_server import ReplayServer

SID1 = "3e11fa47-71ca-11e1-9e33-c80aa9429562"
SID2 = "2c256447-3f0d-431b-95c4-8bdbce3c5ce1"


@pytest.fixture()
def replay(fixture_paths):
    seg_dir = os.path.dirname(fixture_paths["segment_paths"][0])
    with ReplayServer(seg_dir) as srv:
        yield srv
    assert srv.errors == []


def test_gtid_set_text_roundtrip():
    text = f"{SID2}:1-17,{SID1}:1-5:11:47-49"
    g = GtidSet.from_text(text)
    assert g.to_text() == f"{SID2}:1-17,{SID1}:1-5:11:47-49"
    # the server inserts whitespace/newlines after commas
    assert GtidSet.from_text(f"{SID2}:1-17,\n {SID1}:1-5:11:47-49") == g
    assert GtidSet.from_text("") == GtidSet()
    assert not GtidSet()
    assert g


def test_gtid_set_binary_roundtrip():
    g = GtidSet.from_text(f"{SID1}:1-5:11,{SID2}:3")
    assert GtidSet.from_binary(g.to_binary()) == g
    assert GtidSet.from_binary(GtidSet().to_binary()) == GtidSet()


def test_gtid_set_ops():
    g = GtidSet.from_text(f"{SID1}:1-5:11")
    assert g.contains(SID1, 1) and g.contains(SID1, 5) and g.contains(SID1, 11)
    assert not g.contains(SID1, 6) and not g.contains(SID1, 12)
    assert not g.contains(SID2, 1)
    # add merges adjacent intervals
    g.add(SID1, 6)
    assert g.to_text() == f"{SID1}:1-6:11"
    g.add(SID1, 7)
    g.add(SID1, 8)
    g.add(SID1, 9)
    g.add(SID1, 10)
    assert g.to_text() == f"{SID1}:1-11"
    # binary-sid form (the GTID event payload carries raw bytes)
    import uuid

    assert g.contains(uuid.UUID(SID1).bytes, 4)
    u = g.union(GtidSet.from_text(f"{SID2}:1-3"))
    assert u.contains(SID2, 2) and u.contains(SID1, 4)
    assert GtidSet.from_text(f"{SID1}:2-4").is_subset_of(g)
    assert not GtidSet.from_text(f"{SID1}:2-12").is_subset_of(g)
    # hole detection: endpoints inside, middle missing
    holey = GtidSet.from_text(f"{SID1}:1-3:9-11")
    assert not GtidSet.from_text(f"{SID1}:2-10").is_subset_of(holey)


def test_server_gtid_executed(replay, fixture_paths):
    """SELECT @@gtid_executed over the wire returns the recorded
    stream's full set; a fresh archive's executed set is empty."""
    conn = MysqlConnection(port=replay.port, user="repl", password="secret").connect()
    try:
        g = conn.gtid_executed()
    finally:
        conn.close()
    assert g, "fixture stream has GTIDs"
    # the fixture writer uses one fixed SID
    assert len(g.sids) == 1
    assert gtid_executed_of_segments("/nonexistent") == GtidSet()


def test_gtid_resume_heals_interrupted_tail(replay, fixture_paths, tmp_path):
    """Round-4 VERDICT done-bar: kill the tail mid-stream, resume by
    GTID set, archive equals the uninterrupted run byte-for-byte (so
    any downstream lake is identical too)."""
    out_dir = str(tmp_path / "gtid_resumed")
    # phase 1: stop mid-file (partial binlog.000001 committed)
    m1 = tail_binlog_to_segments(
        out_dir, port=replay.port, user="repl", password="secret",
        start_file="binlog.000001", stop_file="binlog.000001", stop_position=None,
    )
    assert [m.segment for m in m1] == ["binlog.000001"]
    src_dir = os.path.dirname(fixture_paths["segment_paths"][0])
    assert os.path.getsize(m1[0].path) < os.path.getsize(os.path.join(src_dir, "binlog.000001"))

    # a partial trailing file contributes nothing to the executed set
    executed = gtid_executed_of_segments(out_dir)
    assert executed == GtidSet()

    # phase 2: GTID auto-positioned resume (no file/pos supplied)
    m2 = tail_binlog_to_segments(
        out_dir, port=replay.port, user="repl", password="secret", resume_gtid=True,
    )
    assert m2 and m2[0].segment == "binlog.000001"
    originals = sorted(os.path.basename(p) for p in fixture_paths["segment_paths"])
    assert sorted(f for f in os.listdir(out_dir) if f.startswith("binlog.")) == originals
    for name in originals:
        with open(os.path.join(src_dir, name), "rb") as a, open(
            os.path.join(out_dir, name), "rb"
        ) as b:
            assert a.read() == b.read(), f"{name} differs from the uninterrupted stream"


def test_gtid_resume_complete_prefix_skips_files(replay, fixture_paths, tmp_path):
    """With a fully-closed prefix on disk, the GTID dump starts at the
    first missing file — contained files are never resent."""
    out_dir = str(tmp_path / "gtid_prefix")
    # tail files 1..2 completely (stop inside file 3 then drop it)
    tail_binlog_to_segments(
        out_dir, port=replay.port, user="repl", password="secret",
        start_file="binlog.000001", stop_file="binlog.000003", stop_position=None,
    )
    os.unlink(os.path.join(out_dir, "binlog.000003"))
    executed = gtid_executed_of_segments(out_dir)
    assert executed  # files 1-2 contribute

    before = {}
    for f in os.listdir(out_dir):
        before[f] = os.path.getmtime(os.path.join(out_dir, f))
    m2 = tail_binlog_to_segments(
        out_dir, port=replay.port, user="repl", password="secret", resume_gtid=True,
    )
    # resumed stream starts at the first missing file, not at 000001
    assert m2[0].segment == "binlog.000003"
    src_dir = os.path.dirname(fixture_paths["segment_paths"][0])
    originals = sorted(os.path.basename(p) for p in fixture_paths["segment_paths"])
    assert sorted(f for f in os.listdir(out_dir) if f.startswith("binlog.")) == originals
    for name in originals:
        with open(os.path.join(src_dir, name), "rb") as a, open(
            os.path.join(out_dir, name), "rb"
        ) as b:
            assert a.read() == b.read()
    # untouched prefix files were not rewritten
    for f, mt in before.items():
        assert os.path.getmtime(os.path.join(out_dir, f)) == mt
