"""Round-5 hardening: canonicalized hash_bucket (cross-dtype join
safety), verify-CLI unverifiable accounting, bench contamination
markers."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def test_hash_bucket_cross_width_and_null_stable():
    """ADVICE r4: two sides keyed int32 vs int64, or an int column that
    picked up nulls (numpy degrades to float64/NaN), must land in the
    same buckets — canonicalization happens INSIDE hash_bucket now, not
    in each caller."""
    from myzql_binlog_connector_ray.functions.relational import hash_bucket

    vals = [-1, 7, 0, 123456, 2**40]
    b64 = hash_bucket(pa.array(vals, pa.int64()), 32)
    b32 = hash_bucket(pa.array([-1, 7, 0, 123456, 0], pa.int32()), 32)
    assert (b64[:4] == b32[:4]).all()
    # int16 / uint32 too
    assert (hash_bucket(pa.array([7, 0], pa.int16()), 32) == b64[1:3]).all()
    assert (hash_bucket(pa.array([7, 0], pa.uint32()), 32) == b64[1:3]).all()
    # a null does not perturb the other rows' buckets
    bn = hash_bucket(pa.array([-1, 7, None, 123456, 2**40], pa.int64()), 32)
    assert bn[0] == b64[0] and bn[1] == b64[1] and bn[3] == b64[3] and bn[4] == b64[4]
    # float32 vs float64, large_string vs string
    f32 = hash_bucket(pa.array([1.5, -2.25], pa.float32()), 32)
    f64 = hash_bucket(pa.array([1.5, -2.25], pa.float64()), 32)
    assert (f32 == f64).all()
    s = hash_bucket(pa.array(["x", "y"], pa.string()), 32)
    ls = hash_bucket(pa.array(["x", "y"], pa.large_string()), 32)
    assert (s == ls).all()
    # numpy / list inputs keep working
    assert (hash_bucket(np.array(vals[:4], dtype=np.int32), 32) == b64[:4]).all()
    assert (hash_bucket(vals, 32) == b64).all()


def test_bucket_join_mixed_width_keys(ray_session):
    """tag_and_bucket/bucket_join_groups no longer drop rows when the
    two sides' key columns have different integer widths."""
    import ray.data

    from myzql_binlog_connector_ray.functions.relational import (
        bucket_join_groups,
        tag_and_bucket,
    )

    left = ray.data.from_arrow(
        pa.table({"k": pa.array([1, 2, 3, 4], pa.int32()), "lv": [10, 20, 30, 40]})
    )
    right = ray.data.from_arrow(
        pa.table({"k": pa.array([2, 4, 5], pa.int64()), "rv": [200, 400, 500]})
    )
    both = left.map_batches(
        lambda b: tag_and_bucket(b, "l", "k", 8), batch_format="pyarrow"
    ).union(
        right.map_batches(lambda b: tag_and_bucket(b, "r", "k", 8), batch_format="pyarrow")
    )
    out = both.groupby("bucket").map_groups(
        lambda g: bucket_join_groups(g, "k"), batch_format="pyarrow"
    )
    rows = sorted(
        (r["lv"], r["rv"]) for r in out.take_all() if r.get("lv") is not None
    )
    assert rows == [(20, 200), (40, 400)]


def test_cli_verify_exit_code_unverifiable(tmp_path):
    """A lake that is entirely delta commits must NOT read as a clean
    verify: exit code 3 + an explicit unverifiable count (ADVICE r4)."""
    import json
    import subprocess
    import sys

    from myzql_binlog_connector_ray.state.manifest import commit_delta

    lake = tmp_path / "lake"
    t = pa.table(
        {
            "repo": ["r"],
            "path": ["p"],
            "ordinal": pa.array([5], pa.int64()),
            "event_row_index": pa.array([0], pa.int64()),
            "dml": ["INSERT"],
        }
    )
    commit_delta(str(lake), 0, t, watermark=5, key_cols=["repo", "path"])
    cfg = {"segments_dir": str(tmp_path), "output_dir": str(tmp_path), "lake_dir": str(lake)}
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))

    def run(mode):
        return subprocess.run(
            [sys.executable, "-m", "myzql_binlog_connector_ray.cli", mode, str(cfg_path)],
            capture_output=True,
            text=True,
            cwd="/root/repo",
            timeout=300,
        )

    r = run("verify")
    assert r.returncode == 3, r.stdout + r.stderr
    assert "unverifiable" in r.stdout
    # compact seals it → clean verify, exit 0
    r2 = run("compact")
    assert r2.returncode == 0, r2.stdout + r2.stderr
    r3 = run("verify")
    assert r3.returncode == 0, r3.stdout + r3.stderr
    assert "unverifiable" not in r3.stdout


def test_bench_host_load_marker():
    import bench

    m = bench.host_load_marker()
    assert "load_1m" in m and "host_cpus" in m
    assert m["host_cpus"] and m["host_cpus"] > 0
