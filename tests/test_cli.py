"""CLI mode dispatch: stdout / parquet / apply over a segment directory.

Each invocation is a subprocess owning its own Ray session (the CLI
calls ray.init itself, mirroring the reference's main();
reference: src/main.zig:85-299).
"""

import glob
import json
import os
import subprocess
import sys

import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def cli_env(fixture_paths, tmp_path_factory):
    work = tmp_path_factory.mktemp("cli")
    cfg = {
        "segments_dir": fixture_paths["segments_dir"],
        "output_dir": str(work / "out"),
        "num_partitions": 4,
    }
    cfg_path = work / "config.json"
    cfg_path.write_text(json.dumps(cfg))
    return {"cfg": str(cfg_path), "out": cfg["output_dir"]}


def _run_cli(*args):
    return subprocess.run(
        [sys.executable, "-m", "myzql_binlog_connector_ray.cli", *args],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=300,
    )


def test_cli_stdout_mode(cli_env):
    r = _run_cli("stdout", cli_env["cfg"], "--limit", "5")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "app.repos" in r.stdout or "metrics.counters" in r.stdout
    assert "after:" in r.stdout


def test_cli_parquet_mode(cli_env):
    r = _run_cli("parquet", cli_env["cfg"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert glob.glob(os.path.join(cli_env["out"], "*.parquet"))


def test_cli_apply_mode(cli_env):
    r = _run_cli("apply", cli_env["cfg"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "partitions committed" in r.stdout
    lake = os.path.join(cli_env["out"], "lake")
    assert glob.glob(os.path.join(lake, "part=*/data.parquet"))
    assert glob.glob(os.path.join(lake, "_manifests", "*.json"))


def test_cli_tail_mode(fixture_paths, tmp_path):
    """tail mode: live replication stream → segment files (in-process
    replay server; runs the CLI main() in-process since the server
    lives in this process)."""
    from myzql_binlog_connector_ray.cli import main
    from replay_server import ReplayServer

    out = tmp_path / "tailed"
    with ReplayServer(fixture_paths["segments_dir"]) as srv:
        cfg = {
            "segments_dir": str(out),
            "host": "127.0.0.1",
            "port": srv.port,
            "user": "repl",
            "password": "secret",
            "from_binlog_file": "binlog.000001",
        }
        cfg_path = tmp_path / "tail.json"
        cfg_path.write_text(json.dumps(cfg))
        assert main(["tail", str(cfg_path)]) == 0
    assert srv.errors == []
    originals = {os.path.basename(p) for p in fixture_paths["segment_paths"]}
    assert originals <= set(os.listdir(out))


def test_cli_rejects_bad_config(tmp_path):
    bad = tmp_path / "bad.json"
    bad.write_text(json.dumps({"segments_dir": "/nonexistent", "from_binlog_position": 1}))
    r = _run_cli("stdout", str(bad))
    assert r.returncode != 0


def test_cli_log_file_plain_text(cli_env, tmp_path):
    """B6 parity: --log-file writes plain 'level(scope): msg' lines
    (no ANSI), truncating on open (reference: src/log_config.zig:20-96)."""
    logf = tmp_path / "run.log"
    r = _run_cli("stdout", cli_env["cfg"], "--limit", "1", "--log-file", str(logf), "--log-level", "debug")
    assert r.returncode == 0, r.stderr[-2000:]
    text = logf.read_text()
    assert "info(cli): mode=stdout" in text
    assert "\x1b[" not in text  # plain text, no color in the file sink
    # truncate-on-open: a second run does not append
    r = _run_cli("stdout", cli_env["cfg"], "--limit", "1", "--log-file", str(logf))
    assert r.returncode == 0
    assert logf.read_text().count("mode=stdout") == 1


def test_cli_log_level_filters(cli_env, tmp_path):
    """Runtime threshold: err suppresses info/debug entirely."""
    logf = tmp_path / "err.log"
    r = _run_cli("stdout", cli_env["cfg"], "--limit", "1", "--log-file", str(logf), "--log-level", "err")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "info(cli)" not in logf.read_text()


def test_scoped_logger_unit(tmp_path):
    from myzql_binlog_connector_ray.logging_config import get_logger, init

    logf = tmp_path / "scoped.log"
    init("debug", str(logf))
    get_logger("decode").debug("hello %d", 7)
    get_logger().info("plain")
    init("warn", str(tmp_path / "other.log"))  # re-init closes the old handler
    text = logf.read_text()
    assert "debug(decode): hello 7" in text
    assert "info: plain" in text


def test_cli_bootstrap_mode(fixture_paths, tmp_path):
    """bootstrap mode: base_snapshot parquet → distributed partitioned
    lake, then apply mode ingests the change stream on top of it."""
    cfg = {
        "segments_dir": fixture_paths["segments_dir"],
        "output_dir": str(tmp_path / "out"),
        "lake_dir": str(tmp_path / "lake"),
        "base_snapshot": fixture_paths["base_lake"],
        "num_partitions": 4,
    }
    cfg_path = tmp_path / "config.json"
    cfg_path.write_text(json.dumps(cfg))
    r = _run_cli("bootstrap", str(cfg_path))
    assert r.returncode == 0, r.stderr[-2000:]
    assert "bootstrapped" in r.stdout
    assert len(glob.glob(os.path.join(cfg["lake_dir"], "part=*", "data.parquet"))) == 4
    r2 = _run_cli("apply", str(cfg_path))
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "partitions committed" in r2.stdout


def test_cli_bootstrap_requires_snapshot(tmp_path):
    cfg_path = tmp_path / "config.json"
    cfg_path.write_text(json.dumps({"segments_dir": str(tmp_path), "num_partitions": 2}))
    r = _run_cli("bootstrap", str(cfg_path))
    assert r.returncode != 0
    assert "base_snapshot" in (r.stderr + r.stdout)


def test_cli_apply_multi_delta_then_compact(fixture_paths, tmp_path):
    """apply-multi with the delta sink, then compact: both namespaces
    committed, delta files present, compaction folds them away."""
    import shutil

    work = tmp_path / "multi"
    work.mkdir()
    cfg = {
        "segments_dir": fixture_paths["segments_dir"],
        "output_dir": str(work / "out"),
        "lake_dir": str(work / "lake"),
        "num_partitions": 4,
        "sink": "delta",
        "tables": ["app.repos", "metrics.counters"],
    }
    cfg_path = work / "config.json"
    cfg_path.write_text(json.dumps(cfg))

    r = _run_cli("apply-multi", str(cfg_path))
    assert r.returncode == 0, r.stderr[-2000:]
    assert "(table, partition) commits" in r.stdout
    assert glob.glob(os.path.join(cfg["lake_dir"], "*", "part=*", "delta-*.parquet"))

    # compact mode operates per namespace dir
    for ns in ("app.repos", "metrics.counters"):
        ns_cfg = dict(cfg, lake_dir=os.path.join(cfg["lake_dir"], ns))
        ns_path = work / f"cfg_{ns}.json"
        ns_path.write_text(json.dumps(ns_cfg))
        r = _run_cli("compact", str(ns_path))
        assert r.returncode == 0, r.stderr[-2000:]
        assert "partitions folded" in r.stdout
    assert not glob.glob(os.path.join(cfg["lake_dir"], "*", "part=*", "delta-*.parquet"))


def test_config_rejects_bad_sink_and_tables(tmp_path):
    from myzql_binlog_connector_ray.config import ConfigError, JobConfig

    with pytest.raises(ConfigError, match="sink"):
        JobConfig.from_dict({"segments_dir": "x", "sink": "appendish"})
    with pytest.raises(ConfigError, match="schema.table"):
        JobConfig.from_dict({"segments_dir": "x", "tables": ["norepo"]})
    cfg = JobConfig.from_dict(
        {"segments_dir": "x", "sink": "delta", "tables": ["app.repos"]}
    )
    assert cfg.sink == "delta" and cfg.tables == ["app.repos"]


def test_cli_verify_mode(cli_env):
    """verify mode re-checks manifests; depends on apply having run."""
    r = _run_cli("verify", cli_env["cfg"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "partitions ok" in r.stdout


def test_cli_verify_multi_namespace_root(fixture_paths, tmp_path):
    """verify/compact on a MULTI-table lake root descend into the
    namespace subdirs instead of reporting a hollow 0/0 ok."""
    work = tmp_path / "vm"
    work.mkdir()
    cfg = {
        "segments_dir": fixture_paths["segments_dir"],
        "output_dir": str(work / "out"),
        "lake_dir": str(work / "lake"),
        "num_partitions": 4,
        "sink": "delta",
    }
    cfg_path = work / "config.json"
    cfg_path.write_text(json.dumps(cfg))
    r = _run_cli("apply-multi", str(cfg_path))
    assert r.returncode == 0, r.stderr[-2000:]

    r = _run_cli("compact", str(cfg_path))  # root-level: folds every namespace
    assert r.returncode == 0, r.stderr[-2000:]
    assert r.stdout.count("partitions folded") == 2
    assert not glob.glob(os.path.join(cfg["lake_dir"], "*", "part=*", "delta-*.parquet"))

    r = _run_cli("verify", str(cfg_path))
    assert r.returncode == 0, r.stderr[-2000:]
    assert r.stdout.count("partitions ok") == 2


def test_cli_stream_mode(ray_session, fixture_paths, tmp_path, monkeypatch):
    """stream mode: live tail + concurrent pipelined apply in one
    command — the resulting lake equals a batch run_ingest. Runs
    main() in-process (the replay server lives in this process);
    ray.shutdown is a no-op under the session fixture."""
    import ray

    from myzql_binlog_connector_ray.cli import main
    from myzql_binlog_connector_ray.pipelines.ingest import init_lake, run_ingest
    from replay_server import ReplayServer

    monkeypatch.setattr(ray, "shutdown", lambda: None)

    n_parts = 8
    base = pq.read_table(fixture_paths["base_lake"])
    ref_lake = str(tmp_path / "ref_lake")
    init_lake(base, ref_lake, n_parts)
    run_ingest(fixture_paths["segment_paths"], ref_lake, num_partitions=n_parts, concurrency=2)

    lake = str(tmp_path / "lake")
    init_lake(base, lake, n_parts)
    seg_out = tmp_path / "streamed_segments"
    with ReplayServer(fixture_paths["segments_dir"]) as srv:
        cfg = {
            "segments_dir": str(seg_out),
            "lake_dir": lake,
            "host": "127.0.0.1",
            "port": srv.port,
            "user": "repl",
            "password": "secret",
            "from_binlog_file": "binlog.000001",
            "num_partitions": n_parts,
            "sink": "delta",
        }
        cfg_path = tmp_path / "stream.json"
        cfg_path.write_text(json.dumps(cfg))
        assert main(["stream", str(cfg_path)]) == 0
    assert srv.errors == []

    import pandas as pd

    from myzql_binlog_connector_ray.pipelines.ingest import read_lake

    def _sorted(d):
        df = read_lake(d).to_pandas().sort_values(["repo", "path"]).reset_index(drop=True)
        return df.reindex(sorted(df.columns), axis=1)

    pd.testing.assert_frame_equal(_sorted(lake), _sorted(ref_lake))
