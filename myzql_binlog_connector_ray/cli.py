"""CLI entry point — the reference's mode dispatch, file-based.

Modes (reference: src/main.zig:85-299):
- ``stdout``  : decode segments and print human-readable change rows
                (reference stdout mode);
- ``parquet`` : decode segments → 9-column envelope Parquet
                (reference parquet mode);
- ``apply``   : decode → LWW upsert into the Parquet lake with
                exactly-once manifests (north rule extension);
- ``tail``    : live MySQL replication tail (sources.mysql_wire) →
                segment files in segments_dir, ready for the other
                modes (reference socket mode, src/main.zig:85-299);
- ``stream``  : tail + concurrent pipelined apply in one command —
                each segment stages the moment it closes and applies
                as per-partition windows (pipelines.streaming);
                cfg.tables switches on multi-table replication.
- ``asof``    : time-travel read — the lake state AS OF --watermark,
                written as parquet to output_dir; with no --watermark
                lists the lake's valid snapshot boundaries;
- ``changelog``: CDC-out — the retained change rows with
                --lo < ordinal <= --hi from the delta history,
                written as parquet to output_dir.
- ``diff``    : semantic snapshot-to-snapshot diff — per-key net
                INSERT/UPDATE/DELETE between the states AS OF --lo
                and AS OF --hi (default head), churn folded away.
- ``history`` : SCD2 history table — every retained version's
                (valid_from, valid_to] ordinal interval straight
                from the delta log; open intervals are NULL.
- ``follow``  : live CDC-out — tail the lake's commit frontier from
                --lo, writing each complete (lo, hi] window as parquet
                to output_dir until --until or --timeout idle seconds.

Usage:
    python -m myzql_binlog_connector_ray.cli <mode> config.json [-v]

The CLI owns the Ray session (guarded init; nothing library-side calls
ray.init).
"""

from __future__ import annotations

import argparse
import os
import sys


def _segment_paths(cfg) -> list[str]:
    from .kernel.constants import segment_sort_key

    paths = sorted(
        (
            os.path.join(cfg.segments_dir, p)
            for p in os.listdir(cfg.segments_dir)
            if p.startswith("binlog.")
        ),
        key=segment_sort_key,
    )
    if not paths:
        raise SystemExit(f"no binlog.* segments in {cfg.segments_dir}")
    return paths


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="myzql-binlog-connector-ray")
    parser.add_argument(
        "mode",
        choices=[
            "stdout", "parquet", "apply", "apply-multi", "compact", "verify", "tail",
            "stream", "bootstrap", "asof", "changelog", "diff", "history", "follow",
        ],
    )
    parser.add_argument("config", help="path to job config JSON")
    parser.add_argument("-v", "--verbose", action="store_true", help="shorthand for --log-level debug")
    parser.add_argument(
        "--log-level",
        choices=["debug", "info", "warn", "err"],
        default="info",
        help="runtime log threshold (reference: src/log_config.zig:20-33)",
    )
    parser.add_argument(
        "--log-file",
        default=None,
        help="write plain-text logs to this file (truncated on open) instead of colored stderr",
    )
    parser.add_argument("--limit", type=int, default=50, help="stdout mode: max rows printed")
    parser.add_argument(
        "--resume",
        action="store_true",
        help="tail mode: continue after the last closed segment in segments_dir "
        "(re-tails a partial last segment from its start)",
    )
    parser.add_argument(
        "--watermark",
        type=int,
        default=None,
        help="asof mode: read the lake state AS OF this ordinal watermark "
        "(omit to list the lake's valid snapshot boundaries)",
    )
    parser.add_argument(
        "--lo",
        type=int,
        default=-1,
        help="changelog/diff mode: exclusive lower / from-snapshot ordinal bound (default -1 = from the start / the base)",
    )
    parser.add_argument(
        "--hi",
        type=int,
        default=None,
        help="changelog/diff mode: inclusive upper / to-snapshot ordinal bound (default: open-ended / head)",
    )
    parser.add_argument(
        "--retain-after",
        type=int,
        default=None,
        help="compact mode: retention horizon — fold only delta windows at or "
        "below this ordinal, keeping later ones live for time travel",
    )
    parser.add_argument(
        "--until",
        type=int,
        default=None,
        help="follow mode: stop once the cursor reaches this ordinal",
    )
    parser.add_argument(
        "--idle-timeout",
        type=float,
        default=10.0,
        help="follow mode: exit after this many seconds without frontier progress",
    )
    args = parser.parse_args(argv)

    from .logging_config import get_logger, init as init_logging, quiet_empty_partition_warnings

    init_logging("debug" if args.verbose else args.log_level, args.log_file)
    quiet_empty_partition_warnings()
    log = get_logger("cli")

    from .config import JobConfig

    cfg = JobConfig.load(args.config)

    if args.mode == "tail":
        from .sources.binlog_tail import tail_binlog_to_segments

        manifests = tail_binlog_to_segments(
            cfg.segments_dir,
            host=cfg.host or "127.0.0.1",
            port=cfg.port,
            user=cfg.user or "root",
            password=cfg.password or "",
            start_file=cfg.from_binlog_file or "binlog.000001",
            start_position=cfg.from_binlog_position,
            stop_file=cfg.to_binlog_file,
            stop_position=cfg.to_binlog_position,
            resume=args.resume,
        )
        for m in manifests:
            print(f"{m.segment}: {m.events} events, {m.bytes} bytes -> {m.path}")
        log.info("tailed %d segments into %s", len(manifests), cfg.segments_dir)
        return 0

    if args.mode == "stream":
        # live tail + concurrent pipelined apply in ONE command: the
        # tailer thread closes segments while a StreamingIngestor
        # stages each on close and applies per-partition windows
        # (pipelines.streaming). With cfg.tables set, every listed
        # table replicates into its own lake namespace. Bounded by
        # to_binlog_file/position if given, else runs to stream EOF.
        import threading
        import time as _time

        import ray

        from .kernel.constants import segment_sort_key
        from .pipelines.streaming import StreamingIngestor
        from .sources.binlog_tail import tail_binlog_to_segments

        if not ray.is_initialized():
            ray.init(
                address="local",
                include_dashboard=False,
                ignore_reinit_error=True,
                logging_level="INFO" if args.verbose else "ERROR",
            )
        try:
            lake = cfg.lake_dir or os.path.join(cfg.output_dir, "lake")
            os.makedirs(lake, exist_ok=True)
            tables = [tuple(t.split(".", 1)) for t in cfg.tables] if cfg.tables else None
            tail_err: list[BaseException] = []

            def _tail():
                try:
                    tail_binlog_to_segments(
                        cfg.segments_dir,
                        host=cfg.host or "127.0.0.1",
                        port=cfg.port,
                        user=cfg.user or "root",
                        password=cfg.password or "",
                        # None → SHOW MASTER STATUS auto-positioning
                        start_file=cfg.from_binlog_file,
                        start_position=cfg.from_binlog_position,
                        stop_file=cfg.to_binlog_file,
                        stop_position=cfg.to_binlog_position,
                        resume=args.resume,
                    )
                except BaseException as e:  # surfaced after the loop
                    tail_err.append(e)

            th = threading.Thread(target=_tail, daemon=True)
            th.start()
            ing = StreamingIngestor(
                lake, num_partitions=cfg.num_partitions, sink=cfg.sink, tables=tables
            )
            consumed: set[str] = set()

            def _closed() -> list[str]:
                if not os.path.isdir(cfg.segments_dir):
                    return []
                return sorted(
                    (f for f in os.listdir(cfg.segments_dir) if f.startswith("binlog.")),
                    key=segment_sort_key,
                )

            while True:
                new = [f for f in _closed() if f not in consumed]
                for f in new:
                    ing.submit(os.path.join(cfg.segments_dir, f))
                    consumed.add(f)
                ing.poll()
                if not new and not th.is_alive():
                    break
                _time.sleep(0.05)
            th.join()
            if tail_err:
                raise tail_err[0]
            summaries = ing.drain()
            committed = sum(1 for s in summaries if not s["skipped"])
            print(
                f"streamed {len(consumed)} segments into {lake}: "
                f"{committed}/{len(summaries)} partition commits"
            )
            log.info(
                "stream: %d segments, %d/%d commits", len(consumed), committed, len(summaries)
            )
        finally:
            ray.shutdown()
        return 0

    if args.mode == "bootstrap":
        # distributed snapshot load: base_snapshot parquet → partitioned lake
        if not cfg.base_snapshot:
            raise SystemExit("bootstrap mode needs base_snapshot in the config")
        import ray

        if not ray.is_initialized():
            ray.init(
                address="local",
                include_dashboard=False,
                ignore_reinit_error=True,
                logging_level="INFO" if args.verbose else "ERROR",
            )
        try:
            import ray.data

            from .pipelines.ingest import init_lake_distributed

            lake = cfg.lake_dir or os.path.join(cfg.output_dir, "lake")
            summaries = init_lake_distributed(
                ray.data.read_parquet(cfg.base_snapshot), lake, cfg.num_partitions
            )
            rows = sum(s["rows"] for s in summaries)
            print(f"bootstrapped {lake}: {len(summaries)} partitions, {rows} rows")
            log.info("bootstrap: %d rows into %d partitions", rows, len(summaries))
        finally:
            ray.shutdown()
        return 0

    if args.mode == "follow":
        # live CDC-out consumer: tail the commit frontier, write each
        # complete (lo, hi] window as parquet. Single lake (point
        # lake_dir at a namespace subdir for multi-table roots).
        import ray

        if not ray.is_initialized():
            ray.init(
                address="local",
                include_dashboard=False,
                ignore_reinit_error=True,
                logging_level="INFO" if args.verbose else "ERROR",
            )
        try:
            lake = cfg.lake_dir or os.path.join(cfg.output_dir, "lake")
            if not os.path.isdir(lake):
                raise SystemExit(f"lake directory does not exist: {lake}")
            if not any(d.startswith("part=") for d in os.listdir(lake)):
                raise SystemExit(
                    f"{lake} holds table namespaces, not partitions — point "
                    "lake_dir at one namespace subdir (e.g. app.repos)"
                )
            from .pipelines.ingest import follow_changelog

            import pyarrow.dataset as pads

            n_windows = 0
            try:
                for lo, hi, ds in follow_changelog(
                    lake, args.lo, until=args.until, timeout=args.idle_timeout
                ):
                    out = os.path.join(cfg.output_dir, f"changelog-{lo}-{hi}")
                    os.makedirs(out, exist_ok=True)
                    ds.write_parquet(out)
                    n = pads.dataset(out, format="parquet").count_rows()
                    n_windows += 1
                    print(f"window ({lo}, {hi}]: {n} rows -> {out}", flush=True)
                    log.info("follow: window (%d, %d] %d rows", lo, hi, n)
            except Exception as e:
                if "SnapshotUnavailable" in str(e) or "compacted_through" in str(e):
                    print(
                        "error: a compaction overran the follower cursor — the "
                        "window's history is below the compaction horizon",
                        file=sys.stderr,
                    )
                    log.error("follow below retention: %s", e)
                    return 2
                raise
            print(f"followed {n_windows} windows")
        finally:
            ray.shutdown()
        return 0

    if args.mode in ("asof", "changelog", "diff", "history"):
        # time-travel / CDC-out reads over an existing lake dir. These
        # operate on ONE partitioned lake (part=* dirs); for a
        # multi-table root, point lake_dir at the namespace subdir.
        import ray

        if not ray.is_initialized():
            ray.init(
                address="local",
                include_dashboard=False,
                ignore_reinit_error=True,
                logging_level="INFO" if args.verbose else "ERROR",
            )
        try:
            lake = cfg.lake_dir or os.path.join(cfg.output_dir, "lake")
            if not os.path.isdir(lake):
                raise SystemExit(f"lake directory does not exist: {lake}")
            from .pipelines.ingest import (
                TABLE_CONFIGS,
                lake_diff,
                lake_history,
                read_lake_asof,
                read_lake_changelog,
                snapshot_points,
                table_ns,
            )

            # a multi-table root holds namespace subdirs; the ordinal
            # watermark is the GLOBAL commit ordinal, so one watermark
            # over every namespace is a cross-table CONSISTENT snapshot
            if any(d.startswith("part=") for d in os.listdir(lake)):
                targets = [(None, lake)]
            else:
                targets = [
                    (d, os.path.join(lake, d))
                    for d in sorted(os.listdir(lake))
                    if os.path.isdir(os.path.join(lake, d)) and not d.startswith("_")
                ]
                if not targets:
                    raise SystemExit(f"no partitions or table namespaces under {lake}")

            if args.mode == "asof" and args.watermark is None:
                for ns, tgt in targets:
                    pts = snapshot_points(tgt)
                    print(f"snapshot boundaries for {tgt}: {len(pts)}")
                    for w in pts:
                        print(f"  watermark={w}")
                return 0

            cfg_by_ns = {table_ns(tt): c for tt, c in TABLE_CONFIGS.items()}
            hi_label = "head" if args.hi is None else args.hi
            suffix = {
                "asof": f"asof-{args.watermark}",
                "changelog": f"changelog-{args.lo}-{hi_label}",
                "diff": f"diff-{args.lo}-{hi_label}",
                "history": "history",
            }[args.mode]
            try:
                for ns, tgt in targets:
                    kw = {}
                    if ns is not None and args.mode in ("asof", "diff", "history"):
                        tc = cfg_by_ns.get(ns)
                        if tc is None:
                            raise SystemExit(
                                f"no TABLE_CONFIGS entry for namespace {ns} — "
                                f"cannot finalize its {args.mode} schema"
                            )
                        kw = dict(
                            key_cols=tc["keys"],
                            final_columns=tc["final_columns"],
                            final_types=tc["types"],
                        )
                    if args.mode == "asof":
                        ds = read_lake_asof(tgt, args.watermark, **kw)
                    elif args.mode == "diff":
                        # snapshot-to-snapshot semantic diff: --lo (from)
                        # and --hi (to, default head); output digest column
                        # is the sha lineage when the table keeps one
                        sha = (
                            "content_sha256"
                            if "content_sha256" in (kw.get("final_columns") or ["content_sha256"])
                            else "digest"
                        )
                        ds = lake_diff(
                            tgt,
                            args.lo,
                            10**15 if args.hi is None else args.hi,
                            sha_col=sha,
                            **kw,
                        )
                    elif args.mode == "history":
                        hkw = dict(key_cols=kw["key_cols"]) if kw else {}
                        if ns is not None:
                            tc = cfg_by_ns.get(ns) or {}
                            hkw["version_col"] = tc.get("version_col", "commit")
                        ds = lake_history(tgt, **hkw)
                    else:
                        # changelog rows are schema-agnostic (as committed)
                        ds = read_lake_changelog(tgt, lo=args.lo, hi=args.hi)
                    out = os.path.join(cfg.output_dir, suffix, ns or "")
                    os.makedirs(out, exist_ok=True)
                    # write once, count from the written files (no double execution)
                    ds.write_parquet(out)
                    import pyarrow.dataset as pads

                    n = pads.dataset(out, format="parquet").count_rows()
                    print(f"{args.mode} written to {out}: {n} rows")
                    log.info("%s: %d rows -> %s", args.mode, n, out)
            except Exception as e:  # surface retention errors cleanly
                if "SnapshotUnavailable" in str(e) or "compacted_through" in str(e):
                    print(f"error: {args.mode} window predates the compaction horizon", file=sys.stderr)
                    log.error("%s below retention: %s", args.mode, e)
                    return 2
                raise
        finally:
            ray.shutdown()
        return 0

    if args.mode in ("compact", "verify"):
        # lake-maintenance modes: operate on the lake dir, no segments needed
        import ray

        if not ray.is_initialized():
            ray.init(
                address="local",
                include_dashboard=False,
                ignore_reinit_error=True,
                logging_level="INFO" if args.verbose else "ERROR",
            )
        try:
            lake = cfg.lake_dir or os.path.join(cfg.output_dir, "lake")
            # a multi-table lake root holds namespace subdirs
            # (<schema>.<table>/part=...) instead of part= dirs directly —
            # operate on every namespace so "0/0 ok" can't mask one
            if not os.path.isdir(lake):
                raise SystemExit(f"lake directory does not exist: {lake}")
            targets = [lake]
            if not any(d.startswith("part=") for d in os.listdir(lake)):
                targets = [
                    os.path.join(lake, d)
                    for d in sorted(os.listdir(lake))
                    if os.path.isdir(os.path.join(lake, d)) and not d.startswith("_")
                ]
                if not targets:
                    raise SystemExit(f"no partitions or table namespaces under {lake}")
            failed = False
            any_unverifiable = False
            for tgt in targets:
                if args.mode == "compact":
                    from .pipelines.ingest import compact_lake

                    summaries = compact_lake(tgt, retain_after=args.retain_after)
                    compacted = sum(1 for s in summaries if not s["skipped"])
                    retained = sum(int(s.get("retained", 0)) for s in summaries)
                    print(
                        f"compacted {tgt}: {compacted}/{len(summaries)} partitions folded"
                        + (f", {retained} delta windows retained" if retained else "")
                    )
                    log.info("compact: %d/%d partitions", compacted, len(summaries))
                else:
                    from .pipelines.ingest import verify_lake

                    rows = verify_lake(tgt)
                    bad = [r for r in rows if not r["ok"]]
                    # delta-commit partitions carry no state digest yet
                    # (state_sha sealed at the next compaction) — count
                    # them separately so an all-delta lake can't read as
                    # a vacuous "all partitions ok"
                    unverifiable = [
                        r for r in rows if r["ok"] and r["detail"].startswith("unverifiable")
                    ]
                    for r in bad:
                        print(f"{tgt} part={r['part']}: {r['detail']}")
                    verified = len(rows) - len(bad) - len(unverifiable)
                    print(
                        f"verified {tgt}: {verified}/{len(rows)} partitions ok"
                        + (f", {len(unverifiable)} unverifiable (compact to seal)" if unverifiable else "")
                    )
                    failed = failed or bool(bad)
                    any_unverifiable = any_unverifiable or bool(unverifiable)
            if failed:
                return 1
            if args.mode == "verify" and any_unverifiable:
                # distinct exit code: nothing failed, but not every
                # partition was actually digest-checked
                return 3
        finally:
            ray.shutdown()
        return 0

    paths = _segment_paths(cfg)
    log.info("mode=%s segments=%d dir=%s", args.mode, len(paths), cfg.segments_dir)

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="INFO" if args.verbose else "ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = args.verbose

    from .pipelines.ingest import decode_envelope, read_segments, run_ingest

    range_kwargs = dict(
        include=cfg.include_tables or None,
        exclude=cfg.exclude_tables or None,
    )

    try:
        if args.mode == "stdout":
            ds = decode_envelope(read_segments(paths), concurrency=cfg.concurrency, **range_kwargs)
            for row in ds.limit(args.limit).take_all():
                print(
                    f"[{row['timestamp']}] {row['dml_type']} "
                    f"{row['database']}.{row['table_name']} pos={row['log_pos']} "
                    f"ordinal={row['ordinal']}"
                )
                if row["before_values"]:
                    print("  before:", row["before_values"])
                if row["after_values"]:
                    print("  after: ", row["after_values"])
        elif args.mode == "parquet":
            ds = decode_envelope(read_segments(paths), concurrency=cfg.concurrency, **range_kwargs)
            os.makedirs(cfg.output_dir, exist_ok=True)
            ds.write_parquet(cfg.output_dir)
            print(f"envelope written to {cfg.output_dir}")
        elif args.mode == "apply-multi":
            from .pipelines.ingest import TABLE_CONFIGS, run_ingest_multi

            lake = cfg.lake_dir or os.path.join(cfg.output_dir, "lake")
            os.makedirs(lake, exist_ok=True)
            tables = (
                [tuple(t.split(".", 1)) for t in cfg.tables]
                if cfg.tables
                else list(TABLE_CONFIGS)
            )
            unknown = [t for t in tables if t not in TABLE_CONFIGS]
            if unknown:
                raise SystemExit(f"tables not in TABLE_CONFIGS: {unknown}")
            summaries = run_ingest_multi(
                paths,
                lake,
                tables=tables,
                num_partitions=cfg.num_partitions,
                concurrency=cfg.concurrency,
                sink=cfg.sink,
            )
            committed = sum(1 for s in summaries if not s["skipped"])
            print(
                f"applied {len(tables)} tables into {lake}: "
                f"{committed}/{len(summaries)} (table, partition) commits"
            )
        else:  # apply
            lake = cfg.lake_dir or os.path.join(cfg.output_dir, "lake")
            os.makedirs(lake, exist_ok=True)
            summaries = run_ingest(
                paths,
                lake,
                num_partitions=cfg.num_partitions,
                concurrency=cfg.concurrency,
                sink=cfg.sink,
            )
            committed = sum(1 for s in summaries if not s["skipped"])
            if cfg.sink == "delta":
                # delta commits report rows=-1 (unknown until compaction)
                print(
                    f"applied into {lake}: {committed}/{len(summaries)} partitions "
                    "committed as deltas (run compact to materialize row counts)"
                )
            else:
                rows = sum(s["rows"] for s in summaries)
                print(
                    f"applied into {lake}: {committed}/{len(summaries)} partitions committed, {rows} rows"
                )
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
