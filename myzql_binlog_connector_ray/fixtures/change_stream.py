"""Deterministic repo-content lake + binlog change stream from `documents`.

The engine's input shape (BASELINE.json input_hint) is a Parquet table
of source-code repositories ``(repo, path, commit, lang, content)``.
This module derives that table — and a multi-wave DML change stream
over it — **deterministically** from the driver's ``documents.parquet``
so that DuckDB oracle SQL can recompute every result closed-form.

Generation rules (mirrored 1:1 in __ray_entry__.oracle_sql):

- ``repo``   = ``'org0/hotrepo'`` when ``doc_id % 7 == 0`` (hot-repo skew)
              else ``'org{doc_id%10}/repo{doc_id%50}'``
- ``path``   = ``'src/f{doc_id}.{lang}'``  (so ``(repo, path)`` is unique)
- ``commit`` = ``md5(repo + ':' + path + ':v' + version)``
- ``content``= v1: text, v2: text + ' [v2]', v3: text + ' [v3]'

Change waves (ordinal = wave * 10_000_000 + batch index; strictly
increasing, and each key appears at most once per wave, so per-key
order == wave order):

- base lake (pre-existing, not in the stream): docs with doc_id % 4 != 0, v1
- wave 1  INSERT: doc_id % 4 == 0 → v1
- wave 1b INSERT into metrics.counters: doc_id % 11 == 0 (table-filter fixture)
- wave 2  UPDATE: doc_id % 3 == 0 → v2
- wave 3  UPDATE: doc_id % 9 == 0 → v3, **with a new column** ``stars =
  doc_id % 1000`` (TABLE_MAP schema evolution: the repos table grows a
  6th column mid-stream)
- wave 4  DELETE: doc_id % 5 == 0

Final LWW state: all docs except doc_id % 5 == 0; content/commit at the
highest wave that touched the key; ``stars`` only for wave-3 keys.
"""

from __future__ import annotations

import hashlib
import os
from dataclasses import dataclass

import pyarrow as pa
import pyarrow.parquet as pq

from ..kernel import binlog_writer as bw

WAVE = 10_000_000
HOT_REPO = "org0/hotrepo"

REPOS_COLUMNS_V1 = ["repo", "path", "commit", "lang", "content"]
REPOS_COLUMNS_V2 = REPOS_COLUMNS_V1 + ["stars"]

REPOS_SPEC_V1 = bw.TableSpec(
    schema="app",
    table="repos",
    table_id=101,
    columns=[bw.c_varchar(200), bw.c_varchar(400), bw.c_varchar(64), bw.c_varchar(16), bw.c_varchar(60000)],
    column_names=REPOS_COLUMNS_V1,
)
REPOS_SPEC_V2 = bw.TableSpec(
    schema="app",
    table="repos",
    table_id=101,
    columns=REPOS_SPEC_V1.columns + [bw.c_long()],
    column_names=REPOS_COLUMNS_V2,
)
COUNTERS_SPEC = bw.TableSpec(
    schema="metrics",
    table="counters",
    table_id=202,
    columns=[bw.c_longlong(), bw.c_longlong()],
    column_names=["id", "val"],
)

#: registry used by the typed decode stage: (schema, table) → column names
SCHEMA_REGISTRY = {
    ("app", "repos"): REPOS_COLUMNS_V2,
    ("metrics", "counters"): ["id", "val"],
}


def repo_of(doc_id: int) -> str:
    if doc_id % 7 == 0:
        return HOT_REPO
    return f"org{doc_id % 10}/repo{doc_id % 50}"


def path_of(doc_id: int, lang: str) -> str:
    return f"src/f{doc_id}.{lang}"


def commit_of(repo: str, path: str, version: int) -> str:
    return hashlib.md5(f"{repo}:{path}:v{version}".encode()).hexdigest()


def content_of(text: str, version: int) -> str:
    return text if version == 1 else f"{text} [v{version}]"


def final_version(doc_id: int) -> int:
    if doc_id % 9 == 0:
        return 3
    if doc_id % 3 == 0:
        return 2
    return 1


@dataclass
class Doc:
    doc_id: int
    text: str
    lang: str


def load_docs(sf_dir: str, replicate: int = 1) -> list[Doc]:
    """Documents table → Doc list; ``replicate`` > 1 expands the key space
    deterministically (bench scale — correctness queries use 1):
    copy r gets doc_id + r*1_000_000 and content suffixed ``" r{r}"``."""
    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text", "lang"])
    docs = [Doc(*vals) for vals in zip(t["doc_id"].to_pylist(), t["text"].to_pylist(), t["lang"].to_pylist())]
    if replicate > 1:
        out = list(docs)
        for r in range(1, replicate):
            off = r * 1_000_000
            out.extend(Doc(d.doc_id + off, f"{d.text} r{r}", d.lang) for d in docs)
        return out
    return docs


def base_lake_table(docs: list[Doc]) -> pa.Table:
    """Pre-existing lake state (version 1 rows for doc_id % 4 != 0)."""
    rows = {c: [] for c in REPOS_COLUMNS_V1}
    for d in docs:
        if d.doc_id % 4 == 0:
            continue
        repo = repo_of(d.doc_id)
        path = path_of(d.doc_id, d.lang)
        rows["repo"].append(repo)
        rows["path"].append(path)
        rows["commit"].append(commit_of(repo, path, 1))
        rows["lang"].append(d.lang)
        rows["content"].append(content_of(d.text, 1))
    return pa.table(rows)


def _repo_row(d: Doc, version: int, with_stars: bool):
    repo = repo_of(d.doc_id)
    path = path_of(d.doc_id, d.lang)
    row = [repo, path, commit_of(repo, path, version), d.lang, content_of(d.text, version)]
    if with_stars:
        row.append(d.doc_id % 1000)
    return row


def build_transactions(docs: list[Doc], rows_per_event: int = 200) -> list[dict]:
    """Ordered transactions: [{ordinal, spec, dml, rows|pairs}].

    Multi-row events batch ``rows_per_event`` rows per transaction
    (the reference observes ~85 rows/event, BASELINE.md); each key
    appears at most once per wave so sharing one GTID per batch keeps
    per-key ordering exact.
    """
    txns: list[dict] = []

    def batches(items, wave, spec, dml):
        for bi in range(0, len(items), rows_per_event):
            txns.append(
                {
                    "ordinal": wave * WAVE + bi // rows_per_event,
                    "spec": spec,
                    "dml": dml,
                    "rows": items[bi : bi + rows_per_event],
                }
            )

    # wave 1: INSERT new repos rows + metrics.counters rows
    inserts = [_repo_row(d, 1, False) for d in docs if d.doc_id % 4 == 0]
    batches(inserts, 1, REPOS_SPEC_V1, "INSERT")
    counters = [[d.doc_id, len(d.text)] for d in docs if d.doc_id % 11 == 0]
    batches(counters, 1, COUNTERS_SPEC, "INSERT")
    # adjust counters ordinals to come after repos inserts within wave 1
    # (batches() restarts the index; shift by a disjoint sub-range)
    n_repo_batches = (len(inserts) + rows_per_event - 1) // rows_per_event
    for t in txns:
        if t["spec"] is COUNTERS_SPEC:
            t["ordinal"] += n_repo_batches

    # wave 2: UPDATE to v2 (before image = v1 state)
    updates2 = [(_repo_row(d, 1, False), _repo_row(d, 2, False)) for d in docs if d.doc_id % 3 == 0]
    batches(updates2, 2, REPOS_SPEC_V1, "UPDATE")

    # wave 3: UPDATE to v3 with the evolved 6-column schema
    updates3 = [
        (_repo_row(d, 2, True)[:5] + [None], _repo_row(d, 3, True)) for d in docs if d.doc_id % 9 == 0
    ]
    batches(updates3, 3, REPOS_SPEC_V2, "UPDATE")

    # wave 4: DELETE (before image = state at final pre-delete version)
    deletes = []
    for d in docs:
        if d.doc_id % 5 != 0:
            continue
        v = final_version(d.doc_id)
        if v == 3:
            deletes.append(_repo_row(d, 3, True))
        else:
            deletes.append(_repo_row(d, v, False) + [None])
    batches(deletes, 4, REPOS_SPEC_V2, "DELETE")

    txns.sort(key=lambda t: t["ordinal"])
    return txns


def _write_one_segment(args) -> str:
    si, chunk, out_dir = args
    w = bw.SegmentWriter(server_id=1, base_timestamp=1_700_000_000 + si)
    w.format_description()
    ddl_emitted = False
    for t in chunk:
        spec = t["spec"]
        if len(spec.columns) == len(REPOS_SPEC_V2.columns) and spec.table == "repos" and not ddl_emitted:
            # self-contained segments: each segment that uses the evolved
            # layout replays the DDL (as it replays FORMAT_DESCRIPTION
            # and TABLE_MAPs)
            w.query("app", "ALTER TABLE repos ADD COLUMN stars INT")
            ddl_emitted = True
        w.gtid(t["ordinal"])
        w.table_map(spec)
        if t["dml"] == "INSERT":
            w.write_rows(spec, t["rows"])
        elif t["dml"] == "UPDATE":
            w.update_rows(spec, t["rows"])
        else:
            w.delete_rows(spec, t["rows"])
    w.rotate(f"binlog.{si + 2:06d}")
    path = os.path.join(out_dir, f"binlog.{si + 1:06d}")
    with open(path, "wb") as f:
        f.write(w.getvalue())
    return path


def write_segments(
    docs: list[Doc],
    out_dir: str,
    num_segments: int = 4,
    rows_per_event: int = 200,
    workers: int | None = None,
) -> list[str]:
    """Write self-contained binlog segment files; returns paths.

    Transactions are chunked into ``num_segments`` contiguous ordinal
    ranges; each segment re-emits FORMAT_DESCRIPTION and the TABLE_MAP
    for every row event (MySQL's per-statement behavior), plus the DDL
    QUERY event ahead of the first evolved-schema transaction it
    carries. Segments encode in parallel worker processes (generation
    is the fixture bottleneck at bench scale).
    """
    os.makedirs(out_dir, exist_ok=True)
    txns = build_transactions(docs, rows_per_event)
    n = max(1, num_segments)
    per_seg = (len(txns) + n - 1) // n
    jobs = [(si, txns[si * per_seg : (si + 1) * per_seg], out_dir) for si in range(n)]

    if workers is None:
        workers = min(8, os.cpu_count() or 1, n)
    if workers <= 1 or n <= 1:
        return [_write_one_segment(j) for j in jobs]
    import multiprocessing as mp

    with mp.get_context("fork").Pool(workers) as pool:
        return pool.map(_write_one_segment, jobs)


def materialize(
    sf_dir: str,
    work_dir: str,
    num_segments: int = 4,
    rows_per_event: int = 200,
    replicate: int = 1,
) -> dict:
    """Build (and cache) base lake parquet + segments for one sf_dir.

    Cached under ``work_dir`` keyed by the sf_dir basename; safe to call
    repeatedly (used by __ray_entry__ queries and bench).
    """
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    root = os.path.join(work_dir, f"cdc_{tag}_s{num_segments}_r{rows_per_event}_x{replicate}")
    done = os.path.join(root, "_FIXTURE_DONE")
    seg_dir = os.path.join(root, "segments")
    base_path = os.path.join(root, "base_lake.parquet")
    if not os.path.exists(done):
        os.makedirs(seg_dir, exist_ok=True)
        docs = load_docs(sf_dir, replicate)
        pq.write_table(base_lake_table(docs), base_path)
        write_segments(docs, seg_dir, num_segments, rows_per_event)
        with open(done, "w") as f:
            f.write("ok")
    return {
        "root": root,
        "segments_dir": seg_dir,
        "base_lake": base_path,
        "segment_paths": sorted(
            os.path.join(seg_dir, p) for p in os.listdir(seg_dir) if p.startswith("binlog.")
        ),
    }
