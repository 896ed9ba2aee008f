"""Query-level API: one function per operator/pipeline, each taking an
``sf_dir`` and returning a Dataset / DataFrame / Arrow table.

These are the entries exposed through ``__ray_entry__.queries()`` and
cross-checked against ``oracle_sql()`` by the driver at sf0.01. CDC
queries run over binlog segments synthesized deterministically from
``documents.parquet`` (fixtures.change_stream), so DuckDB can recompute
the same results closed-form. Ray is assumed to be initialised by the
caller.
"""

from __future__ import annotations

import os
import tempfile
from functools import partial

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data
from ray.data.aggregate import Count, Sum

from .fixtures.change_stream import WAVE, materialize
from .functions.ann import BruteForceTopK, LshBucketer, merge_topk
from .functions.dedup import (
    MinHasher,
    add_content_hash,
    add_simhash,
    band_bucket_pairs,
)
from .functions.multimodal import DecodeStub, payload_stats, text_to_media_batch
from .functions.text import LanguageId, QualityScorer, add_fingerprint, token_count_batch
from .pipelines.ingest import (
    FINAL_COLUMNS,
    apply_changes,
    decode_envelope,
    decode_typed,
    init_lake,
    read_segments,
)

WORK_DIR = os.environ.get("GRAFT_WORK_DIR", os.path.join(tempfile.gettempdir(), "graft_cdc_work"))


def _fixtures(sf_dir: str, replicate: int = 1, rows_per_event: int = 200, num_segments: int = 4) -> dict:
    os.makedirs(WORK_DIR, exist_ok=True)
    return materialize(sf_dir, WORK_DIR, num_segments=num_segments, rows_per_event=rows_per_event, replicate=replicate)


def _fresh_lake(fx: dict, num_partitions: int) -> str:
    """Hash-partitioned base lake for this fixture set (cached)."""
    lake_dir = os.path.join(fx["root"], f"base_lake_p{num_partitions}")
    done = os.path.join(lake_dir, "_LAKE_DONE")
    if not os.path.exists(done):
        init_lake(pq.read_table(fx["base_lake"]), lake_dir, num_partitions)
        with open(done, "w") as f:
            f.write("ok")
    return lake_dir


# --------------------------------------------------------------------------
# CDC queries (SURVEY.md §2 operators, SQL-checked)
# --------------------------------------------------------------------------


def lake_upsert_lww(sf_dir: str, *, num_partitions: int = 16, concurrency=None):
    """Flagship: decode segments → LWW upsert apply over the base lake."""
    fx = _fixtures(sf_dir)
    lake_dir = _fresh_lake(fx, num_partitions)
    changes = decode_typed(read_segments(fx["segment_paths"]), concurrency=concurrency)
    return apply_changes(
        changes, lake_dir=lake_dir, num_partitions=num_partitions, final_columns=FINAL_COLUMNS
    )


def changes_count_by_dml(sf_dir: str, *, concurrency=None):
    fx = _fixtures(sf_dir)
    ds = decode_envelope(read_segments(fx["segment_paths"]), concurrency=concurrency)
    return ds.groupby(["database", "table_name", "dml_type"]).aggregate(Count(alias_name="n"))


def table_filter_app_only(sf_dir: str, *, concurrency=None):
    """Include-filter ``app.*`` applied at TABLE_MAP time inside decode."""
    fx = _fixtures(sf_dir)
    ds = decode_envelope(read_segments(fx["segment_paths"]), include=["app.*"], concurrency=concurrency)
    return ds.groupby(["table_name", "dml_type"]).aggregate(Count(alias_name="n"))


def ordinal_range_waves12(sf_dir: str, *, concurrency=None):
    """Position-range predicate: stop at the wave-2/3 boundary."""
    fx = _fixtures(sf_dir)
    ds = decode_envelope(
        read_segments(fx["segment_paths"]), max_ordinal=3 * WAVE - 1, concurrency=concurrency
    )
    return ds.groupby("dml_type").aggregate(Count(alias_name="n"))


def envelope_counters_inserts(sf_dir: str, *, concurrency=None):
    """Envelope JSON row images for the metrics.counters table."""
    fx = _fixtures(sf_dir)
    ds = decode_envelope(
        read_segments(fx["segment_paths"]), include=["metrics.counters"], concurrency=concurrency
    )
    ds = ds.map_batches(
        lambda t: t.filter(pa.compute.equal(t["dml_type"], "INSERT")).select(
            ["database", "table_name", "after_values"]
        ),
        batch_format="pyarrow",
    )
    return ds


# --------------------------------------------------------------------------
# Training-data operators over documents / embeddings (SQL-checked)
# --------------------------------------------------------------------------


def _docs_ds(sf_dir: str, columns=None):
    return ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=columns)


def dedup_exact(sf_dir: str):
    """Exact dedup: documents ∪ (shifted copy) → hash-group → keep min id.

    The text column is dropped before the groupby so the shuffle ships
    only (hash, doc_id) pairs.
    """
    ds = _docs_ds(sf_dir, ["doc_id", "text"])
    dup = ds.map_batches(
        lambda t: t.set_column(0, "doc_id", pa.compute.add(t["doc_id"], 1_000_000)),
        batch_format="pyarrow",
    )
    from ray.data.aggregate import Min

    both = ds.union(dup)
    hashed = both.map_batches(add_content_hash, batch_format="pyarrow").select_columns(
        ["doc_id", "content_hash"]
    )
    kept = hashed.groupby("content_hash").aggregate(Min("doc_id", alias_name="doc_id"))
    return kept.select_columns(["doc_id"])


def token_count_by_lang(sf_dir: str):
    ds = _docs_ds(sf_dir, ["doc_id", "text", "lang"])
    ds = ds.map_batches(token_count_batch, batch_format="pyarrow")
    return ds.groupby("lang").aggregate(
        Sum("n_tokens", alias_name="total_tokens"), Count(alias_name="n_docs")
    )


def quality_stats_by_source(sf_dir: str, *, concurrency=(1, 2)):
    ds = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["text", "source"])
    ds = ds.map_batches(QualityScorer, batch_format="pyarrow", concurrency=concurrency)
    return ds.groupby("source").aggregate(
        Count(alias_name="n_docs"),
        Sum("q_chars", alias_name="total_chars"),
        Sum("q_tokens", alias_name="total_tokens"),
    )


def lang_distribution(sf_dir: str):
    return _docs_ds(sf_dir, ["lang"]).groupby("lang").aggregate(Count(alias_name="n"))


def _parquet_head(path: str, columns: list[str], n: int) -> pa.Table:
    """First ``n`` rows only — streams the leading pages of row group 0
    instead of loading the whole table on the driver (a driver OOM at
    100 TB). The embeddings table is written in vec_id order (all sf
    dirs), so the head IS the global ``ORDER BY vec_id LIMIT n``."""
    pf = pq.ParquetFile(path)
    batch = next(pf.iter_batches(batch_size=n, columns=columns))
    return pa.Table.from_batches([batch]).sort_by(columns[0])


def ann_topk_bruteforce(sf_dir: str, *, k: int = 10, num_queries: int = 5):
    """Brute-force cosine top-k: queries broadcast once via ray.put,
    per-batch float64 matmul partials, tiny driver-side merge."""
    path = os.path.join(sf_dir, "embeddings.parquet")
    head = _parquet_head(path, ["vec_id", "embedding"], num_queries)
    q = np.asarray(head["embedding"].to_pylist(), dtype=np.float64)
    qids = head["vec_id"].to_pylist()
    q_ref = ray.put(q)

    ds = ray.data.read_parquet(path, columns=["vec_id", "embedding"])
    partials = ds.map_batches(
        BruteForceTopK,
        fn_constructor_kwargs=dict(queries_ref=q_ref, query_ids=qids, k=k),
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 2),
    )
    merged = merge_topk(partials.to_pandas(), k=k)  # ≤ (k+1)·#blocks·nq rows
    merged = merged.rename(columns={"rank": "rk"})
    return merged


def binary_payload_stats(sf_dir: str):
    """Multimodal metadata pipeline: opaque payloads → per-kind size stats."""
    ds = _docs_ds(sf_dir, ["doc_id", "text"])
    media = ds.map_batches(text_to_media_batch, batch_format="pyarrow")
    stats = media.map_batches(payload_stats, batch_format="pyarrow")
    return stats.groupby("kind").aggregate(
        Count(alias_name="n"), Sum("payload_bytes", alias_name="total_bytes")
    )


# --------------------------------------------------------------------------
# Non-SQL-expressible operators (rows-only driver check)
# --------------------------------------------------------------------------


def minhash_dup_candidates(sf_dir: str, *, concurrency=(1, 2)):
    """MinHash-LSH near-dup candidates over documents ∪ near-identical copy."""
    ds = _docs_ds(sf_dir, ["doc_id", "text"])
    near = ds.map_batches(
        lambda t: pa.table(
            {
                "doc_id": pa.compute.add(t["doc_id"], 1_000_000),
                "text": pa.array([s + " tail" for s in t["text"].to_pylist()]),
            }
        ),
        batch_format="pyarrow",
    )
    both = ds.union(near)
    bands = both.map_batches(MinHasher, batch_format="pyarrow", concurrency=concurrency)
    pairs = bands.groupby(["band", "band_hash"]).map_groups(band_bucket_pairs, batch_format="pandas")
    out = pairs.to_pandas().drop_duplicates(["a", "b"]).sort_values(["a", "b"]).reset_index(drop=True)
    return out


def simhash_fingerprints(sf_dir: str):
    ds = _docs_ds(sf_dir, ["doc_id", "text"])
    return ds.map_batches(add_simhash, batch_format="pyarrow").select_columns(["doc_id", "simhash"])


def language_id_predictions(sf_dir: str, *, concurrency=(1, 2)):
    ds = _docs_ds(sf_dir, ["doc_id", "text", "lang"])
    ds = ds.map_batches(LanguageId, batch_format="pyarrow", concurrency=concurrency)
    return ds.select_columns(["doc_id", "lang", "lang_pred"])


def doc_fingerprints(sf_dir: str):
    ds = _docs_ds(sf_dir, ["doc_id", "text"])
    fp = ds.map_batches(add_fingerprint, batch_format="pyarrow")
    return fp.map_batches(
        lambda t: pa.table(
            {
                "doc_id": t["doc_id"],
                "n_fingerprints": pa.array([len(x) for x in t["fingerprint"].to_pylist()], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def ann_topk_lsh(sf_dir: str, *, k: int = 10, num_queries: int = 5, bits: int = 4):
    """LSH-bucketed ANN (scale path): search only the query's bucket."""
    path = os.path.join(sf_dir, "embeddings.parquet")
    head = _parquet_head(path, ["vec_id", "embedding"], num_queries)
    q = np.asarray(head["embedding"].to_pylist(), dtype=np.float64)
    qids = head["vec_id"].to_pylist()
    dim = q.shape[1]
    bucketer = LshBucketer(dim=dim, bits=bits)
    q_buckets = bucketer.bucket_of(q)

    ds = ray.data.read_parquet(path, columns=["vec_id", "embedding"])
    ds = ds.map_batches(
        LshBucketer, fn_constructor_kwargs=dict(dim=dim, bits=bits), batch_format="pyarrow", concurrency=(1, 2)
    )
    wanted = set(int(b) for b in q_buckets)
    ds = ds.map_batches(
        lambda t: t.filter(pa.compute.is_in(t["bucket"], value_set=pa.array(sorted(wanted), pa.int64()))),
        batch_format="pyarrow",
    )
    partials = ds.map_batches(
        BruteForceTopK,
        fn_constructor_kwargs=dict(queries_ref=ray.put(q), query_ids=qids, k=k),
        batch_format="pyarrow",
        concurrency=(1, 2),
    )
    merged = merge_topk(partials.to_pandas(), k=k).rename(columns={"rank": "rk"})
    return merged


def multimodal_decode_fake(sf_dir: str, *, concurrency=(1, 2)):
    """Media decode plumbing with the deterministic fake kernel."""
    ds = _docs_ds(sf_dir, ["doc_id", "text"])
    media = ds.map_batches(text_to_media_batch, batch_format="pyarrow")
    feats = media.map_batches(
        DecodeStub,
        fn_constructor_kwargs=dict(dim=16, fake=True),
        batch_format="pyarrow",
        batch_size=256,  # payload-width-aware batch sizing
        concurrency=concurrency,
    )
    return feats.map_batches(
        lambda t: pa.table(
            {
                "media_id": t["media_id"],
                "kind": t["kind"],
                "feat_dim": pa.array([len(x) for x in t["features"].to_pylist()], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def ingest_exactly_once(sf_dir: str, *, num_partitions: int = 16, concurrency=None):
    """Transactional ingest run twice; returns per-partition commit
    summaries of the second (fully skipped) run — exactly-once evidence."""
    import shutil

    from .pipelines.ingest import run_ingest

    fx = _fixtures(sf_dir)
    lake_dir = os.path.join(fx["root"], "lake_e1")
    if os.path.exists(lake_dir):
        shutil.rmtree(lake_dir)
    import glob

    src = _fresh_lake(fx, num_partitions)
    shutil.copytree(src, lake_dir)
    run_ingest(fx["segment_paths"], lake_dir, num_partitions=num_partitions, concurrency=concurrency)
    summaries = run_ingest(
        fx["segment_paths"], lake_dir, num_partitions=num_partitions, concurrency=concurrency
    )
    return pd.DataFrame(summaries).sort_values("part").reset_index(drop=True)


# --------------------------------------------------------------------------
# Relational operators (joins, windows) — SQL-checked
# --------------------------------------------------------------------------


def _cents(batch: pa.Table, src: str, dst: str, factor: str | None = None) -> pa.Table:
    """Exact integer cents from a 2-decimal double (float-sum-order-proof).

    Uses floor(x*100 + 0.5) so the per-row rounding is bit-identical to
    the DuckDB oracle expression (pyarrow's round() uses a different
    half-way rule than DuckDB's)."""
    import pyarrow.compute as pc

    v = batch[src]
    if factor is not None:
        v = pc.multiply(v, pc.subtract(pa.scalar(1.0), batch[factor]))
    cents = pc.cast(pc.floor(pc.add(pc.multiply(v, pa.scalar(100.0)), pa.scalar(0.5))), pa.int64())
    return batch.append_column(dst, cents)


def lineitem_pricing_summary(sf_dir: str):
    """TPC-H Q1-shaped pricing summary (cents-exact aggregates)."""
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )
    ds = ds.map_batches(
        lambda t: _cents(_cents(t, "l_extendedprice", "base_cents"), "l_extendedprice", "disc_cents", "l_discount"),
        batch_format="pyarrow",
    )
    ds = ds.map_batches(
        lambda t: t.append_column("qty", pa.compute.cast(t["l_quantity"], pa.int64())),
        batch_format="pyarrow",
    )
    return ds.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("qty", alias_name="sum_qty"),
        Sum("base_cents", alias_name="sum_base_cents"),
        Sum("disc_cents", alias_name="sum_disc_cents"),
        Count(alias_name="n"),
    )


def revenue_by_brand(sf_dir: str, *, concurrency=(1, 2)):
    """Broadcast join: part (small side, ray.put once) probed per batch."""
    from .functions.relational import BroadcastJoiner

    part_df = pq.read_table(
        os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_brand"]
    ).to_pandas().rename(columns={"p_partkey": "l_partkey"})
    ref = ray.put(part_df)

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_extendedprice", "l_discount"],
    )
    ds = ds.map_batches(
        lambda t: _cents(t, "l_extendedprice", "rev_cents", "l_discount"), batch_format="pyarrow"
    )
    joined = ds.map_batches(
        BroadcastJoiner,
        fn_constructor_kwargs=dict(small_ref=ref, on="l_partkey"),
        batch_format="pandas",
        concurrency=concurrency,
    )
    return joined.groupby("p_brand").aggregate(
        Sum("rev_cents", alias_name="revenue_cents"), Count(alias_name="n_items")
    )


def order_priority_revenue(sf_dir: str, *, num_buckets: int = 16):
    """Partitioned hash join (both sides large): orders ⋈ lineitem on
    orderkey via Ray Data's native hash join, then revenue by order
    priority. The join ships only pruned columns (key + priority on one
    side, key + pre-computed cents on the other) through the shuffle,
    and Arrow-native partitions preserve int64 exactly (round-1's
    null-padded-union variant leaked int64 → float64 through pandas)."""
    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_orderkey", "o_orderpriority"]
    )
    lineitem = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )
    lineitem = lineitem.map_batches(
        lambda t: _cents(t, "l_extendedprice", "rev_cents", "l_discount").select(
            ["l_orderkey", "rev_cents"]
        ),
        batch_format="pyarrow",
    )
    joined = orders.join(
        lineitem,
        join_type="inner",
        num_partitions=num_buckets,
        on=("o_orderkey",),
        right_on=("l_orderkey",),
    )
    return joined.groupby("o_orderpriority").aggregate(
        Sum("rev_cents", alias_name="revenue_cents"), Count(alias_name="n_items")
    )


def asof_last_event_per_order(sf_dir: str, *, num_buckets: int = 8):
    """As-of join: latest event (by ts ≤ o_orderdate) per order, matched
    on customer key. Bucket by key, merge_asof within buckets."""
    from .functions.relational import asof_join_group, tag_and_bucket

    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_orderkey", "o_custkey", "o_orderdate"]
    )
    events = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_id", "user_id", "ts"]
    )

    def prep_orders(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t2 = pa.table(
            {
                "k": pc.cast(t["o_custkey"], pa.int64()),
                "o_orderkey": t["o_orderkey"],
                "o_ts": pc.cast(t["o_orderdate"], pa.int64()),
                "event_id": pa.nulls(len(t), pa.int64()),
                "e_ts": pa.nulls(len(t), pa.int64()),
            }
        )
        return tag_and_bucket(t2, "l", "k", num_buckets)

    def prep_events(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t2 = pa.table(
            {
                "k": pc.cast(t["user_id"], pa.int64()),
                "o_orderkey": pa.nulls(len(t), pa.int64()),
                "o_ts": pa.nulls(len(t), pa.int64()),
                "event_id": t["event_id"],
                "e_ts": pc.cast(t["ts"], pa.int64()),
            }
        )
        return tag_and_bucket(t2, "r", "k", num_buckets)

    def asof_group(g: pd.DataFrame) -> pd.DataFrame:
        out = asof_join_group(g, key="k", left_time="o_ts", right_time="e_ts")
        if not len(out):
            return pd.DataFrame(
                {"o_orderkey": pd.Series(dtype="int64"), "event_id": pd.Series(dtype="Int64")}
            )
        # restore dtypes pandas coerced while materializing the padded
        # union (int64+null → float64); do it here so the returned
        # Dataset carries the final schema and the caller never collects.
        # A bucket with zero events drops the all-null event_id column
        # entirely — reinstate it as nulls (left join semantics).
        ev = out["event_id"] if "event_id" in out.columns else pd.Series(pd.NA, index=out.index)
        return pd.DataFrame(
            {
                "o_orderkey": out["o_orderkey"].astype("int64"),
                "event_id": ev.astype("Int64"),
            }
        )

    both = orders.map_batches(prep_orders, batch_format="pyarrow").union(
        events.map_batches(prep_events, batch_format="pyarrow")
    )
    return both.groupby("bucket").map_groups(asof_group, batch_format="pandas")


def events_tumbling_window(sf_dir: str, *, window_sec: int = 3600):
    """Per-user tumbling windows over the events stream (count + cents sum)."""
    from .functions.relational import tumbling_window_agg

    ds = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts", "value"])
    ds = ds.map_batches(lambda t: _cents(t, "value", "value_cents"), batch_format="pyarrow")
    return ds.groupby("user_id").map_groups(
        partial(tumbling_window_agg, time_col="ts", window_sec=window_sec, value_col="value_cents", key_col="user_id"),
        batch_format="pandas",
    )


def events_sessionize(sf_dir: str, *, gap_sec: int = 1800):
    """Per-user sessions (gap > gap_sec starts a new session)."""
    from .functions.relational import sessionize_group

    ds = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts"])
    return ds.groupby("user_id").map_groups(
        partial(sessionize_group, time_col="ts", gap_sec=gap_sec, key_col="user_id"),
        batch_format="pandas",
    )


def top_revenue_orders(sf_dir: str, *, k: int = 10):
    """Sort/top-k: pre-aggregate revenue per order, global top-k."""
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )
    ds = ds.map_batches(lambda t: _cents(t, "l_extendedprice", "rev_cents", "l_discount"), batch_format="pyarrow")
    per_order = ds.groupby("l_orderkey").aggregate(Sum("rev_cents", alias_name="revenue_cents"))
    # orderkey tiebreak keeps the top-k deterministic under revenue ties
    top = per_order.sort(["revenue_cents", "l_orderkey"], descending=[True, False]).limit(k).to_pandas()
    top = top.rename(columns={"l_orderkey": "o_orderkey"})
    top["rk"] = range(1, len(top) + 1)
    return top[["rk", "o_orderkey", "revenue_cents"]]


def embedding_near_dup_pairs(sf_dir: str, *, bits: int = 10, threshold: float = 0.95):
    """Embedding-cosine near-dup: LSH bucket → exact cosine verify within
    buckets (rows-only check; cosine pairs aren't SQL-stable)."""
    from .functions.ann import LshBucketer

    path = os.path.join(sf_dir, "embeddings.parquet")
    dim = len(_parquet_head(path, ["vec_id", "embedding"], 1)["embedding"][0].as_py())
    ds = ray.data.read_parquet(path, columns=["vec_id", "embedding"])
    ds = ds.map_batches(
        LshBucketer, fn_constructor_kwargs=dict(dim=dim, bits=bits), batch_format="pyarrow", concurrency=(1, 2)
    )

    def verify(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) < 2:
            return pd.DataFrame({"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64"), "cos": pd.Series(dtype="float64")})
        ids = group["vec_id"].to_numpy()
        mat = np.asarray(group["embedding"].tolist(), dtype=np.float64)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1
        mat = mat / norms
        sims = mat @ mat.T
        ii, jj = np.triu_indices(len(ids), k=1)
        mask = sims[ii, jj] >= threshold
        return pd.DataFrame({"a": ids[ii][mask], "b": ids[jj][mask], "cos": sims[ii, jj][mask]})

    pairs = ds.groupby("bucket").map_groups(verify, batch_format="pandas")
    out = pairs.to_pandas()
    if len(out):
        out = out.drop_duplicates(["a", "b"]).sort_values(["a", "b"]).reset_index(drop=True)
    else:
        # keep a stable schema even when no pair clears the threshold
        out = pd.DataFrame({"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64"), "cos": pd.Series(dtype="float64")})
    return out


def minhash_dup_verified(sf_dir: str, *, threshold: float = 0.5, concurrency=(1, 2)):
    """MinHash-LSH candidates verified with exact n-gram Jaccard.

    Candidate pairs come from the banded-LSH groupby; verification
    broadcasts the doc-id → text map (small at this sf; at scale the
    verify joins candidates back to texts with a bucket join instead).
    """
    from .functions.dedup import ngram_jaccard

    cands = minhash_dup_candidates(sf_dir, concurrency=concurrency)
    texts = pq.read_table(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])
    tmap = dict(zip(texts["doc_id"].to_pylist(), texts["text"].to_pylist()))

    def text_of(i: int) -> str:
        if i >= 1_000_000:
            return tmap[i - 1_000_000] + " tail"  # the synthetic near-dup copy
        return tmap[i]

    rows = []
    for a, b in cands[["a", "b"]].itertuples(index=False):
        j = ngram_jaccard(text_of(int(a)), text_of(int(b)))
        if j >= threshold:
            rows.append({"a": int(a), "b": int(b), "jaccard": round(j, 6)})
    out = pd.DataFrame(rows, columns=["a", "b", "jaccard"])
    return out.sort_values(["a", "b"]).reset_index(drop=True) if len(out) else out


def ann_topk_ivf(sf_dir: str, *, k: int = 10, num_queries: int = 5, n_lists: int = 8, nprobe: int = 3):
    """IVF ANN: cosine-k-means lists trained on a driver-side sample,
    centroids broadcast; queries probe nprobe lists only (rows-only)."""
    from .functions.ann import BruteForceTopK, IvfIndex

    path = os.path.join(sf_dir, "embeddings.parquet")
    train_head = _parquet_head(path, ["vec_id", "embedding"], 256)
    sample = np.asarray(train_head["embedding"].to_pylist(), dtype=np.float64)
    centroids = IvfIndex.train(sample, n_lists=n_lists)
    head = train_head.slice(0, num_queries)
    q = np.asarray(head["embedding"].to_pylist(), dtype=np.float64)
    qids = head["vec_id"].to_pylist()
    index = IvfIndex(centroids)
    probe_lists = set(int(l) for lists in index.probe(q, nprobe) for l in lists)

    ds = ray.data.read_parquet(path, columns=["vec_id", "embedding"])
    ds = ds.map_batches(
        IvfIndex, fn_constructor_kwargs=dict(centroids=ray.put(centroids)),
        batch_format="pyarrow", concurrency=(1, 2),
    )
    ds = ds.map_batches(
        lambda t: t.filter(pa.compute.is_in(t["ivf_list"], value_set=pa.array(sorted(probe_lists), pa.int64()))),
        batch_format="pyarrow",
    )
    partials = ds.map_batches(
        BruteForceTopK,
        fn_constructor_kwargs=dict(queries_ref=ray.put(q), query_ids=qids, k=k),
        batch_format="pyarrow",
        concurrency=(1, 2),
    )
    from .functions.ann import merge_topk

    return merge_topk(partials.to_pandas(), k=k).rename(columns={"rank": "rk"})


def token_count_bpe_by_lang(sf_dir: str, *, concurrency=(1, 2)):
    """BPE-ish token counts (GPT-2-style pre-tokenizer regex), per lang."""
    from .functions.text import BpeishTokenCounter

    ds = _docs_ds(sf_dir, ["text", "lang"])
    ds = ds.map_batches(BpeishTokenCounter, batch_format="pyarrow", concurrency=concurrency)
    return ds.groupby("lang").aggregate(
        Sum("n_bpe_tokens", alias_name="total_bpe_tokens"), Count(alias_name="n_docs")
    )
