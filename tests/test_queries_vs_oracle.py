"""Driver-gate rehearsal: every queries() entry with an oracle_sql()
runs at sf0.001 and must match DuckDB row-for-row (order-insensitive,
columns aligned by name) — the same comparison CORRECTNESS_r{N}.json
records at sf0.01."""

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def _oracle(sf_dir: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con.sql(sql).df()


def _to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]) or pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        else:
            df[c] = df[c].astype("string")
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


SQL_CHECKED = [
    "lineitem_pricing_summary",
    "revenue_by_brand",
    "order_priority_revenue",
    "asof_last_event_per_order",
    "events_tumbling_window",
    "events_sessionize",
    "top_revenue_orders",
    "lake_upsert_lww",
    "changes_count_by_dml",
    "table_filter_app_only",
    "ordinal_range_waves12",
    "envelope_counters_inserts",
    "dedup_exact",
    "token_count_by_lang",
    "quality_stats_by_source",
    "lang_distribution",
    "ann_topk_bruteforce",
    "binary_payload_stats",
    # round 2: hash kernels respecified in md5+integer-polynomial
    # arithmetic so DuckDB recomputes them exactly
    "minhash_dup_candidates",
    # round 5: incremental dedup — wave probed against the base index
    "dedup_incremental_candidates",
    "dedup_incremental_verified",
    # round 5: deterministic seeded global shuffle -> (shard, pos)
    "training_shuffle_shards",
    # round 5: semantic base->final snapshot diff (partition-aligned)
    "lake_snapshot_diff",
    # round 5: SCD2 history table from the delta log (wave units)
    "lake_history_scd2",
    # round 5: version lineage (what superseded what, lag oracle)
    "lake_version_lineage",
    # round 5: one Lloyd step, integer-exact centroid means
    "embedding_kmeans_step",
    "minhash_dup_verified",
    "simhash_fingerprints",
    "language_id_predictions",
    "token_count_bpe_by_lang",
    "multimodal_decode_fake",
    "ann_topk_lsh",
    "embedding_near_dup_pairs",
    "doc_fingerprints",  # codepoint polynomial windows recomputed via list_transform
    "multimodal_decode",  # real BMP/WAV/y4m decode vs closed-form payload spec
    "corpus_curation_stats",  # composite: langid -> quality gate -> dedup -> stats
    "simhash_dup_pairs",  # banded Hamming LSH + popcount verify, bit-exact in SQL
    "events_order_value_range_join",  # binned interval join, inequality-only predicate
    "events_hopping_window",  # overlapping windows via vectorized fan-out
    "documents_hash_sample",  # deterministic md5 sampling, nested rates
    "events_value_percentiles",  # exact two-pass histogram quantiles
    "top_orders_per_priority",  # grouped top-k (windowed ranking)
    "top_tokens",  # distributed word count + global top-k
    "distinct_users_per_day",  # exact two-level COUNT(DISTINCT)
    # round 3: the last two rows-only queries gained oracles
    "ann_topk_ivf",  # one-pass IVF training spec recomputed closed-form
    # round 4: multi-table typed ingest (one decode pass, two lakes)
    "lake_upsert_lww_multi",
    "lake_counters_multi",
    # round 4: delta-sink three-wave ingest + fold-on-read
    "lake_upsert_lww_delta",
    # round 4: contiguous-greedy sequence packing (window-fn oracle)
    "sequence_packing_stats",
    # round 4: per-cluster survivor selection (associative argmax)
    "dedup_keep_best",
    # round 4: snapshot-vs-replayed-lake reconciliation drift set
    "lake_reconcile_diff",
    # round 4: temperature mixture reweighting (q ∝ p^alpha)
    "corpus_mixture_weights",
    "ingest_exactly_once",  # double-replay lake == single-replay lake SQL
    "dedup_clusters",  # connected components vs recursive-CTE fixpoint
    "lake_repo_stats_incremental",  # IVM view == closed-form final-lake stats
    "quality_gopher_by_lang",  # Gopher-style gates, every gate discriminating
    "documents_stratified_sample",  # per-language md5 rates from one pass
    "unigram_logprob_by_lang",  # CCNet-ish unigram LM quality scores
    "curated_export_summary",  # write-side curation: shards read back from disk
    "pii_redaction_stats",  # compiled-regex scrub, counts + redaction delta
    "benchmark_decontamination",  # n-gram overlap vs held-out benchmark set
    "intradoc_repetition_removal",  # keep-first paragraph dedup within docs
    "approx_distinct_users_hll",  # deterministic HLL sketch, bit-exact in SQL
    "events_user_running",  # row-window fns: running sum / row_number / lag
    "customers_without_events",  # distributed anti-join, co-partitioned is_in
    "tfidf_top_terms_by_lang",  # TF-IDF (rational IDF), grouped top-k
    "events_value_quantile_sketch",  # one-pass grouped histogram quantiles
    "event_transition_counts",  # per-user Markov bigram, vectorized shift
    "reservoir_sample_per_group",  # deterministic per-group k-sample
    "doc_chunking_stats",  # overlapping token windows, prefix-sum chars
    "embedding_centroids_by_label",  # vector mean, integer-exact combiner
    "lineitem_semijoin_bloom",  # bloom prefilter + exact co-partition semi
    "url_domain_stats",  # planted URLs, per-domain link/doc counts
    "lineitem_profile",  # one-pass per-column stats profile
    "events_value_percentiles_by_type",  # exact grouped two-pass quantiles
    "customer_event_counts",  # left-outer grouped count, zeros included
    "events_user_trailing_window",  # RANGE-frame trailing sum, peer-inclusive
    "token_counts_cms",  # count-min sketch, md5 buckets recomputed in SQL
]


@pytest.fixture(scope="module")
def entrymod(ray_session):
    import __ray_entry__ as m

    return m


@pytest.mark.parametrize("name", SQL_CHECKED)
def test_query_matches_oracle(entrymod, sf_dir, name):
    fn = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    got_raw = _to_pandas(fn(sf_dir))
    want_raw = _oracle(sf_dir, sql)
    # The driver hashes typed values, so an int64 column that leaks to
    # float64 on one side fails there even when values compare equal
    # (round-1 order_priority_revenue). Mirror that: dtype *kinds* must
    # match wherever neither side carries nulls (nulls legitimately
    # float-ify DuckDB's .df() output).
    for c in sorted(set(got_raw.columns) & set(want_raw.columns)):
        g, w = got_raw[c], want_raw[c]
        if not g.isna().any() and not w.isna().any():
            gk = "i" if pd.api.types.is_integer_dtype(g) else g.dtype.kind
            wk = "i" if pd.api.types.is_integer_dtype(w) else w.dtype.kind
            assert gk == wk, f"{name}.{c}: dtype kind {g.dtype} vs oracle {w.dtype}"
    got = _normalize(got_raw)
    want = _normalize(want_raw)
    assert list(got.columns) == list(want.columns), (list(got.columns), list(want.columns))
    assert len(got) == len(want), (len(got), len(want))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_every_oracle_key_has_query(entrymod):
    q = set(entrymod.queries().keys())
    o = set(entrymod.oracle_sql().keys())
    assert o <= q
    # round 3: EVERY query is oracled — no rows-only checks remain
    assert q == o


def test_entry_smoke(entrymod):
    import ray.data

    result = entrymod.entry()
    assert isinstance(result, (ray.data.Dataset, pd.DataFrame))
    df = _to_pandas(result)
    assert len(df) > 0
    assert "content_sha256" in df.columns
