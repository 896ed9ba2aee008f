"""Driver contract for the Ray-Data-native CDC ingest engine.

``entry()`` runs the flagship pipeline (binlog-segment decode → LWW
upsert apply) on sf0.001. ``queries()`` exposes one callable per
implemented operator/pipeline (SURVEY.md §2 + training-data extras);
``oracle_sql()`` gives the DuckDB-checkable subset. Ray is initialised
by the driver before this module is imported — nothing here calls
``ray.init``/``ray.shutdown``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from myzql_binlog_connector_ray import api


def entry() -> Any:
    """Flagship on sf0.001: segments → decode → LWW upsert → final lake."""
    return api.lake_upsert_lww("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        # CDC pipeline operators (reference parity + north rule)
        "lake_upsert_lww": api.lake_upsert_lww,
        "changes_count_by_dml": api.changes_count_by_dml,
        "table_filter_app_only": api.table_filter_app_only,
        "ordinal_range_waves12": api.ordinal_range_waves12,
        "envelope_counters_inserts": api.envelope_counters_inserts,
        "ingest_exactly_once": api.ingest_exactly_once,
        # training-data operators
        "dedup_exact": api.dedup_exact,
        "token_count_by_lang": api.token_count_by_lang,
        "quality_stats_by_source": api.quality_stats_by_source,
        "lang_distribution": api.lang_distribution,
        "ann_topk_bruteforce": api.ann_topk_bruteforce,
        "binary_payload_stats": api.binary_payload_stats,
        # relational operators (joins, windows, top-k)
        "lineitem_pricing_summary": api.lineitem_pricing_summary,
        "revenue_by_brand": api.revenue_by_brand,
        "order_priority_revenue": api.order_priority_revenue,
        "asof_last_event_per_order": api.asof_last_event_per_order,
        "events_tumbling_window": api.events_tumbling_window,
        "events_sessionize": api.events_sessionize,
        "top_revenue_orders": api.top_revenue_orders,
        # non-SQL-expressible (rows-only checks)
        "minhash_dup_candidates": api.minhash_dup_candidates,
        "simhash_fingerprints": api.simhash_fingerprints,
        "language_id_predictions": api.language_id_predictions,
        "doc_fingerprints": api.doc_fingerprints,
        "ann_topk_lsh": api.ann_topk_lsh,
        "multimodal_decode_fake": api.multimodal_decode_fake,
        "embedding_near_dup_pairs": api.embedding_near_dup_pairs,
        "minhash_dup_verified": api.minhash_dup_verified,
        "ann_topk_ivf": api.ann_topk_ivf,
        "token_count_bpe_by_lang": api.token_count_bpe_by_lang,
    }


# Shared CTE mapping documents → the derived repo-content key space
# (mirrors fixtures/change_stream.py generation rules 1:1).
_D = """
  SELECT doc_id, text, lang,
    CASE WHEN doc_id % 7 = 0 THEN 'org0/hotrepo'
         ELSE 'org' || (doc_id % 10) || '/repo' || (doc_id % 50) END AS repo,
    'src/f' || doc_id || '.' || lang AS path,
    CASE WHEN doc_id % 9 = 0 THEN 3 WHEN doc_id % 3 = 0 THEN 2 ELSE 1 END AS v
  FROM documents
"""


def oracle_sql() -> dict[str, str]:
    return {
        "lake_upsert_lww": f"""
            WITH d AS ({_D})
            SELECT repo, path,
                   md5(repo || ':' || path || ':v' || v) AS commit,
                   lang,
                   CASE WHEN v = 1 THEN text ELSE text || ' [v' || v || ']' END AS content,
                   CAST(CASE WHEN doc_id % 9 = 0 THEN doc_id % 1000 END AS BIGINT) AS stars,
                   sha256(CASE WHEN v = 1 THEN text ELSE text || ' [v' || v || ']' END) AS content_sha256
            FROM d
            WHERE doc_id % 5 <> 0
        """,
        "changes_count_by_dml": """
            WITH d AS (SELECT doc_id FROM documents)
            SELECT 'app' AS "database", 'repos' AS table_name, 'INSERT' AS dml_type,
                   (SELECT count(*) FROM d WHERE doc_id % 4 = 0) AS n
            UNION ALL
            SELECT 'app', 'repos', 'UPDATE',
                   (SELECT count(*) FROM d WHERE doc_id % 3 = 0) + (SELECT count(*) FROM d WHERE doc_id % 9 = 0)
            UNION ALL
            SELECT 'app', 'repos', 'DELETE',
                   (SELECT count(*) FROM d WHERE doc_id % 5 = 0)
            UNION ALL
            SELECT 'metrics', 'counters', 'INSERT',
                   (SELECT count(*) FROM d WHERE doc_id % 11 = 0)
        """,
        "table_filter_app_only": """
            WITH d AS (SELECT doc_id FROM documents)
            SELECT 'repos' AS table_name, 'INSERT' AS dml_type,
                   (SELECT count(*) FROM d WHERE doc_id % 4 = 0) AS n
            UNION ALL
            SELECT 'repos', 'UPDATE',
                   (SELECT count(*) FROM d WHERE doc_id % 3 = 0) + (SELECT count(*) FROM d WHERE doc_id % 9 = 0)
            UNION ALL
            SELECT 'repos', 'DELETE',
                   (SELECT count(*) FROM d WHERE doc_id % 5 = 0)
        """,
        "ordinal_range_waves12": """
            WITH d AS (SELECT doc_id FROM documents)
            SELECT 'INSERT' AS dml_type,
                   (SELECT count(*) FROM d WHERE doc_id % 4 = 0) + (SELECT count(*) FROM d WHERE doc_id % 11 = 0) AS n
            UNION ALL
            SELECT 'UPDATE', (SELECT count(*) FROM d WHERE doc_id % 3 = 0)
        """,
        "envelope_counters_inserts": """
            SELECT 'metrics' AS "database", 'counters' AS table_name,
                   '{"c0":' || doc_id || ',"c1":' || length(text) || '}' AS after_values
            FROM documents WHERE doc_id % 11 = 0
        """,
        "dedup_exact": """
            SELECT min(doc_id) AS doc_id FROM (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 1000000, text FROM documents
            ) GROUP BY text
        """,
        "token_count_by_lang": """
            SELECT lang,
                   CAST(sum(CASE WHEN trim(text) = '' THEN 0
                            ELSE length(regexp_split_to_array(trim(text), '\\s+')) END) AS BIGINT) AS total_tokens,
                   count(*) AS n_docs
            FROM documents GROUP BY lang
        """,
        "quality_stats_by_source": """
            SELECT source, count(*) AS n_docs,
                   CAST(sum(length(text)) AS BIGINT) AS total_chars,
                   CAST(sum(CASE WHEN trim(text) = '' THEN 0
                            ELSE length(regexp_split_to_array(trim(text), '\\s+')) END) AS BIGINT) AS total_tokens
            FROM documents GROUP BY source
        """,
        "lang_distribution": "SELECT lang, count(*) AS n FROM documents GROUP BY lang",
        "ann_topk_bruteforce": """
            WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings ORDER BY vec_id LIMIT 5),
            s AS (
              SELECT q.qid, e.vec_id AS nid, list_cosine_similarity(q.qe, e.embedding) AS sim
              FROM q CROSS JOIN embeddings e
              WHERE e.vec_id <> q.qid
            )
            SELECT qid, nid, rk FROM (
              SELECT qid, nid,
                     row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rk
              FROM s
            ) WHERE rk <= 10
        """,
        "binary_payload_stats": """
            SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
                        WHEN doc_id % 3 = 1 THEN 'audio'
                        ELSE 'video' END AS kind,
                   count(*) AS n,
                   CAST(sum(strlen(text)) AS BIGINT) AS total_bytes
            FROM documents GROUP BY 1
        """,
        "lineitem_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
                   CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS sum_base_cents,
                   CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS sum_disc_cents,
                   count(*) AS n
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "revenue_by_brand": """
            SELECT p_brand,
                   CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents,
                   count(*) AS n_items
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY p_brand
        """,
        "order_priority_revenue": """
            SELECT o_orderpriority,
                   CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents,
                   count(*) AS n_items
            FROM orders JOIN lineitem ON o_orderkey = l_orderkey
            GROUP BY o_orderpriority
        """,
        "asof_last_event_per_order": """
            SELECT o.o_orderkey, e.event_id
            FROM orders o ASOF LEFT JOIN events e
              ON o.o_custkey = e.user_id AND e.ts <= o.o_orderdate
        """,
        "events_tumbling_window": """
            SELECT user_id,
                   CAST((epoch_us(ts) // 1000000 // 3600) * 3600 AS BIGINT) AS window_start,
                   count(*) AS n_events,
                   CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS total_value
            FROM events GROUP BY user_id, window_start
        """,
        "events_sessionize": """
            WITH e AS (
              SELECT user_id, epoch_us(ts) // 1000000 AS sec,
                     lag(epoch_us(ts) // 1000000) OVER (PARTITION BY user_id ORDER BY ts) AS prev_sec
              FROM events
            ), s AS (
              SELECT user_id, sec,
                     sum(CASE WHEN prev_sec IS NULL OR sec - prev_sec > 1800 THEN 1 ELSE 0 END)
                       OVER (PARTITION BY user_id ORDER BY sec ROWS UNBOUNDED PRECEDING) AS sid
              FROM e
            )
            SELECT user_id,
                   CAST(min(sec) AS BIGINT) AS session_start,
                   CAST(max(sec) AS BIGINT) AS session_end,
                   count(*) AS n_events,
                   CAST(max(sec) - min(sec) AS BIGINT) AS duration_sec
            FROM s GROUP BY user_id, sid
        """,
        "top_revenue_orders": """
            SELECT CAST(row_number() OVER (ORDER BY revenue_cents DESC, o_orderkey) AS BIGINT) AS rk,
                   o_orderkey, revenue_cents
            FROM (
              SELECT l_orderkey AS o_orderkey,
                     CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
              FROM lineitem GROUP BY l_orderkey
            )
            QUALIFY rk <= 10
        """,
    }
