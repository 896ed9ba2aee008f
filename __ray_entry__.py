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
from myzql_binlog_connector_ray.functions.text import BPEISH_PATTERN


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
        # multi-table typed ingest: one decode pass, per-table lakes
        "lake_upsert_lww_multi": api.lake_upsert_lww_multi,
        "lake_counters_multi": api.lake_counters_multi,
        # delta-sink ingest (three waves, no base rewrite) + fold-on-read
        "lake_upsert_lww_delta": api.lake_upsert_lww_delta,
        "lake_snapshot_asof": api.lake_snapshot_asof,
        "lake_changelog_tail": api.lake_changelog_tail,
        "lake_snapshot_diff": api.lake_snapshot_diff,
        "lake_history_scd2": api.lake_history_scd2,
        "lake_version_lineage": api.lake_version_lineage,
        "lake_changelog_follow": api.lake_changelog_follow,
        "lake_replicate_follow": api.lake_replicate_follow,
        # pipelined streaming ingest (round-5): stage-on-close raw
        # tasks, contiguous-prefix apply waves, final fold to base
        "lake_upsert_lww_streaming": api.lake_upsert_lww_streaming,
        # multi-table pipelined streaming: one stage-on-close decode
        # pass feeds BOTH tables' namespaced lakes live
        "lake_counters_multi_streaming": api.lake_counters_multi_streaming,
        # reconciliation: per-key drift between snapshot and replayed lake
        "lake_reconcile_diff": api.lake_reconcile_diff,
        # training-data operators
        "dedup_exact": api.dedup_exact,
        "token_count_by_lang": api.token_count_by_lang,
        "sequence_packing_stats": api.sequence_packing_stats,
        "training_shuffle_shards": api.training_shuffle_shards,
        "corpus_mixture_weights": api.corpus_mixture_weights,
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
        "dedup_incremental_candidates": api.dedup_incremental_candidates,
        "dedup_incremental_verified": api.dedup_incremental_verified,
        "simhash_fingerprints": api.simhash_fingerprints,
        "language_id_predictions": api.language_id_predictions,
        "doc_fingerprints": api.doc_fingerprints,
        "ann_topk_lsh": api.ann_topk_lsh,
        "multimodal_decode_fake": api.multimodal_decode_fake,
        "multimodal_decode": api.multimodal_decode,
        "embedding_near_dup_pairs": api.embedding_near_dup_pairs,
        "minhash_dup_verified": api.minhash_dup_verified,
        "ann_topk_ivf": api.ann_topk_ivf,
        "token_count_bpe_by_lang": api.token_count_bpe_by_lang,
        "corpus_curation_stats": api.corpus_curation_stats,
        "simhash_dup_pairs": api.simhash_dup_pairs,
        "events_order_value_range_join": api.events_order_value_range_join,
        "events_hopping_window": api.events_hopping_window,
        "documents_hash_sample": api.documents_hash_sample,
        "events_value_percentiles": api.events_value_percentiles,
        "top_orders_per_priority": api.top_orders_per_priority,
        "top_tokens": api.top_tokens,
        "distinct_users_per_day": api.distinct_users_per_day,
        "approx_distinct_users_hll": api.approx_distinct_users_hll,
        # round 3
        "lake_repo_stats_incremental": api.lake_repo_stats_incremental,
        "dedup_clusters": api.dedup_clusters,
        "dedup_keep_best": api.dedup_keep_best,
        "quality_gopher_by_lang": api.quality_gopher_by_lang,
        "documents_stratified_sample": api.documents_stratified_sample,
        "unigram_logprob_by_lang": api.unigram_logprob_by_lang,
        "curated_export_summary": api.curated_export_summary,
        "pii_redaction_stats": api.pii_redaction_stats,
        "benchmark_decontamination": api.benchmark_decontamination,
        "intradoc_repetition_removal": api.intradoc_repetition_removal,
        "events_user_running": api.events_user_running,
        "customers_without_events": api.customers_without_events,
        "tfidf_top_terms_by_lang": api.tfidf_top_terms_by_lang,
        "events_value_quantile_sketch": api.events_value_quantile_sketch,
        "event_transition_counts": api.event_transition_counts,
        "reservoir_sample_per_group": api.reservoir_sample_per_group,
        "doc_chunking_stats": api.doc_chunking_stats,
        "embedding_centroids_by_label": api.embedding_centroids_by_label,
        "embedding_kmeans_step": api.embedding_kmeans_step,
        "lineitem_semijoin_bloom": api.lineitem_semijoin_bloom,
        "url_domain_stats": api.url_domain_stats,
        "lineitem_profile": api.lineitem_profile,
        "events_value_percentiles_by_type": api.events_value_percentiles_by_type,
        "customer_event_counts": api.customer_event_counts,
        "events_user_trailing_window": api.events_user_trailing_window,
        "token_counts_cms": api.token_counts_cms,
    }


# --------------------------------------------------------------------------
# Oracle-SQL generators for the hash-based operators. The Python kernels
# (functions/dedup.py, functions/text.py) are specified in md5 + integer
# polynomial arithmetic precisely so DuckDB can recompute them exactly;
# the permutation/plane constants below are seed-derived, data-independent
# literals — part of the spec, embedded here so the SQL is self-contained.
# --------------------------------------------------------------------------


def _minhash_cte() -> str:
    """CTE chain reproducing functions/dedup.py's minhash-LSH end to end:
    corpus (documents ∪ ' tail' copies) → 31-bit md5 word hashes →
    polynomial 5-gram hashes → 128 permutation minima → 16 md5 band
    keys → candidate pairs. Assumes every doc has ≥5 words (fixture
    min is 10)."""
    from myzql_binlog_connector_ray.functions.dedup import M31, POW_B, minhash_params

    a, c = minhash_params(128)
    perms = ", ".join(f"({i},{int(a[i])},{int(c[i])})" for i in range(128))

    def wh(expr: str) -> str:
        return f"(CAST(('0x' || substr(md5({expr}),1,8)) AS BIGINT) & 2147483647)"

    terms = " + ".join(f"{wh(f'ws[i+{j}]')} * {int(POW_B[j])} % {M31}" for j in range(5))
    return f"""
  corpus AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 1000000, text || ' tail' FROM documents
  ),
  words AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws FROM corpus),
  gidx AS (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 4)) AS i FROM words),
  grams AS (
    SELECT doc_id, ({terms}) % {M31} AS gh FROM gidx
  ),
  mins AS (
    SELECT g.doc_id, p.pi, min((p.pa * g.gh + p.pb) % {M31}) AS mh
    FROM grams g CROSS JOIN (VALUES {perms}) p(pi, pa, pb)
    GROUP BY g.doc_id, p.pi
  ),
  bands AS (
    SELECT doc_id, pi // 8 AS band,
           CAST(('0x' || substr(md5(string_agg(CAST(mh AS VARCHAR), ',' ORDER BY pi)),1,15)) AS BIGINT) AS bh
    FROM mins GROUP BY doc_id, pi // 8
  ),
  cpairs AS (
    SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
    FROM bands x JOIN bands y ON x.band = y.band AND x.bh = y.bh AND x.doc_id < y.doc_id
  )"""


def _langid_scores() -> str:
    from myzql_binlog_connector_ray.functions.text import _LANG_PROFILES

    cols = []
    for lang in ("en", "es", "fr", "de"):
        lit = "[" + ", ".join(f"'{w}'" for w in sorted(_LANG_PROFILES[lang])) + "]"
        cols.append(
            f"len(list_intersect(list_distinct(regexp_split_to_array(lower(text), '\\s+')), {lit})) AS s_{lang}"
        )
    return ", ".join(cols)


def _lsh_bucket_expr(bits: int = 4, dim: int = 64, seed: int = 11) -> str:
    """Random-hyperplane bucket id as SQL; the plane matrix is the same
    RandomState(seed) draw LshBucketer makes (repr round-trips float64)."""
    import numpy as np

    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((bits, dim))
    cases = []
    for b in range(bits):
        lit = "[" + ", ".join(repr(float(x)) for x in planes[b]) + "]"
        cases.append(f"(CASE WHEN list_dot_product(embedding, {lit}) > 0 THEN {1 << b} ELSE 0 END)")
    return " + ".join(cases)


def _simhash_cte(source: str) -> str:
    """SimHasher's 60-bit fingerprint recomputed in SQL over ``source``
    (a table/CTE with doc_id, text) — shared by the fingerprint and
    near-dup-pairs oracles."""
    return f"""
      swords AS (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS w FROM {source}),
      swh AS (SELECT doc_id, CAST(('0x' || substr(md5(w),1,15)) AS BIGINT) AS h FROM swords),
      sbits AS (
        SELECT doc_id, b.bit,
               sum(CASE WHEN (h >> b.bit) & 1 = 1 THEN 1 ELSE -1 END) AS acc
        FROM swh CROSS JOIN (SELECT unnest(generate_series(0, 59)) AS bit) b
        GROUP BY doc_id, b.bit
      ),
      sh AS (
        SELECT doc_id,
               CAST(sum(CASE WHEN acc > 0 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT) AS simhash
        FROM sbits GROUP BY doc_id
      )
    """


def _langid_case() -> str:
    """The LanguageId heuristic as a SQL CASE (expects s_en..s_de and
    text in scope — pair with _langid_scores())."""
    return """CASE
                     WHEN length(text) > 0
                          AND length(regexp_replace(substr(text, 1, 200), '[^\u4e00-\u9fff]', '', 'g')) * 1.0
                              / greatest(1, least(length(text), 200)) > 0.2
                       THEN 'zh'
                     WHEN s_en = 0 AND s_es = 0 AND s_fr = 0 AND s_de = 0 THEN 'unknown'
                     WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_de THEN 'en'
                     WHEN s_es >= s_fr AND s_es >= s_de THEN 'es'
                     WHEN s_fr >= s_de THEN 'fr'
                     ELSE 'de'
                   END"""


def _fingerprint_cte() -> str:
    """Winnowing fingerprint recomputed in SQL — identical values to
    functions.text.rolling_fingerprint (shared FP_* spec constants)."""
    from myzql_binlog_connector_ray.functions.text import (
        FP_BASE,
        FP_KEEP_MOD,
        FP_MOD,
        FP_WINDOW,
    )

    terms = " + ".join(
        f"c[i+{j}]*{pow(FP_BASE, FP_WINDOW - 1 - j, FP_MOD)}" for j in range(FP_WINDOW)
    )
    return f"""
      cp AS (
        SELECT doc_id,
               list_transform(range(1, length(text)+1), i -> CAST(unicode(text[i]) AS BIGINT)) AS c,
               length(text) AS L
        FROM documents
      ),
      hs AS (
        SELECT doc_id, L, c,
               list_transform(range(1, L - {FP_WINDOW - 2}), i -> ({terms}) % {FP_MOD}) AS h
        FROM cp
      ),
      fp AS (
        SELECT doc_id,
          CASE
            WHEN L = 0 THEN [CAST(0 AS BIGINT)]
            WHEN L < {FP_WINDOW} THEN [list_reduce(c, (a, b) -> (a*{FP_BASE}+b) % {FP_MOD}) // 2]
            WHEN len(list_filter(h, x -> x % {FP_KEEP_MOD} = 0)) = 0 THEN [h[-1] // 2]
            ELSE list_transform(list_filter(h, x -> x % {FP_KEEP_MOD} = 0), x -> x // 2)
          END AS f
        FROM hs
      )
    """


def _gopher_sql() -> str:
    """quality_gopher_by_lang's gates recomputed in SQL: same tokenizer
    guard as the token-count oracles, occurrence-counting stopword
    filter, char-exact mean word length, distinct-token repetition gate."""
    from myzql_binlog_connector_ray.functions.text import _LANG_PROFILES

    stops = "[" + ", ".join(f"'{w}'" for w in sorted(_LANG_PROFILES["en"])) + "]"
    ws = "regexp_split_to_array(trim(text), '\\s+')"
    return f"""
        WITH f AS (
          SELECT lang,
            CASE WHEN trim(text) = '' THEN 0 ELSE len({ws}) END AS n_words,
            CASE WHEN trim(text) = '' THEN 0
                 ELSE list_sum(list_transform({ws}, x -> length(x))) END AS sum_len,
            CASE WHEN trim(text) = '' THEN 0
                 ELSE len(list_filter({ws}, x -> list_contains({stops}, x))) END AS n_stop,
            CASE WHEN trim(text) = '' THEN 0
                 ELSE len(list_distinct({ws})) END AS n_uniq
          FROM documents
        ), g AS (
          SELECT lang, n_words,
            sum_len * 1.0 / greatest(n_words, 1) AS mean_len,
            n_stop * 1.0 / greatest(n_words, 1) AS stop_ratio,
            n_uniq * 1.0 / greatest(n_words, 1) AS uniq_ratio
          FROM f
        )
        SELECT lang, count(*) AS n_docs,
          CAST(sum(CASE WHEN n_words BETWEEN 40 AND 100000 THEN 1 ELSE 0 END) AS BIGINT) AS n_ok_words,
          CAST(sum(CASE WHEN mean_len >= 3.0 AND mean_len <= 4.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_ok_mean_len,
          CAST(sum(CASE WHEN stop_ratio >= 0.06 THEN 1 ELSE 0 END) AS BIGINT) AS n_ok_stop_ratio,
          CAST(sum(CASE WHEN uniq_ratio >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_ok_uniq,
          CAST(sum(CASE WHEN n_words BETWEEN 40 AND 100000 AND mean_len >= 3.0
                        AND mean_len <= 4.5 AND stop_ratio >= 0.06 AND uniq_ratio >= 0.5
                   THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_all
        FROM g GROUP BY lang
    """


def _media_expected_cte() -> str:
    """Expected multimodal_decode output recomputed from media_id via
    the closed-form payload spec (functions.media_codec synth_payload):
    byte j of an image/video carries (j+id) % 251, audio sample j
    carries ((7j+id) % 4096) - 2048."""
    return """
      media AS (
        SELECT doc_id AS media_id,
               CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind
        FROM documents
      ),
      dims AS (
        SELECT media_id, kind,
          CASE kind WHEN 'image' THEN 8 + media_id % 24
                    WHEN 'video' THEN 8 + media_id % 16 ELSE 0 END AS width,
          CASE kind WHEN 'image' THEN 8 + (media_id // 3) % 24
                    WHEN 'video' THEN 8 + (media_id // 2) % 16 ELSE 0 END AS height,
          CASE kind WHEN 'image' THEN 1
                    WHEN 'video' THEN 2 + media_id % 4
                    ELSE 800 + media_id % 800 END AS n_frames
        FROM media
      ),
      expected AS (
        SELECT media_id, kind, width, height, n_frames,
          CASE kind WHEN 'image' THEN 0
                    WHEN 'audio' THEN n_frames // 8
                    ELSE n_frames * 40 END AS duration_ms,
          CASE kind
            WHEN 'audio' THEN
              list_sum(list_transform(range(0, n_frames), j -> (7*j + media_id) % 4096 - 2048))
            WHEN 'image' THEN
              list_sum(list_transform(range(0, 3 * width * height), j -> (j + media_id) % 251))
            ELSE
              list_sum(list_transform(range(0, n_frames * width * height), j -> (j + media_id) % 251))
          END AS checksum
        FROM dims
      )
    """


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


_LAKE_FINAL_SQL = f"""
    WITH d AS ({_D})
    SELECT repo, path,
           md5(repo || ':' || path || ':v' || v) AS commit,
           lang,
           CASE WHEN v = 1 THEN text ELSE text || ' [v' || v || ']' END AS content,
           CAST(CASE WHEN doc_id % 9 = 0 THEN doc_id % 1000 END AS BIGINT) AS stars,
           sha256(CASE WHEN v = 1 THEN text ELSE text || ' [v' || v || ']' END) AS content_sha256
    FROM d
    WHERE doc_id % 5 <> 0
"""


def _profile_sql() -> str:
    """lineitem_profile recomputed in DuckDB: one UNION ALL arm per
    column, mirroring api.lineitem_profile's type rules (strings →
    codepoint length, timestamps → epoch-µs, numerics → value)."""
    cols = {
        "l_orderkey": "l_orderkey",
        "l_partkey": "l_partkey",
        "l_suppkey": "l_suppkey",
        "l_linenumber": "l_linenumber",
        "l_quantity": "l_quantity",
        "l_extendedprice": "l_extendedprice",
        "l_discount": "l_discount",
        "l_tax": "l_tax",
        "l_returnflag": "length(l_returnflag)",
        "l_linestatus": "length(l_linestatus)",
        "l_shipdate": "epoch_us(l_shipdate)",
    }
    arms = [
        f"""SELECT '{name}' AS col, CAST(count(*) AS BIGINT) AS n,
                   CAST(count(*) - count({expr}) AS BIGINT) AS n_null,
                   CAST(min({expr}) AS DOUBLE) AS vmin,
                   CAST(max({expr}) AS DOUBLE) AS vmax
            FROM lineitem"""
        for name, expr in cols.items()
    ]
    return " UNION ALL ".join(arms)


def _url_domain_sql() -> str:
    """url_domain_stats recomputed in DuckDB: same planted corpus, same
    pattern (api.URL_PATTERN — group 1 is the domain). Assembled via
    token replacement like _pii_sql to avoid format-string mangling."""
    from myzql_binlog_connector_ray.api import URL_PATTERN

    sql = """
        WITH corpus AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + 4000000,
                 text || ' see https://site' || CAST(doc_id % 50 AS VARCHAR)
                      || '.example.org/p/' || CAST(doc_id AS VARCHAR)
                      || ' and http://cdn' || CAST(doc_id % 7 AS VARCHAR)
                      || '.example.net/img'
          FROM documents WHERE doc_id % 4 = 0
        ), hits AS (
          SELECT doc_id, unnest(regexp_extract_all(text, '@URL@', 1)) AS domain
          FROM corpus
        )
        SELECT domain,
               CAST(count(*) AS BIGINT) AS n_urls,
               CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
        FROM hits GROUP BY domain
    """
    return sql.replace("@URL@", URL_PATTERN)


def _pii_sql() -> str:
    """pii_redaction_stats recomputed in DuckDB: same planted corpus,
    same RE2-compatible patterns (api.PII_PATTERNS is the shared spec),
    same replacement order. Assembled via token replacement — the
    patterns contain both '{}' and '%', so f-strings / %-format would
    mangle them."""
    from myzql_binlog_connector_ray.api import PII_PATTERNS

    pats = {name: pat for name, pat, _ in PII_PATTERNS}
    sql = """
        WITH corpus AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + 3000000,
                 text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com ip 10.'
                      || CAST(doc_id % 256 AS VARCHAR) || '.0.1 tel +1 555-'
                      || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
          FROM documents WHERE doc_id % 5 = 0
        )
        SELECT doc_id,
               len(regexp_extract_all(text, '@EMAIL@')) AS n_email,
               len(regexp_extract_all(text, '@IP@')) AS n_ip,
               len(regexp_extract_all(text, '@PHONE@')) AS n_phone,
               length(text) - length(
                 regexp_replace(regexp_replace(regexp_replace(text,
                   '@EMAIL@', '[EMAIL]', 'g'),
                   '@IP@', '[IP]', 'g'),
                   '@PHONE@', '[PHONE]', 'g')) AS chars_removed
        FROM corpus
    """
    for name, pat in pats.items():
        sql = sql.replace(f"@{name.upper()}@", pat)
    return sql


def _decontam_sql(n: int = 8) -> str:
    """benchmark_decontamination recomputed closed-form: same benchmark
    split, same planted contaminated copies, same 60-bit md5 gram keys
    (the simhash word-hash encoding)."""
    gh = "CAST(('0x' || substr(md5(array_to_string(list_slice(ws, i, i + %d), ' ')), 1, 15)) AS BIGINT)" % (n - 1)
    return f"""
        WITH bench AS (SELECT doc_id, text FROM documents WHERE doc_id % 7 = 0),
        evalc AS (
          SELECT doc_id, text FROM documents WHERE doc_id % 7 <> 0
          UNION ALL
          SELECT doc_id + 2000000,
                 'zzz pad ' || array_to_string(
                     list_slice(regexp_split_to_array(trim(text), '\\s+'), 1, 10), ' ')
                 || ' qqq pad' AS text
          FROM documents WHERE doc_id % 14 = 0
        ),
        bw AS (SELECT regexp_split_to_array(trim(text), '\\s+') AS ws FROM bench),
        bgidx AS (SELECT ws, unnest(generate_series(1, len(ws) - {n - 1})) AS i FROM bw),
        bg AS (SELECT DISTINCT {gh} AS gh FROM bgidx),
        ew AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws FROM evalc),
        egidx AS (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - {n - 1})) AS i FROM ew),
        eg AS (SELECT DISTINCT doc_id, {gh} AS gh FROM egidx),
        hits AS (SELECT eg.doc_id, count(*) AS nh FROM eg JOIN bg USING (gh) GROUP BY eg.doc_id)
        SELECT c.doc_id,
               coalesce(h.nh, 0) AS n_contaminated_grams,
               coalesce(h.nh, 0) > 0 AS contaminated
        FROM evalc c LEFT JOIN hits h ON c.doc_id = h.doc_id
    """


def _intradoc_sql(para_words: int = 15) -> str:
    """intradoc_repetition_removal recomputed closed-form: same 15-word
    chunking, same planted first-paragraph repeat for doc_id % 3 == 0,
    keep-first semantics via min(k). Assumes nonempty docs (fixture min
    is 10 words; regexp_split_to_array('') diverges from ''.split())."""
    p = para_words
    return f"""
        WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws FROM documents),
        base AS (
          SELECT doc_id, k, array_to_string(list_slice(ws, {p}*k + 1, {p}*k + {p}), ' ') AS para
          FROM (SELECT doc_id, ws, unnest(generate_series(0, (len(ws)-1)//{p})) AS k FROM w)
        ),
        planted AS (
          SELECT doc_id, (len(ws)-1)//{p} + 1 AS k,
                 array_to_string(list_slice(ws, 1, {p}), ' ') AS para
          FROM w WHERE doc_id % 3 = 0
        ),
        paras AS (SELECT * FROM base UNION ALL SELECT * FROM planted),
        firsts AS (SELECT doc_id, para, min(k) AS k0 FROM paras GROUP BY doc_id, para),
        agg AS (
          SELECT doc_id, count(*) AS n_paras,
                 CAST(sum(length(para)) AS BIGINT) AS sum_chars
          FROM paras GROUP BY doc_id
        ),
        uagg AS (
          SELECT doc_id, count(*) AS n_unique_paras,
                 CAST(sum(length(para)) AS BIGINT) AS u_chars
          FROM firsts GROUP BY doc_id
        )
        SELECT a.doc_id, a.n_paras, u.n_unique_paras,
               a.sum_chars + (a.n_paras - 1) AS chars_before,
               u.u_chars + (u.n_unique_paras - 1) AS chars_after
        FROM agg a JOIN uagg u USING (doc_id)
    """


def oracle_sql() -> dict[str, str]:
    return {
        "pii_redaction_stats": _pii_sql(),
        "benchmark_decontamination": _decontam_sql(),
        "intradoc_repetition_removal": _intradoc_sql(),
        "lake_upsert_lww": _LAKE_FINAL_SQL,
        # exactly-once: the double-replay lake must equal the
        # single-replay final state, value-for-value
        "ingest_exactly_once": _LAKE_FINAL_SQL,
        # multi-table ingest: the repos namespace out of the one-pass
        # two-table replay must equal the single-table flagship state,
        # and the counters namespace must equal its closed-form insert
        # set — wrong routing/lost tables/watermark bleed all fail
        "lake_upsert_lww_multi": _LAKE_FINAL_SQL,
        # delta sink: three appended waves folded on read must equal the
        # rewrite sink's final state exactly (associative LWW fold)
        "lake_upsert_lww_delta": _LAKE_FINAL_SQL,
        # CDC replication: source → frontier follower → replica; the
        # replica's final state must equal the flagship closed form
        "lake_replicate_follow": _LAKE_FINAL_SQL,
        # time travel: state AS OF the wave-2 boundary — v2 for %3 keys,
        # v1 otherwise, no deletes yet, stars not yet added (all-null)
        "lake_snapshot_asof": f"""
            WITH d AS ({_D}),
            s AS (
              SELECT doc_id, text, lang, repo, path,
                     CASE WHEN doc_id % 3 = 0 THEN 2 ELSE 1 END AS v
              FROM d
            )
            SELECT repo, path,
                   md5(repo || ':' || path || ':v' || v) AS commit,
                   lang,
                   CASE WHEN v = 1 THEN text ELSE text || ' [v' || v || ']' END AS content,
                   CAST(NULL AS BIGINT) AS stars,
                   sha256(CASE WHEN v = 1 THEN text ELSE text || ' [v' || v || ']' END) AS content_sha256
            FROM s
        """,
        # CDC-out after the wave-2 boundary: wave-3 updates + wave-4
        # deletes, one row per retained change (keys in both waves
        # appear twice — the window-aligned history keeps both)
        "lake_changelog_tail": f"""
            WITH d AS ({_D})
            SELECT repo, path, 'UPDATE' AS dml FROM d WHERE doc_id % 9 = 0
            UNION ALL
            SELECT repo, path, 'DELETE' AS dml FROM d WHERE doc_id % 5 = 0
        """,
        # semantic base→final diff: net change per key — %4 inserts
        # that survive the %5 deletes, %3 content updates, %5 deletes
        # of pre-existing (%4<>0) keys; insert-then-delete keys and
        # unchanged keys emit nothing
        "lake_snapshot_diff": f"""
            WITH d AS ({_D})
            SELECT repo, path, 'INSERT' AS change,
                   sha256(CASE WHEN v = 1 THEN text ELSE text || ' [v' || v || ']' END) AS content_sha256
            FROM d WHERE doc_id % 4 = 0 AND doc_id % 5 <> 0
            UNION ALL
            SELECT repo, path, 'UPDATE' AS change,
                   sha256(CASE WHEN v = 1 THEN text ELSE text || ' [v' || v || ']' END) AS content_sha256
            FROM d WHERE doc_id % 4 <> 0 AND doc_id % 5 <> 0 AND doc_id % 3 = 0
            UNION ALL
            SELECT repo, path, 'DELETE' AS change, CAST(NULL AS VARCHAR) AS content_sha256
            FROM d WHERE doc_id % 4 <> 0 AND doc_id % 5 = 0
        """,
        # SCD2 history: every RETAINED version's validity interval in
        # wave units — base v1 opens at 0, %4 inserts at 1, %3 updates
        # open v2 at 2, %9 open v3 at 3, %5 deletes close the last
        # version at 4; open intervals are NULL. Waves 1+2 share one
        # commit window, so a key both inserted (%4) and updated (%3)
        # there keeps only the v2 generation (per-window LWW — the same
        # collapse lake_changelog_follow pins). lead() recomputes the
        # chain.
        "lake_history_scd2": f"""
            WITH d AS ({_D}),
            vers AS (
              SELECT repo, path, 1 AS ver,
                     CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 0 END AS w, doc_id
              FROM d
              WHERE doc_id % 4 <> 0 OR doc_id % 3 <> 0
              UNION ALL
              SELECT repo, path, 2, 2, doc_id FROM d WHERE doc_id % 3 = 0
              UNION ALL
              SELECT repo, path, 3, 3, doc_id FROM d WHERE doc_id % 9 = 0
            ),
            ends AS (
              SELECT repo, path, ver, w, doc_id,
                     lead(w) OVER (PARTITION BY repo, path ORDER BY w) AS nxt
              FROM vers
            )
            SELECT repo, path,
                   md5(repo || ':' || path || ':v' || ver) AS commit,
                   CAST(w AS BIGINT) AS valid_from_wave,
                   CAST(COALESCE(nxt, CASE WHEN doc_id % 5 = 0 THEN 4 END) AS BIGINT) AS valid_to_wave
            FROM ends
        """,
        # version lineage: what each retained version superseded and
        # that predecessor's lifetime in waves (lag over the same
        # collapsed chains as lake_history_scd2; first generations NULL)
        "lake_version_lineage": f"""
            WITH d AS ({_D}),
            vers AS (
              SELECT repo, path, 1 AS ver,
                     CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 0 END AS w
              FROM d
              WHERE doc_id % 4 <> 0 OR doc_id % 3 <> 0
              UNION ALL
              SELECT repo, path, 2, 2 FROM d WHERE doc_id % 3 = 0
              UNION ALL
              SELECT repo, path, 3, 3 FROM d WHERE doc_id % 9 = 0
            ),
            chain AS (
              SELECT repo, path, ver, w,
                     lag(ver) OVER (PARTITION BY repo, path ORDER BY w) AS pver,
                     lag(w) OVER (PARTITION BY repo, path ORDER BY w) AS pw
              FROM vers
            )
            SELECT repo, path,
                   md5(repo || ':' || path || ':v' || ver) AS commit,
                   CASE WHEN pver IS NULL THEN NULL
                        ELSE md5(repo || ':' || path || ':v' || pver) END AS prev_commit,
                   CAST(w - pw AS BIGINT) AS prev_lifetime_waves
            FROM chain
        """,
        # CDC-out follower: one window per published commit frontier.
        # Window 1 spans waves 1+2 (one ingest pass), so the per-window
        # LWW reduce keeps only the LAST change for keys hit by both
        # (insert %4 then update %3 → the UPDATE survives for %12 keys)
        "lake_changelog_follow": f"""
            WITH d AS ({_D})
            SELECT repo, path, 'INSERT' AS dml, CAST(1 AS BIGINT) AS window_no
            FROM d WHERE doc_id % 4 = 0 AND doc_id % 12 <> 0
            UNION ALL
            SELECT repo, path, 'UPDATE' AS dml, CAST(1 AS BIGINT) AS window_no
            FROM d WHERE doc_id % 3 = 0
            UNION ALL
            SELECT repo, path, 'UPDATE' AS dml, CAST(2 AS BIGINT) AS window_no
            FROM d WHERE doc_id % 9 = 0
            UNION ALL
            SELECT repo, path, 'DELETE' AS dml, CAST(3 AS BIGINT) AS window_no
            FROM d WHERE doc_id % 5 = 0
        """,
        # streaming ingest: the incrementally-streamed lake must equal
        # the batch flagship's final state, value-for-value
        "lake_upsert_lww_streaming": _LAKE_FINAL_SQL,
        # multi-table streaming: the side table's live-streamed final
        # state must equal the batch multi-ingest oracle
        "lake_counters_multi_streaming": """
            SELECT CAST(doc_id AS BIGINT) AS id,
                   CAST(length(text) AS BIGINT) AS val
            FROM documents WHERE doc_id % 11 = 0
        """,
        # reconciliation diff: snapshot (v1, doc_id%4<>0) vs replayed
        # final state (doc_id%5<>0 at final version) — drift set only
        "lake_reconcile_diff": f"""
            WITH d AS ({_D}),
            base AS (SELECT repo, path, text AS content FROM d WHERE doc_id % 4 <> 0),
            fin AS (
              SELECT repo, path,
                     CASE WHEN v = 1 THEN text ELSE text || ' [v' || v || ']' END AS content
              FROM d WHERE doc_id % 5 <> 0
            )
            SELECT CASE WHEN b.repo IS NULL THEN 'added'
                        WHEN f.repo IS NULL THEN 'removed'
                        ELSE 'changed' END AS status,
                   coalesce(b.repo, f.repo) AS repo,
                   coalesce(b.path, f.path) AS path
            FROM base b FULL OUTER JOIN fin f ON b.repo = f.repo AND b.path = f.path
            WHERE b.repo IS NULL OR f.repo IS NULL OR b.content <> f.content
        """,
        "lake_counters_multi": """
            SELECT CAST(doc_id AS BIGINT) AS id,
                   CAST(length(text) AS BIGINT) AS val
            FROM documents WHERE doc_id % 11 = 0
        """,
        # IVM: the incrementally maintained per-repo view must equal
        # stats recomputed closed-form over the expected FINAL lake
        "lake_repo_stats_incremental": f"""
            WITH d AS ({_D})
            SELECT repo,
                   count(*) AS n_files,
                   CAST(sum(length(CASE WHEN v = 1 THEN text
                                        ELSE text || ' [v' || v || ']' END)) AS BIGINT) AS content_chars
            FROM d
            WHERE doc_id % 5 <> 0
            GROUP BY repo
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
        # temperature mixture: q ∝ p^alpha over per-lang token shares
        "corpus_mixture_weights": """
            WITH t AS (
              SELECT lang,
                     count(*) AS n_docs,
                     CAST(sum(CASE WHEN trim(text) = '' THEN 0
                              ELSE length(regexp_split_to_array(trim(text), '\\s+')) END) AS BIGINT) AS total_tokens
              FROM documents GROUP BY lang
            ), s AS (
              SELECT lang, n_docs, total_tokens,
                     total_tokens / CAST(sum(total_tokens) OVER () AS DOUBLE) AS p
              FROM t
            ), w AS (
              SELECT lang, n_docs, total_tokens, p,
                     pow(p, 0.3) / sum(pow(p, 0.3)) OVER () AS q
              FROM s
            )
            SELECT lang, n_docs, total_tokens,
                   round(p, 6) AS p, round(q, 6) AS q, round(q / p, 6) AS boost
            FROM w
        """,
        # sequence packing: contiguous-greedy per lang in doc_id order;
        # a doc belongs to the sequence where its prefix starts
        # deterministic seeded global shuffle: md5(seed:doc_id) key,
        # shard = key mod N, pos = rank within shard by (key, doc_id)
        "training_shuffle_shards": """
            WITH keys AS (
              SELECT doc_id,
                     CAST(('0x' || substr(md5('17:' || CAST(doc_id AS VARCHAR)),1,12)) AS BIGINT) AS k
              FROM documents
            )
            SELECT doc_id,
                   CAST(k % 16 AS BIGINT) AS shard,
                   CAST(row_number() OVER (PARTITION BY k % 16 ORDER BY k, doc_id) - 1 AS BIGINT) AS pos
            FROM keys
        """,
        "sequence_packing_stats": """
            WITH t AS (
              SELECT lang, doc_id,
                     CASE WHEN trim(text) = '' THEN 0
                          ELSE length(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens
              FROM documents
            ), c AS (
              SELECT lang, n_tokens,
                     SUM(n_tokens) OVER (
                       PARTITION BY lang ORDER BY doc_id
                       ROWS UNBOUNDED PRECEDING
                     ) - n_tokens AS prefix
              FROM t
            )
            SELECT lang, CAST(prefix // 512 AS BIGINT) AS seq_id,
                   count(*) AS n_docs,
                   CAST(sum(n_tokens) AS BIGINT) AS seq_tokens
            FROM c GROUP BY lang, seq_id
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
        "documents_hash_sample": """
            SELECT doc_id, lang,
                   (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100) < 10 AS in_tenth
            FROM documents
            WHERE (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100) < 50
        """,
        "events_hopping_window": """
            SELECT user_id,
                   CAST(((epoch_us(ts) // 1000000) // 1800 - i.i) * 1800 AS BIGINT) AS window_start,
                   count(*) AS n_events,
                   CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS total_value
            FROM events CROSS JOIN (SELECT unnest([0, 1]) AS i) i
            GROUP BY user_id, window_start
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
        "corpus_curation_stats": f"""
            WITH scored AS (
              SELECT doc_id, text,
                     {_langid_case()} AS lang_pred,
                     CASE WHEN trim(text) = '' THEN 0
                          ELSE length(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens
              FROM (SELECT doc_id, text, {_langid_scores()} FROM documents)
            ),
            corpus AS (
              SELECT doc_id, text, lang_pred, n_tokens FROM scored
              UNION ALL
              SELECT doc_id + 1000000, text, lang_pred, n_tokens FROM scored
            ),
            kept AS (SELECT * FROM corpus WHERE n_tokens >= 30),
            dedup AS (
              SELECT md5(text) AS h, min(doc_id) AS doc_id,
                     min(lang_pred) AS lang_pred, min(n_tokens) AS n_tokens
              FROM kept GROUP BY md5(text)
            )
            SELECT lang_pred, count(*) AS n_docs,
                   CAST(sum(n_tokens) AS BIGINT) AS total_tokens
            FROM dedup GROUP BY lang_pred
        """,
        # write-side curation: the shards READ BACK from disk must
        # aggregate to the same closed-form curation stats
        "curated_export_summary": """
            WITH scored AS (
              SELECT doc_id, text,
                     {langid} AS lang_pred,
                     CASE WHEN trim(text) = '' THEN 0
                          ELSE length(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens
              FROM (SELECT doc_id, text, {scores} FROM documents)
            ),
            corpus AS (
              SELECT doc_id, text, lang_pred, n_tokens FROM scored
              UNION ALL
              SELECT doc_id + 1000000, text, lang_pred, n_tokens FROM scored
            ),
            kept AS (SELECT * FROM corpus WHERE n_tokens >= 30),
            dedup AS (
              SELECT md5(text) AS h, min(doc_id) AS doc_id,
                     min(lang_pred) AS lang_pred, min(n_tokens) AS n_tokens
              FROM kept GROUP BY md5(text)
            )
            SELECT lang_pred, count(*) AS n_docs,
                   CAST(sum(n_tokens) AS BIGINT) AS total_tokens
            FROM dedup GROUP BY lang_pred
        """.replace("{langid}", _langid_case()).replace("{scores}", _langid_scores()),
        "events_order_value_range_join": """
            SELECT o_orderpriority, count(*) AS n_pairs
            FROM events e
            JOIN orders o
              ON e.value >= o.o_totalprice / 1000.0 - 1.0
             AND e.value <  o.o_totalprice / 1000.0
            GROUP BY o_orderpriority
        """,
        "simhash_dup_pairs": f"""
            WITH corpus AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 1000000, text || ' tail' FROM documents
            ),
            {_simhash_cte("corpus")},
            bands AS (
              SELECT doc_id, simhash, b.b AS band, (simhash >> (10 * b.b)) & 1023 AS key
              FROM sh CROSS JOIN (SELECT unnest(generate_series(0, 5)) AS b) b
            ),
            cand AS (
              SELECT DISTINCT x.doc_id AS a, y.doc_id AS b, x.simhash AS sa, y.simhash AS sb
              FROM bands x
              JOIN bands y ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id
            )
            SELECT a, b, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
            FROM cand WHERE bit_count(xor(sa, sb)) <= 6
        """,
        "minhash_dup_candidates": f"""
            WITH {_minhash_cte()}
            SELECT a, b FROM cpairs
        """,
        # incremental dedup: the full-corpus LSH pair set minus its
        # base×base pairs — every pair with at least one incoming
        # (doc_id >= 1M) member; a < b and base ids < 1M, so the filter
        # on b alone is exact
        "dedup_incremental_candidates": f"""
            WITH {_minhash_cte()}
            SELECT a, b FROM cpairs WHERE b >= 1000000
        """,
        # connected components over the symmetric candidate-pair graph:
        # every node's cluster is the min doc_id reachable from it —
        # the recursive CTE enumerates (node, reachable label) pairs
        # (UNION dedup terminates it), min per node is the fixpoint the
        # Ray min-label propagation converges to
        "dedup_clusters": f"""
            WITH RECURSIVE {_minhash_cte()},
            edges AS (
              SELECT a AS s, b AS d FROM cpairs
              UNION ALL
              SELECT b, a FROM cpairs
            ),
            cc AS (
              SELECT doc_id AS node, doc_id AS label FROM corpus
              UNION
              SELECT e.d AS node, cc.label
              FROM cc JOIN edges e ON e.s = cc.node
            )
            SELECT node AS doc_id, CAST(min(label) AS BIGINT) AS cluster
            FROM cc GROUP BY node
        """,
        # survivor selection: per cluster keep the doc with the most
        # whitespace tokens, ties broken by min doc_id
        "dedup_keep_best": f"""
            WITH RECURSIVE {_minhash_cte()},
            edges AS (
              SELECT a AS s, b AS d FROM cpairs
              UNION ALL
              SELECT b, a FROM cpairs
            ),
            cc AS (
              SELECT doc_id AS node, doc_id AS label FROM corpus
              UNION
              SELECT e.d AS node, cc.label
              FROM cc JOIN edges e ON e.s = cc.node
            ),
            lab AS (SELECT node AS doc_id, min(label) AS cluster FROM cc GROUP BY node),
            toks AS (
              SELECT doc_id,
                     CASE WHEN trim(text) = '' THEN 0
                          ELSE length(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens
              FROM corpus
            ),
            ranked AS (
              SELECT l.cluster, t.doc_id, t.n_tokens,
                     count(*) OVER (PARTITION BY l.cluster) AS n_members,
                     row_number() OVER (
                       PARTITION BY l.cluster ORDER BY t.n_tokens DESC, t.doc_id
                     ) AS rn
              FROM lab l JOIN toks t USING (doc_id)
            )
            SELECT CAST(cluster AS BIGINT) AS cluster,
                   CAST(doc_id AS BIGINT) AS survivor_doc_id,
                   CAST(n_tokens AS BIGINT) AS survivor_tokens,
                   CAST(n_members AS BIGINT) AS n_members
            FROM ranked WHERE rn = 1
        """,
        "minhash_dup_verified": f"""
            WITH {_minhash_cte()},
            gset AS (SELECT DISTINCT doc_id, gh FROM grams),
            gsize AS (SELECT doc_id, count(*) AS n FROM gset GROUP BY doc_id),
            inter AS (
              SELECT p.a, p.b, count(*) AS ni
              FROM cpairs p
              JOIN gset x ON x.doc_id = p.a
              JOIN gset y ON y.doc_id = p.b AND y.gh = x.gh
              GROUP BY p.a, p.b
            )
            SELECT i.a, i.b,
                   round(CAST(i.ni AS DOUBLE) / (sa.n + sb.n - i.ni), 6) AS jaccard
            FROM inter i
            JOIN gsize sa ON sa.doc_id = i.a
            JOIN gsize sb ON sb.doc_id = i.b
            WHERE CAST(i.ni AS DOUBLE) / (sa.n + sb.n - i.ni) >= 0.5
        """,
        # incremental verify: the batch verifier restricted to pairs
        # with an incoming (doc_id >= 1M) member — the wave-vs-corpus
        # dedup decision
        "dedup_incremental_verified": f"""
            WITH {_minhash_cte()},
            gset AS (SELECT DISTINCT doc_id, gh FROM grams),
            gsize AS (SELECT doc_id, count(*) AS n FROM gset GROUP BY doc_id),
            inter AS (
              SELECT p.a, p.b, count(*) AS ni
              FROM cpairs p
              JOIN gset x ON x.doc_id = p.a
              JOIN gset y ON y.doc_id = p.b AND y.gh = x.gh
              WHERE p.b >= 1000000
              GROUP BY p.a, p.b
            )
            SELECT i.a, i.b,
                   round(CAST(i.ni AS DOUBLE) / (sa.n + sb.n - i.ni), 6) AS jaccard
            FROM inter i
            JOIN gsize sa ON sa.doc_id = i.a
            JOIN gsize sb ON sb.doc_id = i.b
            WHERE CAST(i.ni AS DOUBLE) / (sa.n + sb.n - i.ni) >= 0.5
        """,
        "simhash_fingerprints": """
            WITH words AS (
              SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS w FROM documents
            ),
            wh AS (SELECT doc_id, CAST(('0x' || substr(md5(w),1,15)) AS BIGINT) AS h FROM words),
            bits AS (
              SELECT doc_id, b.bit,
                     sum(CASE WHEN (h >> b.bit) & 1 = 1 THEN 1 ELSE -1 END) AS acc
              FROM wh CROSS JOIN (SELECT unnest(generate_series(0, 59)) AS bit) b
              GROUP BY doc_id, b.bit
            )
            SELECT doc_id,
                   CAST(sum(CASE WHEN acc > 0 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT) AS simhash
            FROM bits GROUP BY doc_id
        """,
        "doc_fingerprints": f"""
            WITH {_fingerprint_cte()}
            SELECT doc_id,
                   CAST(len(f) AS BIGINT) AS n_fingerprints,
                   CAST(list_min(f) AS BIGINT) AS fp_min,
                   CAST(list_max(f) AS BIGINT) AS fp_max,
                   CAST(list_sum(f) AS BIGINT) AS fp_sum
            FROM fp
        """,
        "language_id_predictions": f"""
            SELECT doc_id, lang,
                   CASE
                     WHEN length(text) > 0
                          AND length(regexp_replace(substr(text, 1, 200), '[^一-鿿]', '', 'g')) * 1.0
                              / greatest(1, least(length(text), 200)) > 0.2
                       THEN 'zh'
                     WHEN s_en = 0 AND s_es = 0 AND s_fr = 0 AND s_de = 0 THEN 'unknown'
                     WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_de THEN 'en'
                     WHEN s_es >= s_fr AND s_es >= s_de THEN 'es'
                     WHEN s_fr >= s_de THEN 'fr'
                     ELSE 'de'
                   END AS lang_pred
            FROM (SELECT doc_id, lang, text, {_langid_scores()} FROM documents)
        """,
        "token_count_bpe_by_lang": """
            SELECT lang,
                   CAST(sum(len(regexp_extract_all(text, '{pat}'))) AS BIGINT) AS total_bpe_tokens,
                   count(*) AS n_docs
            FROM documents GROUP BY lang
        """.replace("{pat}", BPEISH_PATTERN.replace("'", "''")),
        "multimodal_decode_fake": """
            SELECT doc_id AS media_id,
                   CASE WHEN doc_id % 3 = 0 THEN 'image'
                        WHEN doc_id % 3 = 1 THEN 'audio'
                        ELSE 'video' END AS kind,
                   CAST(16 AS BIGINT) AS feat_dim
            FROM documents
        """,
        "multimodal_decode": f"""
            WITH {_media_expected_cte()}
            SELECT media_id, kind,
                   CAST(width AS INTEGER) AS width,
                   CAST(height AS INTEGER) AS height,
                   CAST(n_frames AS INTEGER) AS n_frames,
                   CAST(duration_ms AS INTEGER) AS duration_ms,
                   CAST(checksum AS BIGINT) AS checksum
            FROM expected
        """,
        "ann_topk_lsh": f"""
            WITH e AS (SELECT vec_id, embedding, {_lsh_bucket_expr()} AS bucket FROM embeddings),
            q AS (SELECT vec_id AS qid, embedding AS qe, bucket FROM e ORDER BY vec_id LIMIT 5),
            probes AS (
              SELECT DISTINCT xor(q.bucket, f.flip) AS bucket
              FROM q, (SELECT unnest([0, 1, 2, 4, 8]) AS flip) f
            ),
            cand AS (SELECT vec_id, embedding FROM e WHERE bucket IN (SELECT bucket FROM probes)),
            s AS (
              SELECT q.qid, c.vec_id AS nid, list_cosine_similarity(q.qe, c.embedding) AS sim
              FROM q CROSS JOIN cand c
              WHERE c.vec_id <> q.qid
            )
            SELECT qid, nid, rk FROM (
              SELECT qid, nid,
                     row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rk
              FROM s
            ) WHERE rk <= 10
        """,
        "embedding_near_dup_pairs": """
            SELECT vec_id AS a, vec_id + 1000000 AS b FROM embeddings
        """,
        # IvfIndex.train_one_pass + assign + probe + rank, recomputed
        # closed-form: seeds = first 8 vec_id-ordered sample rows, one
        # cosine assignment pass (ties -> lowest lid), centroids =
        # elementwise avg of raw assigned vectors (empty list keeps its
        # seed), full-table assignment, top-3 probed lists per query,
        # top-10 by (sim DESC, nid ASC).
        "ann_topk_ivf": """
            WITH s AS (
              SELECT vec_id, embedding, row_number() OVER (ORDER BY vec_id) AS rn
              FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 256)
            ),
            seeds AS (SELECT rn - 1 AS lid, embedding AS se FROM s WHERE rn <= 8),
            assign_s AS (
              SELECT vec_id, embedding, lid FROM (
                SELECT s.vec_id, s.embedding, d.lid,
                       row_number() OVER (
                         PARTITION BY s.vec_id
                         ORDER BY list_cosine_similarity(s.embedding, d.se) DESC, d.lid
                       ) AS r
                FROM s CROSS JOIN seeds d
              ) WHERE r = 1
            ),
            cent AS (
              SELECT lid, list(m ORDER BY i) AS ce FROM (
                SELECT lid, i, avg(v) AS m FROM (
                  SELECT lid, unnest(embedding) AS v,
                         generate_subscripts(embedding, 1) AS i
                  FROM assign_s
                ) GROUP BY lid, i
              ) GROUP BY lid
            ),
            cents AS (
              SELECT d.lid, coalesce(c.ce, d.se) AS ce
              FROM seeds d LEFT JOIN cent c ON c.lid = d.lid
            ),
            assign_all AS (
              SELECT vec_id, embedding, lid FROM (
                SELECT e.vec_id, e.embedding, c.lid,
                       row_number() OVER (
                         PARTITION BY e.vec_id
                         ORDER BY list_cosine_similarity(e.embedding, c.ce) DESC, c.lid
                       ) AS r
                FROM embeddings e CROSS JOIN cents c
              ) WHERE r = 1
            ),
            q AS (SELECT vec_id AS qid, embedding AS qe FROM s WHERE rn <= 5),
            probes AS (
              SELECT DISTINCT lid FROM (
                SELECT q.qid, c.lid,
                       row_number() OVER (
                         PARTITION BY q.qid
                         ORDER BY list_cosine_similarity(q.qe, c.ce) DESC, c.lid
                       ) AS r
                FROM q CROSS JOIN cents c
              ) WHERE r <= 3
            ),
            sims AS (
              SELECT q.qid, c.vec_id AS nid, list_cosine_similarity(q.qe, c.embedding) AS sim
              FROM q CROSS JOIN (
                SELECT vec_id, embedding FROM assign_all
                WHERE lid IN (SELECT lid FROM probes)
              ) c
              WHERE c.vec_id <> q.qid
            )
            SELECT qid, nid, rk FROM (
              SELECT qid, nid,
                     row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rk
              FROM sims
            ) WHERE rk <= 10
        """,
        "quality_gopher_by_lang": _gopher_sql(),
        # unigram LM quality scores: counts over the full corpus, vocab
        # capped by (count desc, token asc), Laplace smoothing with an
        # OOV class, per-doc mean NLL averaged per language; round(6)
        # absorbs libm ulp differences between numpy log and DuckDB ln
        "unigram_logprob_by_lang": """
            WITH toks AS (
              SELECT lang, doc_id,
                     unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS w
              FROM documents WHERE trim(text) <> ''
            ),
            counts AS (SELECT w, count(*) AS c FROM toks GROUP BY w),
            vocab AS (
              SELECT w, c FROM (
                SELECT w, c, row_number() OVER (ORDER BY c DESC, w) AS rk FROM counts
              ) WHERE rk <= 65536
            ),
            consts AS (
              SELECT (SELECT CAST(sum(c) AS DOUBLE) FROM counts) AS total,
                     (SELECT count(*) FROM vocab) AS v
            ),
            doc AS (
              SELECT t.lang, t.doc_id,
                     avg(-ln((coalesce(vb.c, 0) + 1) / (consts.total + consts.v + 1))) AS nll
              FROM toks t
              LEFT JOIN vocab vb ON vb.w = t.w
              CROSS JOIN consts
              GROUP BY t.lang, t.doc_id
            ),
            final AS (
              SELECT a.lang, coalesce(d.nll, 0.0) AS nll
              FROM documents a LEFT JOIN doc d ON d.doc_id = a.doc_id
            )
            SELECT lang, count(*) AS n_docs, round(avg(nll), 6) AS avg_nll
            FROM final GROUP BY lang
        """,
        "documents_stratified_sample": """
            SELECT doc_id, lang
            FROM documents
            WHERE (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100)
                  < CASE WHEN lang = 'en' THEN 10 ELSE 30 END
        """,
        "events_value_percentiles": """
            SELECT CAST(0.5 AS DOUBLE) AS pct, quantile_disc(value, 0.5) AS value FROM events
            UNION ALL
            SELECT CAST(0.9 AS DOUBLE), quantile_disc(value, 0.9) FROM events
            UNION ALL
            SELECT CAST(0.99 AS DOUBLE), quantile_disc(value, 0.99) FROM events
        """,
        "top_orders_per_priority": """
            SELECT o_orderpriority, rk, o_orderkey, revenue_cents FROM (
              SELECT o_orderpriority, o_orderkey, revenue_cents,
                     row_number() OVER (
                       PARTITION BY o_orderpriority
                       ORDER BY revenue_cents DESC, o_orderkey
                     ) AS rk
              FROM (
                SELECT o_orderpriority, o_orderkey,
                       CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
                FROM orders JOIN lineitem ON o_orderkey = l_orderkey
                GROUP BY o_orderpriority, o_orderkey
              )
            ) WHERE rk <= 3
        """,
        "top_tokens": """
            SELECT CAST(row_number() OVER (ORDER BY n DESC, token) AS BIGINT) AS rk, token, n
            FROM (
              SELECT token, count(*) AS n FROM (
                SELECT unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS token
                FROM documents
              ) GROUP BY token
            )
            QUALIFY rk <= 20
        """,
        "distinct_users_per_day": """
            SELECT CAST((epoch_us(ts) // 1000000 // 86400) * 86400 AS BIGINT) AS day,
                   CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
            FROM events GROUP BY day
        """,
        # HyperLogLog sketch recomputed closed-form: same 48-bit md5
        # prefix, integer bit_length via bin(), exact dyadic 2^-M sum
        # (order-independent — see api.approx_distinct_users_hll).
        "approx_distinct_users_hll": """
            WITH pairs AS (
              SELECT DISTINCT
                     CAST((epoch_us(ts) // 1000000 // 86400) * 86400 AS BIGINT) AS day,
                     user_id
              FROM events
            ), hashed AS (
              SELECT day,
                     CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12)) AS BIGINT) AS h
              FROM pairs
            ), regs AS (
              SELECT day, h % 64 AS bucket,
                     MAX(43 - CASE WHEN h // 64 = 0 THEN 0
                                   ELSE length(bin(h // 64)) END) AS M
              FROM hashed GROUP BY day, bucket
            ), agg AS (
              SELECT day, CAST(count(*) AS BIGINT) AS n_regs,
                     sum(power(2.0, -M)) AS s
              FROM regs GROUP BY day
            ), est AS (
              SELECT day, n_regs,
                     (0.7213 / (1 + 1.079 / 64)) * (64 * 64) / (s + (64 - n_regs)) AS raw
              FROM agg
            )
            SELECT day, n_regs,
                   CASE WHEN raw <= 2.5 * 64 AND n_regs < 64
                        THEN round(64 * ln(64.0 / (64 - n_regs)), 6)
                        ELSE round(raw, 6) END AS approx_users
            FROM est
        """,
        # row-window functions; cents keep the running sum integer-exact
        # (numpy sequential cumsum vs DuckDB's window segment tree would
        # differ on float accumulation order)
        "events_user_running": """
            SELECT event_id, user_id,
                   CAST(row_number() OVER w AS BIGINT) AS rn,
                   CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) OVER w
                        AS BIGINT) AS run_cents,
                   COALESCE(epoch_us(ts) - lag(epoch_us(ts)) OVER w, -1) AS gap_us
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        """,
        "customers_without_events": """
            SELECT c_custkey, c_name, c_acctbal
            FROM customer
            WHERE c_custkey NOT IN (SELECT user_id FROM events)
        """,
        # rational IDF (n_docs/df, no log) — a spec choice so the score
        # is bit-reproducible in SQL; token spec matches top_tokens
        "tfidf_top_terms_by_lang": """
            WITH tok AS (
              SELECT doc_id, lang,
                     unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS token
              FROM documents
            ), tf AS (
              SELECT lang, token, CAST(count(*) AS BIGINT) AS tf
              FROM tok GROUP BY lang, token
            ), df AS (
              SELECT token, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
              FROM tok GROUP BY token
            ), scored AS (
              SELECT lang, token, tf, df,
                     round(CAST(tf AS DOUBLE) *
                           (CAST((SELECT count(*) FROM documents) AS DOUBLE)
                            / CAST(df AS DOUBLE)), 6) AS score
              FROM tf JOIN df USING (token)
            )
            SELECT lang,
                   CAST(row_number() OVER (PARTITION BY lang
                                           ORDER BY score DESC, token) AS BIGINT) AS rk,
                   token, tf, df, score
            FROM scored
            QUALIFY rk <= 10
        """,
        # one-pass grouped histogram quantile sketch; op order of the
        # interpolation mirrors api.events_value_quantile_sketch exactly
        "events_value_quantile_sketch": """
            WITH hist AS (
              SELECT event_type, CAST(floor(value / 0.25) AS BIGINT) AS bin,
                     CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY event_type, bin
            ), cum AS (
              SELECT event_type, bin, n,
                     CAST(sum(n) OVER (PARTITION BY event_type ORDER BY bin)
                          AS BIGINT) AS cum,
                     CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT) AS total
              FROM hist
            ), q AS (
              SELECT * FROM (VALUES (0.5::DOUBLE), (0.9::DOUBLE), (0.99::DOUBLE)) t(pct)
            ), hit AS (
              SELECT event_type, pct, bin, n,
                     CAST(ceil(pct * total) AS BIGINT) AS rank, cum - n AS cum_before,
                     row_number() OVER (PARTITION BY event_type, pct ORDER BY bin) AS rb
              FROM cum CROSS JOIN q
              WHERE cum >= CAST(ceil(pct * total) AS BIGINT)
            )
            SELECT event_type, pct,
                   bin * 0.25 + 0.25 * CAST(rank - cum_before AS DOUBLE)
                     / CAST(n AS DOUBLE) AS approx_value
            FROM hit WHERE rb = 1
        """,
        # Markov bigram over per-user ordered event sequences
        "event_transition_counts": """
            SELECT prev_type, cur_type, CAST(count(*) AS BIGINT) AS n
            FROM (
              SELECT lag(event_type) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id) AS prev_type,
                     event_type AS cur_type
              FROM events
            )
            WHERE prev_type IS NOT NULL
            GROUP BY prev_type, cur_type
        """,
        # deterministic per-group reservoir: smallest md5-prefix ranks,
        # same 32-bit integer spec as documents_hash_sample
        "reservoir_sample_per_group": """
            SELECT lang, rk, doc_id, hkey FROM (
              SELECT lang, doc_id,
                     CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                          AS BIGINT) AS hkey,
                     CAST(row_number() OVER (
                        PARTITION BY lang
                        ORDER BY CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                                      AS BIGINT), doc_id) AS BIGINT) AS rk
              FROM documents
            ) WHERE rk <= 8
        """,
        # overlapping token windows; chunk char length equals the joined
        # slice length (api side computes it from a prefix sum, never
        # materializing the chunk text)
        "doc_chunking_stats": """
            WITH toks AS (
              SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tk
              FROM documents
            ), st AS (
              SELECT doc_id, tk,
                     unnest(generate_series(0, len(tk) - 1, 48)) AS s
              FROM toks
            )
            SELECT doc_id,
                   CAST(s // 48 AS BIGINT) AS chunk_id,
                   CAST(least(len(tk) - s, 64) AS BIGINT) AS n_tokens,
                   CAST(length(array_to_string(tk[s + 1:least(s + 64, len(tk))], ' '))
                        AS BIGINT) AS n_chars
            FROM st
        """,
        # integer-millionth quantization makes the vector sums associative;
        # the one double division is op-order identical on both sides
        # one Lloyd step: seeds = k smallest vec_ids, assignment =
        # rank-1 cosine (ties -> smallest cid), centroid = integer-
        # millionths mean (same quantization as centroids_by_label)
        "embedding_kmeans_step": """
            WITH seeds AS (
              SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, embedding AS se
              FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 4)
            ),
            sims AS (
              SELECT e.vec_id, s.cid, list_cosine_similarity(s.se, e.embedding) AS sim
              FROM embeddings e CROSS JOIN seeds s
            ),
            assign AS (
              SELECT vec_id, cid FROM (
                SELECT vec_id, cid,
                       row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rk
                FROM sims
              ) WHERE rk = 1
            ),
            q AS (
              SELECT a.cid, d.d - 1 AS dim,
                     CAST(floor(CAST(e.embedding[d.d] AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS qv
              FROM assign a JOIN embeddings e USING (vec_id)
              CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS d) d
            )
            SELECT CAST(cid AS BIGINT) AS cluster, CAST(dim AS BIGINT) AS dim,
                   CAST(sum(qv) AS DOUBLE) / (count(*) * 1000000.0) AS centroid,
                   count(*) AS n_members
            FROM q GROUP BY cid, dim
        """,
        "embedding_centroids_by_label": """
            WITH ex AS (
              SELECT label,
                     unnest(generate_series(0, len(embedding) - 1)) AS dim,
                     unnest(embedding) AS val
              FROM embeddings
            )
            SELECT CAST(label AS BIGINT) AS label, CAST(dim AS BIGINT) AS dim,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CAST(floor(CAST(val AS DOUBLE) * 1000000.0 + 0.5)
                                 AS BIGINT)) AS DOUBLE)
                     / (count(*) * 1000000.0) AS centroid
            FROM ex GROUP BY label, dim
        """,
        # the bloom prefilter is internal acceleration whose false
        # positives are removed by the exact co-partitioned is_in, so the
        # oracle is the plain semi-join
        "lineitem_semijoin_bloom": """
            SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0
                                       + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
            FROM lineitem
            WHERE l_orderkey IN (
              SELECT o_orderkey FROM orders WHERE o_totalprice > 450000.0
            )
            GROUP BY l_returnflag
        """,
        # same planted corpus + same RE2/Python-identical pattern
        # (api.URL_PATTERN group 1 = domain)
        "url_domain_stats": _url_domain_sql(),
        # one stats row per column: strings profile codepoint length,
        # timestamps profile epoch-µs (api.lineitem_profile's spec)
        "lineitem_profile": _profile_sql(),
        # exact grouped percentiles: quantile_disc's rank rule
        # (ceil(q·n)−1, 0-based ascending) — matches the two-pass
        # histogram selection in api.events_value_percentiles_by_type
        "events_value_percentiles_by_type": """
            SELECT event_type, 0.5 AS pct,
                   quantile_disc(value, 0.5) AS value FROM events GROUP BY event_type
            UNION ALL
            SELECT event_type, 0.9, quantile_disc(value, 0.9) FROM events GROUP BY event_type
            UNION ALL
            SELECT event_type, 0.99, quantile_disc(value, 0.99) FROM events GROUP BY event_type
        """,
        # left-outer grouped aggregate: zero-activity customers included
        "customer_event_counts": """
            SELECT c.c_custkey, c.c_name,
                   CAST(COALESCE(e.n, 0) AS BIGINT) AS n_events
            FROM customer c
            LEFT JOIN (
              SELECT user_id, count(*) AS n FROM events GROUP BY user_id
            ) e ON c.c_custkey = e.user_id
        """,
        # RANGE frame (includes ts peers) — cents keep the trailing sum
        # integer-exact; µs window arithmetic identical on both sides
        "events_user_trailing_window": """
            SELECT event_id, user_id,
                   CAST(sum(cents) OVER w AS BIGINT) AS trail_cents,
                   CAST(count(*) OVER w AS BIGINT) AS n_win
            FROM (
              SELECT event_id, user_id, ts,
                     CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
              FROM events
            )
            WINDOW w AS (PARTITION BY user_id ORDER BY ts
                         RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
        """,
        # count-min sketch recomputed closed-form: same md5-prefix
        # bucket spec (bucket_j = md5("j:" || token)[:8 hex] % 1024),
        # integer sums are order-independent so the matrix is bit-exact
        "token_counts_cms": """
            WITH tok AS (
              SELECT unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS token
              FROM documents
            ), cnt AS (
              SELECT token, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY token
            ), top AS (
              SELECT token, n,
                     CAST(row_number() OVER (ORDER BY n DESC, token) AS BIGINT) AS rk
              FROM cnt QUALIFY rk <= 20
            ), js AS (SELECT * FROM (VALUES (0), (1)) t(j)),
            cms AS (
              SELECT j,
                     CAST(('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || token), 1, 8))
                          AS BIGINT) % 1024 AS bucket,
                     CAST(sum(n) AS BIGINT) AS c
              FROM cnt CROSS JOIN js GROUP BY j, bucket
            )
            SELECT t.rk, t.token, t.n AS true_n, CAST(min(c.c) AS BIGINT) AS est_n
            FROM top t
            CROSS JOIN js
            JOIN cms c ON c.j = js.j AND c.bucket =
                 CAST(('0x' || substr(md5(CAST(js.j AS VARCHAR) || ':' || t.token), 1, 8))
                      AS BIGINT) % 1024
            GROUP BY t.rk, t.token, t.n
        """,
    }
