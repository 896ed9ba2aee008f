"""Round-4 hardening regressions: numeric-suffix segment ordering,
trailing-window composite overflow, vectorized hash_bucket, DNS TC bit.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from myzql_binlog_connector_ray.kernel.constants import segment_sort_key


def test_segment_sort_key_numeric_suffix_order():
    """MySQL widens the binlog suffix past .999999; lexicographic order
    would put binlog.1000000 BEFORE binlog.999999 and pick the wrong
    LWW winner (round-3 advice)."""
    names = ["binlog.1000000", "binlog.999999", "binlog.000002", "binlog.1000001"]
    got = sorted(names, key=segment_sort_key)
    assert got == ["binlog.000002", "binlog.999999", "binlog.1000000", "binlog.1000001"]
    # tailer stop compare uses the same key
    assert segment_sort_key("binlog.1000000") > segment_sort_key("binlog.999999")
    # non-numeric suffixes fall back to plain string order, stably
    assert sorted(["b.x", "a.y"], key=segment_sort_key) == ["a.y", "b.x"]
    # full paths hash the basename only
    assert segment_sort_key("/tmp/segs/binlog.000007") == segment_sort_key("binlog.000007")


def test_tailer_should_stop_numeric_suffix():
    from myzql_binlog_connector_ray.sources.binlog_tail import BinlogTailer

    t = BinlogTailer(conn=None, out_dir="/tmp/x", start_file="binlog.999999", stop_file="binlog.1000000")
    t._seg_name = "binlog.999999"
    assert not t._should_stop(100)  # not yet at stop_file
    t._seg_name = "binlog.1000001"
    assert t._should_stop(100)  # rotated past stop_file


def test_trailing_window_large_uid_no_overflow(ray_session, tmp_path):
    """Round-3 advice: uid >= 2^18 wrapped the uid*2^45 composite and
    searchsorted returned garbage. Dense per-partition ranks must make
    arbitrary uid values safe — pin against a pandas rolling reference."""
    from myzql_binlog_connector_ray import api

    rng = np.random.RandomState(7)
    n = 4000
    uid = rng.choice([5, 2**18 + 3, 2**40 + 11, 2**55], size=n).astype(np.int64)
    base = np.int64(1_700_000_000_000_000)
    tsus = base + rng.randint(0, 3 * 3600 * 1_000_000, size=n).astype(np.int64)
    value = np.round(rng.uniform(0, 100, size=n), 2)
    t = pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            "ts": pa.array(tsus, pa.timestamp("us")),
            "user_id": pa.array(uid, pa.int64()),
            "event_type": pa.array(["x"] * n, pa.string()),
            "value": pa.array(value, pa.float64()),
            "props": pa.array(["{}"] * n, pa.string()),
        }
    )
    sf = tmp_path / "sfbig"
    sf.mkdir()
    pq.write_table(t, str(sf / "events.parquet"))

    got = (
        api.events_user_trailing_window(str(sf), window_sec=3600)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )

    # reference: per-user O(n^2) window scan in numpy (small n)
    cents = np.floor(value * 100.0 + 0.5).astype(np.int64)
    w_us = 3600 * 1_000_000
    exp_sum = np.zeros(n, dtype=np.int64)
    exp_cnt = np.zeros(n, dtype=np.int64)
    for u in np.unique(uid):
        m = np.flatnonzero(uid == u)
        for i in m:
            in_w = m[(tsus[m] >= tsus[i] - w_us) & (tsus[m] <= tsus[i])]
            exp_sum[i] = cents[in_w].sum()
            exp_cnt[i] = len(in_w)
    order = got["event_id"].to_numpy()
    assert (got["trail_cents"].to_numpy() == exp_sum[order]).all()
    assert (got["n_win"].to_numpy() == exp_cnt[order]).all()


def test_hash_bucket_vectorized_dtypes():
    """hash_bucket accepts arrow arrays/chunked arrays and numpy without
    a per-row str() loop; same values in the same dtype agree across
    container kinds."""
    from myzql_binlog_connector_ray.functions.relational import hash_bucket

    vals = np.array([1, 5, 99, 2**40, -7], dtype=np.int64)
    a = hash_bucket(vals, 16)
    b = hash_bucket(pa.array(vals), 16)
    c = hash_bucket(pa.chunked_array([pa.array(vals[:2]), pa.array(vals[2:])]), 16)
    assert (a == b).all() and (a == c).all()
    s = hash_bucket(pa.array(["x", "y", "x"]), 8)
    assert s[0] == s[2]
    assert a.dtype == np.int32 and (0 <= a).all() and (a < 16).all()


def test_bucket_lookup_join_mixed_key_dtypes(ray_session):
    """prep_right must bucket the CASTED key: int32 right keys joining
    int64 left keys land in the same bucket (bit-pattern hashing would
    split negative values)."""
    import ray

    from myzql_binlog_connector_ray.functions.relational import bucket_lookup_join

    left = ray.data.from_arrow(
        pa.table({"k": pa.array([-1, 2, 3, -1, 7], pa.int64())})
    )
    right = ray.data.from_arrow(
        pa.table(
            {
                "rk": pa.array([-1, 2, 3], pa.int32()),
                "v": pa.array([10, 20, 30], pa.int64()),
            }
        )
    )
    out = bucket_lookup_join(
        left, right, left_key="k", right_key="rk", value_col="v",
        out_col="val", value_type=pa.int64(), num_buckets=4,
    ).to_pandas()
    out = out.sort_values(["k", "val"]).reset_index(drop=True)
    assert out["k"].tolist() == [-1, -1, 2, 3]
    assert out["val"].tolist() == [10, 10, 20, 30]


def test_bucket_lookup_join_list_values(ray_session):
    """The reason this helper exists: list-typed value columns (gram
    sets) that Acero rejects must survive the vectorized take()."""
    import ray

    from myzql_binlog_connector_ray.functions.relational import bucket_lookup_join

    left = ray.data.from_arrow(pa.table({"k": pa.array([1, 2, 9], pa.int64())}))
    right = ray.data.from_arrow(
        pa.table(
            {
                "k2": pa.array([1, 2], pa.int64()),
                "gs": pa.array([[1, 2, 3], [4]], pa.list_(pa.int64())),
            }
        )
    )
    out = bucket_lookup_join(
        left, right, left_key="k", right_key="k2", value_col="gs",
        out_col="gram", value_type=pa.list_(pa.int64()), num_buckets=3,
    ).to_pandas()
    got = {int(r["k"]): list(r["gram"]) for _, r in out.iterrows()}
    assert got == {1: [1, 2, 3], 2: [4]}  # k=9 dropped (inner join)


def test_dns_truncated_response_rejected():
    import struct

    from myzql_binlog_connector_ray.sources.dns import DnsError, build_a_query, parse_a_response

    q = build_a_query("db.example", 0x1234)
    question = q[12:]
    # TC bit (0x0200) set: must refuse instead of parsing a partial answer
    hdr = q[:2] + struct.pack(">HHHHH", 0x8180 | 0x0200, 1, 1, 0, 0)
    resp = hdr + question + b"\xc0\x0c" + struct.pack(">HHIH", 1, 1, 60, 4) + bytes([10, 0, 0, 1])
    with pytest.raises(DnsError, match="TC"):
        parse_a_response(resp, 0x1234)


def test_pii_redactor_vectorized_matches_python_re():
    """The Arrow RE2 kernels must agree with the Python-re reference on
    counts and redaction deltas (the patterns are spec-restricted to the
    re/RE2-agreeing subset)."""
    import re

    from myzql_binlog_connector_ray.api import PII_PATTERNS, PiiRedactor

    texts = [
        "mail a.b+c@ex-ample.co.uk and x@y.io ip 10.2.3.4 tel +1 555-0001",
        "no pii here at all",
        "edges: 999.999.999.999 1.2.3.4.5 ip-ish a@b.c @not.an.email +1 12-3456",
        "",
        "dup dup a@b.cc a@b.cc 8.8.8.8 8.8.8.8 +1 111-2222 +1 111-2222",
    ]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()), "text": pa.array(texts)})
    got = PiiRedactor()(t).to_pandas()

    pats = [(n, re.compile(p), r) for n, p, r in PII_PATTERNS]
    red = list(texts)
    for i, s in enumerate(texts):
        for name, pat, repl in pats:
            assert got.loc[i, f"n_{name}"] == len(pat.findall(s)), (i, name)
        r = s
        for _, pat, repl in pats:
            r = pat.sub(repl, r)
        assert got.loc[i, "chars_removed"] == len(s) - len(r), i


def test_url_extractor_vectorized_matches_findall():
    import re

    from myzql_binlog_connector_ray.api import URL_PATTERN, UrlExtractor

    texts = [
        "see https://a.example.com/x and http://b.org plus https://a.example.com",
        "no urls",
        "scheme only: https:// nothing, then http://c-d.net/p?q=1 end",
        "tight(https://x.io/y)paren http://x.io",
        # pathological: scheme nested in another URL's space-free path —
        # findall consumes it, the naive split would double-count
        "redir https://a.com/r?u=https://b.com x",
        # scheme abutting a domain: findall reports the extended domain
        "glue https://a.comhttps://b.com end",
        # chain of nested schemes
        "https://a.com/u=https://b.com/u=https://c.com tail http://d.org",
    ]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()), "text": pa.array(texts)})
    got = UrlExtractor()(t).to_pandas().set_index("domain").sort_index()

    pat = re.compile(URL_PATTERN)
    urls: dict[str, int] = {}
    docs: dict[str, set] = {}
    for i, s in enumerate(texts):
        for groups in pat.findall(s):
            d = groups[0]
            urls[d] = urls.get(d, 0) + 1
            docs.setdefault(d, set()).add(i)
    assert dict(got["n_urls_p"]) == urls
    assert dict(got["n_docs_p"]) == {d: len(v) for d, v in docs.items()}


def test_typed_dedup_lww_across_numeric_suffix_boundary(ray_session):
    """Decode-level regression: the fused LWW pre-dedup scans segments
    in commit order even across the .999999 -> .1000000 suffix widening
    (lexicographic order would let the OLD value win)."""
    from myzql_binlog_connector_ray.kernel import binlog_writer as bw
    from myzql_binlog_connector_ray.stages.decode import SegmentDecoder

    spec = bw.TableSpec(
        "app", "repos", 101,
        [bw.c_varchar(100), bw.c_varchar(100), bw.c_varchar(100)],
        ["repo", "path", "content"],
    )

    def seg(ordinal, content):
        w = bw.SegmentWriter()
        w.format_description()
        w.gtid(ordinal)
        w.table_map(spec)
        w.write_rows(spec, [["r", "p", content]])
        w.rotate("x")
        return w.getvalue()

    dec = SegmentDecoder(
        mode="typed",
        registry={("app", "repos"): ["repo", "path", "content"]},
        target_table=("app", "repos"),
        dedup_keys=["repo", "path"],
    )
    out = dec(
        pa.table(
            {
                "path": ["binlog.1000000", "binlog.999999"],
                "bytes": [seg(2, "NEW"), seg(1, "OLD")],
            }
        )
    ).to_pandas()
    assert len(out) == 1
    assert out.iloc[0]["content"] == "NEW"
    assert out.iloc[0]["segment"] == "binlog.1000000"
