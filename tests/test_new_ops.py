"""Edge-case tests for the round-3 operator additions beyond the
oracle-parity harness: chunking boundary math, centroid exactness on
interleaved labels, bloom false-positive removal (forced with a tiny
filter), transition tie-breaks, and reservoir block-split invariance."""

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from myzql_binlog_connector_ray import api


def _write(dirpath, name, table):
    pq.write_table(table, str(dirpath / f"{name}.parquet"))
    return str(dirpath)


@pytest.fixture()
def tiny_dir(tmp_path):
    return tmp_path


def test_doc_chunking_boundaries(ray_session, tiny_dir):
    # one token; exactly size; size+1 (second chunk = 1 leftover token
    # at start=stride); whitespace-only text (trim -> '' -> [''] with
    # zero chars, one chunk)
    size, stride = 4, 3
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(
                [
                    "solo",
                    "a bb ccc dddd",          # exactly size tokens
                    "a bb ccc dddd eeeee",    # size+1 -> chunks [0..3], [3..4]
                    "   ",                     # trims to '' -> one empty token
                ],
                pa.string(),
            ),
            "lang": pa.array(["en"] * 4),
            "source": pa.array(["t"] * 4),
            "n_chars": pa.array([0] * 4, pa.int64()),
        }
    )
    sf = _write(tiny_dir, "documents", docs)
    out = (
        api.doc_chunking_stats(sf, size=size, stride=stride)
        .to_pandas()
        .sort_values(["doc_id", "chunk_id"])
        .reset_index(drop=True)
    )
    rows = list(map(tuple, out[["doc_id", "chunk_id", "n_tokens", "n_chars"]].values))
    assert rows == [
        (1, 0, 1, 4),            # "solo"
        (2, 0, 4, 13),           # whole text
        (2, 1, 1, 4),            # start=stride=3 still < n_tok -> "dddd"
        (3, 0, 4, 13),           # first window
        (3, 1, 2, 10),           # tokens[3:5] = "dddd eeeee"
        (4, 0, 1, 0),            # empty token, zero chars
    ]


def test_embedding_centroids_exact_on_interleaved_labels(ray_session, tiny_dir):
    rng = np.random.RandomState(11)
    n, dim = 400, 8
    lab = rng.randint(0, 5, n).astype(np.int32)
    vec = rng.randn(n, dim).astype(np.float32)
    emb = pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.array(list(vec), pa.list_(pa.float32())),
            "label": pa.array(lab, pa.int32()),
        }
    )
    sf = _write(tiny_dir, "embeddings", emb)
    out = api.embedding_centroids_by_label(sf).to_pandas()
    q = np.floor(vec.astype(np.float64) * 1e6 + 0.5).astype(np.int64)
    for label in np.unique(lab):
        m = lab == label
        want = q[m].sum(axis=0).astype(np.float64) / (m.sum() * 1e6)
        got = (
            out[out["label"] == label].sort_values("dim")["centroid"].to_numpy()
        )
        assert np.array_equal(got, want)  # bit-exact, not allclose
        assert (out[out["label"] == label]["n"] == m.sum()).all()


def test_bloom_semijoin_exact_despite_false_positives(ray_session, tiny_dir):
    # m_bits=8 forces heavy bloom false positives; the co-partitioned
    # is_in must still produce the exact semi-join aggregate.
    rng = np.random.RandomState(3)
    n_orders, n_items = 300, 2000
    okey = np.arange(n_orders, dtype=np.int64)
    price = rng.uniform(0, 100, n_orders)
    orders = pa.table(
        {
            "o_orderkey": pa.array(okey),
            "o_totalprice": pa.array(price, pa.float64()),
        }
    )
    lkey = rng.randint(0, n_orders * 2, n_items).astype(np.int64)  # half dangling
    ep = rng.uniform(1, 50, n_items)
    disc = rng.uniform(0, 0.1, n_items)
    flag = np.array(["A", "N", "R"])[lkey % 3]
    lineitem = pa.table(
        {
            "l_orderkey": pa.array(lkey),
            "l_extendedprice": pa.array(ep, pa.float64()),
            "l_discount": pa.array(disc, pa.float64()),
            "l_returnflag": pa.array(flag, pa.string()),
        }
    )
    sf = _write(tiny_dir, "orders", orders)
    _write(tiny_dir, "lineitem", lineitem)
    thresh = 50.0
    out = (
        api.lineitem_semijoin_bloom(sf, threshold=thresh, m_bits=8)
        .to_pandas()
        .sort_values("l_returnflag")
        .reset_index(drop=True)
    )
    qual = set(okey[price > thresh].tolist())
    keep = np.array([k in qual for k in lkey])
    cents = np.floor(ep * (1.0 - disc) * 100.0 + 0.5).astype(np.int64)
    for _, row in out.iterrows():
        m = keep & (flag == row["l_returnflag"])
        assert row["n"] == int(m.sum())
        assert row["revenue_cents"] == int(cents[m].sum())
    assert set(out["l_returnflag"]) == set(flag[keep])


def test_event_transition_tie_break_on_event_id(ray_session, tiny_dir):
    # same user, same ts: order falls back to event_id
    ts = pa.array(np.array([10, 10, 10, 20], dtype="datetime64[us]"))
    events = pa.table(
        {
            "event_id": pa.array([3, 1, 2, 4], pa.int64()),
            "ts": ts,
            "user_id": pa.array([7, 7, 7, 7], pa.int64()),
            "event_type": pa.array(["c", "a", "b", "d"], pa.string()),
            "value": pa.array([0.0] * 4, pa.float64()),
            "props": pa.array([""] * 4, pa.string()),
        }
    )
    sf = _write(tiny_dir, "events", events)
    out = api.event_transition_counts(sf).to_pandas()
    got = {(r.prev_type, r.cur_type): r.n for r in out.itertuples()}
    assert got == {("a", "b"): 1, ("b", "c"): 1, ("c", "d"): 1}


def test_reservoir_sample_block_split_invariance(ray_session, tiny_dir):
    docs = pa.table(
        {
            "doc_id": pa.array(np.arange(200), pa.int64()),
            "text": pa.array(["x"] * 200),
            "lang": pa.array((["en"] * 150) + (["fr"] * 48) + (["tiny"] * 2)),
            "source": pa.array(["t"] * 200),
            "n_chars": pa.array([1] * 200, pa.int64()),
        }
    )
    sf = _write(tiny_dir, "documents", docs)
    a = (
        api.reservoir_sample_per_group(sf, k=5)
        .to_pandas()
        .sort_values(["lang", "rk"])
        .reset_index(drop=True)
    )
    # groups smaller than k return all members, ranked
    assert (a[a["lang"] == "tiny"]["rk"].to_numpy() == [1, 2]).all()
    assert len(a[a["lang"] == "en"]) == 5
    # closed-form: the 5 smallest md5-prefix ranks among en docs
    ids = np.arange(150)
    hk = np.array(
        [
            int.from_bytes(hashlib.md5(str(i).encode()).digest()[:4], "big")
            for i in ids
        ]
    )
    want = ids[np.lexsort((ids, hk))][:5]
    got = a[a["lang"] == "en"].sort_values("rk")["doc_id"].to_numpy()
    assert np.array_equal(got, want)


def test_doc_chunking_matches_naive_reference(ray_session, tiny_dir):
    # randomized (seeded) doc shapes: the vectorized prefix-sum kernel
    # must equal the obvious per-doc Python implementation
    rng = np.random.RandomState(42)
    texts, n = [], 60
    for i in range(n):
        n_tok = int(rng.randint(1, 200))
        toks = ["w" * int(rng.randint(1, 12)) for _ in range(n_tok)]
        texts.append(" ".join(toks))
    docs = pa.table(
        {
            "doc_id": pa.array(np.arange(n), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * n),
            "source": pa.array(["t"] * n),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    sf = _write(tiny_dir, "documents", docs)
    size, stride = 16, 11
    out = (
        api.doc_chunking_stats(sf, size=size, stride=stride)
        .to_pandas()
        .sort_values(["doc_id", "chunk_id"])
        .reset_index(drop=True)
    )
    want = []
    for i, text in enumerate(texts):
        toks = text.strip().split()
        s = 0
        cid = 0
        while s < len(toks):
            window = toks[s : s + size]
            want.append((i, cid, len(window), len(" ".join(window))))
            s += stride
            cid += 1
    got = list(map(tuple, out[["doc_id", "chunk_id", "n_tokens", "n_chars"]].values))
    assert got == want
