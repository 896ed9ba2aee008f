"""combiner_aggregate / combiner_collect_distinct equivalence with
Dataset.groupby().aggregate(...) — the combiner tree must be a drop-in
for associative aggregates at any key cardinality (it exists because
Ray's per-key sort-aggregate measured ~20x slower at 150k keys)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from myzql_binlog_connector_ray.functions.agg import (
    combiner_aggregate,
    combiner_collect_distinct,
)


@pytest.fixture(scope="module")
def skewed_ds(ray_session):
    rng = np.random.RandomState(7)
    n = 20_000
    keys = rng.zipf(1.3, n) % 500  # skewed int keys incl. a hot head
    vals = rng.randint(-1000, 1000, n)
    langs = np.array(["en", "es", "fr", "de"])[keys % 4]
    t = pa.table(
        {
            "k": pa.array(keys, pa.int64()),
            "lang": pa.array(langs, pa.string()),
            "v": pa.array(vals, pa.int64()),
        }
    )
    return ray.data.from_arrow(t).repartition(8), t


def test_combiner_aggregate_matches_groupby(skewed_ds):
    ds, t = skewed_ds
    got = (
        combiner_aggregate(
            ds,
            ["k"],
            [
                ("v", "sum", "s"),
                (None, "count", "n"),
                ("v", "min", "lo"),
                ("v", "max", "hi"),
            ],
            num_parts=16,
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    want = (
        t.group_by("k")
        .aggregate([("v", "sum"), ("v", "count"), ("v", "min"), ("v", "max")])
        .rename_columns(["k", "s", "n", "lo", "hi"])
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert got[["k", "s", "n", "lo", "hi"]].equals(want)
    assert got["s"].dtype.kind == "i"  # dtype survives (no float64 leak)


def test_combiner_aggregate_multikey_string(skewed_ds):
    ds, t = skewed_ds
    got = (
        combiner_aggregate(ds, ["lang", "k"], [("v", "sum", "s")], num_parts=8)
        .to_pandas()
        .sort_values(["lang", "k"])
        .reset_index(drop=True)
    )
    want = (
        t.group_by(["lang", "k"])
        .aggregate([("v", "sum")])
        .rename_columns(["lang", "k", "s"])
        .to_pandas()
        .sort_values(["lang", "k"])
        .reset_index(drop=True)
    )
    assert got.equals(want)


def test_combiner_aggregate_rejects_unknown_kind(skewed_ds):
    ds, _ = skewed_ds
    with pytest.raises(ValueError):
        combiner_aggregate(ds, ["k"], [("v", "median", "m")])


def test_combiner_collect_distinct(skewed_ds):
    ds, t = skewed_ds
    got = combiner_collect_distinct(ds, ["k"], "v", "vals", num_parts=8).to_pandas()
    got_sets = {int(r.k): frozenset(r.vals) for r in got.itertuples()}
    want = t.group_by("k").aggregate([("v", "distinct")]).to_pandas()
    want_sets = {int(r.k): frozenset(r.v_distinct) for r in want.itertuples()}
    assert got_sets == want_sets


def test_combiner_count_with_null_keys(ray_session):
    """Row count is sum-of-ones, so null-KEY groups count their rows
    (counting non-nulls of keys[0] would report 0 for the null group)."""
    import ray

    t = pa.table(
        {
            "k": pa.array(["a", None, None, "b", "a"], pa.string()),
            "v": pa.array([1, 2, 3, 4, 5], pa.int64()),
        }
    )
    ds = ray.data.from_arrow(t)
    got = (
        combiner_aggregate(ds, ["k"], [(None, "count", "n"), ("v", "sum", "s")], num_parts=4)
        .to_pandas()
        .sort_values("k", na_position="last")
        .reset_index(drop=True)
    )
    assert got["n"].tolist() == [2, 1, 2]
    assert got["s"].tolist() == [6, 4, 5]


def test_hll_sketch_accuracy_vs_exact(ray_session, sf_dir):
    """The HLL estimate must land within the sketch's statistical error
    of the exact per-day distinct count (m=64 ⇒ σ ≈ 1.04/√64 = 13%;
    assert 3σ). Bit-exactness vs DuckDB is covered by the oracle test —
    this pins that the sketch estimates the right QUANTITY."""
    from myzql_binlog_connector_ray import api

    exact = {
        r["day"]: r["n_users"] for r in api.distinct_users_per_day(sf_dir).take_all()
    }
    approx = api.approx_distinct_users_hll(sf_dir).take_all()
    assert len(approx) == len(exact)
    for r in approx:
        e = exact[r["day"]]
        assert abs(r["approx_users"] - e) / e < 0.39, (r["day"], r["approx_users"], e)


def test_quantile_sketch_within_bin_of_exact(ray_session, sf_dir):
    """The one-pass histogram sketch must land within bin_width of the
    exact (sort-based) per-group quantile — the sketch's error bound.
    Bit-exactness vs DuckDB is covered by the oracle test; this pins
    that the estimate tracks the true quantile."""
    import duckdb
    import os

    from myzql_binlog_connector_ray import api

    got = api.events_value_quantile_sketch(sf_dir).to_pandas()
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{os.path.join(sf_dir, 'events.parquet')}')"
    )
    exact = con.sql(
        """
        SELECT event_type, 0.5 AS pct, quantile_disc(value, 0.5) AS v
        FROM events GROUP BY event_type
        UNION ALL
        SELECT event_type, 0.9, quantile_disc(value, 0.9) FROM events GROUP BY event_type
        UNION ALL
        SELECT event_type, 0.99, quantile_disc(value, 0.99) FROM events GROUP BY event_type
        """
    ).df()
    exact["pct"] = exact["pct"].astype("float64")
    merged = got.merge(exact, on=["event_type", "pct"])
    assert len(merged) == len(got) > 0
    err = (merged["approx_value"] - merged["v"]).abs()
    assert (err <= 0.25 + 1e-9).all(), merged[err > 0.25]
