"""Property tests for the round-4 kernels: LWW-fold associativity over
random change streams, as-of running-max vs brute force, sequence
packing vs a per-lang reference, segment ordering totality.
"""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from hypothesis import given, settings
from hypothesis import strategies as st

from myzql_binlog_connector_ray.kernel.constants import segment_sort_key
from myzql_binlog_connector_ray.stages.apply_arrow import lww_fold_arrow

# -- LWW fold ---------------------------------------------------------------

_keys = st.integers(min_value=0, max_value=6)  # few keys → many collisions
_dmls = st.sampled_from(["INSERT", "UPDATE", "DELETE"])


@st.composite
def change_stream(draw, max_len=24):
    n = draw(st.integers(min_value=0, max_value=max_len))
    rows = []
    for i in range(n):
        rows.append((draw(_keys), draw(_dmls), i))  # ordinal = position (strictly increasing)
    return rows


def _table(rows):
    return pa.table(
        {
            "repo": pa.array([f"r{k}" for k, _, _ in rows], pa.string()),
            "path": pa.array(["p"] * len(rows), pa.string()),
            "content": pa.array(
                [None if d == "DELETE" else f"v{o}" for _, d, o in rows], pa.string()
            ),
            "dml": pa.array([d for _, d, _ in rows], pa.string()),
            "ordinal": pa.array([o for _, _, o in rows], pa.int64()),
            "event_row_index": pa.array([1] * len(rows), pa.int64()),
        }
    )


def _final_dict(t: pa.Table) -> dict:
    return {
        r: c
        for r, c in zip(t["repo"].to_pylist(), t["content"].to_pylist())
    }


def _reference_fold(base: dict, rows) -> dict:
    state = dict(base)
    for k, d, o in rows:
        if d == "DELETE":
            state.pop(f"r{k}", None)
        else:
            state[f"r{k}"] = f"v{o}"
    return state


@settings(max_examples=120, deadline=None)
@given(stream=change_stream(), cut=st.integers(min_value=0, max_value=24), base_keys=st.sets(_keys))
def test_lww_fold_associative_and_correct(stream, cut, base_keys):
    """For ANY change stream split at ANY point: base ∘ (a+b) ==
    (base ∘ a) ∘ b, and both equal a sequential dict replay."""
    cut = min(cut, len(stream))
    a, b = stream[:cut], stream[cut:]
    base = pa.table(
        {
            "repo": pa.array([f"r{k}" for k in sorted(base_keys)], pa.string()),
            "path": pa.array(["p"] * len(base_keys), pa.string()),
            "content": pa.array([f"base{k}" for k in sorted(base_keys)], pa.string()),
        }
    )
    whole = _final_dict(lww_fold_arrow(base, _table(stream)))
    split = _final_dict(lww_fold_arrow(lww_fold_arrow(base, _table(a)), _table(b)))
    want = _reference_fold({f"r{k}": f"base{k}" for k in base_keys}, stream)
    assert whole == want
    assert split == want


# -- as-of running-max kernel -------------------------------------------------


@settings(max_examples=80, deadline=None)
@given(
    ev=st.lists(st.tuples(st.integers(0, 4), st.integers(0, 50)), max_size=30),
    orders=st.lists(st.tuples(st.integers(0, 4), st.integers(0, 50)), max_size=20),
)
def test_asof_running_max_matches_bruteforce(ev, orders):
    """The lexsort + maximum.accumulate scan == brute-force 'latest
    event with ts <= order ts per key' for random inputs incl. ties."""
    ev_k = np.array([k for k, _ in ev], dtype=np.int64)
    ev_ts = np.array([t for _, t in ev], dtype=np.int64)
    ev_id = np.arange(len(ev), dtype=np.int64)
    o_k = np.array([k for k, _ in orders], dtype=np.int64)
    o_ts = np.array([t for _, t in orders], dtype=np.int64)

    # kernel (the asof_part core): union both sides, events before
    # orders at ts ties, running max of event positions
    k = np.concatenate([ev_k, o_k])
    ts = np.concatenate([ev_ts, o_ts])
    side = np.concatenate([np.zeros(len(ev), np.int8), np.ones(len(orders), np.int8)])
    eid = np.concatenate([ev_id, np.full(len(orders), -1, np.int64)])
    order = np.lexsort((side, ts, k))
    k, ts, side, eid = k[order], ts[order], side[order], eid[order]
    n = len(k)
    marker = np.where(side == 0, np.arange(n, dtype=np.int64), np.int64(-1))
    last = np.maximum.accumulate(marker) if n else marker
    om = side == 1
    le = last[om]
    safe = np.maximum(le, 0)
    valid = (le >= 0) & (k[safe] == k[om])
    got = {}
    for kk, tt, v, s in zip(k[om], ts[om], valid, safe):
        got.setdefault((int(kk), int(tt)), set()).add(int(eid[s]) if v else None)

    # brute force (ties: the LAST event in input order among max-ts, the
    # same tie-break merge_asof/the kernel use)
    for (kk, tt), vals in got.items():
        cands = [i for i in range(len(ev)) if ev_k[i] == kk and ev_ts[i] <= tt]
        if not cands:
            want = None
        else:
            mx = max(ev_ts[i] for i in cands)
            want = max(i for i in cands if ev_ts[i] == mx)
        assert want in vals, ((kk, tt), vals, want)


# -- sequence packing kernel ---------------------------------------------------


@settings(max_examples=80, deadline=None)
@given(
    docs=st.lists(
        st.tuples(st.sampled_from(["en", "fr", "de"]), st.integers(0, 40)), max_size=40
    ),
    budget=st.integers(min_value=1, max_value=64),
)
def test_packing_prefix_kernel_matches_reference(docs, budget):
    """Vectorized per-lang-segment prefix (the pack_part core) equals a
    per-lang sequential pack."""
    if not docs:
        return
    lang = np.array([l for l, _ in docs])
    did = np.arange(len(docs), dtype=np.int64)
    ntok = np.array([t for _, t in docs], dtype=np.int64)
    _, codes = np.unique(lang, return_inverse=True)
    order = np.lexsort((did, codes))
    l2, n2, c2, d2 = lang[order], ntok[order], codes[order], did[order]
    cum = np.cumsum(n2)
    start = cum - n2
    new = np.ones(len(docs), dtype=bool)
    new[1:] = c2[1:] != c2[:-1]
    head = np.maximum.accumulate(np.where(new, np.arange(len(docs)), 0))
    prefix = start - start[head]
    seq = prefix // budget

    # reference: sequential per-lang cursor in doc_id order
    want = {}
    cursors = {}
    for l, t, d in sorted(zip(lang, ntok, did), key=lambda x: (x[0], x[2])):
        cur = cursors.get(l, 0)
        want[d] = cur // budget
        cursors[l] = cur + t
    got = dict(zip(d2.tolist(), seq.tolist()))
    assert got == want


# -- segment ordering ----------------------------------------------------------


@settings(max_examples=60, deadline=None)
@given(
    nums=st.lists(st.integers(min_value=0, max_value=10**8), min_size=2, max_size=12, unique=True)
)
def test_segment_sort_key_orders_by_number(nums):
    """For any numeric suffixes (any width), key order == numeric order."""
    names = [f"binlog.{n:06d}" if n < 10**6 else f"binlog.{n}" for n in nums]
    got = sorted(names, key=segment_sort_key)
    want = [x[1] for x in sorted(zip(nums, names))]
    assert got == want


@given(
    st.lists(st.integers(min_value=0, max_value=(1 << 62) - 1), min_size=1, max_size=200)
)
def test_mod_m31_owned_equals_mod_m31(xs):
    """The in-place Mersenne fold is value-identical to the allocating
    spec version over its full valid domain [0, 2^62)."""
    import numpy as np

    from myzql_binlog_connector_ray.functions.dedup import mod_m31, mod_m31_owned

    x = np.array(xs, dtype=np.int64)
    assert (mod_m31(x.copy()) == mod_m31_owned(x.copy())).all()


@settings(max_examples=15, deadline=None)
@given(
    windows=st.lists(
        st.dictionaries(
            st.sampled_from(["A", "B", "C", "D", "E", "F"]),
            st.tuples(
                st.sampled_from(["INSERT", "UPDATE", "DELETE"]),
                st.text(alphabet="xyz", min_size=1, max_size=3),
            ),
            max_size=6,
        ),
        min_size=1,
        max_size=4,
    ),
    base_keys=st.sets(st.sampled_from(["A", "B", "C", "D", "E", "F"]), max_size=6),
)
def test_lake_diff_history_match_bruteforce(ray_session, tmp_path_factory, windows, base_keys):
    """lake_diff and lake_history over a hash-partitioned delta lake must
    match a per-key Python replay of the same LWW stream — any window
    pair for diff, full interval chains for history."""
    import uuid

    import pandas as pd
    import pyarrow as pa

    from myzql_binlog_connector_ray.pipelines.ingest import init_lake, lake_diff, lake_history
    from myzql_binlog_connector_ray.state.manifest import commit_delta
    from myzql_binlog_connector_ray.stages.apply import partition_of

    P = 4
    lake = str(tmp_path_factory.mktemp("propdiff") / uuid.uuid4().hex)
    base = sorted(base_keys)
    init_lake(
        pa.table(
            {
                "repo": pa.array(["r"] * len(base), pa.string()),
                "path": pa.array(base, pa.string()),
                "content": pa.array([f"base-{k}" for k in base], pa.string()),
            }
        ),
        lake,
        P,
    )
    marks = [10 * (i + 1) for i in range(len(windows))]
    for w, ops in zip(marks, windows):
        rows = sorted(ops.items())
        if not rows:
            continue
        by_part: dict = {}
        for k, (dml, content) in rows:
            part = int(partition_of(["r"], [k], P)[0])
            by_part.setdefault(part, []).append((k, dml, content))
        for p, prows in by_part.items():
            commit_delta(
                lake,
                p,
                pa.table(
                    {
                        "repo": pa.array(["r"] * len(prows), pa.string()),
                        "path": pa.array([r[0] for r in prows], pa.string()),
                        "content": pa.array([r[2] for r in prows], pa.string()),
                        "dml": pa.array([r[1] for r in prows], pa.string()),
                        "ordinal": pa.array([w] * len(prows), pa.int64()),
                        "event_row_index": pa.array(list(range(len(prows))), pa.int64()),
                    }
                ),
                w,
                key_cols=["repo", "path"],
            )
        # every partition must carry the wave's manifest watermark even if
        # it had no rows (run_ingest commits empty watermarks the same way)

    def replay(upto):
        state = {k: f"base-{k}" for k in base}
        for w, ops in zip(marks, windows):
            if w > upto:
                break
            for k, (dml, content) in sorted(ops.items()):
                if dml == "DELETE":
                    state.pop(k, None)
                else:
                    state[k] = content
        return state

    fc = ["repo", "path", "content"]
    ft = {"repo": pa.string(), "path": pa.string(), "content": pa.string()}

    # diff between every adjacent boundary pair plus the full span
    bounds = [-1] + marks
    pairs = [(bounds[i], bounds[i + 1]) for i in range(len(bounds) - 1)] + [(-1, marks[-1])]
    for lo, hi in pairs:
        s_lo, s_hi = replay(lo), replay(hi)
        want = {}
        for k in set(s_lo) | set(s_hi):
            if k not in s_lo:
                want[k] = "INSERT"
            elif k not in s_hi:
                want[k] = "DELETE"
            elif s_lo[k] != s_hi[k]:
                want[k] = "UPDATE"
        got = lake_diff(lake, lo, hi, sha_col="digest", final_columns=fc, final_types=ft).to_pandas()
        got_map = {} if len(got) == 0 else dict(zip(got["path"], got["change"]))
        assert got_map == want, (lo, hi)

    # history: per-key interval chain == replayed change positions
    h = lake_history(lake, version_col="content").to_pandas()
    for k in set(base) | {k for ops in windows for k in ops}:
        events = [(-1, f"base-{k}", "BASE")] if k in base else []
        for w, ops in zip(marks, windows):
            if k in ops:
                dml, content = ops[k]
                events.append((w, content, dml))
        want_rows = []
        for i, (w, content, dml) in enumerate(events):
            if dml == "DELETE":
                continue
            nxt = events[i + 1][0] if i + 1 < len(events) else None
            want_rows.append((w, content, nxt))
        hk = h[h["path"] == k].sort_values("valid_from")
        got_rows = [
            (int(r.valid_from), r.content, None if pd.isna(r.valid_to) else int(r.valid_to))
            for r in hk.itertuples()
        ]
        assert got_rows == want_rows, k
