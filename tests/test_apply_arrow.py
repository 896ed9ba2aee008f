"""Arrow LWW fold ≡ pandas LWW fold, on random DML sequences."""

import pandas as pd
import pyarrow as pa
from hypothesis import given, settings

from myzql_binlog_connector_ray.stages.apply import _lww_fold
from myzql_binlog_connector_ray.stages.apply_arrow import lww_fold_arrow
from tests.test_property import dml_sequences


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    cols = ["repo", "path", "content", "commit"]
    return df[cols].sort_values(["repo", "path"]).reset_index(drop=True)


@given(dml_sequences())
@settings(max_examples=100, deadline=None)
def test_arrow_fold_equals_pandas_fold(events):
    df = pd.DataFrame(events)
    t = pa.Table.from_pandas(df, preserve_index=False)
    pd.testing.assert_frame_equal(
        _norm(lww_fold_arrow(None, t).to_pandas()), _norm(_lww_fold(None, df))
    )


@given(dml_sequences())
@settings(max_examples=50, deadline=None)
def test_arrow_fold_with_base_equals_pandas(events):
    df = pd.DataFrame(events)
    base = pd.DataFrame(
        [
            {"repo": "r0", "path": "p", "commit": "base", "lang": "py", "content": "base-content"},
            {"repo": "rX", "path": "p", "commit": "base", "lang": "py", "content": "untouched"},
        ]
    )
    got = lww_fold_arrow(pa.Table.from_pandas(base, preserve_index=False), pa.Table.from_pandas(df, preserve_index=False)).to_pandas()
    want = _lww_fold(base.copy(), df)
    pd.testing.assert_frame_equal(_norm(got), _norm(want))


def test_partition_of_arrow_equals_python_lists():
    """The arrow fast path (binary join + siphash of utf-8 bytes) must
    assign the same partition ids as the original per-row f-string path —
    otherwise a key silently splits from its lake partition."""
    from myzql_binlog_connector_ray.stages.apply import partition_of

    repos = [f"org/repo-{i % 7}" for i in range(500)] + ["dup/x"] * 3
    paths = [f"src/mod_{i}.py" for i in range(500)] + ["a.py"] * 3
    via_lists = partition_of(repos, paths, 128)
    via_arrow = partition_of(pa.chunked_array([repos]), pa.chunked_array([paths]), 128)
    assert (via_lists == via_arrow).all()
