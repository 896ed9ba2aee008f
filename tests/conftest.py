import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def fixture_paths(sf_dir, tmp_path_factory):
    """Segments + base lake for sf0.001, built once per session."""
    from myzql_binlog_connector_ray.fixtures.change_stream import materialize

    work = str(tmp_path_factory.mktemp("cdcfix"))
    return materialize(sf_dir, work, num_segments=4, rows_per_event=50)
