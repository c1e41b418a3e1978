import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    import ray

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
def tiny_table(tmp_path_factory):
    """FIXTURES.md F1 'tiny': 4 partitions x 250 rows."""
    from etl_data_validation_kio_ray.sources.synth import generate_token_table

    d = tmp_path_factory.mktemp("tiny")
    return generate_token_table(str(d), partitions=4, rows_per_partition=250)
