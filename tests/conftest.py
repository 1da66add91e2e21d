import pytest
import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    """One Ray session for the whole pytest run (driver contract)."""
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
def source_files_small():
    from aws_medallion_datalake_ray.sources.fixtures import make_source_files

    return make_source_files(3000, seed=42)


@pytest.fixture(scope="session")
def sf_dir():
    import os

    return os.environ.get("GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
