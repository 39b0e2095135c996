import pytest


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
def tiny_fixture():
    """~6k-row deterministic transcripts stream (FIXTURES F1 'tiny')."""
    from condor_ray.sources.transcripts import generate_stream_fixture

    return generate_stream_fixture(n_rows=6000, n_convs=200, seed=42, n_fragments=6)


@pytest.fixture(scope="session")
def small_fixture():
    """~60k-row stream (FIXTURES F1 'small')."""
    from condor_ray.sources.transcripts import generate_stream_fixture

    return generate_stream_fixture(n_rows=60000, n_convs=2000, seed=42, n_fragments=12)
