import os

import pytest

os.environ.setdefault("RAY_DEDUP_LOGS", "0")


@pytest.fixture(scope="session")
def ray_session():
    """One Ray session for the whole test run (never per-test)."""
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

    from tsdownsample_ray.tuning import tune_data_context

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    tune_data_context(ctx)  # the engine's execution profile (see tuning.py)
    yield
    ray.shutdown()
