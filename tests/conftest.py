import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    """One Ray session for the whole test run (per the driver contract)."""
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def sf_dir():
    # GRAFT_TEST_SF=/root/testdata/sf0.1 re-runs the whole oracle/bounds
    # suite at another scale (the round-4 10x sweep that caught the motifs
    # CMS-collision divergence); default stays the fast gate scale.
    import os

    return os.environ.get("GRAFT_TEST_SF", "/root/testdata/sf0.001")
