import os
import sys

import pytest
import ray

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Dynamic oracles (queries3.dynamic_oracles) inline fit constants derived from
# the input tables; point them at the sf the tests read (driver default: sf0.01).
os.environ["GRAFT_ORACLE_SF_DIR"] = "/root/testdata/sf0.001"


@pytest.fixture(scope="session", autouse=True)
def ray_session():
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
def sf_small():
    return "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def transcripts_dir(tmp_path_factory):
    from sts_opentelemetry_collector_ray.sources import generate_transcripts

    out = str(tmp_path_factory.mktemp("transcripts"))
    generate_transcripts(out, n_turns=5000, seed=42)
    return out
