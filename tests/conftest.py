from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, "/root/repo")

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from mo_etl_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    s = get_spark(app_name="mo-etl-spark-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE


def pytest_collection_modifyitems(config, items):
    # keep meta/contract tests first so drift fails fast
    items.sort(key=lambda it: 0 if "contract" in it.name else 1)
