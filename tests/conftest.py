from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from huracan_spark.session import get_spark

    s = get_spark("huracan-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"
