from __future__ import annotations

import pytest

SF_DIR_SMALL = "/root/testdata/sf0.001"
SF_DIR_MEDIUM = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from dbt_tpch_spark.session import get_spark

    s = get_spark("dbt-tpch-spark-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR_SMALL
