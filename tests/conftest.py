from __future__ import annotations

import pytest

from vector_database_in_rust_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="vdb-tests", shuffle_partitions=8)
    yield s
    s.stop()
