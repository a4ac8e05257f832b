from __future__ import annotations

import pytest

from a3_fp_bigdata_spark.session import build_session

SF0001 = "/root/testdata/sf0.001"
SF001 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = build_session(
        app_name="a3-tests",
        master="local[4]",
        shuffle_partitions=4,
    )
    yield s
    s.stop()
