from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from pholcus_spark.session import build_spark

    extra = {}
    if os.environ.get("PHOLCUS_TEST_NO_AQE"):
        extra["spark.sql.adaptive.enabled"] = "false"
    s = build_spark(
        "pholcus-tests", parallelism=8, shuffle_partitions=8, extra_conf=extra
    )
    yield s
    s.stop()
