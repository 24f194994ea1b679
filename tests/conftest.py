from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from flink_realtime_data_eng_spark.session import get_test_spark


@pytest.fixture(scope="session")
def spark():
    s = get_test_spark()
    s.sparkContext.setLogLevel("ERROR")
    yield s
