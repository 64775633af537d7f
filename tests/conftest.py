from __future__ import annotations

import pytest

from parallel_pagerank_spark import EngineConfig
from parallel_pagerank_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="ppr-tests",
        master="local[4]",
        config=EngineConfig(shuffle_partitions=8),
    )
    yield s
    s.stop()


def edges_df(spark, edges):
    return spark.createDataFrame(
        [(int(s), int(t)) for s, t in edges], "src long, dst long"
    )
