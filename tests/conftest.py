from __future__ import annotations

import pytest

from parallel_pagerank_spark import EngineConfig
from parallel_pagerank_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    # 4 shuffle partitions: the suite's graphs are tiny, so distributed-
    # loop supersteps are pure task-scheduling overhead — halving the
    # per-stage task count speeds the suite up with identical results
    # (partitioning never affects semantics; plan-shape tests that care
    # about partition counts set their own).
    s = get_spark(
        app_name="ppr-tests",
        master="local[4]",
        config=EngineConfig(shuffle_partitions=4),
    )
    yield s
    s.stop()


def edges_df(spark, edges):
    return spark.createDataFrame(
        [(int(s), int(t)) for s, t in edges], "src long, dst long"
    )
