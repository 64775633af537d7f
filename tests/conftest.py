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


def pytest_collection_modifyitems(config, items):
    """Default suite stays under the ~10-minute budget (r3 verdict #9):
    tests marked ``exhaustive`` — the slowest distributed-loop runs whose
    surfaces are ALSO covered by a faster test, a driver oracle row, or
    both — are skipped unless SPARK_GRAFT_EXHAUSTIVE=1. The committed
    durations snapshot lives in BENCH/pytest_durations.txt."""
    import os

    if os.environ.get("SPARK_GRAFT_EXHAUSTIVE"):
        return
    skip = pytest.mark.skip(
        reason="exhaustive tier (set SPARK_GRAFT_EXHAUSTIVE=1)"
    )
    for item in items:
        if "exhaustive" in item.keywords:
            item.add_marker(skip)
