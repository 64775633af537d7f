"""Checkpoint/resume (north rule: superstep state resumable with
per-partition lineage + convergence metrics) and source parsing."""

from __future__ import annotations

import json

import numpy as np
import pytest

from parallel_pagerank_spark.config import PageRankConfig
from parallel_pagerank_spark.operators.pagerank import pagerank
from parallel_pagerank_spark.sources.edgelist import (
    read_edge_list,
    write_edge_list,
)

from .conftest import edges_df
from .oracles import SMALL_GRAPH, pagerank_oracle


def test_checkpoint_manifest_and_resume(spark, tmp_path):
    ck = str(tmp_path / "ck")
    df = edges_df(spark, SMALL_GRAPH)
    # interval 5, not 7: the rank DataFrame is referenced twice per
    # superstep (gather + update join), so the un-truncated logical plan
    # DOUBLES per iteration — 2^7 vs 2^5 leaves between truncations made
    # the interval-7 variant ~6x slower in driver-side analysis alone,
    # measuring Catalyst instead of the checkpoint contract
    # tol 1e-4 (reference default, 16 iters vs 26): the checkpoint
    # CONTRACT is under test, not the tolerance — 1e-6 iteration parity
    # is pinned by test_small_graph_golden
    cfg = PageRankConfig(
        tol=1e-4, checkpoint_dir=ck, checkpoint_interval=5
    )
    res = pagerank(df, config=cfg)
    assert res.converged and res.iterations == 16

    manifest = json.loads((tmp_path / "ck/pagerank/manifest.json").read_text())
    iters = [m["iteration"] for m in manifest]
    assert iters == [5, 10, 15, 16]
    assert manifest[-1]["converged"] is True
    # per-partition lineage recorded
    assert sum(p["rows"] for p in manifest[-1]["partitions"]) == 4
    # convergence metrics carried in the manifest
    assert len(manifest[-1]["metrics"]) == 16
    assert manifest[-1]["metrics"][-1]["l1"] < 1e-4

    # resume from a converged checkpoint: immediate return, same ranks
    res2 = pagerank(df, config=cfg, resume=True)
    assert res2.converged and res2.iterations == 16
    a = {r["id"]: r["rank"] for r in res.ranks.collect()}
    b = {r["id"]: r["rank"] for r in res2.ranks.collect()}
    assert a == b


def test_resume_from_partial_checkpoint(spark, tmp_path):
    """Kill the loop mid-run (max_iter) and resume to convergence: final
    ranks must match the uninterrupted run exactly."""
    ck = str(tmp_path / "ck2")
    df = edges_df(spark, SMALL_GRAPH)
    partial = pagerank(
        df,
        config=PageRankConfig(
            tol=1e-4, checkpoint_dir=ck, checkpoint_interval=5, max_iter=10
        ),
    )
    assert not partial.converged and partial.iterations == 10
    resumed = pagerank(
        df,
        config=PageRankConfig(
            tol=1e-4, checkpoint_dir=ck, checkpoint_interval=5
        ),
        resume=True,
    )
    assert resumed.converged
    # resume restarts from iteration 10 (last checkpoint) and lands on the
    # same fixpoint and total iteration count as the uninterrupted run
    assert resumed.iterations == 16
    oracle_ranks, _, _ = pagerank_oracle(SMALL_GRAPH, tol=1e-4)
    got = {r["id"]: r["rank"] for r in resumed.ranks.collect()}
    assert np.allclose(
        [got[i] for i in range(4)], oracle_ranks, atol=1e-6
    )


def test_components_resume_from_partial_checkpoint(spark, tmp_path):
    """Same resume contract for connected components: interrupt the
    min-label loop mid-run, resume from the durable manifest, and land on
    the identical labeling and total superstep count as an unbroken run."""
    from parallel_pagerank_spark.operators.components import (
        connected_components,
    )

    ck = str(tmp_path / "ck_cc")
    path_edges = [(i, i + 1) for i in range(11)]  # diameter-11 path
    df = edges_df(spark, path_edges)
    full = connected_components(df, fast_path_edges=0)
    partial = connected_components(
        df, max_iter=5, checkpoint_dir=ck, checkpoint_interval=2
    )
    assert not partial.converged
    resumed = connected_components(
        df, checkpoint_dir=ck, checkpoint_interval=2, resume=True
    )
    assert resumed.converged
    assert resumed.supersteps == full.supersteps == 12
    got = {r["id"]: r["component"] for r in resumed.components.collect()}
    assert got == {i: 0 for i in range(12)}
    # resuming a converged run returns immediately from the manifest
    again = connected_components(
        df, checkpoint_dir=ck, checkpoint_interval=2, resume=True
    )
    assert again.converged and again.supersteps == 12


def test_edge_list_roundtrip(spark, tmp_path):
    df = edges_df(spark, SMALL_GRAPH)
    path = str(tmp_path / "edges_out")
    write_edge_list(df, path)
    back = read_edge_list(spark, path)
    assert sorted((r["src"], r["dst"]) for r in back.collect()) == sorted(
        SMALL_GRAPH
    )


def test_edge_list_tolerant_parse(spark, tmp_path):
    p = tmp_path / "bad.txt"
    p.write_text(
        "# header comment\n0 1\n1\t2\n\nnot numbers\n3 garbage\n2 0\n# end\n"
    )
    got = read_edge_list(spark, str(p)).collect()
    assert sorted((r["src"], r["dst"]) for r in got) == [
        (0, 1),
        (1, 2),
        (2, 0),
    ]
