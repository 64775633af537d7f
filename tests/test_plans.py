"""Plot sinks (A9 counterpart) and the cross-run comparison harness."""

from __future__ import annotations

import struct
import zlib

import pytest

from parallel_pagerank_spark.config import PageRankConfig
from parallel_pagerank_spark.operators.pagerank import pagerank

from .conftest import edges_df
from .oracles import SMALL_GRAPH


def _png_dims(path: str) -> tuple[int, int]:
    with open(path, "rb") as f:
        data = f.read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    assert data[12:16] == b"IHDR"
    w, h = struct.unpack(">II", data[16:24])
    # IDAT must inflate to h * (1 + w*3) filter-prefixed scanline bytes
    idat = b""
    i = 8
    while i < len(data):
        (length,) = struct.unpack(">I", data[i : i + 4])
        tag = data[i + 4 : i + 8]
        if tag == b"IDAT":
            idat += data[i + 8 : i + 8 + length]
        i += 12 + length
    assert len(zlib.decompress(idat)) == h * (1 + w * 3)
    return w, h


def test_plot_sinks(spark, tmp_path):
    from parallel_pagerank_spark.operators.stats import rank_histogram
    from parallel_pagerank_spark.plans.plots import (
        convergence_plot,
        rank_distribution_plot,
        top_ranked_plot,
    )

    res = pagerank(edges_df(spark, SMALL_GRAPH), config=PageRankConfig())
    files = convergence_plot(res.metrics, str(tmp_path / "conv"))
    top = [
        (r["id"], r["rank"])
        for r in res.ranks.orderBy("rank", ascending=False).collect()
    ]
    files += top_ranked_plot(top, str(tmp_path / "top"))
    hist = [
        (r["lo"], r["hi"], r["num_vertices"])
        for r in rank_histogram(res.ranks, bins=8).collect()
    ]
    files += rank_distribution_plot(hist, str(tmp_path / "hist"))
    assert len(files) == 6
    for f in files:
        if f.endswith(".png"):
            w, h = _png_dims(f)
            assert w >= 160 and h >= 100
        else:
            body = open(f).read()
            assert body.startswith("<svg") and body.rstrip().endswith("</svg>")
    # convergence SVG carries real content: both series + log-scale labels
    conv = open(str(tmp_path / "conv.svg")).read()
    assert "polyline" in conv and "l1" in conv and "max_err" in conv


def test_comparison_report(spark):
    from parallel_pagerank_spark.plans.compare import (
        compare_ranks,
        comparison_report,
    )

    df = edges_df(spark, SMALL_GRAPH)
    fast = pagerank(df, config=PageRankConfig())
    loop = pagerank(df, config=PageRankConfig(fast_path_threshold=0))
    d = compare_ranks(fast.ranks, loop.ranks)
    assert d["n_unmatched"] == 0
    assert d["max_abs_diff"] == pytest.approx(0.0, abs=1e-9)
    assert d["topk_overlap"] == 1.0
    report = comparison_report({"vectorized": fast, "dataframe": loop})
    assert "PAGERANK METHOD COMPARISON" in report
    assert "vectorized" in report and "dataframe" in report
    assert "max|Δrank|" in report
