"""Cross-run comparison harness — the engine-side counterpart of the
reference's compare_methods.py:136-213 side-by-side method table.

``compare_ranks`` diffs two rank DataFrames distributively (join + one
aggregate — no collect of the full vectors); ``comparison_report`` renders
the reference's fixed-width table over any number of named PageRankResults.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def compare_ranks(a: DataFrame, b: DataFrame, k: int = 10) -> dict:
    """Diff two ``(id, rank)`` DataFrames: max/L1 rank deltas over the id
    join plus top-k id-set overlap. One join + one aggregate."""
    joined = (
        a.select("id", F.col("rank").alias("rank_a"))
        .join(b.select("id", F.col("rank").alias("rank_b")), "id", "full")
    )
    row = joined.agg(
        F.count("*").alias("n_union"),
        F.sum(
            (F.col("rank_a").isNull() | F.col("rank_b").isNull()).cast("long")
        ).alias("n_unmatched"),
        F.max(F.abs(F.col("rank_a") - F.col("rank_b"))).alias("max_abs"),
        F.sum(F.abs(F.col("rank_a") - F.col("rank_b"))).alias("l1"),
    ).first()
    top = lambda df: {  # noqa: E731
        r["id"]
        for r in df.orderBy(F.desc("rank"), F.asc("id")).limit(k).collect()
    }
    ta, tb = top(a), top(b)
    return {
        "n_union": row["n_union"],
        "n_unmatched": int(row["n_unmatched"] or 0),
        "max_abs_diff": float(row["max_abs"]) if row["max_abs"] is not None else None,
        "l1_diff": float(row["l1"]) if row["l1"] is not None else None,
        "topk_overlap": len(ta & tb) / max(len(ta | tb), 1),
    }


def comparison_report(named_results: dict, k: int = 10) -> str:
    """Fixed-width table over named PageRankResults (mirrors
    compare_methods.py:136-159's METHOD COMPARISON layout), followed by
    pairwise rank-delta lines vs the first-listed baseline."""
    lines = [
        "=" * 78,
        "PAGERANK METHOD COMPARISON",
        "=" * 78,
        f"{'Method':<20} {'Mode':<12} {'Iterations':<12} {'Converged':<10} "
        f"{'Final L1':<14}",
        "-" * 78,
    ]
    for name, res in named_results.items():
        final_l1 = res.metrics[-1]["l1"] if res.metrics else float("nan")
        lines.append(
            f"{name:<20} {getattr(res, 'mode', '?'):<12} "
            f"{res.iterations:<12} {str(res.converged):<10} {final_l1:<14.6e}"
        )
    names = list(named_results)
    if len(names) > 1:
        lines.append("-" * 78)
        base = named_results[names[0]]
        for other in names[1:]:
            d = compare_ranks(
                base.ranks, named_results[other].ranks, k=k
            )
            fmt = lambda v: "n/a" if v is None else f"{v:.3e}"  # noqa: E731
            lines.append(
                f"{names[0]} vs {other}: max|Δrank|="
                f"{fmt(d['max_abs_diff'])}  L1Δ={fmt(d['l1_diff'])}  "
                f"top{k} overlap={d['topk_overlap']:.0%}  "
                f"unmatched ids={d['n_unmatched']}"
            )
    lines.append("=" * 78)
    return "\n".join(lines)
