"""BENCH harness: headline queries + scaling evidence.

Prints ONE JSON line:
  {"metric": ..., "value": <total headline sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "pagerank": {...}, "scaling": {...}}

Headline metric (BASELINE.json north rule): PageRank edges/sec/iteration to
1e-6 L1 on the transcript-shaped event link graph. Cluster-size scaling is
evidenced sandbox-style (no real cluster): the same fixed-superstep job runs
at local[N] and local[4N] in child processes on the same 30M-edge synthetic
input, INTERLEAVED in adjacent A/B pairs (default 3 pairs) so host drift hits
both levels equally; efficiency = steady-state-throughput(4N) / (4 * thr(N))
using the MEDIAN steady superstep per level, with the per-level IQR, the
per-pair efficiencies (pair ratios cancel slow drift) and the resulting
uncertainty band all quoted, plus a shuffle-free compute
control probe (both parallelism levels share ONE memory bus on this host —
see BENCH/BASELINE.md for the full analysis of what does and does not
transfer to a real N vs 4N cluster).

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# r5 (verdict #3): 24 supersteps with the first 8 dropped — the longer
# steady window plus ParallelGC in the child JVMs is what cut the
# per-level spread; 12/3 was too short for GC/JIT to settle at 32 threads
SCALING_ITERS = 24  # fixed supersteps for the two-parallelism comparison
SCALING_WARMUP = 8  # discarded supersteps (JIT + cache + GC settling)


def _spark(cores: int, partitions: int | None = None, gc_pinned=False):
    from parallel_pagerank_spark import EngineConfig, get_spark

    # scaling children fix partitions = CPUS at BOTH parallelism levels:
    # identical task granularity, only executor-thread count varies —
    # the local-mode stand-in for N vs 4N executors on a fixed-partition
    # dataset. gc_pinned: throughput-oriented ParallelGC with a fixed
    # thread count so GC behavior is identical at both levels (G1's
    # adaptive sizing was a measured variance source at 32 threads).
    extra = (
        {
            "spark.driver.extraJavaOptions": (
                "-XX:+UseParallelGC -XX:ParallelGCThreads=8"
            )
        }
        if gc_pinned
        else None
    )
    return get_spark(
        app_name=f"bench-{cores}",
        master=f"local[{cores}]",
        config=EngineConfig(
            shuffle_partitions=partitions or max(cores, 8)
        ),
        extra_conf=extra,
    )


def _timed(fn):
    t0 = time.monotonic()
    out = fn()
    return time.monotonic() - t0, out


SCALE_EDGES = int(os.environ.get("BENCH_SCALE_EDGES", "30000000"))
SCALE_VERTICES = int(
    os.environ.get("BENCH_SCALE_VERTICES", str(SCALE_EDGES // 10))
)


def child_scaling(cores: int) -> None:
    """Fixed-superstep PageRank loop on the deterministic synthetic scaling
    graph + a compute-bound control probe; prints JSON.

    Robust timing: the first ``SCALING_WARMUP`` supersteps (JIT compilation,
    cache population) are discarded and the steady-state per-superstep time
    is the MEDIAN of the rest — single-host shuffle timings are noisy."""
    from pyspark.sql import functions as F

    from parallel_pagerank_spark.config import PageRankConfig
    from parallel_pagerank_spark.operators.pagerank import pagerank
    from parallel_pagerank_spark.sources.generators import (
        synthetic_scaling_edges,
    )

    spark = _spark(cores, partitions=CPUS, gc_pinned=True)
    spark.sparkContext.setLogLevel("ERROR")
    edges = synthetic_scaling_edges(spark, SCALE_EDGES, SCALE_VERTICES)
    vertices = spark.range(SCALE_VERTICES)
    # compute-bound control: hash-reduce 200M longs — measures how much CPU
    # scaling the host actually offers a shuffle-free Spark job
    def ctl_trial(offset: int) -> float:
        # fresh lineage per trial (distinct range start) so nothing is
        # reused between trials; chained hashes raise per-row CPU cost
        # well above row-iteration overhead
        df = spark.range(offset, offset + 1_600_000_000, 1, CPUS * 2)
        h = F.xxhash64(F.xxhash64(F.xxhash64("id")))
        return _timed(lambda: df.select(F.sum(h.cast("double"))).collect())[0]

    ctl_trial(0)  # warm codegen/JIT
    t_control = min(ctl_trial(i * 1_000_000_000) for i in (1, 2))
    res = pagerank(
        edges,
        vertices=vertices,
        config=PageRankConfig(
            tol=0.0, max_iter=SCALING_ITERS, spmv_mode="shuffle"
        ),
    )
    iter_times = [m["wall_ms"] / 1000.0 for m in res.metrics]
    print(
        json.dumps(
            {
                "iter_times": [round(t, 3) for t in iter_times],
                "t_control": t_control,
                "edges": SCALE_EDGES,
            }
        )
    )
    spark.stop()


def child_headline() -> None:
    """Headline queries at full parallelism; prints the inner JSON."""
    from pyspark.sql import functions as F

    from parallel_pagerank_spark.config import PageRankConfig
    from parallel_pagerank_spark.functions.dedup import (
        minhash_lsh_candidates,
        simhash,
    )
    from parallel_pagerank_spark.functions.similarity import (
        cosine_topk_bruteforce,
    )
    from parallel_pagerank_spark.functions.text import analyze_documents
    from parallel_pagerank_spark.operators.components import (
        large_star_small_star,
    )
    from parallel_pagerank_spark.operators.labelprop import label_propagation
    from parallel_pagerank_spark.operators.pagerank import pagerank
    from parallel_pagerank_spark.operators.triangles import triangle_count
    from parallel_pagerank_spark.sources.events import (
        cooccurrence_edges,
        event_graph_edges,
    )

    spark = _spark(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")

    edges = event_graph_edges(events).cache()
    n_edges = edges.count()

    queries: dict[str, float] = {}
    queries_best: dict[str, float] = {}
    pr_stats: dict = {}

    def q(name, fn, repeats=2):
        # report the COLD first run as the headline (comparable to the
        # round-1 single-run methodology — repeat runs can hit internally
        # persisted intermediates like LSH signatures and would overstate
        # speed); best-of-k is recorded separately as the noise-floor /
        # stability signal
        cold, out = _timed(fn)
        best = cold
        for _ in range(repeats - 1):
            t, out = _timed(fn)
            best = min(best, t)
        queries[name] = cold
        queries_best[name] = best
        return out

    res = q(
        "pagerank_1e6",
        lambda: pagerank(
            edges, config=PageRankConfig(tol=1e-6, max_iter=300)
        ),
    )
    pr_loop_s = sum(m["wall_ms"] for m in res.metrics) / 1000.0
    pr_stats = {
        "iterations": res.iterations,
        "converged": res.converged,
        "final_l1": res.metrics[-1]["l1"] if res.metrics else None,
        "edges": n_edges,
        "loop_sec": pr_loop_s,
        "edges_per_sec_per_iter": (
            n_edges * res.iterations / pr_loop_s if pr_loop_s else None
        ),
    }
    q(
        "connected_components",
        lambda: large_star_small_star(edges).components.count(),
    )
    q(
        "label_propagation_5",
        lambda: label_propagation(edges, max_iter=5).labels.count(),
    )
    q(
        "triangle_count",
        lambda: triangle_count(cooccurrence_edges(events, 2)),
    )
    # Projection-only queries must be consumed through a full-row checksum:
    # a bare count() lets Catalyst prune every computed column and times
    # nothing but the parquet scan (rounds 1-2 under-reported these two —
    # see BENCH/BASELINE.md methodology note).
    def _checksum(df):
        # bit_xor, not sum: summing 64-bit hashes overflows under ANSI
        return df.select(
            F.xxhash64(F.struct("*")).alias("h")
        ).agg(F.bit_xor("h")).collect()

    q("text_analysis", lambda: _checksum(analyze_documents(docs)))
    q(
        "minhash_lsh",
        lambda: minhash_lsh_candidates(docs).count(),
    )
    q("simhash", lambda: _checksum(simhash(docs)))
    q(
        "knn_bruteforce",
        lambda: cosine_topk_bruteforce(
            emb, emb.orderBy("vec_id").limit(8), k=10
        ).count(),
    )
    from parallel_pagerank_spark.operators.bfs import bfs_distances
    from parallel_pagerank_spark.operators.hits import hits
    from parallel_pagerank_spark.operators.paths import sssp_distances

    bfs_sources = events.filter(F.col("event_id") % 97 == 0).select(
        F.col("event_id").alias("id")
    )
    q("hits_10", lambda: hits(edges, max_iter=10).scores.count())
    q(
        "bfs_8",
        lambda: bfs_distances(
            edges, bfs_sources, max_hops=8
        ).distances.count(),
    )
    wedges = edges.select(
        "src",
        "dst",
        (F.lit(1) + F.pmod(F.col("src") + F.col("dst"), F.lit(5)))
        .cast("double")
        .alias("w"),
    )
    q(
        "sssp_6",
        lambda: sssp_distances(
            wedges, bfs_sources, weight_col="w", max_rounds=6
        ).distances.count(),
    )
    # forced-distributed twins (fast_path_edges=0): the 100 TB-relevant
    # figures for the three routed iterative ops — the routed rows above
    # time the vectorized tier, which hides distributed-tier regressions
    # (r3 verdict). Reported SEPARATELY so the headline sum stays
    # comparable round-over-round. Single run each: superstep-overhead-
    # bound at this SF; a warm repeat would not change what they measure.
    distributed: dict[str, float] = {}
    distributed["hits_10_dist"], _ = _timed(
        lambda: hits(edges, max_iter=10, fast_path_edges=0).scores.count()
    )
    distributed["bfs_8_dist"], _ = _timed(
        lambda: bfs_distances(
            edges, bfs_sources, max_hops=8, fast_path_edges=0
        ).distances.count()
    )
    distributed["sssp_6_dist"], _ = _timed(
        lambda: sssp_distances(
            wedges,
            bfs_sources,
            weight_col="w",
            max_rounds=6,
            fast_path_edges=0,
        ).distances.count()
    )
    # wave-14 ops, reported SEPARATELY so the 11-query headline sum stays
    # comparable round-over-round. Full-row checksum consumption, same
    # honesty rule as the headline.
    from parallel_pagerank_spark.functions.lm import bigram_lm_score
    from parallel_pagerank_spark.functions.text import pii_stats
    from parallel_pagerank_spark.functions.urls import domain_stats
    from parallel_pagerank_spark.operators.linkanalysis import adamic_adar

    extras: dict[str, float] = {}
    extras["lm_score"], _ = _timed(
        lambda: _checksum(
            bigram_lm_score(docs.filter(F.col("lang") == "en"), docs)
        )
    )
    extras["pii_scrub"], _ = _timed(lambda: _checksum(pii_stats(docs)))
    extras["url_domains"], _ = _timed(
        lambda: _checksum(
            domain_stats(
                docs.withColumn(
                    "text",
                    F.concat(
                        F.col("text"),
                        F.lit(" https://s"),
                        F.pmod(F.col("doc_id"), F.lit(50)).cast("string"),
                        F.lit(".example.com/p"),
                    ),
                )
            )
        )
    )
    extras["adamic_adar"], _ = _timed(
        lambda: _checksum(adamic_adar(edges))
    )
    # wave-20 ops, same separate-extras rule
    from parallel_pagerank_spark.functions.layout import zorder_key
    from parallel_pagerank_spark.sources.events import (
        conversation_entropy,
        tool_transitions,
    )

    extras["tool_transitions"], _ = _timed(
        lambda: _checksum(tool_transitions(events))
    )
    # round the two float columns to 6 (as _q_conv_entropy does) so the
    # full-row checksum is decimal-stable; the underlying ln-sum is
    # already an order-deterministic sorted fold (r5), this makes the
    # consumed rows additionally robust to any future engine 1-ulp shift
    extras["conv_entropy"], _ = _timed(
        lambda: _checksum(
            conversation_entropy(events).select(
                "user_id",
                "n_events",
                "n_tools",
                F.round("entropy", 6).alias("entropy"),
                F.round("entropy_ratio", 6).alias("entropy_ratio"),
            )
        )
    )
    extras["zorder_layout"], _ = _timed(
        lambda: _checksum(
            zorder_key(
                events.filter(F.col("user_id").isNotNull()).select(
                    "event_id",
                    "user_id",
                    F.unix_micros(F.col("ts").cast("timestamp")).alias(
                        "ts_us"
                    ),
                ),
                ["user_id", "ts_us"],
            )
        )
    )
    print(
        json.dumps(
            {
                "queries": queries,
                "queries_best": queries_best,
                "pagerank": pr_stats,
                "distributed_tiers": distributed,
                "extras": extras,
            }
        )
    )
    spark.stop()


def run_child(args: list[str]) -> dict:
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), *args],
        capture_output=True,
        text=True,
        env=env,
        timeout=3000,
    )
    last = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if not last:
        raise RuntimeError(
            f"child {args} produced no JSON; stderr tail: "
            f"{out.stderr[-2000:]}"
        )
    return json.loads(last[-1])


def main() -> None:
    if len(sys.argv) > 1:
        if sys.argv[1] == "--scaling-child":
            child_scaling(int(sys.argv[2]))
            return
        if sys.argv[1] == "--headline-child":
            child_headline()
            return

    small = max(2, CPUS // 4)
    # INTERLEAVED pairs (A/B A/B A/B): host drift (thermal, page cache,
    # co-tenant load) hits both parallelism levels equally instead of
    # biasing whichever ran second (r3 verdict: the committed efficiency
    # rode a single quiet superstep — spread must be quoted, not hidden).
    # Three adjacent pairs additionally give PAIRED efficiencies whose
    # median is robust to slow drift across the ~10-minute window.
    n_pairs = int(os.environ.get("BENCH_SCALING_PAIRS", "3"))
    runs: list[tuple[int, dict]] = []
    for _ in range(n_pairs):
        for level in (small, CPUS):
            runs.append((level, run_child(["--scaling-child", str(level)])))
    head = run_child(["--headline-child"])

    def steady_times(level: int) -> list[float]:
        out: list[float] = []
        for lv, r in runs:
            if lv == level:
                out.extend(r["iter_times"][SCALING_WARMUP:])
        return out

    t_small_all = steady_times(small)
    t_big_all = steady_times(CPUS)
    med_small = statistics.median(t_small_all)
    med_big = statistics.median(t_big_all)

    def iqr(xs: list[float]) -> tuple[float, float]:
        q = statistics.quantiles(xs, n=4, method="inclusive")
        return q[0], q[2]

    q1_s, q3_s = iqr(t_small_all)
    q1_b, q3_b = iqr(t_big_all)
    thr_small = SCALE_EDGES / med_small
    thr_big = SCALE_EDGES / med_big
    eff_pooled = thr_big / (4.0 * thr_small)
    # the efficiency's honest uncertainty band from the per-level IQRs
    eff_lo = (q1_s / (4.0 * q3_b))
    eff_hi = (q3_s / (4.0 * q1_b))
    # paired efficiencies: each adjacent (small, big) pair shares its
    # ~3-minute host window, so the pair ratio cancels slow drift; the
    # median-of-pairs is the headline-stability figure (r3 verdict #3)
    pair_effs: list[float] = []
    for i in range(0, len(runs) - 1, 2):
        ms = statistics.median(runs[i][1]["iter_times"][SCALING_WARMUP:])
        mb = statistics.median(
            runs[i + 1][1]["iter_times"][SCALING_WARMUP:]
        )
        pair_effs.append(ms / (4.0 * mb))
    eff_paired = statistics.median(pair_effs)
    t_ctl_small = min(r["t_control"] for lv, r in runs if lv == small)
    t_ctl_big = min(r["t_control"] for lv, r in runs if lv == CPUS)
    ctl_efficiency = t_ctl_small / (4.0 * t_ctl_big)
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    result = {
        "metric": "pagerank_edges_per_sec_per_iter_to_1e-6_L1",
        "value": round(sum(head["queries"].values()), 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in head["queries"].items()},
        "queries_best": {
            k: round(v, 3) for k, v in head.get("queries_best", {}).items()
        },
        "sf": float(sf),
        "pagerank": head["pagerank"],
        "distributed_tiers": {
            k: round(v, 3)
            for k, v in head.get("distributed_tiers", {}).items()
        },
        "extras": {
            k: round(v, 3) for k, v in head.get("extras", {}).items()
        },
        "scaling": {
            "cores_small": small,
            "cores_big": CPUS,
            "scale_edges": SCALE_EDGES,
            "iters": SCALING_ITERS,
            "warmup_dropped": SCALING_WARMUP,
            "runs_per_level": n_pairs,
            "interleaving": "A/B " * n_pairs,
            "t_iter_median_small": round(med_small, 3),
            "t_iter_median_big": round(med_big, 3),
            "t_iter_iqr_small": [round(q1_s, 3), round(q3_s, 3)],
            "t_iter_iqr_big": [round(q1_b, 3), round(q3_b, 3)],
            "iter_times_small": [round(t, 3) for t in t_small_all],
            "iter_times_big": [round(t, 3) for t in t_big_all],
            "throughput_small_edges_per_sec": round(thr_small, 1),
            "throughput_big_edges_per_sec": round(thr_big, 1),
            # HEADLINE (r5, verdict #3): the median of the per-pair
            # efficiencies — each adjacent A/B pair shares its host
            # window, so the pair ratio cancels slow drift; this is the
            # most run-to-run-stable estimator the harness produces
            "efficiency": round(eff_paired, 4),
            "efficiency_pooled": round(eff_pooled, 4),
            "efficiency_iqr_band": [round(eff_lo, 4), round(eff_hi, 4)],
            "pair_efficiencies": [round(e, 4) for e in pair_effs],
            "efficiency_paired_median": round(eff_paired, 4),
            "spread_small_iqr_over_median": round(
                (q3_s - q1_s) / med_small, 4
            ),
            "spread_big_iqr_over_median": round(
                (q3_b - q1_b) / med_big, 4
            ),
            "cpu_control_efficiency": round(ctl_efficiency, 4),
            "note": (
                "single-host stand-in for N vs 4N executors: both levels "
                "share one memory bus, so shuffle-bound supersteps cap "
                "below the cpu_control ceiling; see BENCH/BASELINE.md. "
                "HEADLINE efficiency = median of per-pair ratios over "
                "interleaved A/B pairs (pair ratios cancel slow host "
                "drift); pooled-median efficiency, the IQR band, and the "
                "per-level relative spreads are quoted alongside. "
                "24 supersteps, first 8 dropped, ParallelGC pinned in "
                "both child JVMs."
            ),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
