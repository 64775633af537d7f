"""Events-table adapter: the driver testdata's ``events`` table
(event_id, ts, user_id, event_type, value, props) is transcript-shaped
(user_id ~ conv_id, ts-order ~ turn order, event_type ~ tool), so the same
link-derivation semantics as operators/derive.py apply (TESTDATA.md §5
events→graph mapping). Every derivation here is ANSI-SQL-expressible so the
driver's DuckDB oracle can run the identical logic.

Vertex id = event_id (already a dense-ish long key).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window, functions as F


def reply_edges(events: DataFrame) -> DataFrame:
    """Consecutive events per user under the stable (ts, event_id) order —
    the reply-link analog of derive_edges (E1)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        events.select(
            F.col("event_id").alias("src"),
            F.lead("event_id").over(w).alias("dst"),
        )
        .filter(F.col("dst").isNotNull())
    )


def handoff_edges(events: DataFrame) -> DataFrame:
    """Consecutive events sharing an event_type, chained across users in
    (ts, event_id) order — the tool-handoff analog."""
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    return (
        events.select(
            F.col("event_id").alias("src"),
            F.lead("event_id").over(w).alias("dst"),
        )
        .filter(F.col("dst").isNotNull())
    )


def event_graph_edges(events: DataFrame) -> DataFrame:
    """reply ∪ handoff (duplicates kept — multi-edge semantics)."""
    return reply_edges(events).unionByName(handoff_edges(events))


def tool_stats(events: DataFrame) -> DataFrame:
    """Per-tool (event_type) activity profile: ``(event_type, n_events,
    n_users, first_us, last_us, mean_value)`` — the per-tool half of a
    transcript-traffic dashboard. Timestamps export as exact epoch
    microseconds (integer — hash-stable across engines, unlike rendered
    timestamps).

    One aggregation, one shuffle on event_type; n_users is an exact
    distinct inside the group (partial aggregation still applies)."""
    return events.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.unix_micros(F.min("ts").cast("timestamp")).alias("first_us"),
        F.unix_micros(F.max("ts").cast("timestamp")).alias("last_us"),
        F.avg("value").alias("mean_value"),
    )


def conversation_stats(events: DataFrame) -> DataFrame:
    """Per-conversation (user_id) profile: ``(user_id, n_events,
    n_event_types, start_us, end_us, duration_us)`` — length and span of
    each transcript timeline. Same single-aggregation shape as
    tool_stats; duration is integer microsecond arithmetic."""
    agg = events.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("event_type").alias("n_event_types"),
        F.unix_micros(F.min("ts").cast("timestamp")).alias("start_us"),
        F.unix_micros(F.max("ts").cast("timestamp")).alias("end_us"),
    )
    return agg.select(
        "user_id",
        "n_events",
        "n_event_types",
        "start_us",
        "end_us",
        (F.col("end_us") - F.col("start_us")).alias("duration_us"),
    )


def cooccurrence_edges(events: DataFrame, window: int = 2) -> DataFrame:
    """Canonical (src<dst) co-occurrence pairs: events of the same user at
    session distance <= ``window`` positions on the per-user timeline.
    Gives a triangle-rich graph (consecutive triples close wedges).

    Derivation is ONE window pass: ``lead(event_id, k)`` for k = 1..window
    over the stable (ts, event_id) order — each event pairs with its next
    ``window`` successors directly, so the output is linear in input size
    (|events| × window rows) with NO join. The earlier per-user self-join
    formulation materialized O(n_u²) candidate pairs per user before the
    distance filter — a straggler time-bomb once one power user has 10⁶
    events (10¹² join-loop iterations in a single task); the window form
    does exactly |events| × window work regardless of per-user skew.
    Result set is identical (every in-window ordered pair exactly once).
    NULL-user events are dropped (the window would otherwise group them
    as one pseudo-user, unlike the join-based SQL oracle formulation).
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events = events.filter(F.col("user_id").isNotNull())
    succ = events.select(
        F.col("event_id").alias("id"),
        *[
            F.lead("event_id", k).over(w).alias(f"_n{k}")
            for k in range(1, window + 1)
        ],
    )
    other = F.explode(
        F.array(*[F.col(f"_n{k}") for k in range(1, window + 1)])
    ).alias("other")
    return (
        succ.select("id", other)
        .filter(F.col("other").isNotNull())
        .select(
            F.least("id", "other").alias("src"),
            F.greatest("id", "other").alias("dst"),
        )
    )


def wrap_edges(events: DataFrame, partition_col: str = "user_id") -> DataFrame:
    """One closing edge per partition: last event -> first event under the
    stable (ts, event_id) order. Composed with reply_edges this turns each
    per-user chain into a directed ring — the standard way to give a
    time-ordered (hence acyclic) link derivation a non-trivial
    strongly-connected structure. Single-event partitions produce no edge
    (no self-loops). One window pass, no join."""
    w_asc = Window.partitionBy(partition_col).orderBy("ts", "event_id")
    w_desc = Window.partitionBy(partition_col).orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    ranked = events.select(
        "event_id",
        F.row_number().over(w_asc).alias("ra"),
        F.row_number().over(w_desc).alias("rd"),
        F.first("event_id").over(w_asc).alias("first_id"),
    )
    return (
        ranked.filter((F.col("rd") == 1) & (F.col("ra") > 1))
        .select(
            F.col("event_id").alias("src"),
            F.col("first_id").alias("dst"),
        )
    )


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered-funnel analysis: how many users reach each step of a
    required event sequence, where step i+1 must occur STRICTLY after
    the user's earliest completion of step i.

    The standard product-analytics funnel (view → click → purchase),
    computed as a chain of earliest-completion times:
    t_1(u) = min ts of step-1 events; t_{i+1}(u) = min ts of step-(i+1)
    events with ts > t_i(u). Returns one row per step:
    ``(step_idx, step, n_users)`` with n_users non-increasing.

    Strictly-after uses the raw timestamp only; two events sharing an
    identical timestamp cannot witness consecutive steps (deterministic
    and engine-portable — no tie-break heuristics).

    Plan shape (100 TB): `events` is scanned ONCE — pre-filtered to
    `type_col IN steps` (pushed to the parquet scan) and persisted; each
    stage is a hash aggregation keyed on the user plus an equi-join
    against the previous stage's per-user times. That join side is
    O(active users) — NOT broadcast-size in general; Spark picks a
    shuffle join at scale, which is the right plan. Per-user state is
    one timestamp per step; no window sort, no per-user event arrays (a
    10^6-event power user costs the same as anyone else per stage).
    Each stage is persisted so the single final action computes every
    stage exactly once (stage i feeds both stage i+1 and its own count
    row); nothing runs on the driver until the caller's action.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    spark = events.sparkSession
    relevant = (
        events.filter(F.col(type_col).isin(list(steps)))
        .select(
            F.col(type_col).alias("etype"),
            F.col(user_col).alias("user"),
            F.col(ts_col).alias("t"),
        )
        .persist()
    )
    prev = None  # DataFrame[user, t_prev]
    per_step = []
    for i, step in enumerate(steps):
        stage = relevant.filter(F.col("etype") == step).select("user", "t")
        if prev is not None:
            stage = stage.join(prev, "user").filter(
                F.col("t") > F.col("t_prev")
            )
        cur = stage.groupBy("user").agg(F.min("t").alias("t_prev")).persist()
        per_step.append(
            cur.select(
                F.lit(i + 1).alias("step_idx"),
                F.lit(step).alias("step"),
            )
        )
        prev = cur
    counted = reduce(DataFrame.unionByName, per_step).groupBy(
        "step_idx", "step"
    ).agg(F.count("*").alias("n_users"))
    # a step no user reaches would vanish from the groupBy — left join
    # against the (tiny, broadcast) step list restores its 0 row
    step_list = spark.createDataFrame(
        [(i + 1, s) for i, s in enumerate(steps)],
        "step_idx int, step string",
    )
    return (
        step_list.join(F.broadcast(counted), ["step_idx", "step"], "left")
        .select(
            "step_idx",
            "step",
            F.coalesce("n_users", F.lit(0).cast("long")).alias("n_users"),
        )
    )


def decayed_event_edges(
    events: DataFrame, halflife_us: int = 43_200_000_000
) -> DataFrame:
    """→ (src, dst, weight): reply∪handoff edges weighted by the recency
    of the SOURCE event — w = H / (H + age_us), age_us = max(ts) − ts(src)
    in exact epoch microseconds, H the half-life (default 12 h).

    Hyperbolic decay rather than exp(−λ·age) ON PURPOSE: the weight is a
    single IEEE division of exactly-representable integers, so Spark and
    any SQL oracle compute bit-identical weights (libm exp() may differ
    in the last ulp across engines). w halves at age H, → 0 smoothly;
    feeding these weights to pagerank(weight_col=...) gives the standard
    time-decayed PageRank readout (recent conversational activity ranks
    higher — cf. temporal link-analysis literature, e.g. Yu et al.
    "TimedPageRank" variants, all public).

    Scale: one id-keyed join to attach the source timestamp and one
    broadcast 1-row frame for the reference time; weights are computed
    scan-side, never materialized per iteration.
    """
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    edges = event_graph_edges(events)
    src_ts = events.select(
        F.col("event_id").alias("src"), us.alias("ts_us")
    )
    ref = events.agg(F.max(us).alias("ref_us"))
    return (
        edges.join(src_ts, "src")
        .join(F.broadcast(ref))
        .withColumn(
            "weight",
            F.lit(halflife_us).cast("double")
            / (
                F.lit(halflife_us) + F.col("ref_us") - F.col("ts_us")
            ).cast("double"),
        )
        .select("src", "dst", "weight")
    )


def parse_props(
    events: DataFrame, fields: dict[str, str] | None = None
) -> DataFrame:
    """Typed columns out of the semi-structured ``props`` JSON payload
    (the metadata side-channel every telemetry/transcript feed carries).
    ``fields`` maps JSON key → Spark cast type; default extracts the
    testdata's ``k`` as a long. Extraction is ``get_json_object`` —
    JVM-side JSON path evaluation inside whole-stage codegen, no
    Python — and ``try_cast`` semantics via the permissive path
    (get_json_object yields NULL for absent keys / non-JSON, matching
    DuckDB's json_extract_string).

    Scale shape: a pure per-row projection — no shuffle at all; at
    100 TB the only cost is the scan, and unused props keys are never
    materialized."""
    fields = fields or {"k": "long"}
    cols = [
        F.get_json_object(F.col("props"), f"$.{key}")
        .cast(typ)
        .alias(f"prop_{key}")
        for key, typ in fields.items()
    ]
    return events.select("event_id", "event_type", *cols)


def props_stats(events: DataFrame) -> DataFrame:
    """Per-event_type stats of the extracted ``props.k`` payload:
    ``(event_type, n, k_nulls, k_sum, k_min, k_max)``. All-integer on
    purpose (sum/min/max, not avg) so the driver hash check is exact;
    one hash aggregation after the stateless parse projection."""
    parsed = parse_props(events)
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.count_if(F.col("prop_k").isNull()).alias("k_nulls"),
        F.sum("prop_k").alias("k_sum"),
        F.min("prop_k").alias("k_min"),
        F.max("prop_k").alias("k_max"),
    )


def tool_latency_stats(events: DataFrame) -> DataFrame:
    """Per-tool response-latency profile: within each conversation
    (user_id) timeline ordered by (ts, event_id), the gap to the
    previous event is attributed to the LATER event's tool
    (event_type) — "how long did this tool take to come back" — then
    summarized per tool as ``(event_type, n_lat, mean_us, p50_us,
    p90_us, p99_us)``.

    All gaps are exact integer microseconds (unix_micros lag
    arithmetic); the mean is exact-int64 sum / count (one IEEE
    division) and the percentiles use Spark ``percentile`` — exact
    linear interpolation, bit-identical to DuckDB ``quantile_cont``
    (the doc_quantiles precedent). First events of a conversation have
    no predecessor and are excluded.

    Scale shape: ONE window pass keyed on the conversation (the
    sessionize shuffle), then one hash aggregation on event_type.
    Exact percentiles sort per group; at 100 TB swap in
    ``approx_percentile`` (documented tier) if per-tool gap counts
    outgrow executor sort memory."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    lat = events.select(
        "event_type",
        (us - F.lag(us).over(w)).alias("lat_us"),
    ).filter(F.col("lat_us").isNotNull())
    return lat.groupBy("event_type").agg(
        F.count("*").alias("n_lat"),
        (
            F.sum("lat_us").cast("double") / F.count("*")
        ).alias("mean_us"),
        F.percentile("lat_us", F.lit(0.5)).alias("p50_us"),
        F.percentile("lat_us", F.lit(0.9)).alias("p90_us"),
        F.percentile("lat_us", F.lit(0.99)).alias("p99_us"),
    )


def tool_transitions(events: DataFrame) -> DataFrame:
    """First-order Markov transition matrix over tools: for every pair of
    consecutive events on a conversation (user_id) timeline under the
    stable (ts, event_id) order, count the (from_tool -> to_tool) handoff
    and normalize per source tool — ``(from_tool, to_tool, n, prob)``
    with ``sum(prob) = 1`` for every from_tool. The agent-behavior
    readout ("after search, what runs next?") that the reference's
    dashboard renders as a handoff table (reference
    dashboard/app.py:1420+ descriptive stats family).

    NULL-conversation events are dropped (same contract as
    cooccurrence_edges); a conversation's last event has no successor
    and contributes no pair.

    Scale shape: ONE window pass keyed on the conversation (the same
    sessionize shuffle every timeline derivation here uses), then one
    two-phase hash aggregation onto the (tools x tools) matrix — at most
    |tools|^2 rows, so the per-source normalizing window runs over a
    vocabulary-sized table, never the corpus. ``n`` is exact int64;
    ``prob`` is one IEEE division of exact integers (engine-portable
    bit-for-bit, the hot_keys share precedent)."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        events.filter(F.col("user_id").isNotNull())
        .select(
            F.col("event_type").alias("from_tool"),
            F.lead("event_type").over(w).alias("to_tool"),
        )
        .filter(F.col("to_tool").isNotNull())
    )
    counts = pairs.groupBy("from_tool", "to_tool").agg(
        F.count(F.lit(1)).alias("n")
    )
    per_src = Window.partitionBy("from_tool")
    return counts.select(
        "from_tool",
        "to_tool",
        "n",
        (F.col("n") / F.sum("n").over(per_src)).alias("prob"),
    )


def conversation_entropy(events: DataFrame) -> DataFrame:
    """Per-conversation tool-diversity entropy — the transcript analog
    of functions/text.token_entropy: Shannon entropy of each
    conversation's event_type distribution in the same rearranged form

        H = ln(T) - (Σ_tool c·ln c) / T      (nats; T = event count)

    returning ``(user_id, n_events, n_tools, entropy, entropy_ratio)``
    with entropy_ratio = H / ln(n_tools) ∈ [0, 1] (1 = uniform tool
    usage; 0 for single-tool conversations by convention). Low-entropy
    conversations are single-tool loops (retry storms, scripted
    traffic); high-entropy ones exercise the full tool surface — the
    per-conversation quality signal a transcript-curation pass filters
    on. NULL-conversation events are dropped (the timeline-derivation
    contract).

    Scale shape: two hash aggregations, both keyed by the conversation
    (+tool) — a corpus-hot tool can never skew a shuffle partition,
    exactly the doc-keyed rule token_entropy documents.

    Determinism: like token_entropy, the Σ c·ln(c) term is a
    left-to-right fold over the ascending-sorted count multiset, so
    the entropy is a fixed property of the data (bit-identical under
    any repartitioning) rather than of the partition combine order —
    equal counts contribute equal summands, so tie order is
    irrelevant."""
    counts = (
        events.filter(F.col("user_id").isNotNull())
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    t = F.sum("c")
    sum_clnc = F.aggregate(
        F.sort_array(F.collect_list(F.col("c").cast("double"))),
        F.lit(0.0),
        lambda acc, x: acc + x * F.log(x),
    )
    h = F.log(t.cast("double")) - sum_clnc / t.cast("double")
    nd = F.count(F.lit(1))
    return counts.groupBy("user_id").agg(
        t.alias("n_events"),
        nd.alias("n_tools"),
        h.alias("entropy"),
        F.when(nd > 1, h / F.log(nd.cast("double")))
        .otherwise(F.lit(0.0))
        .alias("entropy_ratio"),
    )
