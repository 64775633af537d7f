"""Wave-16 operators: JSON props extraction, cross-snapshot dedup."""

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# parse_props / props_stats (sources/events.py)
# ---------------------------------------------------------------------------


@pytest.fixture()
def props_events(spark):
    rows = [
        (0, "click", '{"k": 7}'),
        (1, "click", '{"k": 3, "x": "y"}'),
        (2, "click", '{"other": 1}'),  # absent key -> NULL
        (3, "view", "not json at all"),  # malformed -> NULL
        (4, "view", None),  # NULL payload -> NULL
        (5, "view", '{"k": -2}'),
    ]
    return spark.createDataFrame(
        rows, "event_id long, event_type string, props string"
    )


def test_parse_props_null_safety(spark, props_events):
    from parallel_pagerank_spark.sources.events import parse_props

    got = {
        r["event_id"]: r["prop_k"]
        for r in parse_props(props_events).collect()
    }
    assert got == {0: 7, 1: 3, 2: None, 3: None, 4: None, 5: -2}


def test_parse_props_custom_fields(spark, props_events):
    from parallel_pagerank_spark.sources.events import parse_props

    out = parse_props(props_events, {"x": "string", "k": "long"})
    assert set(out.columns) == {"event_id", "event_type", "prop_x", "prop_k"}
    row = {r["event_id"]: r for r in out.collect()}
    assert row[1]["prop_x"] == "y" and row[1]["prop_k"] == 3
    assert row[0]["prop_x"] is None


def test_props_stats(spark, props_events):
    from parallel_pagerank_spark.sources.events import props_stats

    got = {r["event_type"]: r.asDict() for r in props_stats(props_events).collect()}
    assert got["click"]["n"] == 3
    assert got["click"]["k_nulls"] == 1
    assert got["click"]["k_sum"] == 10
    assert got["click"]["k_min"] == 3 and got["click"]["k_max"] == 7
    assert got["view"]["n"] == 3
    assert got["view"]["k_nulls"] == 2
    assert got["view"]["k_sum"] == -2


# ---------------------------------------------------------------------------
# cross_jaccard_join / dedup_against (functions/dedup.py)
# ---------------------------------------------------------------------------


def _shingles(t, n=5):
    import re

    t = re.sub(r"\s+", " ", (t or "").lower()).strip()
    return {t[i : i + n] for i in range(max(len(t) - n + 1, 1))}


@pytest.fixture()
def snapshot_docs(spark):
    ref = [
        (100, "the quick brown fox jumps over the lazy dog"),
        (101, "entirely different reference content right here"),
        (102, "shared exact content"),
    ]
    new = [
        (1, "the quick brown fox jumps over the lazy dot"),  # near-dup of 100
        (2, "shared exact content"),  # exact dup of 102
        (3, "completely novel text that matches nothing else"),
        (4, "completely novel text that matches nothing else"),  # dup of 3
        (5, "another genuinely fresh document body"),
    ]
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    return mk(new), mk(ref)


def test_cross_jaccard_vs_bruteforce(spark, snapshot_docs):
    from parallel_pagerank_spark.functions.dedup import cross_jaccard_join

    new, ref = snapshot_docs
    for t in (0.5, 0.8, 0.95):
        got = {
            (r["new_id"], r["ref_id"]): r["jaccard"]
            for r in cross_jaccard_join(new, ref, threshold=t).collect()
        }
        want = {}
        for nid, ntext in new.collect():
            for rid, rtext in ref.collect():
                a, b = _shingles(ntext), _shingles(rtext)
                j = len(a & b) / len(a | b)
                if j >= t:
                    want[(nid, rid)] = j
        assert set(got) == set(want), f"threshold {t}"
        for k, j in want.items():
            assert got[k] == pytest.approx(j, abs=1e-12)


def test_dedup_against_tiers(spark, snapshot_docs):
    from parallel_pagerank_spark.functions.dedup import dedup_against

    new, ref = snapshot_docs
    # exact tier only: drops 2 (exact dup of ref), groups 3+4
    exact = {
        r["keep_id"]: r["dup_count"]
        for r in dedup_against(new, ref).collect()
    }
    assert exact == {1: 1, 3: 2, 5: 1}
    # near tier at 0.8 additionally drops 1 (near-dup of ref 100)
    near = {
        r["keep_id"]: r["dup_count"]
        for r in dedup_against(new, ref, threshold=0.8).collect()
    }
    assert near == {3: 2, 5: 1}


def test_cross_jaccard_validation(spark, snapshot_docs):
    from parallel_pagerank_spark.functions.dedup import cross_jaccard_join

    new, ref = snapshot_docs
    with pytest.raises(ValueError):
        cross_jaccard_join(new, ref, threshold=0.0)
    with pytest.raises(ValueError):
        cross_jaccard_join(new, ref, threshold=1.5)
