"""URL extraction, per-domain statistics, and domain blocklist filtering.

Standard web-corpus curation steps (the C4 cleanup and the CCNet /
RefinedWeb pipelines all carry a URL/domain pass: per-domain dedup and
blocklist removal). No reference counterpart — the reference's input is
an edge list (`/root/reference/pagerank_mpi/csr_graph.c`), but a
link-graph engine fed by web text needs the text→URL→domain step to
BUILD that edge list, so this is the missing front half of the same
pipeline.

Dialect discipline: the URL regex is restricted to the Java-regex ∩ RE2
subset (character classes, `(?:...)` groups, `?`/`*` repetition — no
lookaround, no backreferences), so a DuckDB oracle reproduces the
extraction verbatim, the same contract as `text.PII_PATTERNS`.

Scale design: extraction is `regexp_extract_all` + `explode` — pure
Column expressions, whole-stage codegen, applied scan-side so only
(id, url) longs/strings reach the shuffle. Domain stats are one hash
aggregation keyed on the domain string. Blocklist filtering broadcasts
the blocklist (it is always tiny relative to the corpus) and anti-joins
the offending doc ids back — two narrow shuffle-free passes over the
corpus plus one id-keyed anti-join.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column, DataFrame, functions as F

# scheme://host[:port][/path] — host chars per RFC 1123, path = any
# non-space run. Portable: no lookaround, no backreferences.
URL_PATTERN = r"https?://[A-Za-z0-9.-]+(?::\d+)?(?:/[^\s]*)?"

# group 1 = the registered host, lowercased by the caller
_DOMAIN_PATTERN = r"^https?://([^/:]+)"


def url_domain(url: Column) -> Column:
    """Host part of a URL Column, lowercased (port and path stripped)."""
    return F.lower(F.regexp_extract(url, _DOMAIN_PATTERN, 1))


def extract_urls(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """→ (doc_id, url, domain): one row per URL occurrence in the text
    (duplicates kept — per-domain counts weight by mention)."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.regexp_extract_all(F.col(text_col), F.lit(URL_PATTERN), 0)
        ).alias("url"),
    ).withColumn("domain", url_domain(F.col("url")))


def domain_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """→ (domain, n_urls, n_docs): mention count and distinct-document
    count per domain — the per-domain curation readout (cap decisions,
    blocklist candidates) over the whole corpus in one aggregation."""
    return (
        extract_urls(docs, id_col, text_col)
        .groupBy("domain")
        .agg(
            F.count("*").alias("n_urls"),
            F.count_distinct(F.col("doc_id")).alias("n_docs"),
        )
    )


def filter_blocked_domains(
    docs: DataFrame,
    blocklist: DataFrame | Iterable[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Drop every document that mentions a blocklisted domain (exact,
    case-insensitive host match), keeping the input schema.

    ``blocklist`` is a DataFrame with a ``domain`` column or an iterable
    of domain strings. It is broadcast: the offending-id set is computed
    with a broadcast semi-join on the exploded URLs, then removed with
    one anti-join on the id — the corpus text is scanned once.
    """
    if not isinstance(blocklist, DataFrame):
        blocklist = docs.sparkSession.createDataFrame(
            [(d.lower(),) for d in blocklist], "domain string"
        )
    else:
        blocklist = blocklist.select(F.lower(F.col("domain")).alias("domain"))
    offending = (
        extract_urls(docs, id_col, text_col)
        .join(F.broadcast(blocklist), "domain", "left_semi")
        .select("doc_id")
        .distinct()
    )
    return docs.join(
        offending.withColumnRenamed("doc_id", id_col), id_col, "left_anti"
    )
