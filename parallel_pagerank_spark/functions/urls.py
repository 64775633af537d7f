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


# query parameters stripped by canonical_url: the widely-published
# analytics/click identifiers (the utm_* family plus the Google/Facebook
# click ids and the bare referral tag). Java∩RE2-portable.
TRACKING_PARAM_PATTERN = r"[?&](?:utm_[a-z0-9_]*|gclid|fbclid|ref)=[^&#]*"


def canonical_url(url: Column) -> Column:
    """Canonical form of a URL Column — the URL-level dedup key every
    crawl pipeline needs (the same page arrives via http/https,
    with/without www., with tracking parameters, with a fragment, with
    a trailing slash — one canonical string collapses them all):

    1. scheme + host lowercased (path/query case is significant, RFC
       3986 §6.2.2.1, so only the authority prefix is folded);
    2. default port stripped (``:80`` for http, ``:443`` for https);
    3. leading ``www.`` host label stripped;
    4. fragment stripped (never sent to the server);
    5. tracking query parameters stripped (utm_*, gclid, fbclid, ref),
       with the query string re-punctuated (first surviving ``&``
       promoted to ``?``, dangling separators dropped);
    6. trailing path slashes stripped (``/a/`` ≡ ``/a``, root ``/``
       dropped too — one consistent choice, applied everywhere).

    Pure Column expressions (anchored regexes from the Java∩RE2
    portable subset — the PII_PATTERNS contract), so the DuckDB oracle
    reproduces every step verbatim and the whole pass stays inside
    whole-stage codegen, scan-side at 100 TB.
    """
    head = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", 0)
    rest = F.substring(url, F.length(head) + 1, F.lit(2147483647))
    head = F.lower(head)
    head = F.regexp_replace(head, r"^(http://[^/:]+):80$", r"$1")
    head = F.regexp_replace(head, r"^(https://[^/:]+):443$", r"$1")
    head = F.regexp_replace(head, r"^(https?://)www\.", r"$1")
    c = F.concat(head, rest)
    c = F.regexp_replace(c, r"#.*$", "")
    c = F.regexp_replace(c, F.lit(TRACKING_PARAM_PATTERN), F.lit(""))
    c = F.regexp_replace(c, r"^([^?&]*)&", r"$1?")
    c = F.regexp_replace(c, r"/+\?", "?")
    c = F.regexp_replace(c, r"[?&]+$", "")
    c = F.regexp_replace(c, r"/+$", "")
    return c


def canonical_urls(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """→ (doc_id, url, canonical): every URL occurrence with its
    canonical form — :func:`extract_urls` + :func:`canonical_url`,
    still a pure scan-side projection."""
    return extract_urls(docs, id_col, text_col).withColumn(
        "canonical", canonical_url(F.col("url"))
    )


def url_dedup(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """URL-level dedup readout → (canonical, keep_id, n_docs, n_occ):
    one row per canonical URL with the kept (minimum-id) document, the
    number of DISTINCT documents mentioning it, and the total mention
    count — the crawl-refresh primitive (fetch each canonical URL once;
    CCNet/RefinedWeb both dedup at the URL level before any content
    pass, since it is free relative to text dedup).

    One shuffle keyed on the canonical string; cardinality is
    |distinct URLs|, and the countDistinct plans two-phase so a
    corpus-hot URL cannot pin a reducer with raw rows.
    """
    return (
        canonical_urls(docs, id_col, text_col)
        .groupBy("canonical")
        .agg(
            F.min(F.col("doc_id")).alias("keep_id"),
            F.count_distinct(F.col("doc_id")).alias("n_docs"),
            F.count(F.lit(1)).alias("n_occ"),
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
