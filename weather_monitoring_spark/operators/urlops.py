"""URL / domain curation — the crawl-side front door of a training-data
pipeline (CCNet / RefinedWeb-style): canonicalize URLs so that exact-URL
dedup actually dedups, roll quality up to the registrable domain, and
filter against domain lists.

Everything is pure column algebra over one projection (zero shuffle for
canonicalization, one digest-width aggregate for domain rollups), and
every rule is expressed with the cross-engine-safe regex subset
(RE2 ∩ Java, the operators/quality.py precedent) so the DuckDB oracles
run the same patterns verbatim.

Canonicalization rules (the industry-standard set, each independently
testable):

- scheme and host lowercase; ``www.`` prefix and default ports
  (``:80``/``:443``) dropped;
- fragment dropped;
- tracking query parameters dropped (``utm_*``, ``fbclid``, ``gclid``,
  ``msclkid``, ``ref``), remaining parameters sorted byte-wise so
  parameter order cannot split identical resources;
- trailing slash normalized (path '' -> '/', '/a/' -> '/a').

Reference parity: the reference has no URL surface; this extends the
engine per the builder brief's LLM-pipeline scope (dedup at crawl scale
starts with URL identity).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Query parameters that never identify a resource (trackers). Shared
#: verbatim with the oracle fragments below.
TRACKING_PARAM_RE = "^(utm_[a-z0-9]+|fbclid|gclid|msclkid|ref)="

#: Second-level public suffixes for the registrable-domain heuristic —
#: exact eTLD+1 needs the full public-suffix list (out of scope); this
#: documented subset covers the common ccTLD second levels and the
#: heuristic (last 2 labels, or 3 when the last 2 are listed) is the
#: standard approximation.
SECOND_LEVEL_SUFFIXES = (
    "co.uk", "org.uk", "gov.uk", "ac.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "com.br", "co.in", "co.kr", "com.mx", "co.za",
)

_URL_RE = "^([a-zA-Z][a-zA-Z0-9+.-]*)://([^/?#]*)([^?#]*)"


def _host_expr(url: str) -> str:
    """Lowercased host with www. prefix and default ports stripped."""
    host = f"lower(regexp_extract({url}, '{_URL_RE}', 2))"
    host = f"regexp_replace({host}, '^www\\\\.', '')"
    return f"regexp_replace({host}, ':(80|443)$', '')"


def _path_expr(url: str) -> str:
    """Path with the trailing slash normalized ('' and '/' -> '/',
    '/a/' -> '/a')."""
    path = f"regexp_extract({url}, '{_URL_RE}', 3)"
    return (
        f"CASE WHEN {path} IN ('', '/') THEN '/' "
        f"ELSE regexp_replace({path}, '/$', '') END"
    )


def _query_expr(url: str) -> str:
    """Sorted, tracker-free query string ('' when nothing survives).
    The raw query is the span between '?' and the end or '#'."""
    raw = f"regexp_extract({url}, '\\\\?([^#]*)', 1)"
    kept = (
        f"array_sort(filter(split({raw}, '&'), "
        f"x -> x != '' AND NOT x RLIKE '{TRACKING_PARAM_RE}'))"
    )
    joined = f"array_join({kept}, '&')"
    return f"CASE WHEN {joined} = '' THEN '' ELSE concat('?', {joined}) END"


def canonical_url_expr(url_col: str) -> Column:
    """The canonical URL as one Spark expression (scheme://host path
    query — fragment dropped)."""
    scheme = f"lower(regexp_extract({url_col}, '{_URL_RE}', 1))"
    return F.expr(
        f"concat({scheme}, '://', {_host_expr(url_col)}, "
        f"{_path_expr(url_col)}, {_query_expr(url_col)})"
    )


def domain_expr(url_col: str) -> Column:
    """Registrable domain (eTLD+1 heuristic) of the URL's host."""
    host = _host_expr(url_col)
    labels = f"split({host}, '\\\\.')"
    last2 = f"concat_ws('.', slice({labels}, -2, 2))"
    last3 = f"concat_ws('.', slice({labels}, -3, 3))"
    sld_set = ", ".join(f"'{s}'" for s in SECOND_LEVEL_SUFFIXES)
    return F.expr(
        f"CASE WHEN size({labels}) >= 3 AND {last2} IN ({sld_set}) "
        f"THEN {last3} ELSE {last2} END"
    )


def canonicalize_urls(
    docs: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """(id, url, canon_url, domain) — the canonicalization projection a
    crawl pipeline persists before URL-level dedup. Zero shuffle."""
    return docs.select(
        F.col(id_col),
        F.col(url_col).alias("url"),
        canonical_url_expr(url_col).alias("canon_url"),
        domain_expr(url_col).alias("domain"),
    )


def url_dedup(
    docs: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """Exact URL-identity dedup AFTER canonicalization: one keeper (min
    id) per canonical URL — the cheapest dedup stage of a crawl, run
    before any content hashing. Same shuffle shape as exact_dedup:
    only (canon digest, id) rows move."""
    return (
        canonicalize_urls(docs, url_col, id_col)
        .select(F.md5(F.col("canon_url")).alias("url_fp"), F.col(id_col))
        .groupBy("url_fp")
        .agg(
            F.min(id_col).alias("keeper_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def domain_stats(
    docs: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-registrable-domain curation rollup: document count, distinct
    canonical URLs (count vs distinct-count gap = within-domain URL
    duplication), mean document length — the table a crawl operator
    ranks and blocklists from. |domains| rows; one aggregate."""
    canon = docs.select(
        F.col(id_col),
        F.length(F.col(text_col)).alias("_len"),
        canonical_url_expr(url_col).alias("canon_url"),
        domain_expr(url_col).alias("domain"),
    )
    return canon.groupBy("domain").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.count_distinct("canon_url").cast("long").alias("n_urls"),
        F.sum("_len").cast("long").alias("total_chars"),
    )


# ---------------- DuckDB oracle fragments (1:1 rule mirror) ---------------


def o_host(url: str) -> str:
    host = f"lower(regexp_extract({url}, '{_URL_RE}', 2))"
    host = f"regexp_replace({host}, '^www\\.', '')"
    return f"regexp_replace({host}, ':(80|443)$', '')"


def o_canonical_url(url: str) -> str:
    scheme = f"lower(regexp_extract({url}, '{_URL_RE}', 1))"
    path = f"regexp_extract({url}, '{_URL_RE}', 3)"
    path = (
        f"CASE WHEN {path} IN ('', '/') THEN '/' "
        f"ELSE regexp_replace({path}, '/$', '') END"
    )
    raw = f"regexp_extract({url}, '\\?([^#]*)', 1)"
    kept = (
        f"list_sort(list_filter(str_split({raw}, '&'), "
        f"x -> x <> '' AND NOT regexp_matches(x, '{TRACKING_PARAM_RE}')))"
    )
    joined = f"array_to_string({kept}, '&')"
    query = f"CASE WHEN {joined} = '' THEN '' ELSE '?' || {joined} END"
    return f"{scheme} || '://' || {o_host(url)} || {path} || {query}"


def o_domain(url: str) -> str:
    labels = f"str_split({o_host(url)}, '.')"
    last2 = f"array_to_string(({labels})[-2:], '.')"
    last3 = f"array_to_string(({labels})[-3:], '.')"
    sld_set = ", ".join(f"'{s}'" for s in SECOND_LEVEL_SUFFIXES)
    return (
        f"CASE WHEN len({labels}) >= 3 AND {last2} IN ({sld_set}) "
        f"THEN {last3} ELSE {last2} END"
    )


def filter_by_domains(
    docs: DataFrame,
    blocked_domains: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """Drop documents whose registrable domain is block-listed: a
    broadcast anti join against the (small) domain list — the standard
    crawl-curation gate. Returns the surviving rows of ``docs``."""
    tagged = docs.withColumn("_dom", domain_expr(url_col))
    return tagged.join(
        F.broadcast(blocked_domains.select(F.col("domain").alias("_dom"))),
        "_dom",
        "left_anti",
    ).drop("_dom")
