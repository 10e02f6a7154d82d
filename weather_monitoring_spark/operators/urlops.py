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

Registrable domains (eTLD+1) use a vendored Public Suffix List snapshot
(``data/psl/public_suffix_list.dat``, publicsuffix.org file format) with
the FULL published matching algorithm — wildcard rules, exception rules,
longest-match, implicit '*' default — compiled into a zero-shuffle CASE
expression that both engines evaluate from the same file.

Reference parity: the reference has no URL surface; this extends the
engine per the builder brief's LLM-pipeline scope (dedup at crawl scale
starts with URL identity).
"""

from __future__ import annotations

import os
from functools import lru_cache

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Query parameters that never identify a resource (trackers). Shared
#: verbatim with the oracle fragments below.
TRACKING_PARAM_RE = "^(utm_[a-z0-9]+|fbclid|gclid|msclkid|ref)="

#: The vendored Public Suffix List snapshot (publicsuffix.org file
#: format: '*.' wildcard rules, '!' exception rules, '//' comments).
#: The matching below implements the FULL published algorithm —
#: exception beats all, else longest rule, else the implicit '*'
#: default — so swapping this file for the complete published
#: public_suffix_list.dat upgrades the data without touching code.
PSL_PATH = os.path.join(
    os.path.dirname(os.path.dirname(__file__)),
    "data",
    "psl",
    "public_suffix_list.dat",
)


@lru_cache(maxsize=1)
def load_psl(path: str = PSL_PATH) -> tuple[
    dict[int, tuple[str, ...]],
    dict[int, tuple[str, ...]],
    dict[int, tuple[str, ...]],
]:
    """Parse the PSL file into (normals, wildcard_bases, exceptions),
    each keyed by label count (wildcards by their BASE's label count).
    Single-label normal rules are dropped: under the implicit default
    rule '*' they are matching-equivalent (public suffix = last label),
    and dropping them keeps the compiled expression small."""
    normals: dict[int, list[str]] = {}
    wildcards: dict[int, list[str]] = {}
    exceptions: dict[int, list[str]] = {}
    with open(path, encoding="utf-8") as fh:
        for line in fh:
            rule = line.strip()
            if not rule or rule.startswith("//"):
                continue
            if rule.startswith("!"):
                body = rule[1:]
                exceptions.setdefault(body.count(".") + 1, []).append(body)
            elif rule.startswith("*."):
                base = rule[2:]
                wildcards.setdefault(base.count(".") + 1, []).append(base)
            elif "." in rule:  # multi-label normal rule
                normals.setdefault(rule.count(".") + 1, []).append(rule)
    freeze = lambda d: {k: tuple(sorted(v)) for k, v in d.items()}  # noqa: E731
    return freeze(normals), freeze(wildcards), freeze(exceptions)


def _psl_domain_case(lastk, n: str) -> str:
    """The registrable-domain (eTLD+1) decision as ONE nested CASE over
    label-suffix IN-lists, shared by both engines (``lastk(k)`` renders
    the host's last-k-labels string; ``n`` the label count):

    - exception rules first (they beat every other match): a k-label
      exception names a NON-suffix, its prevailing public suffix is the
      rule minus its leftmost label, so the registrable domain is
      exactly ``lastk(k)``;
    - then public-suffix lengths p in DESCENDING order (longest rule
      wins): ps = p if the last p labels are a normal rule, or the last
      p-1 labels are a wildcard base with at least p labels present;
      registrable = last p+1 labels, NULL when the host IS the suffix
      (matched branches return their NULL rather than falling through —
      a shorter rule must not resurrect a registrable domain);
    - implicit default rule '*': ps = 1, registrable = last 2 labels.

    Both engines' suffix-slices are total functions (Spark yields '',
    DuckDB clamps, when k exceeds the label count) — every membership
    test is therefore guarded by ``n >= k`` so the engines cannot
    diverge on short hosts. IN-lists compile to hash-set probes
    (Catalyst InSet / DuckDB constant filter): the whole decision stays
    a zero-shuffle scalar expression at any corpus size, which is why
    the list is compiled into the plan rather than broadcast-joined —
    a join would re-shuffle per-document rows to pick one constant per
    host."""
    normals, wildcards, exceptions = load_psl()
    quote = lambda vals: ", ".join(f"'{v}'" for v in vals)  # noqa: E731
    branches: list[str] = []
    for k in sorted(exceptions, reverse=True):
        branches.append(
            f"WHEN {n} >= {k} AND {lastk(k)} IN ({quote(exceptions[k])}) "
            f"THEN {lastk(k)}"
        )
    ps_values = sorted(set(normals) | {b + 1 for b in wildcards}, reverse=True)
    for p in ps_values:
        conds = []
        if p in normals:
            conds.append(f"({n} >= {p} AND {lastk(p)} IN ({quote(normals[p])}))")
        if p - 1 in wildcards:
            conds.append(
                f"({n} >= {p} AND {lastk(p - 1)} IN ({quote(wildcards[p - 1])}))"
            )
        reg = f"CASE WHEN {n} >= {p + 1} THEN {lastk(p + 1)} ELSE NULL END"
        branches.append(f"WHEN {' OR '.join(conds)} THEN {reg}")
    default = f"CASE WHEN {n} >= 2 THEN {lastk(2)} ELSE NULL END"
    return "CASE " + " ".join(branches) + f" ELSE {default} END"

_URL_RE = "^([a-zA-Z][a-zA-Z0-9+.-]*)://([^/?#]*)([^?#]*)"


def _raw_host_expr(url: str) -> str:
    """Lowercased host with default ports stripped — www. KEPT. Domain
    derivation matches the PSL against this form: the www-strip exists
    for URL identity, and stripping it first would mis-resolve hosts
    whose registrable domain IS a www name (the PSL '!www.ck'
    exception)."""
    host = f"lower(regexp_extract({url}, '{_URL_RE}', 2))"
    return f"regexp_replace({host}, ':(80|443)$', '')"


def _host_expr(url: str) -> str:
    """Lowercased host with www. prefix and default ports stripped."""
    return f"regexp_replace({_raw_host_expr(url)}, '^www\\\\.', '')"


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
    """Registrable domain (eTLD+1) of the URL's host under the vendored
    Public Suffix List — full publicsuffix.org semantics (wildcard +
    exception rules, longest match, implicit '*' default). NULL when
    the host is itself a public suffix (no registrable domain exists).
    Zero shuffle: the PSL compiles to IN-set probes in the projection."""
    host = _raw_host_expr(url_col)
    labels = f"split({host}, '\\\\.')"
    lastk = lambda k: f"concat_ws('.', slice({labels}, -{k}, {k}))"  # noqa: E731
    return F.expr(_psl_domain_case(lastk, f"size({labels})"))


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
    only (canon digest, id) rows move.

    A NULL canonical URL (missing url — e.g. a WARC response whose
    WARC-Target-URI header was damaged away — or an un-canonicalizable
    one) means UNKNOWN identity, not shared identity: each such doc is
    its own keeper (fingerprint coalesced to a per-doc sentinel).
    ``md5(NULL)`` is NULL and GROUP BY puts all NULLs in one group, so
    the un-coalesced form silently deleted every URI-less page but one
    — found by the r12 curate_crawl damage property, where WHICH doc
    survived the collapse depended on digest id order."""
    return (
        canonicalize_urls(docs, url_col, id_col)
        .select(
            F.coalesce(
                F.md5(F.col("canon_url")),
                F.concat(F.lit("null:"), F.col(id_col).cast("string")),
            ).alias("url_fp"),
            F.col(id_col),
        )
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


def o_raw_host(url: str) -> str:
    host = f"lower(regexp_extract({url}, '{_URL_RE}', 2))"
    return f"regexp_replace({host}, ':(80|443)$', '')"


def o_host(url: str) -> str:
    return f"regexp_replace({o_raw_host(url)}, '^www\\.', '')"


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
    """DuckDB mirror of domain_expr — SAME vendored PSL file, same
    compiled CASE (only the list-slice syntax differs; both slices are
    total and every membership test is label-count guarded)."""
    labels = f"str_split({o_raw_host(url)}, '.')"
    lastk = lambda k: f"array_to_string(({labels})[-{k}:], '.')"  # noqa: E731
    return _psl_domain_case(lastk, f"len({labels})")


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
