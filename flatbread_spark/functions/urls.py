"""URL canonicalization for web-corpus ingestion.

Web crawls reach a training pipeline keyed by URL, and the same page
arrives under dozens of spellings: mixed-case scheme/host, explicit
default ports, ``www.`` prefixes, tracking parameters (``utm_*``,
``gclid``...), shuffled query-parameter order, trailing slashes and
fragments. Canonicalizing BEFORE dedup/stats is the difference between
"2.1B unique pages" and the truth; doing it as pure string expressions
(no UDF, no shuffle) keeps it free at 100 TB — the whole chain is one
whole-stage-codegen projection that Catalyst can pipeline into the scan.

Canonical form produced by :func:`canonical_url`:

``scheme://host[:port]path[?query]`` where

- scheme and host are lowercased; a leading ``www.`` is dropped;
- the port is dropped when it is the scheme default (http:80, https:443);
- the path keeps its case (paths ARE case-sensitive), loses trailing
  slashes (root stays ``/``; an empty path becomes ``/``);
- the query loses tracking parameters (:data:`TRACKING_RE`) and empty
  fragments, and the surviving ``k=v`` parts are byte-sorted — parameter
  order never splits a URL;
- the ``#fragment`` is dropped entirely.

Out of scope (documented non-goals, same judgement calls as the big crawl
dedup stacks): percent-decoding, IDN/punycode folding, userinfo stripping
and path normalization of ``..`` segments — each is rare in practice and
risky to fold blindly (decoding can CHANGE the resource a URL names).

:func:`registered_domain` approximates the public-suffix list with the
common two-level suffixes (:data:`MULTI_TLDS`) — ``a.b.co.uk`` →
``b.co.uk``, ``a.b.com`` → ``b.com``. The full PSL is a data file swap,
not a design change: the lookup is a literal IN over the suffix set.

Every definition here is mirrored by :func:`canonical_url_sql` /
:func:`registered_domain_sql`, which emit the equivalent DuckDB SQL from
the SAME constants — the discipline that keeps the driver's oracle
byte-identical (see ``text_normalize``).
"""
from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# query parameters that never identify the resource (analytics/click ids)
TRACKING_RE = "^(utm_[a-z0-9_]+|gclid|fbclid|msclkid|mc_cid|mc_eid|igshid)="

# common two-level public suffixes; registered domain keeps one extra label
MULTI_TLDS = (
    "ac.uk", "co.in", "co.jp", "co.kr", "co.nz", "co.uk", "co.za",
    "com.au", "com.br", "com.cn", "com.mx", "com.tr", "gov.uk",
    "ne.jp", "net.au", "or.jp", "org.au", "org.uk",
)

_SCHEME_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOSTPORT_RE = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_PATH_RE = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
_QUERY_RE = r"\?([^#]*)"


def url_scheme(url: Column) -> Column:
    """Lower-cased scheme; '' when the value is not an absolute URL."""
    return F.lower(F.regexp_extract(url, _SCHEME_RE, 1))


def url_host(url: Column) -> Column:
    """Lower-cased host: port and a leading ``www.`` removed."""
    hostport = F.lower(F.regexp_extract(url, _HOSTPORT_RE, 1))
    host = F.regexp_replace(hostport, ":[0-9]*$", "")
    return F.regexp_replace(host, r"^www\.", "")


def url_port(url: Column) -> Column:
    """Explicit port digits, or '' when none is present."""
    hostport = F.regexp_extract(url, _HOSTPORT_RE, 1)
    return F.regexp_extract(hostport, ":([0-9]+)$", 1)


def url_path(url: Column) -> Column:
    """Path with trailing slashes stripped; '' and '/' both → '/'."""
    raw = F.regexp_extract(url, _PATH_RE, 1)
    trimmed = F.regexp_replace(raw, "/+$", "")
    return F.when(trimmed == "", F.lit("/")).otherwise(trimmed)


def url_query_canonical(url: Column) -> Column:
    """Surviving query parts, byte-sorted and '&'-joined; '' when nothing
    survives. Tracking params (:data:`TRACKING_RE`) and empty parts drop."""
    raw = F.regexp_extract(url, _QUERY_RE, 1)
    parts = F.split(raw, "&")
    kept = F.filter(
        parts, lambda p: (p != "") & ~p.rlike(TRACKING_RE)
    )
    return F.array_join(F.array_sort(kept), "&")


def canonical_url(url: Column) -> Column:
    """The canonical spelling (module docstring); NULL stays NULL."""
    scheme = url_scheme(url)
    host = url_host(url)
    port = url_port(url)
    default_port = ((scheme == "http") & (port == "80")) | (
        (scheme == "https") & (port == "443")
    )
    port_part = F.when(
        (port == "") | default_port, F.lit("")
    ).otherwise(F.concat(F.lit(":"), port))
    q = url_query_canonical(url)
    q_part = F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q))
    return F.concat(
        scheme, F.lit("://"), host, port_part, url_path(url), q_part
    )


def registered_domain(host: Column) -> Column:
    """Registrable domain of an already-normalized host (see
    :func:`url_host`): last two labels, or three when the last two form a
    known two-level suffix; hosts with a single label pass through."""
    parts = F.split(host, r"\.")
    n = F.size(parts)
    # try_element_at: NULL (not an ANSI error) when the label doesn't exist;
    # the n-guards below make sure a NULL label never reaches the output
    last2 = F.concat_ws(
        ".", F.try_element_at(parts, F.lit(-2)), F.try_element_at(parts, F.lit(-1))
    )
    last3 = F.concat_ws(
        ".",
        F.try_element_at(parts, F.lit(-3)),
        F.try_element_at(parts, F.lit(-2)),
        F.try_element_at(parts, F.lit(-1)),
    )
    return (
        F.when((n >= 3) & last2.isin(*MULTI_TLDS), last3)
        .when(n >= 2, last2)
        .otherwise(host)
    )


def dedup_by_url(
    df,
    url_col: str,
    id_col: str,
    quality_col: str,
    out_url: str = "url_canonical",
):
    """URL-keyed dedup: one winner per :func:`canonical_url` spelling —
    the standard first pass of web-corpus ingestion (same page fetched
    under many URL spellings), BEFORE any content hashing runs.

    Winner = highest ``quality_col``, ties to the smallest ``id_col``
    (a struct max — deterministic under any partitioning). Returns one row
    per canonical URL: ``(out_url, id_col, quality_col, n_dups)``.

    Scale: document CONTENT never moves — only ``(canonical, quality,
    id)`` triples shuffle (one hash partition on the canonical string),
    and partial aggregation combines map-side, so a hot URL (a crawler
    trap fetched millions of times) reduces before the exchange. Rejoin
    winners to the corpus by ``id_col`` when the full rows are needed.
    """
    canon = canonical_url(F.col(url_col)).alias(out_url)
    slim = df.select(canon, F.col(id_col), F.col(quality_col))
    # min_by over (null_flag, -quality, id): fieldwise struct compare =
    # quality desc winner with the smallest id breaking ties. Only QUALITY
    # is negated (a score, numeric by contract); the id is compared with
    # its native ordering, so string doc ids — common in URL corpora —
    # work too. The leading null flag is load-bearing: a NULL struct
    # field sorts FIRST in Spark's struct ordering, so without it a
    # NULL-quality row would beat every scored row in its group
    # (ADVICE r6); flag 1 pushes unscored rows after all scored ones.
    key = F.struct(
        F.col(quality_col).isNull().cast("int").alias("nf"),
        (-F.col(quality_col)).alias("nq"),
        F.col(id_col).alias("i"),
    )
    payload = F.struct(
        F.col(id_col).alias("i"), F.col(quality_col).alias("q")
    )
    return (
        slim.groupBy(out_url)
        .agg(
            F.min_by(payload, key).alias("__w"),
            F.count(F.lit(1)).cast("bigint").alias("n_dups"),
        )
        .select(
            out_url,
            F.col("__w.i").alias(id_col),
            F.col("__w.q").alias(quality_col),
            "n_dups",
        )
    )


# --------------------------------------------------------------- SQL mirrors
# DuckDB expressions built from the SAME constants, for oracle parity.
# Caveats encoded here (verified): DuckDB regexp_extract returns '' on no
# match (same as Spark); lists are 1-indexed with negative wrap; lambda
# filters use `x -> ...`.

def _sql_q(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def url_host_sql(url_expr: str) -> str:
    """DuckDB SQL computing :func:`url_host` of ``url_expr``."""
    hostport = f"lower(regexp_extract({url_expr}, {_sql_q(_HOSTPORT_RE)}, 1))"
    return (
        f"regexp_replace(regexp_replace({hostport}, ':[0-9]*$', ''),"
        f" '^www\\.', '')"
    )


def canonical_url_sql(url_expr: str) -> str:
    """DuckDB SQL computing :func:`canonical_url` of ``url_expr``."""
    u = url_expr
    scheme = f"lower(regexp_extract({u}, {_sql_q(_SCHEME_RE)}, 1))"
    host = url_host_sql(u)
    port = (
        f"regexp_extract(regexp_extract({u}, {_sql_q(_HOSTPORT_RE)}, 1),"
        f" ':([0-9]+)$', 1)"
    )
    default_port = (
        f"(({scheme} = 'http' AND {port} = '80') OR"
        f" ({scheme} = 'https' AND {port} = '443'))"
    )
    port_part = (
        f"CASE WHEN {port} = '' OR {default_port} THEN ''"
        f" ELSE ':' || {port} END"
    )
    raw_path = f"regexp_extract({u}, {_sql_q(_PATH_RE)}, 1)"
    path = (
        f"CASE WHEN regexp_replace({raw_path}, '/+$', '') = '' THEN '/'"
        f" ELSE regexp_replace({raw_path}, '/+$', '') END"
    )
    raw_q = f"regexp_extract({u}, {_sql_q(_QUERY_RE)}, 1)"
    kept = (
        f"list_filter(string_split({raw_q}, '&'),"
        f" p -> p <> '' AND NOT regexp_matches(p, {_sql_q(TRACKING_RE)}))"
    )
    # COALESCE: DuckDB's array_to_string over an EMPTY list yields NULL
    # (Spark's array_join yields ''), and the NULL would poison every ||
    q = f"COALESCE(array_to_string(list_sort({kept}), '&'), '')"
    q_part = f"CASE WHEN {q} = '' THEN '' ELSE '?' || {q} END"
    return f"{scheme} || '://' || {host} || {port_part} || {path} || {q_part}"


def registered_domain_sql(host_expr: str) -> str:
    """DuckDB SQL computing :func:`registered_domain` of ``host_expr``."""
    h = host_expr
    parts = f"string_split({h}, '.')"
    tlds = ", ".join(_sql_q(t) for t in MULTI_TLDS)
    last2 = f"({parts}[-2] || '.' || {parts}[-1])"
    last3 = f"({parts}[-3] || '.' || {parts}[-2] || '.' || {parts}[-1])"
    return (
        f"CASE WHEN len({parts}) >= 3 AND {last2} IN ({tlds}) THEN {last3}"
        f" WHEN len({parts}) >= 2 THEN {last2}"
        f" ELSE {h} END"
    )
