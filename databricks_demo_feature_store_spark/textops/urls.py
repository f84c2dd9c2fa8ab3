"""URL canonicalization + domain extraction — the URL-level curation
tier of a web-crawl training pipeline (CommonCrawl-style corpora dedup
URL-FIRST, before any content hashing: canonical-URL dedup removes
refetches of the same page behind tracking params / fragments / case /
default ports at zero content cost).

Pure column expressions (JVM-side regex/array ops — no UDFs), each
cross-engine checkable:

* :func:`url_scheme_col` / :func:`url_host_col` / :func:`url_path_col`
  / :func:`url_query_col` — RFC-3986-ish component extraction for
  ``scheme://host[:port]/path?query#fragment`` URLs.
* :func:`canonicalize_url_col` — the standard normalization stack:
  lowercase scheme+host, drop the scheme's default port, empty path →
  ``/``, DROP the fragment, drop tracking parameters
  (``utm_*``/``gclid``/``fbclid``/``msclkid``/``ref``/``mc_cid``/
  ``mc_eid``), sort the surviving query params. Two fetches of one
  logical page canonicalize to one string.
* :func:`registered_domain_col` — the per-site grouping key (domain
  caps, per-site quality stats). Public-suffix-list resolution needs
  the external PSL file (env-blocked here); this is the documented
  two-label heuristic with a three-label carve-out for common
  second-level registries (``co.uk``-style: 2nd-to-last label in
  {co, com, net, org, gov, edu, ac} under a 2-letter ccTLD).

Scale shape: all row-local (narrow, scan-speed, whole-stage codegen);
the canonical-URL dedup that follows is the exact-dedup family's one
(fingerprint, id) shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

_SCHEME_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://"
_AUTH_RE = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_PATH_RE = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
_TRACKING_RE = "^(utm_[^=]*|gclid|fbclid|msclkid|ref|mc_cid|mc_eid)="


def url_scheme_col(url: Column) -> Column:
    """Lower-cased scheme (``''`` when the value is not a URL)."""
    return F.lower(F.regexp_extract(url, _SCHEME_RE, 1))


def url_host_col(url: Column) -> Column:
    """Lower-cased host WITHOUT the port."""
    auth = F.lower(F.regexp_extract(url, _AUTH_RE, 1))
    return F.regexp_replace(auth, ":[0-9]+$", "")


def url_path_col(url: Column) -> Column:
    """Path component; empty normalizes to ``/``."""
    p = F.regexp_extract(url, _PATH_RE, 1)
    return F.when(p == "", F.lit("/")).otherwise(p)


def url_query_col(url: Column) -> Column:
    """Raw query string (without ``?``; fragment excluded)."""
    return F.regexp_extract(url, r"\?([^#]*)", 1)


def canonicalize_url_col(url: Column) -> Column:
    """Canonical form of ``url`` (see module docstring). Non-URL values
    (no ``scheme://``) canonicalize to NULL so they never collide with
    real pages in a canonical-URL dedup."""
    scheme = url_scheme_col(url)
    auth = F.lower(F.regexp_extract(url, _AUTH_RE, 1))
    host = F.regexp_replace(auth, ":[0-9]+$", "")
    port = F.regexp_extract(auth, ":([0-9]+)$", 1)
    default_port = (
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
        | (port == "")
    )
    hostport = F.when(default_port, host).otherwise(F.concat_ws(":", host, port))
    path = url_path_col(url)
    params = F.filter(
        F.split(url_query_col(url), "&"),
        lambda p: (p != "") & ~p.rlike(_TRACKING_RE),
    )
    q = F.concat_ws("&", F.array_sort(params))
    return F.when(
        scheme == "",
        F.lit(None).cast("string"),
    ).otherwise(
        F.concat(
            scheme,
            F.lit("://"),
            hostport,
            path,
            F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q)),
        )
    )


def registered_domain_col(host: Column) -> Column:
    """Registered domain of a (lower-case) host: the last two labels,
    or the last THREE when the 2nd-to-last is a common second-level
    registry label under a 2-letter ccTLD (``example.co.uk``). A
    documented heuristic — exact resolution needs the public-suffix
    list (env-blocked; swap in when available)."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    tld = F.element_at(labels, -1)
    sld = F.element_at(labels, -2)
    three = (
        (n >= 3)
        & (F.length(tld) == 2)
        & sld.isin("co", "com", "net", "org", "gov", "edu", "ac")
    )
    last2 = F.concat_ws(".", F.slice(labels, n - 1, 2))
    last3 = F.concat_ws(".", F.slice(labels, n - 2, 3))
    return F.when(n <= 1, host).when(three, last3).otherwise(last2)
