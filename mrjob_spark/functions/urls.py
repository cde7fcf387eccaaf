"""URL canonicalization — the first dedup key of every web-corpus
pipeline (RefinedWeb/CCNet dedup by canonical URL before any content
comparison; cf. reference mrjob's parse helpers in ``mrjob/parse.py``,
which stop at generic URI splitting).

Everything here is pure JVM column math (``regexp_extract`` / array
HOFs) so canonicalization rides whole-stage codegen at corpus scale —
no Python touches the URL stream. Each Spark builder has a DuckDB twin
(``sql_*``) used by the oracle, expression-for-expression.

Canonical form applied, in order:

1. scheme and host lowercased,
2. a leading ``www.`` stripped from the host,
3. default ports stripped (``:80`` for http, ``:443`` for https),
4. the fragment (``#...``) dropped,
5. tracking parameters dropped (``utm_*``, ``fbclid``, ``gclid``),
6. remaining query parameters sorted bytewise,
7. a trailing slash stripped from the path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: query parameters that never identify content
_TRACKING_RE = r"^(utm_[a-z]+|fbclid|gclid)="

# one regex splits any http(s) URL into its five parts; anchored groups
# keep it total (a non-matching part extracts as '')
_URL_RE = r"^([a-zA-Z][a-zA-Z0-9+.-]*)://([^/?#:]+)(:[0-9]+)?([^?#]*)(\?[^#]*)?"


def canonical_url(url: Column) -> Column:
    """Canonicalize an http(s) URL column (steps 1-7 above)."""
    scheme = F.lower(F.regexp_extract(url, _URL_RE, 1))
    host = F.regexp_replace(
        F.lower(F.regexp_extract(url, _URL_RE, 2)), r"^www\.", ""
    )
    port = F.regexp_extract(url, _URL_RE, 3)
    path = F.regexp_replace(
        F.regexp_extract(url, _URL_RE, 4), r"/$", ""
    )
    query = F.regexp_extract(url, _URL_RE, 5)

    # default ports vanish; any other port survives
    keep_port = F.when(
        ((scheme == "http") & (port == ":80"))
        | ((scheme == "https") & (port == ":443"))
        | (port == ""),
        F.lit(""),
    ).otherwise(port)

    # '?a=1&utm_source=x&b=2' -> kept params sorted -> '?a=1&b=2'
    params = F.filter(
        F.split(F.regexp_replace(query, r"^\?", ""), "&"),
        lambda p: (p != "") & ~p.rlike(_TRACKING_RE),
    )
    kept_query = F.when(
        F.size(params) > 0,
        F.concat(F.lit("?"), F.array_join(F.array_sort(params), "&")),
    ).otherwise(F.lit(""))

    return F.concat(
        scheme, F.lit("://"), host, keep_port, path, kept_query
    )


def sql_canonical_url(expr: str) -> str:
    """DuckDB twin of :func:`canonical_url` over *expr* — the same seven
    steps with the same regexes, for the oracle."""
    scheme = f"lower(regexp_extract({expr}, '{_URL_RE}', 1))"
    host = (
        f"regexp_replace(lower(regexp_extract({expr}, '{_URL_RE}', 2)),"
        f" '^www\\.', '')"
    )
    port = f"regexp_extract({expr}, '{_URL_RE}', 3)"
    path = f"regexp_replace(regexp_extract({expr}, '{_URL_RE}', 4), '/$', '')"
    query = f"regexp_extract({expr}, '{_URL_RE}', 5)"
    keep_port = f"""CASE WHEN ({scheme} = 'http' AND {port} = ':80')
             OR ({scheme} = 'https' AND {port} = ':443')
             OR {port} = '' THEN '' ELSE {port} END"""
    params = f"""list_filter(
        string_split(regexp_replace({query}, '^\\?', ''), '&'),
        p -> p <> '' AND NOT regexp_matches(p, '{_TRACKING_RE}'))"""
    kept_query = f"""CASE WHEN len({params}) > 0
        THEN '?' || list_aggr(list_sort({params}), 'string_agg', '&')
        ELSE '' END"""
    return (
        f"{scheme} || '://' || {host} || {keep_port} || {path}"
        f" || {kept_query}"
    )


def synthesize_url(doc_id: Column, source: Column) -> Column:
    """Deterministic messy-URL generator for the oracle fixtures (the
    ``synthesize_media_payloads`` idiom — testdata carries no URLs, so
    the mess is an arithmetic function of ``(doc_id, source)``): case
    noise in scheme/host, a ``www.`` on half the rows, a default or
    explicit port by ``doc_id % 4``, a COLLIDING path (``doc_id % 50``
    — distinct docs share canonical URLs, which is what makes the dedup
    non-trivial), a trailing slash on odd rows, tracking + real params
    in varied order, and a fragment every fifth row."""
    scheme = F.when(doc_id % 3 == 0, "HTTPS").otherwise("http")
    www = F.when(doc_id % 2 == 0, "WWW.").otherwise("")
    host = F.concat(www, source, F.lit(".Example.COM"))
    port = (
        F.when((doc_id % 4 == 0) & (doc_id % 3 == 0), ":443")
        .when((doc_id % 4 == 0) & (doc_id % 3 != 0), ":80")
        .when(doc_id % 4 == 1, ":8080")
        .otherwise("")
    )
    path = F.concat(
        F.lit("/docs/page"), (doc_id % 50).cast("string"),
        F.when(doc_id % 2 == 1, "/").otherwise(""),
    )
    query = (
        F.when(doc_id % 3 == 0, "?utm_source=feed&b=2&a=1")
        .when(doc_id % 3 == 1, "?a=1&utm_campaign=x&b=2")
        .otherwise("?b=2&a=1")
    )
    frag = F.when(doc_id % 5 == 0, "#sec").otherwise("")
    return F.concat(scheme, F.lit("://"), host, port, path, query, frag)


def sql_synthesize_url(doc_id: str = "doc_id", source: str = "source") -> str:
    """DuckDB twin of :func:`synthesize_url`."""
    return f"""(CASE WHEN {doc_id} % 3 = 0 THEN 'HTTPS' ELSE 'http' END
        || '://'
        || CASE WHEN {doc_id} % 2 = 0 THEN 'WWW.' ELSE '' END
        || {source} || '.Example.COM'
        || CASE WHEN {doc_id} % 4 = 0 AND {doc_id} % 3 = 0 THEN ':443'
                WHEN {doc_id} % 4 = 0 THEN ':80'
                WHEN {doc_id} % 4 = 1 THEN ':8080'
                ELSE '' END
        || '/docs/page' || CAST({doc_id} % 50 AS VARCHAR)
        || CASE WHEN {doc_id} % 2 = 1 THEN '/' ELSE '' END
        || CASE WHEN {doc_id} % 3 = 0 THEN '?utm_source=feed&b=2&a=1'
                WHEN {doc_id} % 3 = 1 THEN '?a=1&utm_campaign=x&b=2'
                ELSE '?b=2&a=1' END
        || CASE WHEN {doc_id} % 5 = 0 THEN '#sec' ELSE '' END)"""
