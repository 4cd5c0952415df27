"""URL/domain canonicalization and URL-level dedup.

The step a web-corpus pipeline (CommonCrawl/CCNet-style) runs BEFORE
text dedup: normalize each record's URL so trivially-different spellings
of the same address (scheme/host case, default ports, ``www.``,
trailing slashes, tracking parameters, fragments, query-parameter
order) collapse to one canonical form, then keep one record per
canonical URL. Everything here is built-in Spark SQL expressions —
map-only whole-stage codegen, zero shuffle for canonicalization, ONE
map-side-combined hash aggregation for the dedup — with a DuckDB SQL
mirror for the oracle.

Canonical form (deliberately rule-based and engine-mirrorable, not a
full RFC 3986 resolver):

* scheme lowercased; records without a ``scheme://`` prefix default to
  ``http``
* userinfo dropped; host lowercased; one leading ``www.`` stripped
* default ports removed (``http:80``, ``https:443``); others kept
* path: case preserved (paths are case-sensitive), trailing slashes
  stripped, empty path → ``/``
* query: parameters split on ``&``; empties and tracking parameters
  (``utm_*`` and the click-id family) dropped; the rest byte-sorted
  and rejoined — parameter order never distinguishes two URLs
* fragment dropped

``domain`` is the naive registered domain (last two dot-labels) — a
public-suffix list lookup is a drop-in upgrade and deliberately out of
scope (no third-party data files in this build).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# click-id / referral params stripped during canonicalization, next to
# the utm_* prefix family
TRACKING_PARAMS = ("fbclid", "gclid", "igshid", "mc_cid", "mc_eid", "msclkid", "ref")

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"


def url_parts(url: Column) -> dict[str, Column]:
    """Decompose ``url`` into canonical-ready parts (all codegen
    expressions): scheme, host, port ('' when default/absent), path,
    query (canonical param order), domain."""
    has_scheme = url.rlike(_SCHEME_RE)
    scheme = F.when(
        has_scheme, F.lower(F.regexp_extract(url, _SCHEME_RE, 1))
    ).otherwise(F.lit("http"))
    rest = F.when(has_scheme, F.regexp_replace(url, _SCHEME_RE, "")).otherwise(url)
    authority = F.regexp_extract(rest, r"^([^/?#]*)", 1)
    hostport = F.regexp_extract(authority, r"([^@]*)$", 1)  # drop userinfo
    host = F.regexp_replace(
        F.lower(F.regexp_extract(hostport, r"^([^:]*)", 1)), r"^www\.", ""
    )
    port = F.regexp_extract(hostport, r":([0-9]+)$", 1)
    default_port = ((scheme == "http") & (port == "80")) | (
        (scheme == "https") & (port == "443")
    )
    port = F.when(default_port, F.lit("")).otherwise(port)
    tail = F.regexp_replace(rest, r"^[^/?#]*", "")
    path = F.regexp_replace(F.regexp_extract(tail, r"^([^?#]*)", 1), r"/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    rawq = F.regexp_extract(tail, r"\?([^#]*)", 1)

    def keep_param(p: Column) -> Column:
        key = F.lower(F.regexp_extract(p, r"^([^=]*)", 1))
        return (p != "") & ~key.rlike("^utm_") & ~key.isin(*TRACKING_PARAMS)

    query = F.array_join(F.array_sort(F.filter(F.split(rawq, "&"), keep_param)), "&")
    domain = F.when(
        host.rlike(r"[^.]+\.[^.]+$"),
        F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1),
    ).otherwise(host)
    return {
        "scheme": scheme,
        "host": host,
        "port": port,
        "path": path,
        "query": query,
        "domain": domain,
    }


def canonicalize_url(url: Column) -> Column:
    """The canonical URL string (see module docstring for the rules)."""
    p = url_parts(url)
    return F.concat(
        p["scheme"],
        F.lit("://"),
        p["host"],
        F.when(p["port"] != "", F.concat(F.lit(":"), p["port"])).otherwise(F.lit("")),
        p["path"],
        F.when(p["query"] != "", F.concat(F.lit("?"), p["query"])).otherwise(
            F.lit("")
        ),
    )


def url_dedup(df: DataFrame, id_col: str, url_col: str) -> DataFrame:
    """One row per canonical URL: ``(canon_url, keeper_id, n_urls)`` —
    the smallest id wins (deterministic), ``n_urls`` counts the records
    that collapsed into it.

    At 100 TB: canonicalization is map-only codegen; the dedup is a
    single hash aggregation on the canonical string with map-side
    combine — the same scale shape as exact text dedup, on ~100-byte
    keys instead of documents.
    """
    return (
        df.select(
            F.col(id_col).alias("__id"),
            canonicalize_url(F.col(url_col)).alias("canon_url"),
        )
        .groupBy("canon_url")
        .agg(
            F.min("__id").alias("keeper_id"),
            F.count(F.lit(1)).alias("n_urls"),
        )
    )


# ---------------------------------------------------------------------------
# DuckDB mirrors


def sql_url_parts(col: str) -> dict[str, str]:
    """DuckDB expressions mirroring :func:`url_parts` value-for-value."""
    scheme_re = "^([A-Za-z][A-Za-z0-9+.-]*)://"
    has = f"regexp_matches({col}, '{scheme_re}')"
    scheme = (
        f"(CASE WHEN {has} THEN lower(regexp_extract({col}, '{scheme_re}', 1)) "
        f"ELSE 'http' END)"
    )
    rest = (
        f"(CASE WHEN {has} THEN regexp_replace({col}, '{scheme_re}', '') "
        f"ELSE {col} END)"
    )
    authority = f"regexp_extract({rest}, '^([^/?#]*)', 1)"
    hostport = f"regexp_extract({authority}, '([^@]*)$', 1)"
    host = (
        f"regexp_replace(lower(regexp_extract({hostport}, '^([^:]*)', 1)), "
        f"'^www\\.', '')"
    )
    rawport = f"regexp_extract({hostport}, ':([0-9]+)$', 1)"
    port = (
        f"(CASE WHEN ({scheme} = 'http' AND {rawport} = '80') "
        f"OR ({scheme} = 'https' AND {rawport} = '443') THEN '' "
        f"ELSE {rawport} END)"
    )
    tail = f"regexp_replace({rest}, '^[^/?#]*', '')"
    path0 = f"regexp_replace(regexp_extract({tail}, '^([^?#]*)', 1), '/+$', '')"
    path = f"(CASE WHEN {path0} = '' THEN '/' ELSE {path0} END)"
    rawq = f"regexp_extract({tail}, '\\?([^#]*)', 1)"
    tracking = ", ".join(f"'{t}'" for t in TRACKING_PARAMS)
    keep = (
        "p -> p <> '' AND NOT regexp_matches(lower(regexp_extract(p, '^([^=]*)', 1)),"
        " '^utm_') AND lower(regexp_extract(p, '^([^=]*)', 1)) NOT IN"
        f" ({tracking})"
    )
    query = (
        f"array_to_string(list_sort(list_filter(string_split({rawq}, '&'), {keep})),"
        " '&')"
    )
    domain = (
        f"(CASE WHEN regexp_matches({host}, '[^.]+\\.[^.]+$') "
        f"THEN regexp_extract({host}, '([^.]+\\.[^.]+)$', 1) ELSE {host} END)"
    )
    return {
        "scheme": scheme,
        "host": host,
        "port": port,
        "path": path,
        "query": query,
        "domain": domain,
    }


def sql_canonicalize_url(col: str) -> str:
    p = sql_url_parts(col)
    return (
        f"({p['scheme']} || '://' || {p['host']} || "
        f"(CASE WHEN {p['port']} <> '' THEN ':' || {p['port']} ELSE '' END) || "
        f"{p['path']} || "
        f"(CASE WHEN {p['query']} <> '' THEN '?' || {p['query']} ELSE '' END))"
    )


# ---------------------------------------------------------------------------
# HTML → text extraction (rule-based, engine-mirrorable)

# Entities handled by the decode step — the high-frequency named set;
# numeric entities are out of scope for the rule-based tier (a full
# parser is a mapInPandas drop-in where fidelity matters more than
# staying JVM-side).
_HTML_ENTITIES = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),  # LAST: "&amp;lt;" must become "&lt;", not "<"
]


def html_to_text(html: Column) -> Column:
    """Visible text of an HTML fragment — the boilerplate-strip step a
    web-corpus pipeline runs between fetch and text analysis. Pure
    codegen regex expressions (map-only, zero shuffle):

    1. drop ``<script>``/``<style>`` elements INCLUDING their bodies
       (case-insensitive, dot-matches-newline)
    2. ``<br>`` and ``</p>`` become newlines (paragraph structure
       survives for :func:`~sdvg_spark.ops.dedup.paragraph_dedup`)
    3. every remaining tag is dropped
    4. the common named entities decode (``&amp;`` last so doubly-
       escaped text un-escapes one level, not two)
    5. horizontal whitespace collapses; leading/trailing space and
       blank lines trim away
    """
    # no backreferences: DuckDB's RE2 mirror lacks them, so script and
    # style bodies are two explicit alternatives
    t = F.regexp_replace(
        html,
        r"(?is)<script\b[^>]*>.*?</script\s*>|<style\b[^>]*>.*?</style\s*>",
        "",
    )
    t = F.regexp_replace(t, r"(?i)<br\s*/?>|</p\s*>", "\n")
    t = F.regexp_replace(t, r"(?s)<[^>]*>", "")
    for ent, rep in _HTML_ENTITIES:
        t = F.regexp_replace(t, ent, rep)
    t = F.regexp_replace(t, r"[ \t\r]+", " ")
    t = F.regexp_replace(t, r" ?\n ?", "\n")
    t = F.regexp_replace(t, r"\n+", "\n")
    t = F.regexp_replace(t, r"^\n+|\n+$", "")  # trim() stops at spaces
    return F.trim(t)


def sql_html_to_text(col: str) -> str:
    """DuckDB mirror of :func:`html_to_text` (same regexes; DuckDB's
    regexp_replace needs explicit 'g' where Spark's is global)."""
    t = (
        f"regexp_replace({col}, "
        "'(?is)<script\\b[^>]*>.*?</script\\s*>|<style\\b[^>]*>.*?</style\\s*>',"
        " '', 'g')"
    )
    t = f"regexp_replace({t}, '(?i)<br\\s*/?>|</p\\s*>', chr(10), 'g')"
    t = f"regexp_replace({t}, '(?s)<[^>]*>', '', 'g')"
    for ent, rep in _HTML_ENTITIES:
        r = rep.replace("'", "''")
        t = f"regexp_replace({t}, '{ent}', '{r}', 'g')"
    t = f"regexp_replace({t}, '[ \\t\\r]+', ' ', 'g')"
    t = f"regexp_replace({t}, ' ?\\n ?', chr(10), 'g')"
    t = f"regexp_replace({t}, '\\n+', chr(10), 'g')"
    t = f"regexp_replace({t}, '^\\n+|\\n+$', '', 'g')"
    return f"trim({t})"
