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
* userinfo dropped; host lowercased; one leading ``www.`` stripped;
  bracketed IPv6 authorities (``[2001:db8::1]:8080``) parse correctly
* default ports removed (``http:80``, ``https:443``); others kept
* path: case preserved (paths are case-sensitive), trailing slashes
  stripped, empty path → ``/``
* query: parameters split on ``&``; empties and tracking parameters
  (``utm_*`` and the click-id family) dropped; the rest byte-sorted
  and rejoined — parameter order never distinguishes two URLs
* fragment dropped

``domain`` is the registered domain under a compiled-in subset of the
public-suffix list: hosts whose last THREE labels form a known 3-label
public suffix (``k12.ma.us``, ``pref.aichi.jp``, ``vic.edu.au``, …)
keep FOUR labels, hosts whose last two labels form a known 2-label
suffix (``co.uk``, ``com.au``, ``on.ca``, …) keep THREE, everything
else keeps two; IP literals (v4 dotted-quad, bracketed v6) pass
through whole. The subset covers the common country-code second-level
registries plus the big 3-label classes — US state ``k12``/``cc``/
``lib`` zones, Japanese ``pref.<prefecture>`` geographic registries,
Australian state ``edu``/``gov`` zones (a bit over a thousand entries
of public knowledge — no third-party data files). Suffixes outside the
subset (the long geographic tail, wildcard rules) fall back to the
next-shorter rule, which GROUPS TOO COARSELY: every registrant under
such a registry lands in one bucket, so per-domain quotas over corpora
heavy in those hosts under-admit. That failure direction is documented
here rather than hidden — extend the tables if a corpus needs them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# click-id params stripped during canonicalization, next to the utm_*
# prefix family. 'ref' is deliberately NOT here: it is frequently
# content-bearing (branch/tag selectors, referenced-object ids), so
# stripping it collapses genuinely distinct URLs.
TRACKING_PARAMS = ("fbclid", "gclid", "igshid", "mc_cid", "mc_eid", "msclkid")

# Compiled-in subset of the public suffix list: MULTI-LABEL public
# suffixes only (single-label TLDs need no entry — the default
# two-label rule already handles them). Grouped {tld: second-level
# labels} and expanded to a frozenset of "label.tld" strings below.
# Compiled from public knowledge of ccTLD registry conventions; the
# high-traffic registries are all present.
_PSL_2LABEL: dict[str, str] = {
    "uk": "co org me ltd plc net sch ac gov nhs mod police",
    "au": "com net org edu gov asn id",
    "nz": "co net org govt ac school geek gen kiwi maori iwi mil health cri parliament",
    "jp": "co ne or go ac ad ed gr lg",
    "kr": "co ne or go ac re pe mil hs ms es sc kg",
    "cn": "com net org gov edu ac mil",
    "tw": "com net org gov edu idv game club ebiz",
    "hk": "com net org gov edu idv",
    "sg": "com net org gov edu per",
    "in": "co net org gov ac edu res firm gen ind mil nic",
    "br": "com net org gov edu mil art adv blog eco ind inf jus leg nom rec srv tur tv wiki",
    "mx": "com net org gob edu",
    "ar": "com net org gob gov edu int mil tur musica",
    "co": "com net org gov edu mil nom",
    "pe": "com net org gob edu mil nom",
    "ve": "com net org gob edu mil web co info",
    "cl": "gob gov mil co",
    "ec": "com net org gob edu mil fin med pro info",
    "bo": "com net org gob edu mil int tv web",
    "uy": "com net org gub edu mil",
    "py": "com net org gov edu mil coop",
    "cr": "co ac ed fi go or sa",
    "gt": "com net org gob edu mil ind",
    "do": "com net org gob edu mil gov sld web art",
    "sv": "com org edu gob red",
    "hn": "com net org gob edu mil",
    "ni": "com net org gob edu mil co ac biz info int web",
    "pa": "com net org gob edu ac sld abo ing med nom",
    "cu": "com net org gov edu inf",
    "tr": "com net org gov edu av bbs bel biz dr gen info k12 mil name pol tel tv web",
    "il": "co net org gov ac muni k12 idf",
    "ru": "com net org edu gov int mil msk spb",
    "ua": "com net org gov edu in kiev kyiv",
    "pl": "com net org gov edu info biz waw",
    "hu": "co org info priv",
    "gr": "com net org gov edu",
    "ro": "com org info firm nom rec store tm arts",
    "za": "co net org gov ac web edu mil nom school",
    "ng": "com net org gov edu sch name mobi mil i",
    "ke": "co ne or go ac sc me mobi info",
    "gh": "com org gov edu mil",
    "tz": "co ne or go ac sc hotel info me mil mobi tv",
    "ug": "co ne or go ac sc",
    "zw": "co org gov ac mil",
    "eg": "com net org gov edu sci eun mil name",
    "ma": "co net org gov ac press",
    "sa": "com net org gov edu med pub sch",
    "ae": "co net org gov ac sch mil",
    "qa": "com net org gov edu mil name sch",
    "kw": "com net org gov edu",
    "om": "com net org gov edu med museum pro",
    "jo": "com net org gov edu mil name sch",
    "lb": "com net org gov edu",
    "pk": "com net org gov edu biz web fam gok gon gop gos",
    "bd": "com net org gov edu ac mil",
    "lk": "com net org gov edu ac sch int web ltd assn grp hotel",
    "np": "com net org gov edu mil aero biz coop info museum name pro",
    "th": "co net or go ac in mi",
    "id": "co net or go ac web sch mil biz my desa ponpes",
    "my": "com net org gov edu mil name",
    "ph": "com net org gov edu ngo mil i",
    "vn": "com net org gov edu int ac biz info name pro health",
    "kh": "com net org gov edu mil per",
    "es": "com nom org gob edu",
    "it": "gov edu",
    "fr": "gouv asso nom tm",
    "pt": "com net org gov edu int publ nome",
    "at": "co or ac gv priv",
    "be": "ac",
    "ir": "co net org gov ac id sch",
    "iq": "com net org gov edu mil",
    "dz": "com gov edu org net asso pol art",
    "tn": "com net org gov",
    "rs": "co org edu in gov ac",
    "ba": "com net org gov edu mil",
    "hr": "com from iz name",
    "lv": "com net org gov edu asn conf id mil",
    "ee": "com org edu gov riik lib med pri aip fie",
    "lt": "gov",
    "kz": "com net org gov edu mil",
    "uz": "com net org gov co",
    "by": "com net org gov mil of",
    "ge": "com net org gov edu mil pvt",
    "am": "com net org",
    "az": "com net org gov edu int mil name pro biz info",
    # US state registries and Canadian provinces are themselves public
    # suffixes (example.ca.us / example.on.ca are registered domains)
    "us": "al ak az ar ca co ct de dc fl ga hi id il in ia ks ky la me md"
    " ma mi mn ms mo mt ne nv nh nj nm ny nc nd oh ok or pa ri sc sd tn"
    " tx ut vt va wa wv wi wy",
    "ca": "ab bc mb nb nf nl ns nt nu on pe qc sk yk gc",
}

PUBLIC_SUFFIXES: frozenset[str] = frozenset(
    f"{label}.{tld}" for tld, labels in _PSL_2LABEL.items() for label in labels.split()
)

# 3-label public suffixes: the big classes the real PSL carries one
# level below the tables above. Hosts ending in one of these keep FOUR
# labels. Same compiled-in-public-knowledge pattern as _PSL_2LABEL.
_US_STATES = (
    "al ak az ar ca co ct de dc fl ga hi id il in ia ks ky la me md"
    " ma mi mn ms mo mt ne nv nh nj nm ny nc nd oh ok or pa ri sc sd tn"
    " tx ut vt va wa wv wi wy"
).split()

_JP_PREFECTURES = (
    "aichi akita aomori chiba ehime fukui fukuoka fukushima gifu gunma"
    " hiroshima hokkaido hyogo ibaraki ishikawa iwate kagawa kagoshima"
    " kanagawa kochi kumamoto kyoto mie miyagi miyazaki nagano nagasaki"
    " nara niigata oita okayama okinawa osaka saga saitama shiga shimane"
    " shizuoka tochigi tokushima tokyo tottori toyama wakayama yamagata"
    " yamaguchi yamanashi"
).split()

_AU_STATES = "act nsw nt qld sa tas vic wa".split()

PUBLIC_SUFFIXES_3: frozenset[str] = frozenset(
    # US state school districts / community colleges / libraries
    [f"{zone}.{st}.us" for st in _US_STATES for zone in ("k12", "cc", "lib")]
    # Japanese prefectural-government geographic registries
    + [f"pref.{p}.jp" for p in _JP_PREFECTURES]
    # Australian state education and government zones
    + [f"{st}.edu.au" for st in _AU_STATES]
    + [f"{st}.gov.au" for st in _AU_STATES]
)

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"


def registered_domain(host: Column) -> Column:
    """Registered domain of a lowercased host under the compiled-in
    public-suffix subset (module docstring). IP literals (dotted-quad
    v4, bracketed v6) pass through whole — per-domain grouping on the
    last two octets of an IP would be meaningless.

    Both ``isin`` sets exceed Spark's InSet conversion threshold, so
    they evaluate as one hash-set membership probe each (O(1) per row,
    still whole-stage codegen) — growing the tables does not grow the
    per-row cost.

    CONSTRUCTION cost is another matter: ``Column.isin`` makes one py4j
    ``lit()`` round trip per literal (~0.6 s driver-side for the ~1100
    entries — measured, the r8 ``url_dedup`` 2× story). Hot paths that
    have the host as a NAMED column should use
    ``registered_domain_sql(host, dialect="spark")`` inside ``F.expr``
    instead: the same expression authored as one parsed SQL string, one
    py4j call total. This Column form stays for composition over
    derived host expressions and for tests."""
    is_ip = host.rlike(r"^[0-9.]+$") | host.rlike(r"^\[")
    last2 = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    last3 = F.regexp_extract(host, r"([^.]+\.[^.]+\.[^.]+)$", 1)
    last4 = F.regexp_extract(host, r"([^.]+\.[^.]+\.[^.]+\.[^.]+)$", 1)
    return (
        F.when(is_ip, host)
        .when((last4 != "") & last3.isin(*sorted(PUBLIC_SUFFIXES_3)), last4)
        .when((last3 != "") & last2.isin(*sorted(PUBLIC_SUFFIXES)), last3)
        .when(last2 != "", last2)
        .otherwise(host)
    )


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
    # bracketed IPv6 authorities: host = the [..] literal (no www-strip,
    # colons inside the brackets are not a port separator)
    bracket = hostport.rlike(r"^\[")
    host = F.when(
        bracket, F.lower(F.regexp_extract(hostport, r"^(\[[^\]]*\])", 1))
    ).otherwise(
        F.regexp_replace(
            F.lower(F.regexp_extract(hostport, r"^([^:]*)", 1)), r"^www\.", ""
        )
    )
    port = F.when(
        bracket, F.regexp_extract(hostport, r"\]:([0-9]+)$", 1)
    ).otherwise(F.regexp_extract(hostport, r":([0-9]+)$", 1))
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
    return _LazyParts(
        {
            "scheme": scheme,
            "host": host,
            "port": port,
            "path": path,
            "query": query,
        },
        host,
    )


class _LazyParts(dict):
    """``url_parts`` result: ``domain`` is built only when read.

    ``registered_domain`` costs ~0.6 s of py4j round trips to CONSTRUCT
    (one ``lit()`` per public-suffix entry), and the biggest caller —
    :func:`canonicalize_url`, hence the whole ``url_dedup`` path — never
    reads it. Building it eagerly doubled ``url_dedup``'s wall time in
    r8; a lazy entry keeps the dict API while charging only callers who
    actually use the domain."""

    def __init__(self, base: dict, host: Column) -> None:
        super().__init__(base)
        self._host = host

    def __missing__(self, key: str) -> Column:
        if key == "domain":
            col = registered_domain(self._host)
            self[key] = col
            return col
        raise KeyError(key)


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
    bracket = f"regexp_matches({hostport}, '^\\[')"
    host = (
        f"(CASE WHEN {bracket} "
        f"THEN lower(regexp_extract({hostport}, '^(\\[[^\\]]*\\])', 1)) "
        f"ELSE regexp_replace(lower(regexp_extract({hostport}, '^([^:]*)', 1)), "
        f"'^www\\.', '') END)"
    )
    rawport = (
        f"(CASE WHEN {bracket} "
        f"THEN regexp_extract({hostport}, '\\]:([0-9]+)$', 1) "
        f"ELSE regexp_extract({hostport}, ':([0-9]+)$', 1) END)"
    )
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
    return {
        "scheme": scheme,
        "host": host,
        "port": port,
        "path": path,
        "query": query,
        "domain": sql_registered_domain(host),
    }


def registered_domain_sql(host: str, dialect: str = "duckdb") -> str:
    """:func:`registered_domain` authored as ONE SQL string, for both
    engines: ``dialect="duckdb"`` is the oracle mirror,
    ``dialect="spark"`` parses with ``F.expr`` in a single py4j call —
    the hot-path form (see the Column docstring for why). The two texts
    differ only in the regex-match predicate spelling
    (``regexp_matches`` vs ``regexp_like``); the CASE, the extracts,
    and the IN lists are byte-identical, so the equivalence surface is
    minimal and pinned by ``test_registered_domain_duckdb_mirror``."""
    like = "regexp_matches" if dialect == "duckdb" else "regexp_like"
    suffixes = ", ".join(f"'{s}'" for s in sorted(PUBLIC_SUFFIXES))
    suffixes3 = ", ".join(f"'{s}'" for s in sorted(PUBLIC_SUFFIXES_3))
    # regexes are deliberately backslash-free ([.] classes, substr for
    # the leading bracket): Spark SQL string literals consume
    # backslashes while DuckDB's do not, so any \-escape would need
    # per-dialect text. A [.] class needs none and parses identically
    # in RE2 and java.util.regex ([[] would not — Java nests classes).
    is_ip = f"({like}({host}, '^[0-9.]+$') OR substr({host}, 1, 1) = '[')"
    last2 = f"regexp_extract({host}, '([^.]+[.][^.]+)$', 1)"
    last3 = f"regexp_extract({host}, '([^.]+[.][^.]+[.][^.]+)$', 1)"
    last4 = f"regexp_extract({host}, '([^.]+[.][^.]+[.][^.]+[.][^.]+)$', 1)"
    return (
        f"(CASE WHEN {is_ip} THEN {host} "
        f"WHEN {last4} <> '' AND {last3} IN ({suffixes3}) THEN {last4} "
        f"WHEN {last3} <> '' AND {last2} IN ({suffixes}) THEN {last3} "
        f"WHEN {last2} <> '' THEN {last2} ELSE {host} END)"
    )


def sql_registered_domain(host: str) -> str:
    """DuckDB mirror of :func:`registered_domain` (back-compat alias)."""
    return registered_domain_sql(host, dialect="duckdb")


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

# Entities handled by the regex decode step: the high-frequency named
# set PLUS the ubiquitous numeric forms (decimal and hex, optional
# leading zeros, case-insensitive hex marker) for the same characters
# and the curly-quote/dash/ellipsis family real HTML uses constantly.
# Each entry is (regex alternation, replacement). The fully general
# path — every numeric codepoint, every named entity — is
# :func:`html_to_text_parsed`, the mapInPandas parser tier.
_HTML_ENTITIES = [
    (r"&nbsp;|&#0*160;|(?i)&#x0*a0;", " "),
    (r"&lt;|&#0*60;|(?i)&#x0*3c;", "<"),
    (r"&gt;|&#0*62;|(?i)&#x0*3e;", ">"),
    (r"&quot;|&#0*34;|(?i)&#x0*22;", '"'),
    (r"&apos;|&#0*39;|(?i)&#x0*27;", "'"),
    (r"&lsquo;|&#0*8216;|(?i)&#x0*2018;", "‘"),
    (r"&rsquo;|&#0*8217;|(?i)&#x0*2019;", "’"),
    (r"&ldquo;|&#0*8220;|(?i)&#x0*201c;", "“"),
    (r"&rdquo;|&#0*8221;|(?i)&#x0*201d;", "”"),
    (r"&ndash;|&#0*8211;|(?i)&#x0*2013;", "–"),
    (r"&mdash;|&#0*8212;|(?i)&#x0*2014;", "—"),
    (r"&hellip;|&#0*8230;|(?i)&#x0*2026;", "…"),
    # LAST: "&amp;lt;" must become "&lt;", not "<"
    (r"&amp;|&#0*38;|(?i)&#x0*26;", "&"),
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
    4. the common entities decode — named plus their numeric forms
       (``&amp;`` family last so doubly-escaped text un-escapes one
       level, not two)
    5. horizontal whitespace collapses; leading/trailing space and
       blank lines trim away

    For full entity coverage (arbitrary numeric codepoints, the long
    named tail) and attribute-aware tag parsing, use
    :func:`html_to_text_parsed` — the Arrow-batched parser tier.
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


# ---------------------------------------------------------------------------
# HTML → text, parser tier (full entity/tag fidelity)

_BLOCK_TAGS = frozenset(
    "p div br li ul ol h1 h2 h3 h4 h5 h6 tr table blockquote pre section"
    " article header footer".split()
)


def _extract_visible_text(html: str) -> str:
    """Visible text via a real HTML tokenizer (stdlib ``html.parser``):
    every named and numeric entity decodes (``convert_charrefs``),
    quoted ``>`` inside attribute values does not truncate tags, and
    block-level boundaries become newlines. Whitespace then collapses
    with the same rules as the regex tier."""
    import re
    from html.parser import HTMLParser

    class _Extractor(HTMLParser):
        def __init__(self) -> None:
            super().__init__(convert_charrefs=True)
            self.parts: list[str] = []
            self.skip = 0

        def handle_starttag(self, tag, attrs):
            if tag in ("script", "style"):
                self.skip += 1
            elif tag in _BLOCK_TAGS:
                self.parts.append("\n")

        def handle_startendtag(self, tag, attrs):
            if tag in _BLOCK_TAGS:
                self.parts.append("\n")

        def handle_endtag(self, tag):
            if tag in ("script", "style"):
                self.skip = max(0, self.skip - 1)
            elif tag in _BLOCK_TAGS:
                self.parts.append("\n")

        def handle_data(self, data):
            if not self.skip:
                self.parts.append(data)

    ex = _Extractor()
    try:
        ex.feed(html)
        ex.close()
    except Exception:  # pragma: no cover - pathological markup
        pass
    t = "".join(ex.parts)
    t = re.sub(r"[ \t\r]+", " ", t)
    t = re.sub(r" ?\n ?", "\n", t)
    t = re.sub(r"\n+", "\n", t)
    return t.strip()


def html_to_text_parsed(
    df: DataFrame, html_col: str, out_col: str = "clean_text"
) -> DataFrame:
    """Parser-tier HTML→text: adds ``out_col`` next to the input
    columns. Arrow-batched ``mapInPandas`` over a real HTML tokenizer —
    map-only and embarrassingly parallel like the regex tier, but
    Python-side, so reserve it for corpora where entity/markup fidelity
    matters more than staying JVM-side (the regex tier is the hot
    path). Not DuckDB-mirrorable (no SQL equivalent of a tokenizer);
    its contract is pinned by pytest fixtures instead of an oracle
    row."""
    import pandas as pd

    if out_col in df.schema.fieldNames():
        raise ValueError(f"output column {out_col!r} already exists")
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + f", {out_col} string"

    def kernel(batches):
        for pdf in batches:
            vals = [
                _extract_visible_text(h) if h is not None else None
                for h in pdf[html_col]
            ]
            yield pdf.assign(**{out_col: pd.Series(vals, index=pdf.index)})

    return df.mapInPandas(kernel, schema)
