"""URL curation for crawl-derived corpora: normalize, filter, dedup.

The first gate every published web-corpus pipeline (C4, CCNet, RefinedWeb)
applies after the WARC intake is URL-level: throw away blocked domains and
non-content schemes, canonicalize the URL (tracking params, fragments,
default ports, case), and keep one document per canonical URL.  All of it
is JVM expressions — ``parse_url`` + regexp chains in whole-stage codegen,
one exact-dedup shuffle for :func:`dedup_by_url` — so the gate costs a
narrow map over the corpus at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# query parameters that identify a click, not a document — the usual
# tracking strip-list (utm campaign family + the big ad-click ids)
TRACKING_PARAMS = (
    "utm_[a-z]+",
    "fbclid",
    "gclid",
    "msclkid",
    "mc_eid",
    "igshid",
    "ref_src",
)


def url_normalize(col: Column) -> Column:
    """Canonical URL: lowercase scheme+host, scheme-MATCHED default ports
    stripped (``:80`` only for http, ``:443`` only for https — the cross
    pairings address different endpoints), fragment dropped, tracking
    params removed from the QUERY STRING ONLY (a literal ``&fbclid=`` in
    the path is path content, and query values may contain ``/``),
    trailing slash on a bare path normalized away."""
    u = F.trim(col)
    # lowercase ONLY the scheme://host[:port] prefix, never the path
    prefix = F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1)
    u = F.concat(F.lower(prefix), F.substr(u, F.length(prefix) + 1))
    u = F.regexp_replace(u, r"#.*$", "")  # fragment
    u = F.regexp_replace(u, r"^(http://[^/:?#]+):80(?=[/?#]|$)", r"$1")
    u = F.regexp_replace(u, r"^(https://[^/:?#]+):443(?=[/?#]|$)", r"$1")
    # split at the FIRST '?': tracking strips apply to the query part only
    path = F.regexp_extract(u, r"^([^?]*)", 1)
    query = F.substr(u, F.length(path) + 1)  # includes the leading '?'
    for p in TRACKING_PARAMS:
        query = F.regexp_replace(query, rf"([?&]){p}=[^&#]*", r"$1")
    query = F.regexp_replace(query, r"\?&+", "?")
    query = F.regexp_replace(query, r"&{2,}", "&")
    query = F.regexp_replace(query, r"[?&]+$", "")  # dangling separators
    u = F.concat(path, query)
    u = F.regexp_replace(u, r"^(https?://[^/?#]+)/$", r"$1")
    return u


def url_host(col: Column) -> Column:
    """Lower-cased host of a URL (empty string when unparseable).

    ``try_parse_url``: under ANSI mode (the Spark 4 default) plain
    ``parse_url`` RAISES on exactly the malformed URLs this module exists
    to drop."""
    return F.lower(F.coalesce(F.try_parse_url(col, F.lit("HOST")), F.lit("")))


def filter_urls(
    df: DataFrame,
    url_col: str = "target_uri",
    block_domains: list[str] | None = None,
    block_patterns: list[str] | None = None,
    allow_schemes: tuple[str, ...] = ("http", "https"),
) -> DataFrame:
    """Drop rows whose URL is off-scheme, on a blocked domain (suffix
    match: ``example.com`` blocks ``www.example.com``), or matches a
    blocked regex.  Blocklists are expressions folded into the projection
    — no join, no shuffle; at real blocklist sizes (tens of thousands of
    domains) switch to a broadcast anti-join on :func:`url_host` instead."""
    u = F.col(url_col)
    host = url_host(u)
    keep = host != ""
    keep &= F.lower(
        F.coalesce(F.try_parse_url(u, F.lit("PROTOCOL")), F.lit(""))
    ).isin(*allow_schemes)
    for d in block_domains or []:
        d = d.lower()
        keep &= ~((host == d) | host.endswith("." + d))
    for pat in block_patterns or []:
        keep &= ~F.lower(u).rlike(pat)
    return df.where(keep)


def dedup_by_url(
    df: DataFrame, url_col: str = "target_uri", id_col: str = "doc_id"
) -> DataFrame:
    """One row per canonical URL — the standard recrawl/mirror dedup before
    any content-level dedup runs.  Keeps the row with the smallest id per
    canonical URL (deterministic), via ONE min(struct) aggregate keyed by
    the normalized URL: no window function, no secondary shuffle, and the
    combine is map-side partial like dedup_exact."""
    with_url = F.col(url_col).isNotNull()
    # null-URL rows pass through UNTOUCHED: null is one group-by key, so
    # deduping them would silently collapse every URL-less document to one
    canon = url_normalize(F.col(url_col)).alias("_curl")
    packed = df.where(with_url).select(
        canon,
        # id_col leads the struct so min() means "smallest id wins"
        F.struct(
            F.col(id_col), *[F.col(c) for c in df.columns if c != id_col]
        ).alias("_row"),
    )
    deduped = (
        packed.groupBy("_curl")
        .agg(F.min("_row").alias("_row"))
        .select("_row.*")
        .select(*df.columns)  # restore the INPUT column order (unions are
        # positional — a reorder would corrupt them silently)
    )
    return deduped.unionByName(df.where(~with_url))
