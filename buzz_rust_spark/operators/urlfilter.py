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
    """Canonical URL: lowercase scheme+host, default ports stripped,
    fragment dropped, tracking query params removed (empty ``?`` too),
    trailing slash on a bare path normalized away."""
    u = F.trim(col)
    # lowercase ONLY the scheme://host[:port] prefix, never the path
    prefix = F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1)
    u = F.concat(F.lower(prefix), F.substr(u, F.length(prefix) + 1))
    u = F.regexp_replace(u, r"#.*$", "")  # fragment
    u = F.regexp_replace(u, r"^(https?://[^/:?#]+):(?:80|443)(?=[/?#]|$)", r"$1")
    for p in TRACKING_PARAMS:
        u = F.regexp_replace(u, rf"([?&]){p}=[^&#]*", r"$1")
    u = F.regexp_replace(u, r"[?&]+$", "")  # dangling separators
    u = F.regexp_replace(u, r"\?&+", "?")
    u = F.regexp_replace(u, r"&{2,}", "&")
    u = F.regexp_replace(u, r"^(https?://[^/?#]+)/$", r"$1")
    return u


def url_host(col: Column) -> Column:
    """Lower-cased host of a URL (empty string when unparseable)."""
    return F.lower(F.coalesce(F.parse_url(col, F.lit("HOST")), F.lit("")))


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
    keep &= F.lower(F.coalesce(F.parse_url(u, F.lit("PROTOCOL")), F.lit(""))).isin(
        *allow_schemes
    )
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
    canon = url_normalize(F.col(url_col)).alias("_curl")
    others = [c for c in df.columns]
    packed = df.select(canon, F.struct(F.col(id_col), *[
        F.col(c) for c in others if c != id_col
    ]).alias("_row"))
    return (
        packed.groupBy("_curl")
        .agg(F.min("_row").alias("_row"))
        .select("_row.*")
    )
