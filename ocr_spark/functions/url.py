"""URL canonicalization column expressions (crawl dedup prerequisite).

The same document commonly appears under many URL spellings: http vs
https, uppercase hosts, default ports, trailing slashes, fragments, and
tracking query parameters. ``canonical_url`` normalizes all of these with
built-in regexp expressions (JVM-side, codegen) so URL-level dedup is a
plain hash-groupBy — the cheapest dedup tier, run before any content
hashing.

Steps (order matters):
1. scheme → lowercase, http:// and https:// unified to https://
2. host → lowercase; default :80/:443 port stripped
3. fragment (#...) dropped
4. tracking params (utm_*, fbclid, gclid, ref) dropped; a trailing lone
   '?' dropped
5. trailing '/' stripped (except the bare host root)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TRACKING = r"(?:utm_[a-z]+|fbclid|gclid|msclkid|ref)=[^&#]*"


def canonical_url(col: str | Column = "url") -> Column:
    c = F.col(col) if isinstance(col, str) else col
    # 1. unify scheme (case-insensitive) to https
    c = F.regexp_replace(c, r"(?i)^https?://", "https://")
    # 2. lowercase the host portion only; strip default ports
    host = F.lower(F.regexp_extract(c, r"^https://([^/?#]+)", 1))
    host = F.regexp_replace(host, r":(?:80|443)$", "")
    rest = F.regexp_replace(c, r"^https://[^/?#]+", "")
    c = F.concat(F.lit("https://"), host, rest)
    # 3. drop fragment
    c = F.regexp_replace(c, r"#.*$", "")
    # 4. drop tracking params, separator-aware: first any param followed by
    # '&' (its own leading ?/& stays to serve the next param), then a
    # trailing param together with its leading separator
    c = F.regexp_replace(c, _TRACKING + r"&", "")
    c = F.regexp_replace(c, r"[?&]" + _TRACKING + r"$", "")
    c = F.regexp_replace(c, r"\?$", "")
    # 5. strip trailing slash (not the root's)
    c = F.regexp_replace(c, r"(https://[^/]+/.+?)/$", "$1")
    return c


def dedup_by_url(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """URL-tier dedup: one row per canonical url (first by raw url order —
    deterministic). Shuffles only (canonical hash, url)."""
    from pyspark.sql import Window

    keyed = pages.withColumn("_curl", canonical_url(url_col))
    w = Window.partitionBy("_curl").orderBy(F.col(url_col))
    return (
        keyed.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_curl")
    )
