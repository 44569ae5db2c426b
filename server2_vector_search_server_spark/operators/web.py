"""Web-corpus curation operators: HTML stripping and URL normalization.

Every large-scale pretraining pipeline runs these before the text stages —
C4 strips page markup before its line rules (Raffel et al. 2020, §2.2),
RefinedWeb filters and deduplicates by normalized URL before content dedup
(Penedo et al. 2023, §3.1). The reference engine ingests .txt/.md/.pdf only,
so these extend the ingest surface rather than mirroring it.

Both operators are pure column expressions (regex + string functions): they
fuse into the scan with no shuffle and no Python, which is what makes them
free at 100 TB — the same single-projection discipline as
``operators/text_analysis``. Patterns are kept to the regex subset that
Java's engine (Spark) and RE2 (DuckDB) interpret identically, so every
output is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# HTML entities the stripper decodes (the ones that survive into text);
# applied AFTER tag removal so entity text inside tags dies with the tag.
_ENTITIES = [("&nbsp;", " "), ("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"),
             ("&quot;", '"'), ("&#39;", "'")]

# Query parameters that track, not identify: the RefinedWeb/common-crawl
# normalization drop list.
_TRACKING_PARAMS = ("utm_[a-z]+", "fbclid", "gclid", "msclkid", "ref")


def strip_html(text: Column) -> Column:
    """Markup → text: drop <script>/<style> blocks wholesale, drop comments,
    turn block-level closers into newlines, drop every remaining tag, decode
    the common entities, and collapse runs of blank space per line. One
    narrow expression chain — no Python, no shuffle."""
    out = F.regexp_replace(text,
                           r"(?is)<(script|style|title)[^>]*>.*?</\1>", " ")
    out = F.regexp_replace(out, r"(?s)<!--.*?-->", " ")
    # block-level boundaries become newlines so paragraphs survive
    out = F.regexp_replace(
        out, r"(?i)</(p|div|br|h[1-6]|li|tr|table|ul|ol)>|<br\s*/?>", "\n")
    out = F.regexp_replace(out, r"(?s)<[^>]*>", " ")
    for ent, rep in _ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(rep))
    out = F.regexp_replace(out, r"[ \t]+", " ")
    out = F.regexp_replace(out, r" ?\n ?", "\n")
    out = F.regexp_replace(out, r"\n{2,}", "\n")
    # F.trim strips spaces only — boundary newlines need the regex form
    return F.regexp_replace(out, r"^\s+|\s+$", "")


def normalize_url(url: Column) -> Column:
    """Canonical URL form: lowercase scheme+host, strip a default port,
    drop the fragment, drop tracking query params (utm_*, fbclid, gclid,
    msclkid, ref), drop an empty leftover '?', and strip one trailing slash
    from a non-root path. Two URLs that differ only in tracking noise or
    case of the authority collapse to the same key — the URL-dedup contract.
    """
    # lowercase scheme://host[:port] only (path and query are case-relevant)
    head = F.regexp_extract(url, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1)
    tail = F.substring(url, F.length(head) + 1, F.lit(2 ** 30))
    out = F.concat(F.lower(head), tail)
    out = F.regexp_replace(out, r"^(https?://[^/?#:]*):(?:80|443)(?=[/?#]|$)",
                           "$1")
    out = F.regexp_replace(out, r"#.*$", "")
    for p in _TRACKING_PARAMS:
        out = F.regexp_replace(out, rf"([?&]){p}=[^&#]*", "$1")
    out = F.regexp_replace(out, r"\?&+", "?")     # leftover separators
    out = F.regexp_replace(out, r"&{2,}", "&")
    out = F.regexp_replace(out, r"[?&]$", "")
    out = F.regexp_replace(out, r"^(.+:\/\/[^/?#]+\/[^?#]*?)\/(?=$|\?)", "$1")
    return out


def url_domain(url: Column) -> Column:
    """Registrable-host extract from a (normalized) URL: the authority minus
    port and a leading ``www.`` — the grouping key for per-domain quotas and
    blocklists (the RefinedWeb URL-filter shape)."""
    host = F.regexp_extract(url, r"^[a-z][a-z0-9+.-]*://([^/?#:]*)", 1)
    return F.regexp_replace(F.lower(host), r"^www\.", "")
