"""F3/F9 — ignore-pattern and hidden-path filter pack.

Web retarget of GitNexus's ignore-pattern machinery: the ~45 directory /
generated-file patterns of language-config.ts:165-199 applied in
parsing-processor.ts:148-161, and the hidden-path visibility predicates of
structure-processor.ts:303-375. The web analogue every crawl pipeline
carries: domain/path blacklists (ad servers, trackers, hidden dot-paths,
crawler traps, asset files).

Rules are DATA (name, regex) — same design as the reference's declarative
pattern lists — compiled into ONE disjunction of rlike predicates: a
scan-local, codegen'd filter with no joins and no UDF; at 10^12 rows it
rides the input scan for free.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# default web ignore-pack (the language-config.ts:165-199 analogue)
DEFAULT_IGNORE_PACK: list[tuple[str, str]] = [
    ("ad_path", r"/(ads?|adserver|banners?|sponsored)/"),
    ("tracker_host", r"^https?://(track(er|ing)?|pixel|metrics|analytics|beacon)\."),
    ("hidden_path", r"/\."),                                  # /.git/ /.well-known/...
    ("infra_path", r"/(cgi-bin|tmp|cache|__[a-z]+__)/"),
    ("asset_ext", r"\.(css|js|ico|woff2?|ttf|eot|map|svg)([?#]|$)"),
    ("calendar_trap", r"/(calendar|cal)/[0-9]{4}/[0-9]{2}/"),
    ("session_id", r"[?&](sessionid|sid|phpsessid)="),
]


def ignore_condition(patterns: list[tuple[str, str]] | None = None,
                     url_col: str = "url") -> Column:
    """OR-of-rlike blacklist condition (TRUE = page should be ignored)."""
    pats = patterns if patterns is not None else DEFAULT_IGNORE_PACK
    cond = F.lit(False)
    for _, rx in pats:
        cond = cond | F.col(url_col).rlike(rx)
    return cond


def matched_rule(patterns: list[tuple[str, str]] | None = None,
                 url_col: str = "url") -> Column:
    """Name of the FIRST matching rule (NULL when none) — the audit
    column; rule order is precedence, like the reference's pattern list."""
    pats = patterns if patterns is not None else DEFAULT_IGNORE_PACK
    expr = F.lit(None).cast("string")
    for name, rx in reversed(pats):
        expr = F.when(F.col(url_col).rlike(rx), F.lit(name)).otherwise(expr)
    return expr


# F7 — config-file predicate (reference parsing-processor.ts:234-252:
# named config files + .json). Web analogue: machine-readable site-config
# resources that should be routed to config handling, not text extraction.
CONFIG_PAGE_RE = (r"(/robots\.txt|/sitemap[^/]*\.xml|/manifest\.json"
                  r"|/feed\.(xml|rss|atom)|/opensearch\.xml)([?#]|$)"
                  r"|/\.well-known/")


def is_config_page(url_col: str = "url") -> Column:
    """TRUE for site-config resources (robots.txt, sitemaps, manifests,
    .well-known, feeds) — the F7 predicate, codegen'd rlike."""
    return F.col(url_col).rlike(CONFIG_PAGE_RE)


def ignore_filter(pages: DataFrame,
                  patterns: list[tuple[str, str]] | None = None,
                  url_col: str = "url", keep_matches: bool = False) -> DataFrame:
    """Apply the blacklist pack to a pages frame.

    keep_matches=False (default): return only the pages that SURVIVE —
    the pipeline pre-pass-1 guard. keep_matches=True: return the dropped
    pages with a `matched_rule` column for auditing.
    """
    cond = ignore_condition(patterns, url_col)
    if keep_matches:
        return pages.filter(cond).withColumn(
            "matched_rule", matched_rule(patterns, url_col))
    return pages.filter(~cond)
