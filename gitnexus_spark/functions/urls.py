"""URL locality distance — the web analogue of the reference's
import-distance scoring (calculateImportDistance + same-file / sibling-
directory bonuses, src/core/graph/trie.ts:182-208 and
call-processor.ts:305-323).

Pure Catalyst expressions (codegen'd, no UDF):

    0  identical URL              (same-file bonus)
    1  same host + same directory (sibling-directory bonus)
    2  same host
    3  different host / unknown

Used by stage-3 fuzzy linking as the tiebreak between equal-Jaccard
candidates, and available standalone (X1 family).
"""

from __future__ import annotations

from pyspark.sql import functions as F

HOST_RE = r"^https?://([^/]+)"


def url_host(col: F.Column) -> F.Column:
    return F.regexp_extract(col, HOST_RE, 1)


def url_dir(col: F.Column) -> F.Column:
    """Everything up to and including the last '/' (the page's directory)."""
    return F.regexp_extract(col, r"^(.*/)[^/]*$", 1)


def url_distance_expr(a: F.Column, b: F.Column) -> F.Column:
    """Locality distance between two URLs (0 closest, 3 farthest)."""
    return (
        F.when(a.isNull() | b.isNull(), F.lit(3))
        .when(a == b, F.lit(0))
        .when((url_host(a) == url_host(b)) & (url_dir(a) == url_dir(b)), F.lit(1))
        .when(url_host(a) == url_host(b), F.lit(2))
        .otherwise(F.lit(3))
    )
