"""UI-change gate — re-spec of utils/ui_checker.py:25-45 (V3).

The reference hashes the first 1000 chars of each homepage and compares with
a stored hash; a change flags the crawler profile for review (the gate call
is commented out in the reference driver, VNNewsCrawler.py:15-17 — we keep
it as a queryable operator + metric column).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import md5_prefix_hash


def ui_changes(pages: DataFrame, stored: DataFrame,
               url_col: str = "url", html_col: str = "html") -> DataFrame:
    """(url, html) x stored(url, ui_hash) -> (url, ui_hash, changed).

    changed is True only when a stored hash exists AND differs
    (ui_checker.py:39-41); unseen URLs are recorded, not flagged.
    """
    cur = pages.select(
        F.col(url_col).alias("url"),
        md5_prefix_hash(F.col(html_col), 1000).alias("ui_hash"),
    )
    old = stored.select(F.col("url"), F.col("ui_hash").alias("prev_hash"))
    return cur.join(old, "url", "left").select(
        "url",
        "ui_hash",
        (F.col("prev_hash").isNotNull() & (F.col("prev_hash") != F.col("ui_hash"))
         ).alias("changed"),
    )
