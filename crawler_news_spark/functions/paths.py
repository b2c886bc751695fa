"""Deterministic storage-path derivation — built-in expressions only.

Re-spec of the reference's SFTP image-path rule (vnexpress.py:117-128):
``{base}/{site}/{category}/{dd-MM-yyyy}/{url-basename-before-'?'}`` where the
date folder comes from the clean_date prefix and the category slug is
filename-sanitized with '/'->'-' (base_crawler.py:76, R3).  The byte
transfer itself is stubbed (media_ref in the span struct carries the source
URL); the path derivation is the queryable part.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def sanitize_category(category: Column) -> Column:
    """R3: article_type.replace('/', '-') (base_crawler.py:76)."""
    return F.regexp_replace(category, "/", "-")


def date_folder(published_date_clean: Column) -> Column:
    """'08/10/2023, 06:49 (GMT+7)' -> '08-10-2023' (vnexpress.py:119-121)."""
    d = F.regexp_extract(published_date_clean, r"^(\d{2})/(\d{2})/(\d{4})", 1)
    m = F.regexp_extract(published_date_clean, r"^(\d{2})/(\d{2})/(\d{4})", 2)
    y = F.regexp_extract(published_date_clean, r"^(\d{2})/(\d{2})/(\d{4})", 3)
    return F.concat_ws("-", d, m, y)


def image_basename(image_url: Column) -> Column:
    """basename of the pre-'?' URL (vnexpress.py:126-127)."""
    clean = F.regexp_replace(image_url, r"\?.*$", "")
    return F.regexp_extract(clean, r"([^/]+)$", 1)


def image_local_path(
    base: Column, site: Column, category: Column,
    published_date_clean: Column, image_url: Column,
) -> Column:
    return F.concat_ws(
        "/",
        base,
        site,
        sanitize_category(category),
        date_folder(published_date_clean),
        image_basename(image_url),
    )


SQL_IMAGE_PATH_TEMPLATE = """
    concat_ws('/', {base}, {site}, regexp_replace({category}, '/', '-'),
        concat_ws('-',
            regexp_extract({date}, '^(\\d{{2}})/(\\d{{2}})/(\\d{{4}})', 1),
            regexp_extract({date}, '^(\\d{{2}})/(\\d{{2}})/(\\d{{4}})', 2),
            regexp_extract({date}, '^(\\d{{2}})/(\\d{{2}})/(\\d{{4}})', 3)),
        regexp_extract(regexp_replace({url}, '\\?.*$', ''), '([^/]+)$', 1))
"""
