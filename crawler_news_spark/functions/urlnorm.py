"""URL canonicalization — built-in column expressions only (no UDF).

Rules (reference precedents cited):
1. absolutize relative hrefs against the host base
   (vietnamnet.py:235-237, baotintuc.py:270-273)
2. strip query + fragment  (``split('?')[0]`` precedent, vnexpress.py:126)
3. lowercase scheme://host  (engine addition; hosts are case-insensitive)

``canonical_hash`` is Spark's builtin ``xxhash64`` over the canonical URL —
JVM-side, codegen'd, and identical on every executor.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def absolutize_col(href: Column, base_url: Column) -> Column:
    return F.when(href.startswith("http"), href).otherwise(F.concat(base_url, href))


def canonicalize_col(url: Column) -> Column:
    u = F.regexp_replace(url, r"[?#].*$", "")
    head = F.lower(F.regexp_extract(u, r"^(https?://[^/]+)", 1))
    tail = F.regexp_extract(u, r"^https?://[^/]+(.*)$", 1)
    return F.concat(head, tail)


def canonical_hash_col(canonical_url: Column) -> Column:
    return F.xxhash64(canonical_url)


# --- Python mirror (oracle) -------------------------------------------------


def absolutize_py(href: str, base_url: str) -> str:
    return href if href.startswith("http") else base_url + href


def canonicalize_py(url: str) -> str:
    u = url.split("?")[0].split("#")[0]
    if "://" in u:
        scheme_host, _, rest = u.partition("://")
        host, slash, path = rest.partition("/")
        return f"{scheme_host.lower()}://{host.lower()}{slash}{path}"
    return u
