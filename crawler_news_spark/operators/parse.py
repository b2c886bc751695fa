"""Vectorized fetch + parse operators (the engine's only Python hot path).

Per the input_hint, no per-row Python UDFs: both operators are
``mapInPandas`` — Arrow batches in, Arrow batches out, one Python worker
invocation per batch, the surrounding plan stays JVM-side.  Fetch and parse
are FUSED in a single pass so page HTML never round-trips through Arrow (at
100 TB the HTML column would dominate shuffle/serialization).  An unfused
``fetch_only`` is kept for tests and plan inspection.

The simulator (sources/hostsim.py) stands in for the network; on a real
deployment the fetch body is an HTTP client — the operator contract
(columns in/out, politeness columns already assigned upstream) is unchanged.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.parse_profiles import parse_article, parse_listing
from ..sources import hostsim as hs

LISTING_OUT_SCHEMA = (
    "host string, type_id int, page_no int, out_links array<string>, "
    "is_terminal boolean, fetch_error boolean"
)

# span structs are NOT emitted from Python: per-row list-of-dict -> Arrow
# struct conversion measured ~7x slower than flat string arrays.  The vUDF
# ships span_texts + contentImageUrls; the struct array is rebuilt JVM-side
# (plans/wave.py spans_expr) with transform()/concat() — pure codegen.
ARTICLE_OUT_SCHEMA = (
    "wave int, host string, type_id int, page_no int, link_index int, "
    "canonical_url string, canonical_hash long, fetch_ts double, "
    "title string, description string, content string, pub_date_raw string, "
    "author string, imageUrl string, comments array<string>, "
    "contentImageUrls array<string>, span_texts array<string>, "
    "parse_ok boolean"
)


def fetch_parse_listings(cfg: hs.WebConfig, listings: DataFrame) -> DataFrame:
    """listing frontier rows -> (out_links in document order, is_terminal).

    Input columns: host, type_id, page_no (+ anything; only these are read).

    The listing family is dispatched per HOST profile (hostsim.LISTING_FAMILY)
    rather than content-sniffed, so a page mixing two families' markup parses
    per its host's registered selector set.
    """
    family_by_host = {s.host: hs.LISTING_FAMILY[s.profile] for s in cfg.hosts}

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_links, terminal, errors = [], [], []
            for host, t, p in zip(pdf["host"], pdf["type_id"], pdf["page_no"]):
                try:
                    html = hs.fetch(cfg, hs.listing_url(cfg, host, int(t), int(p)))
                    links, is_term = parse_listing(html, family_by_host.get(host))
                    out_links.append(links)
                    terminal.append(is_term)
                    errors.append(False)
                except Exception:
                    out_links.append([])
                    terminal.append(False)
                    errors.append(True)
            yield pd.DataFrame(
                {
                    "host": pdf["host"],
                    "type_id": pdf["type_id"],
                    "page_no": pdf["page_no"],
                    "out_links": out_links,
                    "is_terminal": terminal,
                    "fetch_error": errors,
                }
            )

    cols = ["host", "type_id", "page_no"]
    return listings.select(*cols).mapInPandas(run, LISTING_OUT_SCHEMA)


def fetch_parse_articles(cfg: hs.WebConfig, articles: DataFrame) -> DataFrame:
    """article frontier rows -> parsed records + span sequences.

    Input columns: wave, host, type_id, page_no, link_index, canonical_url,
    canonical_hash, fetch_ts.  ``parse_ok=False`` rows are null-title drops
    (base_crawler.py:53-56) or fetch errors — kept for lineage, filtered from
    the articles table.
    """
    profile_by_host = {s.host: s.profile for s in cfg.hosts}
    base_by_host = {s.host: s.base_url for s in cfg.hosts}

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            out = {
                k: [None] * n
                for k in (
                    "title description content pub_date_raw author imageUrl "
                    "comments contentImageUrls span_texts".split()
                )
            }
            ok = [False] * n
            for i, (host, cu) in enumerate(zip(pdf["host"], pdf["canonical_url"])):
                try:
                    html = hs.fetch(cfg, cu)
                    rec = parse_article(html, profile_by_host[host], base_by_host[host])
                except Exception:
                    rec = None
                if rec is None:
                    continue
                ok[i] = True
                for k in out:
                    out[k][i] = rec[k]
            res = pdf[
                [
                    "wave", "host", "type_id", "page_no", "link_index",
                    "canonical_url", "canonical_hash", "fetch_ts",
                ]
            ].copy()
            for k, v in out.items():
                res[k] = v
            res["parse_ok"] = ok
            yield res

    cols = [
        "wave", "host", "type_id", "page_no", "link_index",
        "canonical_url", "canonical_hash", "fetch_ts",
    ]
    return articles.select(*cols).mapInPandas(run, ARTICLE_OUT_SCHEMA)


def fetch_parse_articles_arrow(cfg: hs.WebConfig, articles: DataFrame) -> DataFrame:
    """``mapInArrow`` twin of :func:`fetch_parse_articles` — same fused
    fetch+parse loop, but the batch never round-trips through pandas: the
    eight passthrough columns are reused as Arrow arrays untouched
    (zero-copy), and the parsed output columns are built as Arrow arrays
    directly.  mapInPandas pays a pandas conversion of every input column
    and a pandas->Arrow conversion of every output column per batch; for
    this operator the only columns Python actually READS are host and
    canonical_url.  A/B-measured against the pandas variant in one window
    (scripts/ab_parse_arrow.py, BENCH.md §10); the output is hash-identical
    by construction and pinned by the crawl_flagship gate."""
    import pyarrow as pa

    profile_by_host = {s.host: s.profile for s in cfg.hosts}
    base_by_host = {s.host: s.base_url for s in cfg.hosts}

    str_t, lstr_t = pa.string(), pa.list_(pa.string())
    out_fields = [
        ("title", str_t), ("description", str_t), ("content", str_t),
        ("pub_date_raw", str_t), ("author", str_t), ("imageUrl", str_t),
        ("comments", lstr_t), ("contentImageUrls", lstr_t),
        ("span_texts", lstr_t),
    ]
    pass_names = [
        "wave", "host", "type_id", "page_no", "link_index",
        "canonical_url", "canonical_hash", "fetch_ts",
    ]

    def run(batches: "Iterator[pa.RecordBatch]") -> "Iterator[pa.RecordBatch]":
        for rb in batches:
            n = rb.num_rows
            out = {k: [None] * n for k, _t in out_fields}
            ok = [False] * n
            hosts = rb.column("host").to_pylist()
            curls = rb.column("canonical_url").to_pylist()
            for i, (host, cu) in enumerate(zip(hosts, curls)):
                try:
                    html = hs.fetch(cfg, cu)
                    rec = parse_article(
                        html, profile_by_host[host], base_by_host[host]
                    )
                except Exception:
                    rec = None
                if rec is None:
                    continue
                ok[i] = True
                for k in out:
                    out[k][i] = rec[k]
            arrays = [rb.column(c) for c in pass_names]
            names = list(pass_names)
            for k, t in out_fields:
                arrays.append(pa.array(out[k], t))
                names.append(k)
            arrays.append(pa.array(ok, pa.bool_()))
            names.append("parse_ok")
            yield pa.RecordBatch.from_arrays(arrays, names)

    cols = list(pass_names)
    return articles.select(*cols).mapInArrow(run, ARTICLE_OUT_SCHEMA)


def fetch_only(cfg: hs.WebConfig, urls: DataFrame, url_col: str = "url") -> DataFrame:
    """Unfused fetch (url -> html) for tests/inspection — NOT the hot path."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            html = [hs.fetch(cfg, u) for u in pdf[url_col]]
            yield pd.DataFrame({url_col: pdf[url_col], "html": html})

    return urls.select(url_col).mapInPandas(run, f"{url_col} string, html string")


def explode_links(parsed_listings: DataFrame) -> DataFrame:
    """UDTF-shaped step as a built-in: posexplode keeps listing document order."""
    return parsed_listings.select(
        "host",
        "type_id",
        "page_no",
        F.posexplode("out_links").alias("link_index", "href"),
    )
