"""Pure-Python reference-semantics crawl oracle — the correctness spec.

Single-threaded, list/dict-based, no Spark.  Mirrors the reference's control
flow (base_crawler.py:106-140 wave-batched listing expansion with
stop-on-empty / stop-on-set; :91-104 type iteration ascending; :52-62
null-title drop) generalized to the engine's documented wave semantics:

- Wave 0 holds listing batch 1 (pages 1..B) for every (host, type); robots
  Disallow prefixes filter URLs (north_rule addition).
- Processing wave ``w``: listings fetched and parsed -> candidate article
  links keyed ``(w, host, type_id, page_no, link_index)``; canonicalized,
  deduped first-occurrence-by-key against the global seen set; survivors are
  enqueued as article rows of wave ``w+1``.  A (host,type) whose batch
  contained an empty page (or a one-shot set) stops; otherwise its next
  B-page batch is enqueued at wave ``w+1`` (base_crawler.py:113-138 exactly:
  the whole batch is always consumed, even pages past the empty one).
- Article rows are fetched at their wave; null-title pages are dropped from
  output but REMAIN in the seen set.
- ``crawl_order`` = dense rank over fetched article rows ordered by
  (wave, host, type_id, page_no, link_index) — never arrival order.
- Politeness: a per-host virtual clock; within (host, wave) fetch order is
  (kind listing<article, type_id, page_no, link_index); each fetch advances
  the host clock by crawl_delay_s.

The Spark engine must reproduce: span sequences per doc, crawl_order, the
final seen set, and politeness timestamps.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..functions.clean_date import clean_date_py
from ..functions.parse_profiles import parse_article, parse_listing
from ..functions.urlnorm import absolutize_py, canonicalize_py
from ..sources import hostsim as hs


@dataclass
class OracleResult:
    articles: list[dict] = field(default_factory=list)  # full records incl. crawl_order
    documents: dict[str, list[dict]] = field(default_factory=dict)  # doc_id -> spans
    crawl_order: list[str] = field(default_factory=list)  # canonical urls in order
    seen: set[str] = field(default_factory=set)  # canonical urls
    fetch_schedule: list[dict] = field(default_factory=list)  # politeness rows
    n_waves: int = 0
    lineage: list[dict] = field(default_factory=list)  # per (wave, host) counters


def _robots_allowed(spec: hs.HostSpec, canonical_url: str) -> bool:
    path = canonical_url.split(spec.host, 1)[-1]
    return not any(path.startswith(p) for p in spec.robots_disallow)


def crawl_oracle(cfg: hs.WebConfig, batch_pages: int = 4,
                 max_waves: int = 100) -> OracleResult:
    res = OracleResult()
    host_clock: dict[str, float] = {s.host: 0.0 for s in cfg.hosts}

    # frontier entries
    # listing: (host, type_id, page_no)
    # article: (host, type_id, page_no, link_index, canonical_url, raw_url)
    listings: list[tuple] = []
    articles: list[tuple] = []
    for spec in cfg.hosts:
        for t in range(spec.n_types):
            n = 1 if spec.one_shot else batch_pages
            for p in range(1, n + 1):
                listings.append((spec.host, t, p))

    wave = 0
    pending_records: list[dict] = []  # records w/ sort key, ranked at the end
    while listings or articles:
        if wave >= max_waves:
            raise RuntimeError("oracle: max_waves exceeded")
        next_listings: list[tuple] = []
        next_articles: list[tuple] = []
        lineage: dict[str, dict] = {}

        def lin(host: str) -> dict:
            return lineage.setdefault(
                host,
                {"wave": wave, "host": host, "n_fetched": 0, "n_parsed": 0,
                 "n_errors": 0, "n_links": 0},
            )

        # ---- politeness schedule for this wave --------------------------
        wave_rows = [("listing", h, t, p, 0) for (h, t, p) in sorted(listings)] + [
            ("article", h, t, p, li) for (h, t, p, li, _cu, _u) in sorted(articles)
        ]
        by_host: dict[str, list[tuple]] = {}
        for row in wave_rows:
            by_host.setdefault(row[1], []).append(row)
        for host, rows in by_host.items():
            spec = cfg.spec(host)
            rows.sort(key=lambda r: (0 if r[0] == "listing" else 1, r[2], r[3], r[4]))
            for kind, h, t, p, li in rows:
                host_clock[host] += spec.crawl_delay_s
                res.fetch_schedule.append(
                    {"wave": wave, "host": host, "kind": kind, "type_id": t,
                     "page_no": p, "link_index": li, "fetch_ts": host_clock[host]}
                )

        # ---- listings: fetch, parse, expand ------------------------------
        # per (host,type): did any page of this wave's batch come back empty?
        stop: dict[tuple[str, int], bool] = {}
        max_page: dict[tuple[str, int], int] = {}
        candidates: list[tuple] = []  # (wave, host, type, page, link_idx, cu, url)
        for host, t, p in listings:
            spec = cfg.spec(host)
            html = hs.fetch(cfg, hs.listing_url(cfg, host, t, p))
            lin(host)["n_fetched"] += 1
            links, is_terminal = parse_listing(html, hs.LISTING_FAMILY[spec.profile])
            lin(host)["n_links"] += len(links)
            key = (host, t)
            max_page[key] = max(max_page.get(key, 0), p)
            if not links or is_terminal:
                stop[key] = True
            else:
                stop.setdefault(key, False)
            for li, href in enumerate(links):
                url = absolutize_py(href, spec.base_url)
                cu = canonicalize_py(url)
                if not _robots_allowed(spec, cu):
                    continue
                candidates.append((wave, host, t, p, li, cu, url))

        # first-occurrence dedup by the crawl key, then global seen anti-join
        candidates.sort(key=lambda c: (c[0], c[1], c[2], c[3], c[4]))
        in_wave: set[str] = set()
        for wv, host, t, p, li, cu, url in candidates:
            if cu in res.seen or cu in in_wave:
                continue
            in_wave.add(cu)
            res.seen.add(cu)
            next_articles.append((host, t, p, li, cu, url))

        # continue listing batches for non-stopped (host,type)
        for (host, t), stopped in stop.items():
            if stopped:
                continue
            base = max_page[(host, t)]
            for p in range(base + 1, base + 1 + batch_pages):
                next_listings.append((host, t, p))

        # ---- articles: fetch, parse, record -------------------------------
        for host, t, p, li, cu, url in articles:
            spec = cfg.spec(host)
            html = hs.fetch(cfg, cu)
            lin(host)["n_fetched"] += 1
            rec = parse_article(html, spec.profile, spec.base_url)
            if rec is None:
                lin(host)["n_errors"] += 1
                continue
            lin(host)["n_parsed"] += 1
            slug = hs.type_slug(cfg, host, t)
            record = {
                "dataSource": "/".join(cu.split("/")[:3]),
                "url": cu,
                "publishedDate": clean_date_py(rec["pub_date_raw"]),
                "author": rec["author"],
                "title": rec["title"],
                "imageUrl": rec["imageUrl"],
                "description": rec["description"],
                "content": rec["content"],
                "comments": rec["comments"],
                "contentImageUrls": rec["contentImageUrls"],
                "article_type": slug,
                "_key": (wave, host, t, p, li),
            }
            pending_records.append(record)
            res.documents[cu] = rec["spans"]

        res.lineage.extend(lineage.values())
        listings, articles = next_listings, next_articles
        wave += 1

    res.n_waves = wave
    pending_records.sort(key=lambda r: r["_key"])
    for i, r in enumerate(pending_records):
        r["crawl_order"] = i
        del r["_key"]
        res.articles.append(r)
        res.crawl_order.append(r["url"])
    return res
