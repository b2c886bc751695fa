"""Deterministic synthetic web — the host simulator that replaces the network.

The sandbox has no network, and a 10^10-URL frontier must never be
materialized up front; both problems have one answer: the web is a *pure
function* ``page(url, seed) -> html`` computed inside the fetch vUDF.  Every
listing page, article body, interleaved image, messy date string and robots
rule is derived from a stable 64-bit hash of (seed, url) — the same URL always
yields the same page, at any scale, on any executor, with no shared state.

Site shapes mirror the reference's observed behaviors
(/root/reference/crawler/*.py):

- pagination templates  (vnexpress.py:255, dantri.py:303, vietnamnet.py:220,
  congthuong.py:198, dangcongsan.py:188, congly.py:209)
- until-empty stop + hard page caps (base_crawler.py:126-128,
  baotintuc.py:248, baovanhoa.py:243)
- one-shot infinite-scroll listings returning a set (baoxaydung.py:196-228)
- parser profiles: vnx (vnexpress.py:175-246), dtr (dantri.py:226-265),
  btt (baothanhtra.py:102-171), vnn (vietnamnet.py:122-181)
"""

from __future__ import annotations

import dataclasses
import hashlib
import struct
from dataclasses import dataclass

# ---------------------------------------------------------------------------
# Stable hashing
# ---------------------------------------------------------------------------


def stable_hash(s: str, seed: int = 0) -> int:
    """Stable unsigned 64-bit hash of a string (blake2b, keyed by seed)."""
    h = hashlib.blake2b(
        s.encode("utf-8"), digest_size=8, key=seed.to_bytes(8, "little")
    ).digest()
    return struct.unpack("<Q", h)[0]


# ---------------------------------------------------------------------------
# Web configuration
# ---------------------------------------------------------------------------

PROFILES = ("vnx", "dtr", "btt", "vnn", "qdn", "btu", "thp", "bdt", "cnd",
            "dcs", "vne", "ktd", "tct", "vdl", "skc",
            "bvl", "tcd", "tta", "bdu", "pnm", "vtc", "cgl",
            "ctg", "btv", "qlt", "tdn",
            "thc", "tgd", "bxd", "skd", "bvh", "tnm", "kth", "bhq")

PAGINATION = {
    "vnx": "suffix-p",  # https://{h}/{slug}-p{n}            vnexpress.py:255
    "dtr": "trang-htm",  # https://{h}/{slug}/trang-{n}.htm   dantri.py:303
    "btt": "brsr-offset",  # https://{h}/{slug}?BRSR={20(n-1)} congthuong.py:198
    "vnn": "page0",  # https://{h}/{slug}-page{n-1}           vietnamnet.py:220
    "qdn": "p-slash",  # https://{h}/{slug}/p/{n}             quandoinhandan.py:186
    "btu": "loadmore",  # https://{h}/{slug}/trang-{n}/loadmore  baothanhtra.py:210
    "thp": "cond-first",  # p1: /{slug}/, else /{slug}/p{n}   taichinhdoanhnghiep.py:182-184
    "bdt": "trang-htm",  # baodantoc paginates like the dantri family
    "cnd": "slug-p",  # https://{h}/{slug}/p{n}               congnghevadoisong.py:179
    "dcs": "aspx-page",  # https://{h}/.../{slug}.aspx?Page={n}  dangcongsan.py:188
    "vne": "htm-trang",  # https://{h}/{slug}.htm?trang={n}   vneconomy.py:180
    "ktd": "slash-qtrang",  # https://{h}/{slug}/?trang={n}   kinhtedouong.py:222
    "tct": "hashtag-page",  # https://{h}/hashtag/{slug}/page-{n}  tapchicongthuong.py:199
    "vdl": "qpage",  # https://{h}/{slug}/?page={n}           vietnamdaily.py:191
    "skc": "slug-p",  # https://{h}/{slug}/p{n}               suckhoecong.py:185
    "bvl": "p-slash",  # https://{h}/{slug}/p/{n}             baovephapluat.py:214
    "tcd": "slug-p",  # https://{h}/{slug}/p{n}               tapchidientu.py:194
    "tta": "qmark-page",  # https://{h}/{slug}?page={n}       tapchitoaan.py:187
    "bdu": "slug-p",  # https://{h}/{slug}/p{n}               baodautu.py:182
    "pnm": "slug-p",  # https://{h}/{slug}/p{n}               phunumoi.py:176
    "vtc": "trang-html",  # https://{h}/{slug}/trang-{n}.html vtcnews.py:219
    "cgl": "one-shot",  # selenium load-more, no paged URL    congly.py:201-233
    # the TRUE MASTERCMS template: &s_cond=&BRSR={page} with the RAW page
    # number (congthuong.py:198, baotaichinhvietnam.py:197,
    # quanlythitruong.py:192) — the 20*(n-1) "brsr-offset" kind above is a
    # synthetic offset variant kept for btt
    "ctg": "brsr-cond",
    "btv": "brsr-cond",
    "qlt": "brsr-cond",
    "tdn": "cond-first",  # taichinhdoanhnghiep.py:182-184 (same as thp)
    "thc": "trang-plain",  # https://{h}/{slug}/trang-{n}     thuonghieucongluan.py:184
    "tgd": "cate-page",  # https://{h}/cate/{slug}/page/{n}   tapchigiaoduc.py:183
    "bxd": "one-shot",  # selenium load-more                  baoxaydung.py:196-228
    "skd": "one-shot",  # selenium load-more                  suckhoedoisong.py:208-232
    "bvh": "qpage",  # https://{h}/{slug}/?page={n}, cap 49   baovanhoa.py:243-245
    "tnm": "html-qpage",  # https://{h}/{slug}.html?page={n}  tainguyenvamoitruong.py:197
    "kth": "qpage",  # https://{h}/{slug}/?page={n}           kienthuc.py:238
    "bhq": "danhmuc-qpage",  # https://{h}/danh-muc/{slug}?page={n}  baohaiquanvietnam.py:189
}

CONTENT_JOIN = {  # §2.3 P3
    "vnx": ",", "dtr": "\n", "btt": " ", "vnn": ",", "qdn": "\n",
    "btu": "\n", "thp": "\n", "bdt": "\n", "cnd": "\n",
    # "\n\n" joiners: dangcongsan.py:125, vneconomy.py:128,
    # kinhtedouong.py:152, tapchicongthuong.py:143, suckhoecong.py:131;
    # vietnamdaily joins blocks with a single "\n" (vietnamdaily.py:139)
    "dcs": "\n\n", "vne": "\n\n", "ktd": "\n\n", "tct": "\n\n",
    "vdl": "\n", "skc": "\n\n",
    # bvl "\n\n" (baovephapluat.py:154); tcd: the reference keeps content
    # as a LIST (tapchidientu.py:126) — the engine's string column pins
    # "\n"; tta " " (get_text separator, tapchitoaan.py:122);
    # bdu "\n\n" (baodautu.py:132)
    "bvl": "\n\n", "tcd": "\n", "tta": " ", "bdu": "\n\n",
    # pnm "\n" (phunumoi.py:126); vtc "\n" (vtcnews.py:162);
    # cgl "\n" (congly.py:152)
    "pnm": "\n", "vtc": "\n", "cgl": "\n",
    # ctg "\n" (congthuong.py:143); btv "\n\n" (baotaichinhvietnam.py:140);
    # qlt "\n" (quanlythitruong.py:129); tdn "\n\n" (taichinhdoanhnghiep.py:131)
    "ctg": "\n", "btv": "\n\n", "qlt": "\n", "tdn": "\n\n",
    # thc "\n\n" (thuonghieucongluan.py:125); tgd "\n" get_text separator
    # (tapchigiaoduc.py:125); bxd "\n" (baoxaydung.py:143); skd "\n"
    # (suckhoedoisong.py:148); bvh "" — .text with NO separator
    # (baovanhoa.py:188); tnm "\n\n" (tainguyenvamoitruong.py:128);
    # kth "\n\n" (kienthuc.py:179); bhq "\n" (baohaiquanvietnam.py:138)
    "thc": "\n\n", "tgd": "\n", "bxd": "\n", "skd": "\n",
    "bvh": "", "tnm": "\n\n", "kth": "\n\n", "bhq": "\n",
}

# Listing-extraction families (F4) — the reference exhibits ~30 per-site
# listing selector shapes; each family here reproduces one structural class:
# - h3-title-news:  h3.title-news > a           (vnexpress.py:258-261 shape)
# - article-walk:   article > (h3|h2) > a, headingless articles skipped
#                   (vtcnews.py:231-243)
# - http-filter:    div.list-news-category article a[href], keep http(s) only,
#                   set-dedup (quandoinhandan.py:198-202; keep-first order
#                   pinned where the reference's list(set()) is run-dependent)
# - multi-class:    any of three title classes, first <a> each
#                   (vietnamnet.py:227-231)
# - newstitle-div:  div.categoryListItem container, div.newsTitle > a
#                   (congnghevadoisong.py:193-201)
# - relative-only:  section.cat-listnews container, h2.title > a, keeping
#                   ONLY hrefs starting with '/' (absolute decoys dropped;
#                   the site prepends its base) (kienthuc.py:244-253)
#   round-4 families:
# - khuvuc-anchors:  div#KhuVuc_3, ALL a[href], base prepended
#                    unconditionally -> relative hrefs (dangcongsan.py:199-209)
# - article-first-a: container div, first a[href] per <article>, conditional
#                    absolutize (vneconomy.py:193-209)
# - item-post:       .item-post a[href], '/'-prefixed absolutized
#                    (kinhtedouong.py:231-240)
# - two-container:   two container classes, '/'-prefixed only, ORDERED
#                    first-occurrence dedup (tapchicongthuong.py:210-225)
# - zone-story:      ul.zone > article.story > first a, base prepended
#                    unconditionally -> relative hrefs (vietnamdaily.py:204-219)
# - link-title:      div.list-new-cate a.link-title, hrefs as-is
#                    (suckhoecong.py:196-207)
LISTING_FAMILY = {
    "vnx": "h3-title-news", "dtr": "h3-title-news", "btt": "h3-title-news",
    "bdt": "relative-only",
    "btu": "article-walk", "thp": "article-walk",
    "qdn": "http-filter",
    "vnn": "multi-class",
    "cnd": "newstitle-div",
    "dcs": "khuvuc-anchors",
    "vne": "article-first-a",
    "ktd": "item-post",
    "tct": "two-container",
    "vdl": "zone-story",
    "skc": "link-title",
    # round-4b families:
    # - ctrangc3:      div.ctrangc3, ALL a[href] (baovephapluat.py:227-234)
    # - thumb-class:   a.thumb300x170 anywhere (tapchidientu.py:205-212)
    # - two-phase:     post-entry-2 first-a's THEN col-lg-8 first-a's;
    #                  empty check on the first set only (tapchitoaan.py:200-216)
    # - ul-li-first-a: ul.list_news_home li > first a (baodautu.py:194-202)
    "bvl": "ctrangc3",
    "tcd": "thumb-class",
    "tta": "two-phase",
    "bdu": "ul-li-first-a",
    # - news2item:    news2 section, div.news2Item > first a (phunumoi.py:189-198)
    # - article-walk: vtc shares the heading-walk family (vtcnews.py:231-243)
    # - bgrid-title:  ul.onecms__loading h3.b-grid__title > a, selenium
    #                 one-shot set (congly.py:213-233)
    "pnm": "news2item",
    "vtc": "article-walk",
    "cgl": "bgrid-title",
    # - bx-cat-content: h3.article-title>a, http-only (congthuong.py:212-225)
    # - cat-listing:    7-class container, h3>first a (baotaichinhvietnam.py:211-222)
    # - bx-list:        h3.article-title's direct a (quanlythitruong.py:203-210)
    # - dle-content:    a.article-title anchors (taichinhdoanhnghiep.py:197-203)
    "ctg": "bx-cat-content",
    "btv": "cat-listing",
    "qlt": "bx-list",
    "tdn": "dle-content",
    # - list-articles:    six-class h3 > a (thuonghieucongluan.py:192-199)
    # - row-h6:           img-content THEN category-box-lg h6>a per row
    #                     (tapchigiaoduc.py:192-206)
    # - cate-box:         selenium one-shot (baoxaydung.py:200-220)
    # - cat-middle:       selenium one-shot (suckhoedoisong.py:212-230)
    # - story-title:      article.story h3.story__title a (baovanhoa.py:254-266)
    # - relative-only:    kth is the family's origin cite (kienthuc.py:244-253)
    # - listnews-title24: h3.title-24 a (tainguyenvamoitruong.py:203-214)
    # - wrap-news-list:   first a per wrap (baohaiquanvietnam.py:197-208)
    "thc": "list-articles",
    "tgd": "row-h6",
    "bxd": "cate-box",
    "skd": "cat-middle",
    "bvh": "story-title",
    "tnm": "listnews-title24",
    "kth": "relative-only",
    "bhq": "wrap-news-list",
}

_VNN_TITLE_CLASSES = ("horizontalPost__main-title", "vnn-title", "title-bold")

_WORDS = (
    "tin tức thời sự kinh doanh thế giới giáo dục thể thao công nghệ đời sống "
    "pháp luật du lịch sức khỏe văn hóa chính trị xã hội quốc tế tài chính "
    "doanh nghiệp thị trường bất động sản khoa học môi trường lao động việc làm"
).split()

_AUTHORS = (
    "Nguyễn Văn An|Trần Thị Bình|Lê Hoàng Cường|Phạm Minh Đức|Hoàng Thu Hà|"
    "Vũ Quang Huy|Đặng Ngọc Lan|Bùi Xuân Mai|Đỗ Thành Nam|Ngô Phương Oanh"
).split("|")

# Messy raw date formats exercising every clean_date branch
# (service_utils.py:109-161): weekday strips, time-first, AM/PM, tz-combo,
# "Cập nhật lúc", "lúc", bare (GMT).
_DATE_FORMATS = (
    "{d:02d}/{m:02d}/{y}, {H:02d}:{M:02d} (GMT+7)",
    "Thứ Sáu, {d:02d}/{m:02d}/{y} {H:02d}:{M:02d}:00 +07:00",
    "Chủ Nhật, ngày {d}/{m}/{y} - {H:02d}:{M:02d}",
    "{H}:{M:02d} {d}/{m}/{y}",
    "Cập nhật lúc {H:02d}:{M:02d} {d:02d}/{m:02d}/{y}",
    "{d}/{m}/{y} lúc {H:02d}:{M:02d}",
    "{d}/{m}/{y} {h}:{M:02d} {ap}",
    "Thứ Hai, {d:02d}/{m:02d}/{y} {H:02d}:{M:02d} (GMT)",
)


@dataclass(frozen=True)
class HostSpec:
    host: str
    profile: str  # vnx | dtr | btt | vnn
    n_types: int
    links_per_page: int
    max_depth: int  # listing pages per type before the empty page
    page_cap: int | None = None  # hard cap (baotintuc.py:248 / baovanhoa.py:243)
    one_shot: bool = False  # selenium-style full listing (baoxaydung.py:196)
    crawl_delay_s: float = 1.0  # politeness budget (base_crawler.py:61)
    robots_disallow: tuple[str, ...] = ()  # path prefixes (north_rule addition)

    @property
    def base_url(self) -> str:
        return f"https://{self.host}"


@dataclass(frozen=True)
class WebConfig:
    seed: int = 42
    hosts: tuple[HostSpec, ...] = ()
    null_title_mod: int = 17  # 1/17 articles have no title -> dropped
    dup_prev_page_mod: int = 3  # hosts h%3==0 repeat one link from prior page
    cross_type_dup_mod: int = 7  # 1/7 links point into type 0 (cross-type dup)
    # emit relative hrefs (vnn absolutizes downstream; bdt/tct relative-only
    # families DROP absolute hrefs; dcs/vdl prepend base unconditionally so
    # absolute hrefs would double the scheme — all four REQUIRE relative)
    # (vtc joins: vtcnews.py:241 prepends its base to every heading href)
    # (kth's relative-only family drops absolute hrefs: kienthuc.py:244-253)
    relative_link_profiles: tuple[str, ...] = ("vnn", "bdt", "dcs", "tct", "vdl",
                                               "vtc", "kth")
    # emit a per-link hash-gated mix of relative and absolute hrefs — these
    # families carry conditional absolutization (href if startswith http
    # else base+href: vneconomy.py:208, kinhtedouong.py:236-238), so both
    # forms must flow through the downstream F5 absolutizer
    mixed_link_profiles: tuple[str, ...] = ("vne", "ktd", "tnm")
    # page_weight scales article length + HTML boilerplate toward realistic
    # news-page sizes (real articles are 100-400 KB with nav/script cruft;
    # weight=1 keeps unit tests fast, bench uses heavier pages so the
    # fetch+parse compute dominates per-wave fixed overhead as it does in
    # production)
    page_weight: int = 1
    # wire syndication (corpus-build fixture; 0 = off, the default — every
    # pre-existing web is unchanged): 1/syndication_mod articles carry one of
    # `wire_stories` shared agency bodies; see article_fields
    syndication_mod: int = 0
    wire_stories: int = 24
    # how many republication branches syndicated docs spread over (3 = the
    # r05 exact/local-note/in-line-edit ladder; 4 adds the r07 PARAPHRASED
    # republication — reworded wire copy sharing no char-5-gram shingles, so
    # only the embedding rung of the dedup ladder can catch it)
    wire_branches: int = 3

    def spec(self, host: str) -> HostSpec:
        return self._by_host[host]

    def __post_init__(self):
        object.__setattr__(self, "_by_host", {h.host: h for h in self.hosts})
        for h in self.hosts:
            # selenium-only sites (congly/baoxaydung/suckhoedoisong) have NO
            # paged listing-URL form — a paged host with one of these
            # profiles is a configuration error, caught here rather than as
            # a mid-crawl ValueError
            if PAGINATION[h.profile] == "one-shot" and not h.one_shot:
                raise ValueError(
                    f"profile {h.profile!r} has no paged listing URL; "
                    f"host {h.host} must be one_shot"
                )


def default_web(seed: int = 42, scale: float = 1.0, page_weight: int = 1) -> WebConfig:
    """The standard 6-host synthetic web.  ``scale`` multiplies types/depth.

    vnx1 is the deliberately skewed giant (many categories, deep listings —
    mirroring vnexpress's 71 categories vs vietnamnet's 16).
    """

    def s(n: int) -> int:
        return max(1, int(round(n * scale)))

    hosts = (
        HostSpec("vnx1.example.vn", "vnx", n_types=s(12), links_per_page=8,
                 max_depth=s(6), crawl_delay_s=1.0,
                 robots_disallow=("/private", "/tag")),
        HostSpec("vnx2.example.vn", "vnx", n_types=s(4), links_per_page=5,
                 max_depth=s(3), page_cap=4, crawl_delay_s=2.0),
        HostSpec("dtr1.example.vn", "dtr", n_types=s(6), links_per_page=6,
                 max_depth=s(4), crawl_delay_s=1.0,
                 robots_disallow=("/video",)),
        HostSpec("btt1.example.vn", "btt", n_types=s(3), links_per_page=4,
                 max_depth=s(5), crawl_delay_s=0.5),
        HostSpec("vnn1.example.vn", "vnn", n_types=s(5), links_per_page=6,
                 max_depth=s(3), crawl_delay_s=1.5),
        HostSpec("one1.example.vn", "dtr", n_types=s(2), links_per_page=10,
                 max_depth=1, one_shot=True, crawl_delay_s=1.0),
        HostSpec("qdn1.example.vn", "qdn", n_types=s(3), links_per_page=5,
                 max_depth=s(4), crawl_delay_s=1.0),
        HostSpec("btu1.example.vn", "btu", n_types=s(3), links_per_page=5,
                 max_depth=s(3), crawl_delay_s=1.0),
        HostSpec("thp1.example.vn", "thp", n_types=s(2), links_per_page=4,
                 max_depth=s(3), crawl_delay_s=1.0),
        HostSpec("bdt1.example.vn", "bdt", n_types=s(2), links_per_page=4,
                 max_depth=s(2), crawl_delay_s=1.0),
        HostSpec("cnd1.example.vn", "cnd", n_types=s(2), links_per_page=4,
                 max_depth=s(2), crawl_delay_s=1.0),
        HostSpec("dcs1.example.vn", "dcs", n_types=s(3), links_per_page=5,
                 max_depth=s(3), crawl_delay_s=1.0,
                 robots_disallow=("/noidung/admin",)),
        HostSpec("vne1.example.vn", "vne", n_types=s(3), links_per_page=5,
                 max_depth=s(3), crawl_delay_s=1.0),
        HostSpec("ktd1.example.vn", "ktd", n_types=s(2), links_per_page=4,
                 max_depth=s(3), crawl_delay_s=0.5),
        HostSpec("tct1.example.vn", "tct", n_types=s(2), links_per_page=4,
                 max_depth=s(2), page_cap=3, crawl_delay_s=1.0),
        HostSpec("vdl1.example.vn", "vdl", n_types=s(2), links_per_page=4,
                 max_depth=s(2), crawl_delay_s=1.5),
        HostSpec("skc1.example.vn", "skc", n_types=s(2), links_per_page=4,
                 max_depth=s(2), crawl_delay_s=1.0),
        HostSpec("bvl1.example.vn", "bvl", n_types=s(2), links_per_page=4,
                 max_depth=s(2), crawl_delay_s=1.0),
        HostSpec("tcd1.example.vn", "tcd", n_types=s(2), links_per_page=4,
                 max_depth=s(2), crawl_delay_s=0.5),
        HostSpec("tta1.example.vn", "tta", n_types=s(2), links_per_page=4,
                 max_depth=s(2), crawl_delay_s=1.0),
        HostSpec("bdu1.example.vn", "bdu", n_types=s(2), links_per_page=4,
                 max_depth=s(2), page_cap=2, crawl_delay_s=1.0),
        HostSpec("pnm1.example.vn", "pnm", n_types=s(2), links_per_page=4,
                 max_depth=s(2), crawl_delay_s=1.0),
        HostSpec("vtc1.example.vn", "vtc", n_types=s(2), links_per_page=4,
                 max_depth=s(2), crawl_delay_s=1.0,
                 robots_disallow=("/video",)),
        HostSpec("cgl1.example.vn", "cgl", n_types=s(2), links_per_page=8,
                 max_depth=1, one_shot=True, crawl_delay_s=1.0),
        HostSpec("ctg1.example.vn", "ctg", n_types=s(2), links_per_page=4,
                 max_depth=s(2), crawl_delay_s=1.0),
        HostSpec("btv1.example.vn", "btv", n_types=s(2), links_per_page=4,
                 max_depth=s(2), crawl_delay_s=1.0),
        HostSpec("qlt1.example.vn", "qlt", n_types=s(2), links_per_page=4,
                 max_depth=s(2), crawl_delay_s=0.5),
        HostSpec("tdn1.example.vn", "tdn", n_types=s(2), links_per_page=4,
                 max_depth=s(2), crawl_delay_s=1.0),
        HostSpec("thc1.example.vn", "thc", n_types=s(2), links_per_page=4,
                 max_depth=s(2), crawl_delay_s=1.0),
        HostSpec("tgd1.example.vn", "tgd", n_types=s(2), links_per_page=4,
                 max_depth=s(2), crawl_delay_s=1.0),
        HostSpec("bxd1.example.vn", "bxd", n_types=s(2), links_per_page=6,
                 max_depth=1, one_shot=True, crawl_delay_s=1.0),
        HostSpec("skd1.example.vn", "skd", n_types=s(2), links_per_page=6,
                 max_depth=1, one_shot=True, crawl_delay_s=0.5),
        # baovanhoa's hard page cap is 49 (baovanhoa.py:243-245); the small
        # default web keeps the cap semantics with a reachable value
        HostSpec("bvh1.example.vn", "bvh", n_types=s(2), links_per_page=4,
                 max_depth=s(3), page_cap=2, crawl_delay_s=1.0),
        HostSpec("tnm1.example.vn", "tnm", n_types=s(2), links_per_page=4,
                 max_depth=s(2), crawl_delay_s=1.0),
        HostSpec("kth1.example.vn", "kth", n_types=s(2), links_per_page=4,
                 max_depth=s(2), crawl_delay_s=1.0),
        HostSpec("bhq1.example.vn", "bhq", n_types=s(2), links_per_page=4,
                 max_depth=s(2), crawl_delay_s=1.0),
    )
    return WebConfig(seed=seed, hosts=hosts, page_weight=page_weight)


def corpus_web(seed: int = 42, scale: float = 0.5, syndication_mod: int = 3,
               wire_stories: int = 16, wire_branches: int = 4) -> WebConfig:
    """The corpus-build fixture: the standard web plus wire syndication, so
    the crawl output genuinely contains the exact- and near-duplicates (and
    eval-set contamination) that a training-corpus pipeline must remove.
    Since r07 it also plants PARAPHRASED republications (wire_branches=4),
    the duplicates only the semantic rung of the dedup ladder can catch —
    and wire_stories dropped 24 -> 16 so that, at 4 branches, the day-2
    slice of corpus_update still contains a within-batch exact duplicate
    (every corpus_update stage keeps a measured non-zero bite)."""
    base = default_web(seed=seed, scale=scale)
    return dataclasses.replace(
        base, syndication_mod=syndication_mod, wire_stories=wire_stories,
        wire_branches=wire_branches,
    )


def bench_web(seed: int = 7, n_hosts: int = 4, types_per_host: int = 512,
              depth: int = 16, links: int = 16, page_weight: int = 48) -> WebConfig:
    """Throughput-bench web: wide taxonomy, one listing round, realistic
    page weight (tens of KB of markup per article, like production news
    pages) so fetch+parse compute dominates per-wave fixed overhead."""
    specs = tuple(
        HostSpec(
            f"bench{i}.example.vn",
            PROFILES[i % len(PROFILES)],
            n_types=types_per_host,
            links_per_page=links,
            max_depth=depth,
            crawl_delay_s=0.5,
        )
        for i in range(n_hosts)
    )
    return WebConfig(seed=seed, hosts=specs, page_weight=page_weight)


def skew_bench_web(seed: int = 7, n_hosts: int = 4, types_total: int = 1024,
                   giant_frac: float = 0.5, depth: int = 16, links: int = 16,
                   page_weight: int = 48) -> WebConfig:
    """Pathological-skew throughput web: same TOTAL taxonomy (and therefore
    the same frontier size) as bench_web(types_per_host=types_total/n_hosts),
    but one host owns ``giant_frac`` of it — the worst real-world shape
    (vnexpress's 71 categories vs vietnamnet's 16, amplified to 50%).  Used
    by ``bench.py --web skew`` to prove the budget anti-join + salted
    politeness hold throughput near the uniform case."""
    giant = int(types_total * giant_frac)
    rest, rem = divmod(types_total - giant, n_hosts - 1)
    # Spread the division remainder over the first `rem` non-giant hosts so
    # host type-counts sum EXACTLY to types_total — the skew-vs-uniform
    # comparison must be frontier-matched, not off by the remainder.
    specs = tuple(
        HostSpec(
            f"bench{i}.example.vn",
            PROFILES[i % len(PROFILES)],
            n_types=giant if i == 0 else rest + (1 if i <= rem else 0),
            links_per_page=links,
            max_depth=depth,
            crawl_delay_s=0.5,
        )
        for i in range(n_hosts)
    )
    assert sum(s.n_types for s in specs) == types_total
    return WebConfig(seed=seed, hosts=specs, page_weight=page_weight)


def skewed_web(seed: int = 7, giant_types: int = 40, giant_depth: int = 12) -> WebConfig:
    """A web where one host dominates the frontier ~100x — the skew fixture."""
    hosts = (
        HostSpec("giant.example.vn", "vnx", n_types=giant_types, links_per_page=10,
                 max_depth=giant_depth, crawl_delay_s=0.1),
        HostSpec("tiny1.example.vn", "dtr", n_types=1, links_per_page=3,
                 max_depth=1, crawl_delay_s=1.0),
        HostSpec("tiny2.example.vn", "vnn", n_types=1, links_per_page=3,
                 max_depth=1, crawl_delay_s=1.0),
    )
    return WebConfig(seed=seed, hosts=hosts)


# ---------------------------------------------------------------------------
# URL formulas (reference §2.2 F2)
# ---------------------------------------------------------------------------


def type_slug(cfg: WebConfig, host: str, type_id: int) -> str:
    w1 = _WORDS[stable_hash(f"slug|{host}|{type_id}", cfg.seed) % len(_WORDS)]
    return f"{w1}-{type_id}"


def listing_url(cfg: WebConfig, host: str, type_id: int, page: int) -> str:
    spec = cfg.spec(host)
    slug = type_slug(cfg, host, type_id)
    if spec.one_shot:
        return f"https://{host}/{slug}"
    kind = PAGINATION[spec.profile]
    if kind == "suffix-p":
        return f"https://{host}/{slug}-p{page}"
    if kind == "trang-htm":
        return f"https://{host}/{slug}/trang-{page}.htm"
    if kind == "brsr-offset":
        return f"https://{host}/{slug}?BRSR={20 * (page - 1)}"
    if kind == "page0":
        return f"https://{host}/{slug}-page{page - 1}"
    if kind == "aspx-page":
        return f"https://{host}/{slug}.aspx?Page={page}"
    if kind == "loadmore":
        return f"https://{host}/{slug}/trang-{page}/loadmore"
    if kind == "cond-first":
        # taichinhdoanhnghiep.py:182-184: bare slug dir for page 1 only
        if page == 1:
            return f"https://{host}/{slug}/"
        return f"https://{host}/{slug}/p{page}"
    if kind == "slug-p":
        return f"https://{host}/{slug}/p{page}"
    if kind == "p-slash":
        return f"https://{host}/{slug}/p/{page}"
    if kind == "htm-trang":
        return f"https://{host}/{slug}.htm?trang={page}"
    if kind == "slash-qtrang":
        return f"https://{host}/{slug}/?trang={page}"
    if kind == "hashtag-page":
        return f"https://{host}/hashtag/{slug}/page-{page}"
    if kind == "qpage":
        return f"https://{host}/{slug}/?page={page}"
    if kind == "qmark-page":
        return f"https://{host}/{slug}?page={page}"
    if kind == "trang-html":
        return f"https://{host}/{slug}/trang-{page}.html"
    if kind == "brsr-cond":
        return f"https://{host}/{slug}&s_cond=&BRSR={page}"
    if kind == "trang-plain":
        return f"https://{host}/{slug}/trang-{page}"
    if kind == "cate-page":
        return f"https://{host}/cate/{slug}/page/{page}"
    if kind == "html-qpage":
        return f"https://{host}/{slug}.html?page={page}"
    if kind == "danhmuc-qpage":
        return f"https://{host}/danh-muc/{slug}?page={page}"
    raise ValueError(kind)


def _article_num(cfg: WebConfig, host: str, type_id: int, idx: int) -> int:
    return 1000000 + (stable_hash(f"art|{host}|{type_id}|{idx}", cfg.seed) % 9000000)


def article_url(cfg: WebConfig, host: str, type_id: int, idx: int,
                relative: bool = False) -> str:
    slug = type_slug(cfg, host, type_id)
    num = _article_num(cfg, host, type_id, idx)
    path = f"/{slug}/bai-viet-{num}.html"  # matches \d{6,}.html$ routing (X9)
    return path if relative else f"https://{host}{path}"


def listing_depth(cfg: WebConfig, host: str, type_id: int) -> int:
    spec = cfg.spec(host)
    return 1 + stable_hash(f"depth|{host}|{type_id}", cfg.seed) % spec.max_depth


def listing_links(cfg: WebConfig, host: str, type_id: int, page: int) -> list[str]:
    """Article hrefs of a listing page, in document order.  [] when empty.

    Duplicates within/across pages and cross-type links are injected
    deterministically to exercise the seen-set.
    """
    spec = cfg.spec(host)
    if spec.one_shot and page > 1:
        return []
    if spec.page_cap is not None and page > spec.page_cap:
        return []  # hard cap manifests as an empty page (baotintuc.py:248-249)
    depth = listing_depth(cfg, host, type_id)
    if not spec.one_shot and page > depth:
        return []
    relative = spec.profile in cfg.relative_link_profiles
    mixed = spec.profile in getattr(cfg, "mixed_link_profiles", ())
    L = spec.links_per_page
    links: list[str] = []
    for k in range(L):
        idx = (page - 1) * L + k
        h = stable_hash(f"link|{host}|{type_id}|{page}|{k}", cfg.seed)
        rel = (h % 2 == 0) if mixed else relative
        if type_id != 0 and h % cfg.cross_type_dup_mod == 0:
            # cross-type duplicate: points into type 0's article space
            links.append(article_url(cfg, host, 0, h % (L * 2), rel))
        else:
            links.append(article_url(cfg, host, type_id, idx, rel))
    h_dup = stable_hash(f"dup|{host}|{type_id}|{page}", cfg.seed)
    if page > 1 and h_dup % cfg.dup_prev_page_mod == 0:
        # repeat one link from the previous page (within-type dup)
        rel = (h_dup % 2 == 0) if mixed else relative
        links.append(article_url(cfg, host, type_id, (page - 2) * L, rel))
    return links


# ---------------------------------------------------------------------------
# Page rendering (the "network")
# ---------------------------------------------------------------------------


def _canonical_article(cfg: WebConfig, host: str, url: str) -> str:
    """Absolute, query-stripped form used as the article's identity."""
    u = url.split("?")[0].split("#")[0]
    if not u.startswith("http"):
        u = f"https://{host}{u}"
    return u


def render_listing_html(cfg: WebConfig, host: str, type_id: int, page: int) -> str:
    """Render a listing page in the host profile's LISTING_FAMILY markup.

    Every family ships decoy elements its reference selector must skip
    (headingless <article>, javascript:/#fragment hrefs, off-class titles) —
    the parser's structural filter is part of the spec, not an accident.
    """
    links = listing_links(cfg, host, type_id, page)
    spec = cfg.spec(host)
    if not links:
        return "<html><body><div class='list-news'></div></body></html>"
    fam = LISTING_FAMILY[spec.profile]
    if fam == "h3-title-news":
        anchors = "".join(
            f'<h3 class="title-news"><a href="{u}">bài {i}</a></h3>'
            for i, u in enumerate(links)
        )
        body = f"<div class='list-news'>{anchors}</div>"
    elif fam == "article-walk":
        # vtcnews.py:231-243: article tags, first h3-or-h2 heading, its <a>;
        # a headingless article (ad slot) contributes nothing
        items = []
        for i, u in enumerate(links):
            tag = "h3" if i % 2 == 0 else "h2"
            items.append(f'<article><{tag}><a href="{u}">bài {i}</a></{tag}></article>')
        items.insert(0, '<article><div class="ad-slot">quảng cáo</div></article>')
        body = "".join(items)
    elif fam == "http-filter":
        # quandoinhandan.py:198-202: article a[href] under the category list,
        # http(s)-prefixed hrefs only — javascript:/fragment decoys dropped
        items = ['<article><a href="javascript:void(0)">xem thêm</a></article>']
        items += [
            f'<article><a href="{u}">bài {i}</a></article>'
            for i, u in enumerate(links)
        ]
        items.append('<article><a href="#top">đầu trang</a></article>')
        body = f'<div class="list-news-category">{"".join(items)}</div>'
    elif fam == "multi-class":
        # vietnamnet.py:227-231: three interchangeable title classes; an
        # off-class title must not match
        items = [
            f'<h3 class="{_VNN_TITLE_CLASSES[i % 3]}"><a href="{u}">bài {i}</a></h3>'
            for i, u in enumerate(links)
        ]
        items.append('<h3 class="other-title"><a href="/khuyen-mai/uu-dai">ưu đãi</a></h3>')
        body = "".join(items)
    elif fam == "newstitle-div":
        # congnghevadoisong.py:193-201: container div, div.newsTitle > a
        items = "".join(
            f'<div class="newsTitle"><a href="{u}">bài {i}</a></div>'
            for i, u in enumerate(links)
        )
        body = f'<div class="categoryListItem category_2">{items}</div>'
    elif fam == "relative-only":
        # kienthuc.py:244-253: h2.title anchors, keep hrefs starting with
        # '/' only — the absolute outbound decoy must be dropped
        items = [
            f'<h2 class="title"><a href="{u}">bài {i}</a></h2>'
            for i, u in enumerate(links)
        ]
        items.append(
            '<h2 class="title"><a href="https://ads.example.com/sponsor">qc</a></h2>'
        )
        body = f'<section class="cat-listnews hzol-clear">{"".join(items)}</section>'
    elif fam == "khuvuc-anchors":
        # dangcongsan.py:199-209: div#KhuVuc_3, ALL anchors inside count —
        # no heading filter; anchors OUTSIDE the container must be ignored
        items = "".join(f'<a href="{u}">bài {i}</a>' for i, u in enumerate(links))
        body = (
            f'<div id="KhuVuc_3">{items}</div>'
            '<a href="/sitemap">sơ đồ trang</a>'
        )
    elif fam == "article-first-a":
        # vneconomy.py:193-209: container div, FIRST a per article; second
        # anchors and anchorless ad articles contribute nothing
        items = []
        for i, u in enumerate(links):
            extra = '<a href="#comments">bình luận</a>' if i % 2 == 0 else ""
            items.append(f'<article><a href="{u}">bài {i}</a>{extra}</article>')
        items.insert(0, "<article><span>quảng cáo</span></article>")
        body = (
            f'<div class="col-12 col-lg-9 column-border">{"".join(items)}'
            "</div><!--col-end-->"
        )
    elif fam == "item-post":
        # kinhtedouong.py:231-240: .item-post a[href]; anchors outside
        # item-posts are ignored
        items = "".join(
            f'<div class="item-post"><a href="{u}">bài {i}</a></div>'
            for i, u in enumerate(links)
        )
        body = f'{items}<a href="/lien-he">liên hệ</a>'
    elif fam == "two-container":
        # tapchicongthuong.py:210-225: two container classes; '/'-prefixed
        # hrefs only; cross-container duplicates removed keep-first; the
        # absolute decoy is dropped
        half = (len(links) + 1) // 2
        first = "".join(f'<a href="{u}">bài {i}</a>' for i, u in enumerate(links[:half]))
        # duplicate one link from container 1 into container 2 to exercise
        # the ordered dedup
        second_links = list(links[half:]) + [links[0]]
        second = "".join(f'<a href="{u}">bài {i}</a>' for i, u in enumerate(second_links))
        second += '<a href="https://ads.example.com/sponsor">qc</a>'
        body = (
            f'<div class="widget-layout-1 pt-4 mb-4">{first}</div>'
            f'<div class="list-view">{second}</div>'
        )
    elif fam == "zone-story":
        # vietnamdaily.py:204-219: ul.zone, article.story, first a each;
        # non-story articles skipped
        items = ["<li><article><a href=\"/khuyen-mai\">qc</a></article></li>"]
        items += [
            f'<li><article class="story"><a href="{u}">bài {i}</a></article></li>'
            for i, u in enumerate(links)
        ]
        body = f'<ul class="zone category-listing-story">{"".join(items)}</ul>'
    elif fam == "link-title":
        # suckhoecong.py:196-207: div.list-new-cate, a.link-title only —
        # the class-less anchor is skipped
        items = "".join(
            f'<a class="link-title" href="{u}">bài {i}</a>' for i, u in enumerate(links)
        )
        body = f'<div class="list-new-cate">{items}<a href="/rss">RSS</a></div>'
    elif fam == "ctrangc3":
        # baovephapluat.py:227-234: div.ctrangc3, ALL anchors; anchors
        # outside the container are ignored
        items = "".join(f'<a href="{u}">bài {i}</a>' for i, u in enumerate(links))
        body = f'<div class="ctrangc3">{items}</div><a href="/gioi-thieu">về chúng tôi</a>'
    elif fam == "thumb-class":
        # tapchidientu.py:205-212: a.thumb300x170 anywhere; the class-less
        # anchor is skipped
        items = "".join(
            f'<a class="thumb300x170" href="{u}">bài {i}</a>'
            for i, u in enumerate(links)
        )
        body = f'{items}<a href="/video/clip-moi">video</a>'
    elif fam == "two-phase":
        # tapchitoaan.py:200-216: post-entry-2 first-a's THEN col-lg-8
        # first-a's — the last link renders in the header container, so
        # document order and extraction order DIFFER by design
        head, tail = links[:-1], links[-1:]
        items = ['<div class="d-md-flex post-entry-2 small-img"><span>qc</span></div>']
        items += [
            f'<div class="d-md-flex post-entry-2 small-img">'
            f'<a href="{u}">bài {i}</a><a href="#share">chia sẻ</a></div>'
            for i, u in enumerate(head)
        ]
        header = "".join(
            f'<div class="col-lg-8"><a href="{u}">tiêu điểm</a></div>' for u in tail
        )
        # header precedes the entry list in the DOCUMENT, but the parser
        # appends its links AFTER the entries (two-phase extraction)
        body = header + "".join(items)
    elif fam == "ul-li-first-a":
        # baodautu.py:194-202: ul.list_news_home li > first a each; the
        # anchorless li contributes nothing
        items = ["<li><span>quảng cáo</span></li>"]
        items += [
            f'<li><a href="{u}">bài {i}</a><a href="#cmt">góp ý</a></li>'
            for i, u in enumerate(links)
        ]
        body = f'<ul class="list_news_home">{"".join(items)}</ul>'
    elif fam == "news2item":
        # phunumoi.py:189-198: news2 section div, div.news2Item > first a;
        # the itemless promo div contributes nothing
        items = ['<div class="news2Item"><span>quảng cáo</span></div>']
        items += [
            f'<div class="news2Item"><a href="{u}">bài {i}</a>'
            f'<a href="#save">lưu</a></div>'
            for i, u in enumerate(links)
        ]
        body = (
            f'<div class="col-xs-12 col-sm-8 col-md-8 news2">{"".join(items)}'
            "<!--news2-end--></div>"
        )
    elif fam == "bgrid-title":
        # congly.py:213-233: ul.onecms__loading, h3.b-grid__title anchors;
        # off-class h3 skipped (one-shot marker appended below)
        items = [
            f'<li><h3 class="b-grid__title"><a href="{u}">bài {i}</a></h3></li>'
            for i, u in enumerate(links)
        ]
        items.append('<li><h3 class="other-title"><a href="/tag/phap-luat">tag</a></h3></li>')
        body = f'<ul class="onecms__loading">{"".join(items)}</ul>'
    elif fam == "bx-cat-content":
        # congthuong.py:212-225: h3.article-title > a under the container,
        # http(s)-prefixed only — javascript: decoys dropped
        items = ['<h3 class="article-title"><a href="javascript:void(0)">thêm</a></h3>']
        items += [
            f'<h3 class="article-title"><a href="{u}">bài {i}</a></h3>'
            for i, u in enumerate(links)
        ]
        body = (
            f'<div class="bx-cat-content fw lt mb2">{"".join(items)}'
            "<!--bxcat-end--></div>"
        )
    elif fam == "cat-listing":
        # baotaichinhvietnam.py:211-222: the 7-class container, h3 > first a
        items = "".join(
            f'<h3 class="article-title"><a href="{u}">bài {i}</a>'
            f'<a href="#save">lưu</a></h3>'
            for i, u in enumerate(links)
        )
        body = (
            '<div class="cat-listing bg-dots mt20 pt20 article-bdt-20 '
            f'thumb-w250 title-22 no-catname">{items}<!--catlisting-end--></div>'
        )
    elif fam == "bx-list":
        # quanlythitruong.py:203-210: h3.a direct anchors; anchorless h3
        # (photo teaser) skipped
        items = ['<h3 class="article-title"><span>ảnh</span></h3>']
        items += [
            f'<h3 class="article-title"><a href="{u}">bài {i}</a></h3>'
            for i, u in enumerate(links)
        ]
        body = (
            f'<div class="bx-list fw lt mb clearfix">{"".join(items)}'
            "<!--bxlist-end--></div>"
        )
    elif fam == "dle-content":
        # taichinhdoanhnghiep.py:197-203: a.article-title anchors directly;
        # the class-less anchor is skipped
        items = "".join(
            f'<a class="article-title" href="{u}">bài {i}</a>'
            for i, u in enumerate(links)
        )
        body = (
            f'<div id="dle-content">{items}<a href="/lien-he">liên hệ</a>'
            "<!--dle-end--></div>"
        )
    elif fam == "list-articles":
        # thuonghieucongluan.py:192-199: the six-class h3 > a; off-class
        # h3 skipped
        items = "".join(
            f'<h3 class="mt-0 mb-1 title card-title fs-18"><a href="{u}">bài {i}</a></h3>'
            for i, u in enumerate(links)
        )
        items += '<h3 class="other"><a href="/tag/hot">tag</a></h3>'
        body = f'<ul class="list-unstyled list-articles mt-2rem">{items}</ul>'
    elif fam == "row-h6":
        # tapchigiaoduc.py:192-206: per row, img-content h6>a THEN
        # category-box-lg h6>a — the lg box link renders FIRST in the row
        # but is appended after the img-content links
        half = max(1, len(links) - 1)
        head, tail = links[:half], links[half:]
        row = []
        row += [f'<div class="category-box-lg"><h6><a href="{u}">nổi bật</a></h6></div>'
                for u in tail]
        row += [f'<div class="img-content"><h6><a href="{u}">bài {i}</a></h6></div>'
                for i, u in enumerate(head)]
        row.append('<div class="img-content"><span>không h6</span></div>')
        body = f'<div class="row">{"".join(row)}<!--row-end--></div>'
    elif fam == "cate-box":
        # baoxaydung.py:200-220 (selenium one-shot)
        items = "".join(
            f'<h3 class="box-category-title-text"><a href="{u}">bài {i}</a></h3>'
            for i, u in enumerate(links)
        )
        body = (
            f'<div class="section__news-cate-box">{items}<!--catebox-end--></div>'
        )
    elif fam == "cat-middle":
        # suckhoedoisong.py:212-230 (selenium one-shot): two middle boxes
        half = (len(links) + 1) // 2
        b1 = "".join(f'<h3><a href="{u}">bài {i}</a></h3>'
                     for i, u in enumerate(links[:half]))
        b2 = "".join(f'<h3><a href="{u}">bài {i}</a></h3>'
                     for i, u in enumerate(links[half:]))
        body = (
            f'<div class="box-category-middle">{b1}<!--catmid-end--></div>'
            f'<div class="box-category-middle">{b2}<!--catmid-end--></div>'
        )
    elif fam == "story-title":
        # baovanhoa.py:254-266: article.story > h3.story__title > first a;
        # titleless story skipped
        items = ['<article class="story"><div class="thumb">ảnh</div></article>']
        items += [
            f'<article class="story"><h3 class="story__title">'
            f'<a href="{u}">bài {i}</a></h3></article>'
            for i, u in enumerate(links)
        ]
        body = "".join(items)
    elif fam == "listnews-title24":
        # tainguyenvamoitruong.py:203-214: h3.title-24 a under the page list
        items = "".join(
            f'<h3 class="title-24"><a href="{u}">bài {i}</a></h3>'
            for i, u in enumerate(links)
        )
        body = (
            f'<div class="list_news-page">{items}<!--listnews-end--></div>'
            '<h3 class="title-24"><a href="/ngoai-container">decoy</a></h3>'
        )
    elif fam == "wrap-news-list":
        # baohaiquanvietnam.py:197-208: first a per wrap; anchorless wrap
        # contributes nothing
        items = ['<div class="wrap-news-list"><span>tiêu điểm ảnh</span></div>']
        items += [
            f'<div class="wrap-news-list"><a href="{u}">bài {i}</a>'
            f'<a href="#cmt">góp ý</a></div>'
            for i, u in enumerate(links)
        ]
        body = "".join(items)
    else:
        raise ValueError(fam)
    marker = "<!--one-shot-->" if spec.one_shot else ""
    return f"<html><body>{marker}{body}</body></html>"


def _sentence(cfg: WebConfig, key: str, n_words: int) -> str:
    h = stable_hash(key, cfg.seed)
    out = []
    for i in range(n_words):
        out.append(_WORDS[(h >> (i % 8)) % len(_WORDS)])
        h = (h * 6364136223846793005 + 1442695040888963407) % (1 << 64)
    return " ".join(out)


def _paraphrase_words(words: list[str], h: int) -> list[str]:
    """Deterministic branch-3 rewrite: every word is replaced by its
    'synonym' — the character-reversed surface form (a dictionary-free
    synonym class: ``least(tok, reverse(tok))`` canonicalizes both forms to
    one key in any engine) — then the word order is Fisher-Yates-shuffled
    from ``h`` and ONE host-local interjection word is spliced in (so two
    paraphrases of the same wire story are near- but not bag-identical).
    The result shares (essentially) no character 5-grams with the original
    sentence, so shingle-based near-dup detection cannot see the
    republication; a bag-of-synonym-class embedding sees it plainly."""
    out = [w[::-1] for w in words]
    for i in range(len(out) - 1, 0, -1):
        h = (h * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        j = h % (i + 1)
        out[i], out[j] = out[j], out[i]
    h = (h * 6364136223846793005 + 1442695040888963407) % (1 << 64)
    out.insert(h % (len(out) + 1), _WORDS[(h >> 8) % len(_WORDS)][::-1])
    return out


def article_fields(cfg: WebConfig, host: str, url: str) -> dict:
    """Ground-truth structured fields of an article page (pre-HTML).

    The HTML renderer serializes these; parsers must recover them exactly.
    """
    spec = cfg.spec(host)
    cu = _canonical_article(cfg, host, url)
    h = stable_hash(f"doc|{cu}", cfg.seed)
    has_title = h % cfg.null_title_mod != 0
    title = f"Tiêu đề {_sentence(cfg, f'title|{cu}', 5)} {h % 1000}" if has_title else None
    desc = f"Mô tả {_sentence(cfg, f'desc|{cu}', 10)}"
    n_paras = cfg.page_weight * (2 + h % 5)
    paras = [
        f"Đoạn {i}: {_sentence(cfg, f'para|{cu}|{i}', 8 + (h >> i) % 10)}."
        for i in range(n_paras)
    ]
    # Wire syndication (off by default — syndication_mod=0 keeps every web,
    # including the flagship default_web, byte-identical): 1/mod articles
    # republish one of `wire_stories` shared wire bodies, the way real news
    # sites run agency copy.  Body text is keyed by the WIRE id, not the
    # article URL, so the same story crawled on different hosts yields
    # byte-identical paragraphs; republications then branch three ways, the
    # three duplication modes real republishing produces:
    #   branch 0  exact copy          (caught by exact/line-level dedup)
    #   branch 1  + one local note    (line-level near-dup: every wire line
    #                                  byte-identical, one extra line)
    #   branch 2  in-line light edit  (token-level near-dup: the desk editor
    #                                  touched EVERY paragraph, so no line
    #                                  is byte-shared — only doc-level fuzzy
    #                                  dedup, e.g. MinHash/LSH at ~0.85
    #                                  shingle-Jaccard, can catch it)
    #   branch 3  paraphrase          (wire_branches=4 only: the desk REWRITES
    #                                  the story — every content word swapped
    #                                  for its synonym (surface form: the
    #                                  character-reversed word) and the word
    #                                  order reshuffled per paragraph, so the
    #                                  copy shares no char-5-gram shingles
    #                                  with the wire body and is invisible to
    #                                  MinHash/SimHash; only an embedding that
    #                                  maps synonyms to the same class — the
    #                                  semantic rung of the dedup ladder —
    #                                  can catch it)
    # Title/desc/author/date/images stay host-local (republishers re-chrome).
    if cfg.syndication_mod and h % cfg.syndication_mod == 0:
        # decision bits are taken from DISJOINT hash windows: the gate uses
        # h mod m, wire/branch use h>>4 and h>>8 — reusing the low bits
        # would correlate the choices (gate mod 3 + branch mod 3 = every
        # syndicated doc an exact copy)
        wire = (h >> 4) % max(1, cfg.wire_stories)
        hw = stable_hash(f"wire|{wire}", cfg.seed)
        n_paras = cfg.page_weight * (3 + hw % 4)
        paras = [
            f"Đoạn {i}: {_sentence(cfg, f'wire|{wire}|{i}', 8 + (hw >> i) % 10)}."
            for i in range(n_paras)
        ]
        branch = (h >> 8) % max(3, cfg.wire_branches)
        if branch == 1:
            paras = paras + [
                f"Đoạn {n_paras}: {_sentence(cfg, f'localnote|{cu}', 10)}."
            ]
            n_paras += 1
        elif branch == 2:
            paras = [
                p[:-1]
                + f", ghi nhận {_WORDS[stable_hash(f'edit|{cu}|{i}', cfg.seed) % len(_WORDS)]}."
                for i, p in enumerate(paras)
            ]
        elif branch == 3:
            paras = [
                f"Đoạn {i}: "
                f"{' '.join(_paraphrase_words(_sentence(cfg, f'wire|{wire}|{i}', 8 + (hw >> i) % 10).split(), stable_hash(f'para3|{cu}|{i}', cfg.seed)))}."
                for i in range(n_paras)
            ]
    author = _AUTHORS[h % len(_AUTHORS)]
    # images interleaved after paragraph positions determined by hash
    n_imgs = h % 4  # 0..3 images
    img_positions = sorted({(stable_hash(f"imgpos|{cu}|{j}", cfg.seed) % n_paras) for j in range(n_imgs)})
    # vnn/tnm images live on the article host itself so relative hrefs can
    # round-trip through urljoin absolutization (vietnamnet.py:146-157,
    # tainguyenvamoitruong.py:136-140)
    img_host = host if spec.profile in ("vnn", "tnm") else f"img.{host}"
    images = [
        (pos, f"https://{img_host}/media/{stable_hash(f'img|{cu}|{pos}', cfg.seed) % 10**8}.jpg")
        for pos in img_positions
    ]
    # date: cycle through the messy formats
    fmt = _DATE_FORMATS[h % len(_DATE_FORMATS)]
    y = 2022 + h % 4
    m = 1 + (h >> 8) % 12
    d = 1 + (h >> 16) % 28
    H = (h >> 24) % 24
    M = (h >> 32) % 60
    ap = "PM" if H >= 12 else "AM"
    h12 = H % 12 or 12
    date_raw = fmt.format(d=d, m=m, y=y, H=H, M=M, h=h12, ap=ap)
    comments = (
        [f"Bình luận {_sentence(cfg, f'cmt|{cu}|{i}', 6)}" for i in range(h % 3)]
        if spec.profile in ("vnx", "vnn")
        else []
    )
    return {
        "canonical_url": cu,
        "title": title,
        "description": desc,
        "paragraphs": paras,
        "author": author,
        "images": images,  # list[(para_pos, abs_url)]
        "date_raw": date_raw,
        "comments": comments,
        "hero_image": f"https://img.{host}/hero/{h % 10**7}.jpg",
        # vnn hero fallback chain (vietnamnet.py:136-143): half the articles
        # carry an inline img.img-content that outranks og:image
        "hero_inline": (
            f"https://{host}/hero-inline/{h % 10**7}.jpg"
            if spec.profile == "vnn" and h % 2 == 0
            else None
        ),
    }


def render_article_html(cfg: WebConfig, host: str, url: str) -> str:
    """Serialize article fields to profile-specific HTML-ish markup.

    Images are interleaved between paragraphs in true document order — the
    'interleaved text + media documents' of the north rule.  Attribute names
    follow each profile's reference site (data-src for vnx/dtr
    vnexpress.py:213-214 / dantri.py:250-255; src for btt baothanhtra.py:142;
    src|data-original + relative forms for vnn vietnamnet.py:146-157).
    """
    spec = cfg.spec(host)
    f = article_fields(cfg, host, url)
    p = spec.profile
    if p in ("dcs", "vne", "ktd", "tct", "vdl", "skc",
             "bvl", "tcd", "tta", "bdu", "pnm", "vtc", "cgl",
             "ctg", "btv", "qlt", "tdn",
             "thc", "tgd", "bxd", "skd", "bvh", "tnm", "kth", "bhq"):
        return _render_article_v2(cfg, host, url, f, spec)
    parts = ["<html><head>"]
    parts.append(f'<meta property="og:image" content="{f["hero_image"]}"/>')
    parts.append("</head><body>")
    # boilerplate nav/cruft scaled by page_weight — real news pages bury the
    # article in markup the parser must scan past
    for b in range(cfg.page_weight - 1):
        filler = _sentence(cfg, f"boiler|{url}|{b}", 20)
        parts.append(f'<div class="nav-item"><span>{filler}</span><a href="#m{b}">menu</a></div>')
    if f["title"] is not None:
        if p == "bdt":
            # title travels in the ATTRIBUTE, not the element text
            # (baodantoc.py:141: soup.find('h1', class_='news-title')['title'])
            parts.append(f'<h1 class="news-title" title="{f["title"]}">Chi tiết bài viết</h1>')
        elif p == "cnd":
            parts.append(f'<h1 class="postTitle">{f["title"]}</h1>')
        else:
            parts.append(f'<h1 class="title-detail">{f["title"]}</h1>')
    if p == "cnd":
        # congnghevadoisong.py:118-121: description matched by a STYLE lambda
        # (bold + justify); a justify-only decoy must not match
        parts.append(f'<span class="newsDate">{f["date_raw"]}</span>')
        parts.append('<p style="text-align: justify;">Một đoạn trang trí.</p>')
        parts.append(
            f'<p style="font-weight: bold; text-align: justify;">{f["description"]}</p>'
        )
        h_a = stable_hash(f"cndauth|{f['canonical_url']}", cfg.seed)
        if h_a % 5 != 0:  # 1/5 articles authorless -> parser defaults to ""
            parts.append(f'<span class="link-source-text-name">{f["author"]}</span>')
    else:
        parts.append(f'<span class="date">{f["date_raw"]}</span>')
        parts.append(f'<p class="description">{f["description"]}</p>')
    if p in ("dtr", "btt", "btu"):
        parts.append(f'<div class="author-name">{f["author"]}</div>')
    if p == "vnn":
        # nested-box author chain (vietnamnet.py:169-178): span.name, else
        # the first <a> in the box, else no box at all (author = "")
        h_a = stable_hash(f"vnnauth|{f['canonical_url']}", cfg.seed)
        if h_a % 3 == 0:
            parts.append(
                f'<div class="article-detail-author"><span class="name">'
                f'{f["author"]}</span></div>'
            )
        elif h_a % 3 == 1:
            parts.append(
                f'<div class="article-detail-author"><a href="#profile">'
                f'{f["author"]}</a></div>'
            )
        # else: no author box — parser must default to ""
    if p == "bdt":
        # span form (baodantoc.py:144: soup.find('span', class_='author-name'))
        parts.append(f'<span class="author-name">{f["author"]}</span>')
    if p == "vnn" and f["hero_inline"]:
        parts.append(f'<img class="img-content" src="{f["hero_inline"]}"/>')
    if p == "cnd":
        # content container is div.postRickText whose FIRST paragraph repeats
        # the description — congnghevadoisong.py:124-126 skips paragraphs[0]
        parts.append('<div class="postRickText">')
        parts.append(f'<p class="Normal">{f["description"]}</p>')
    else:
        parts.append('<article class="content-body">')
    img_by_pos: dict[int, list[str]] = {}
    for pos, src in f["images"]:
        img_by_pos.setdefault(pos, []).append(src)
    h_doc = stable_hash(f"decoy|{f['canonical_url']}", cfg.seed)
    for i, para in enumerate(f["paragraphs"]):
        parts.append(f'<p class="Normal">{para}</p>')
        if p == "btu" and i == 0:
            # share/script cruft the parser must decompose before get_text
            # (baotintuc.py:188-190: content_div.select("script, style, .share"))
            filler = _sentence(cfg, f"share|{f['canonical_url']}", 6)
            parts.append(
                f'<div class="share"><p class="Normal">Chia sẻ: {filler}</p>'
                f'<img src="https://img.{host}/share-decoy.jpg"/></div>'
            )
            parts.append(f'<script>var t = "{filler}";</script>')
        for src in img_by_pos.get(i, []):
            if p in ("vnx", "dtr"):
                parts.append(f'<img class="lazy" data-src="{src}"/>')
            elif p in ("btt", "qdn", "thp", "bdt", "cnd"):
                parts.append(f'<img src="{src}"/>')
            elif p == "btu":
                # images live in figure.image wrappers (baotintuc.py:193-199)
                parts.append(f'<figure class="image"><img src="{src}"/></figure>')
            else:  # vnn: relative / picture-srcset / data-original variants
                h_img = stable_hash(f"rel|{src}", cfg.seed)
                if h_img % 3 == 0 and src.startswith(f"https://{host}/"):
                    parts.append(f'<img src="{src[len(f"https://{host}"):]}"/>')
                elif h_img % 3 == 1:
                    # picture>source data-srcset, first candidate wins
                    # (vietnamnet.py:153-157)
                    parts.append(
                        f'<picture><source data-srcset="{src} 1x, {src}?w=1200 2x"/>'
                        f'<img class="pic"/></picture>'
                    )
                else:
                    parts.append(f'<img data-original="{src}"/>')
    if p == "thp":
        # excluded-by-prefix decoy paragraph (thuonghieuvaphapluat.py:131-133
        # drops paragraphs starting with the correspondent marker)
        if h_doc % 2 == 0:
            filler = _sentence(cfg, f"vn|{f['canonical_url']}", 5)
            parts.append(f'<p class="Normal">Văn Nam - {filler}</p>')
        # author rides a style-attribute match (thuonghieuvaphapluat.py:135)
        parts.append(f'<p style="text-align: right; float: right;">{f["author"]}</p>')
    if p == "vnx":
        # author travels as the last content paragraph (vnexpress.py:190-193)
        parts.append(f'<p class="Normal">{f["author"]}</p>')
    if p == "qdn":
        # author travels as p>strong (quandoinhandan.py:140 + heuristic
        # beautifulSoup_utils.py:12-51); decoys exercise the filters
        h_a = stable_hash(f"qdnauth|{f['canonical_url']}", cfg.seed)
        if h_a % 3 == 0:
            parts.append('<p class="Normal"><strong>GIÁ VÀNG SJC</strong></p>')
        if h_a % 4 == 0:
            parts.append('<p class="Normal"><strong>TIN, ẢNH: Phóng viên thường trú</strong></p>')
        parts.append(f'<p class="Normal"><strong>{f["author"]}</strong></p>')
    parts.append("</div>" if p == "cnd" else "</article>")
    if spec.profile in ("vnx", "vnn") and f["comments"]:
        cmts = "".join(f'<div class="comment_content">{c}</div>' for c in f["comments"])
        parts.append(f'<div class="box_comment">{cmts}</div>')
    parts.append("</body></html>")
    return "".join(parts)


def _render_article_v2(cfg: WebConfig, host: str, url: str, f: dict,
                       spec: HostSpec) -> str:
    """Article markup for the round-4 profiles (dcs/vne/ktd/tct/vdl/skc).

    Each branch serializes the same ground-truth fields in its reference
    site's selector idiom, with decoy elements the parser must skip — the
    markup is the *test vector* for the profile's structural quirks.
    """
    p = spec.profile
    cu = f["canonical_url"]
    h = stable_hash(f"v2|{cu}", cfg.seed)
    parts = ["<html><head>"]
    parts.append(f'<meta property="og:image" content="{f["hero_image"]}"/>')
    parts.append("</head><body>")
    for b in range(cfg.page_weight - 1):
        filler = _sentence(cfg, f"boiler|{url}|{b}", 20)
        parts.append(
            f'<div class="nav-item"><span>{filler}</span><a href="#m{b}">menu</a></div>'
        )
    img_by_pos: dict[int, list[str]] = {}
    for pos, src in f["images"]:
        img_by_pos.setdefault(pos, []).append(src)
    paras = f["paragraphs"]

    if p == "dcs":
        # id-selector markup (dangcongsan.py:113-141)
        if f["title"] is not None:
            # get_text() without strip is the reference behavior — a
            # hash-gated trailing space pins the no-strip semantics
            t = f["title"] + (" " if h % 4 == 0 else "")
            parts.append(f'<h1 id="contenttitle">{t}</h1>')
        parts.append(f'<div id="description">{f["description"]}</div>')
        parts.append(f'<div id="ngaytao">{f["date_raw"]}</div>')
        parts.append('<div class="noidungtt">')
        for i, para in enumerate(paras):
            parts.append(f"<p>{para}</p>")
            if i == 0 and h % 3 == 0:
                parts.append("<p> </p>")  # blank para -> filtered by strip
            for src in img_by_pos.get(i, []):
                parts.append(f'<img class="imgtelerik" src="{src}"/>')
        if h % 2 == 1:
            # non-imgtelerik decoy the img.imgtelerik selector must skip
            parts.append(f'<img src="https://img.{host}/banner-decoy.jpg"/>')
        parts.append("</div>")
        theo = "Theo " if h % 2 == 0 else ""
        parts.append(f'<b id="tacgia">{theo}{f["author"]}</b>')

    elif p == "vne":
        # header-scoped markup (vneconomy.py:117-135)
        parts.append('<header class="detail__header">')
        parts.append(f'<div class="detail__meta">{f["date_raw"]}</div>')
        if f["title"] is not None:
            parts.append(f'<h1 class="detail__title">{f["title"]}</h1>')
        parts.append(f'<h2 class="detail__summary">{f["description"]}</h2>')
        parts.append(f'<div class="detail__author">{f["author"]}</div>')
        parts.append("</header>")
        # scoping decoy: a detail__title OUTSIDE the header (related-news box)
        parts.append('<h1 class="detail__title">Tin liên quan nổi bật</h1>')
        parts.append('<div class="detail__content">')
        for i, para in enumerate(paras):
            parts.append(f"<p>{para}</p>")
            for src in img_by_pos.get(i, []):
                parts.append(f'<figure><img src="{src}"/></figure>')
            if i == 1 and h % 3 == 0:
                # bare img (tracking pixel) — figure-only selector skips it
                parts.append(f'<img src="https://img.{host}/pixel.gif"/>')
        parts.append("</div>")

    elif p == "ktd":
        # attribute-date + 3-tier author markup (kinhtedouong.py:139-175)
        parts.append('<div class="title-post">')
        if f["title"] is not None:
            parts.append(f'<h1 class="title">{f["title"]}</h1>')
        parts.append(f'<time datetime="{f["date_raw"]}">1 giờ trước</time>')
        parts.append("</div>")
        parts.append(f'<h2 class="sum-main">{f["description"]}</h2>')
        parts.append('<div class="news-content">')
        for i, para in enumerate(paras):
            parts.append(f"<p>{para}</p>")
            for src in img_by_pos.get(i, []):
                parts.append(f'<img src="{src}"/>')
        tier = h % 3
        if tier == 0:
            parts.append(f'<p class="alignright"><strong>{f["author"]}</strong></p>')
        elif tier == 1:
            parts.append(f'<p class="alignright"><em>{f["author"]}</em></p>')
        else:
            # tier-3: last valid p>strong wins; the PV and too-long decoys
            # AFTER it must be rejected by the word-count/PV filters
            parts.append(f"<p><strong>{f['author']}</strong></p>")
            parts.append("<p><strong>PV</strong></p>")
            parts.append(
                "<p><strong>GIÁ VÀNG TRONG NƯỚC HÔM NAY TĂNG MẠNH</strong></p>"
            )
        parts.append("</div>")

    elif p == "tct":
        # unfiltered p+h2 markup (tapchicongthuong.py:123-153)
        if f["title"] is not None:
            parts.append(
                f'<h1 class="post-title text-left font-playfair">{f["title"]}</h1>'
            )
        parts.append(
            f'<div class="meta-info"><span class="source"><strong>'
            f'{f["author"]}</strong></span></div>'
        )
        if stable_hash(f"sapo|{cu}", cfg.seed) % 13 != 0:
            tcct = "TCCT " if h % 2 == 0 else ""
            parts.append(f'<div class="sapo title-1 mb-3">{tcct}{f["description"]}</div>')
        # else: sapo missing -> the re.sub(None) crash-drop (tct parser)
        parts.append(
            f'<div class="post-meta"><span>{f["date_raw"]}</span>'
            "<span>Tạp chí Công Thương</span></div>"
        )
        parts.append('<div id="post_content">')
        for i, para in enumerate(paras):
            parts.append(f"<p>{para}</p>")
            if (h >> (i % 16)) % 4 == 0:
                sub = _sentence(cfg, f"h2|{cu}|{i}", 4)
                parts.append(f"<h2>{sub}</h2>")  # subhead JOINS the content
            if i == 0 and h % 5 == 0:
                parts.append("<p></p>")  # empty entry KEPT (no filter)
            for src in img_by_pos.get(i, []):
                parts.append(
                    f'<figure><img src="{src}"/>'
                    "<figcaption>Ảnh minh họa</figcaption></figure>"
                )
        if h % 2 == 1:
            parts.append(f'<img src="https://img.{host}/logo-decoy.png"/>')
        parts.append("</div>")

    elif p == "vdl":
        # block-div markup (vietnamdaily.py:117-146)
        if f["title"] is not None:
            parts.append(f'<h1 class="cms-title article-title">{f["title"]}</h1>')
        parts.append(f'<div class="summary cms-desc">{f["description"]}</div>')
        parts.append(f'<div class="meta clearfix"><time>{f["date_raw"]}</time></div>')
        tier = h % 3
        if tier == 0:
            parts.append(
                f'<div class="author"><span class="name">{f["author"]}</span></div>'
            )
        elif tier == 1:
            parts.append('<div class="author">Nguồn: tổng hợp</div>')  # no name span
        # tier 2: no author box at all -> author ""
        parts.append('<div id="abody" class="cms-body clearfix">')
        for i, para in enumerate(paras):
            imgs = img_by_pos.get(i, [])
            own_block = stable_hash(f"vdlblk|{cu}|{i}", cfg.seed) % 2 == 0
            if imgs and own_block:
                # image-only sibling block: contributes images, no text
                parts.append(f"<div>{para}</div>")
                parts.append(
                    "<div>" + "".join(f'<img src="{s}"/>' for s in imgs) + "</div>"
                )
            else:
                inline = "".join(f'<img src="{s}"/>' for s in imgs)
                parts.append(f"<div>{para}{inline}</div>")
        parts.append("<!--abody-end--></div>")

    elif p == "skc":
        # box-author section + pipe-description markup (suckhoecong.py:116-138)
        parts.append('<section class="box-author">')
        if f["title"] is not None:
            parts.append(f"<h1>{f['title']}</h1>")
        # the ' 03/' tail is the literal split key the reference uses to
        # shear the date off the info line (suckhoecong.py:123)
        parts.append(
            f'<div class="info-author">Sức khỏe cộng đồng | {f["description"]}'
            " 03/01/2024 08:00</div>"
        )
        parts.append(f"<ul><li>{f['date_raw']}</li><li>Theo dõi trên</li></ul>")
        parts.append("</section>")
        parts.append('<div class="detail text-justify">')
        for i, para in enumerate(paras):
            parts.append(f"<p>{para}</p>")
            if i == 0 and h % 5 == 0:
                parts.append("<p></p>")  # empty entry KEPT (no filter)
            for src in img_by_pos.get(i, []):
                parts.append(f'<img src="{src}"/>')
        if h % 4 != 0:
            parts.append(f'<div class="author-detail">{f["author"]}</div>')
        parts.append("<!--detail-end--></div>")

    elif p == "bvl":
        # split-container markup (baovephapluat.py:139-168): text in
        # div.noidung, images in div.post-content with the own-domain
        # filter — an off-domain CDN decoy must be dropped
        if f["title"] is not None:
            parts.append(f'<h1 class="post-title">{f["title"]}</h1>')
        parts.append(f'<div class="lbPublishedDate">{f["date_raw"]}</div>')
        parts.append(f'<div class="post-summary"><h2>{f["description"]}</h2></div>')
        parts.append('<div class="noidung">')
        for i, para in enumerate(paras):
            parts.append(f"<p>{para}</p>")
            if i == 0 and h % 5 == 0:
                parts.append("<p></p>")  # empty entry KEPT (no filter)
        parts.append("</div>")
        parts.append('<div class="post-content">')
        for _pos, src in f["images"]:
            parts.append(f'<img src="{src}"/>')
        if h % 2 == 0:
            parts.append('<img src="https://cdn.external.example/ads/banner.jpg"/>')
        parts.append("</div>")
        if h % 4 != 0:
            parts.append(f'<div class="tacgia">{f["author"]}</div>')

    elif p == "tcd":
        # list-content markup (tapchidientu.py:121-146)
        if f["title"] is not None:
            parts.append(f'<h1 class="detail-title">{f["title"]}</h1>')
        parts.append(
            f'<div class="detail-intro"><p class="caption">{f["description"]}</p></div>'
        )
        parts.append(f'<div class="datetimeup">{f["date_raw"]}</div>')
        parts.append('<div id="main-detail">')
        for i, para in enumerate(paras):
            parts.append(f"<p>{para}</p>")
            for src in img_by_pos.get(i, []):
                parts.append(f'<img src="{src}"/>')
        # right-aligned decoy WITHOUT strong after the author line: the
        # reversed scan must skip it and land on the strong one
        parts.append(f'<p style="text-align: right;"><strong>{f["author"]}</strong></p>')
        parts.append('<p style="text-align: right;">Nguồn: VietQ</p>')
        parts.append("</div>")

    elif p == "tta":
        # first-h1 markup (tapchitoaan.py:118-142): a second h1 after the
        # real one pins select_one("h1") = first-wins
        if f["title"] is not None:
            parts.append(f"<h1>{f['title']}</h1>")
            parts.append("<h1>Chuyên mục Tòa án</h1>")
        parts.append(f'<h5 class="short-desc">{f["description"]}</h5>')
        parts.append(
            f'<div class="post-meta"><span>{f["date_raw"]}</span>'
            "<span>Tòa án nhân dân</span></div>"
        )
        parts.append(f'<span class="author">{f["author"]}</span>')
        parts.append('<div class="post-entry">')
        for i, para in enumerate(paras):
            parts.append(f"<p>{para}</p>")
            for src in img_by_pos.get(i, []):
                parts.append(f'<img src="{src}"/>')
                if h % 3 == 0:
                    # duplicate src — the keep-first dedup (:136) drops it
                    parts.append(f'<img src="{src}"/>')
        parts.append("</div>")

    elif p == "bdu":
        # div-title markup (baodautu.py:122-136); post-time carries the
        # ' - ' decorations strip(' -') shears off
        if f["title"] is not None:
            parts.append(f'<div class="title-detail">{f["title"]}</div>')
        parts.append(f'<a class="author">{f["author"]}</a>')
        parts.append(f'<span class="post-time"> - {f["date_raw"]} - </span>')
        parts.append(f'<div class="sapo_detail">{f["description"]}</div>')
        parts.append('<div id="content_detail_news">')
        for i, para in enumerate(paras):
            parts.append(f"<p>{para}</p>")
            if i == 0 and h % 5 == 0:
                parts.append("<p></p>")  # empty entry KEPT (no filter)
            for src in img_by_pos.get(i, []):
                parts.append(f'<img src="{src}"/>')
        parts.append("</div>")

    elif p == "pnm":
        # itemprop markup (phunumoi.py:115-130): 1-in-7 articles drop the
        # author paragraph — the unguarded .get_text() crash-drops the
        # whole article, title and all
        if f["title"] is not None:
            parts.append(f'<h1 class="articleTitle">{f["title"]}</h1>')
        parts.append(f'<div class="articleShortDesc mt10">{f["description"]}</div>')
        parts.append(f'<time class="articleTimePosted">{f["date_raw"]}</time>')
        parts.append('<div itemprop="articleBody">')
        for i, para in enumerate(paras):
            parts.append(f"<p>{para}</p>")
            if i == 0 and h % 5 == 0:
                parts.append("<p></p>")  # empty entry KEPT (no filter)
            for src in img_by_pos.get(i, []):
                parts.append(f'<img src="{src}"/>')
        if h % 2 == 0:
            # srcless lazyload decoy ('src' in attrs check, :127)
            parts.append('<img class="lazyload" data-note="no-src"/>')
        parts.append("</div>")
        if h % 7 != 0:
            parts.append(f'<p class="author-news">{f["author"]}</p>')

    elif p == "vtc":
        # header-h1 + first-h2 markup (vtcnews.py:155-175)
        parts.append('<header class="mb5">')
        if f["title"] is not None:
            parts.append(f"<h1>{f['title']}</h1>")
        parts.append("</header>")
        parts.append(f"<h2>{f['description']}</h2>")
        parts.append(f'<span class="time-update">{f["date_raw"]}</span>')
        parts.append('<div class="edittor-content">')
        for i, para in enumerate(paras):
            parts.append(f"<p>{para}</p>")
            for src in img_by_pos.get(i, []):
                parts.append(
                    f'<figure class="expNoEdit"><img data-src="{src}"/></figure>'
                )
            if i == 1 and h % 3 == 0:
                # bare src img — the data-src figure selector skips it
                parts.append(f'<img src="https://img.{host}/inline-ad.jpg"/>')
        parts.append("</div>")
        if h % 3 != 0:
            parts.append(f'<div class="author-make"><span>{f["author"]}</span></div>')
        # else: no author block -> '' (vtcnews.py:174-175)

    elif p == "cgl":
        # longform-header markup (congly.py:126-160)
        if f["title"] is not None:
            parts.append(
                f'<h1 class="sc-longform-header-title block-sc-title">{f["title"]}</h1>'
            )
        parts.append(
            f'<p class="sc-longform-header-sapo block-sc-sapo">{f["description"]}</p>'
        )
        parts.append(
            f'<span class="sc-longform-header-date block-sc-publish-time">'
            f'{f["date_raw"]}</span>'
        )
        if h % 4 != 0:
            parts.append(
                f'<span class="sc-longform-header-author block-sc-author">'
                f'{f["author"]}</span>'
            )
        parts.append('<div class="entry entry-no-padding">')
        for i, para in enumerate(paras):
            parts.append(f"<p>{para}</p>")
            if i == 0 and h % 5 == 0:
                parts.append("<p></p>")  # empty entry KEPT (no filter)
            for src in img_by_pos.get(i, []):
                parts.append(f'<figure><img src="{src}"/></figure>')
        if h % 2 == 1:
            parts.append(f'<img src="https://img.{host}/footer-decoy.jpg"/>')
        parts.append("</div>")

    elif p == "ctg":
        # p+strong double-walk markup (congthuong.py:128-149): a hash-gated
        # NESTED strong pins the find_all(["p","strong"]) double-count
        if f["title"] is not None:
            parts.append(f'<h1 class="article-detail-title f5">{f["title"]}</h1>')
        parts.append(f'<div class="article-detail-desc">{f["description"]}</div>')
        parts.append(f'<span class="format_time">{f["date_raw"]}</span>')
        parts.append('<div id="articleBody" itemprop="articleBody">')
        for i, para in enumerate(paras):
            if i == 1 and h % 3 == 0:
                # nested strong: its text appears in the p AND standalone
                lead = para.split(" ", 1)
                parts.append(
                    f"<p><strong>{lead[0]}</strong>"
                    f"{' ' + lead[1] if len(lead) > 1 else ''}</p>"
                )
            else:
                parts.append(f"<p>{para}</p>")
            if (h >> (i % 16)) % 5 == 0:
                sub = _sentence(cfg, f"ctgsub|{cu}|{i}", 3)
                parts.append(f"<strong>{sub}</strong>")  # standalone subhead
            for src in img_by_pos.get(i, []):
                parts.append(f'<img src="{src}"/>')
        parts.append("</div>")
        parts.append(f'<div class="article-detail-author clearfix">{f["author"]}</div>')

    elif p == "btv":
        # two-part-date markup (baotaichinhvietnam.py:121-145)
        if f["title"] is not None:
            parts.append(f'<h1 class="post-title">{f["title"]}</h1>')
        tier = h % 3
        if tier == 0:
            parts.append(f'<h2 class="author-title">{f["author"]}</h2>')
        elif tier == 1:
            # empty h2 -> the get_text(strip=True) falsy check falls back
            parts.append('<h2 class="author-title"> </h2>')
            parts.append(f'<div class="post-author">{f["author"]}</div>')
        # tier 2: neither -> author None
        parts.append(f'<div class="post-desc">{f["description"]}</div>')
        hh, mm_ = (h >> 40) % 24, (h >> 46) % 60
        parts.append(
            f'<span class="article-publish-time"><span class="format_time">'
            f"{hh:02d}:{mm_:02d}</span> <span class=\"format_date\">"
            f'{f["date_raw"]}</span></span>'
        )
        parts.append('<div class="post-content">')
        for i, para in enumerate(paras):
            parts.append(f"<p>{para}</p>")
            if i == 0 and h % 5 == 0:
                parts.append("<p></p>")  # empty entry KEPT (no filter)
            for src in img_by_pos.get(i, []):
                parts.append(f'<img src="{src}"/>')
        parts.append("</div>")

    elif p == "qlt":
        # MASTERCMS markup (quanlythitruong.py:118-146)
        if f["title"] is not None:
            parts.append(f'<h1 class="article-detail-title f0">{f["title"]}</h1>')
        parts.append(f'<div class="article-detail-desc f0">{f["description"]}</div>')
        parts.append(f'<span class="format_time">{f["date_raw"]}</span>')
        if h % 3 == 0:
            parts.append(f'<span class="article-publisher lt">{f["author"]}</span>')
        parts.append('<div class="__MASTERCMS_CONTENT fw lt mb clearfix">')
        for i, para in enumerate(paras):
            parts.append(f"<p>{para}</p>")
            for src in img_by_pos.get(i, []):
                parts.append(f'<img src="{src}"/>')
        if h % 3 != 0:
            # right-p author path: an empty right-p decoy AFTER the real
            # one exercises the nonempty filter in the reversed scan
            parts.append(f'<p style="text-align: right;">{f["author"]}</p>')
            parts.append('<p style="text-align: right;"> </p>')
        parts.append("</div>")

    elif p == "tdn":
        # noidung-h2 markup (taichinhdoanhnghiep.py:120-139); 1/11 articles
        # miss the blockquote cite -> crash-drop
        parts.append('<article class="article"><div class="meta">TCDN</div>')
        if f["title"] is not None:
            parts.append(f"<h1>{f['title']}</h1>")
        parts.append("</article>")
        parts.append(f'<span class="bx-time lt">{f["date_raw"]}</span>')
        parts.append('<div id="noidung">')
        # the h2 description carries raw whitespace the parser normalizes
        parts.append(f"<h2>  {f['description']}\n </h2>")
        for i, para in enumerate(paras):
            parts.append(f"<p>{para}</p>")
            if i == 0 and h % 5 == 0:
                parts.append("<p></p>")  # empty entry KEPT (no filter)
            for src in img_by_pos.get(i, []):
                parts.append(f'<img src="{src}"/>')
        parts.append("</div>")
        if h % 11 != 0:
            parts.append(
                f'<blockquote class="blockquote-reverse"><cite>{f["author"]}'
                "</cite></blockquote>"
            )

    elif p == "thc":
        # justify-filter markup (thuonghieucongluan.py:117-133): only the
        # justify-styled paragraphs count; a style-less decoy is skipped;
        # the date span carries the bi-clock icon token
        if f["title"] is not None:
            parts.append(
                f'<h1 class="page-title mb-3"><a href="{cu}">{f["title"]}</a></h1>'
            )
        parts.append(f'<span class="item">bi-clock {f["date_raw"]}</span>')
        parts.append(f'<div class="article-sapo strong">{f["description"]}</div>')
        parts.append('<div class="article-body" id="content_detail">')
        for i, para in enumerate(paras):
            parts.append(f'<p style="text-align: justify;">{para}</p>')
            if i == 0 and h % 3 == 0:
                parts.append("<p>Quảng cáo không justify.</p>")  # skipped
            for src in img_by_pos.get(i, []):
                parts.append(f'<img src="{src}"/>')
        theo = "Theo " if h % 2 == 0 else ""
        parts.append(f'<p style="text-align: right;">{theo}{f["author"]}</p>')
        parts.append("</div>")

    elif p == "tgd":
        # heading-ul-date markup (tapchigiaoduc.py:114-133)
        if f["title"] is not None:
            parts.append(f'<h1 class="page-title">{f["title"]}</h1>')
        parts.append(f'<div class="news-sapo strong">{f["description"]}</div>')
        parts.append(
            '<div class="news-heading"><ul class="list-unstyled list-inline">'
            f'<li class="list-inline-item">{f["date_raw"]}</li>'
            '<li class="list-inline-item">Giáo dục</li></ul>'
        )
        parts.append("</div>")
        parts.append('<div class="news-content detail" id="news-detail">')
        for i, para in enumerate(paras):
            parts.append(f"<p>{para}</p>")
            if i == 0 and h % 4 == 0:
                parts.append("<p>  </p>")  # blank fragment -> dropped
            for src in img_by_pos.get(i, []):
                parts.append(f'<img src="{src}"/>')
        if h % 3 == 0:
            parts.append(f'<p align="right">{f["author"]}</p>')  # ALIGN attr
        parts.append("</div>")

    elif p == "bxd":
        # data-role one-shot markup (baoxaydung.py:128-152)
        if f["title"] is not None:
            parts.append(f'<h1 class="title detail-title">{f["title"]}</h1>')
        parts.append(f'<h3 class="text detail-sapo">{f["description"]}</h3>')
        parts.append(f'<span data-role="publishdate">{f["date_raw"]} |</span>')
        parts.append('<div class="detail-cmain">')
        for i, para in enumerate(paras):
            parts.append(f"<p>{para}</p>")
            for src in img_by_pos.get(i, []):
                parts.append(f'<img src="{src}"/>')
        parts.append("</div>")
        parts.append(
            '<div class="detail-author-flex"><span class="ava">A</span>'
            f'<a class="name" href="#pv">{f["author"]} -</a></div>'
        )

    elif p == "skd":
        # data-role + data-original markup (suckhoedoisong.py:129-160)
        if f["title"] is not None:
            parts.append(
                f'<h1 class="detail-title" data-role="title">{f["title"]}</h1>'
            )
        parts.append(
            f'<h2 class="detail-sapo" data-role="sapo">{f["description"]}</h2>'
        )
        parts.append(
            f'<span class="publish-date" data-role="publishdate">'
            f'{f["date_raw"]} |</span>'
        )
        parts.append(
            '<div class="detail-content afcbc-body" data-role="content">'
        )
        for i, para in enumerate(paras):
            parts.append(f"<p>{para}</p>")
            for src in img_by_pos.get(i, []):
                if stable_hash(f"skdimg|{src}", cfg.seed) % 2 == 0:
                    parts.append(f'<img data-original="{src}"/>')
                else:
                    parts.append(f'<img src="{src}"/>')
            if i == 1 and h % 3 == 0:
                parts.append('<img src="/static/pixel.gif"/>')  # non-http: dropped
        parts.append("</div>")
        if h % 4 != 0:
            parts.append(
                f'<div class="detail-author" data-role="author">{f["author"]}</div>'
            )

    elif p == "bvh":
        # no-separator markup (baovanhoa.py:184-199): .text concatenates
        # paragraphs with NO joiner
        if f["title"] is not None:
            parts.append(f'<h1 class="detail__title">{f["title"]}</h1>')
        parts.append(f'<h2 class="detail__summary">{f["description"]}</h2>')
        parts.append(f"<time>{f['date_raw']}</time>")
        parts.append(f'<span class="detail__author">{f["author"]}</span>')
        parts.append('<div class="detail__content">')
        for i, para in enumerate(paras):
            parts.append(f"<p>{para}</p>")
            for src in img_by_pos.get(i, []):
                parts.append(f'<img src="{src}"/>')
        parts.append("</div>")

    elif p == "tnm":
        # span-decompose markup (tainguyenvamoitruong.py:117-143): the
        # descDetail carries a span icon the parser must decompose; 1/3 of
        # articles route the author through the right-styled tail paragraph
        if f["title"] is not None:
            parts.append(f'<h2 class="headingDetail">{f["title"]}</h2>')
        parts.append(
            f'<p class="descDetail"><span class="icon-cal">15/3</span>'
            f'{f["description"]}</p>'
        )
        parts.append(f'<span class="time icon-time">{f["date_raw"]}</span>')
        parts.append('<div class="html-content">')
        for i, para in enumerate(paras):
            parts.append(f"<p>{para}</p>")
            for src in img_by_pos.get(i, []):
                # relative src exercises the urljoin path
                if stable_hash(f"tnmimg|{src}", cfg.seed) % 2 == 0 and \
                        src.startswith(f"https://{host}/"):
                    parts.append(f'<img src="{src[len("https://" + host):]}"/>')
                else:
                    parts.append(f'<img src="{src}"/>')
        parts.append(f'<p style="text-align: right;">{f["author"]}</p>')
        parts.append("</div>")

    elif p == "kth":
        # justify-lambda p+div markup (kienthuc.py:165-185): content blocks
        # are p OR div styled justify; unstyled decoys skipped; title via
        # get_text() with NO strip
        if f["title"] is not None:
            t = f["title"] + (" " if h % 4 == 0 else "")
            parts.append(f'<h1 class="cms-title">{t}</h1>')
        parts.append(f'<h2 class="sapo cms-desc">{f["description"]}</h2>')
        parts.append(f"<time>{f['date_raw']}</time>")
        parts.append('<div id="abody">')
        for i, para in enumerate(paras):
            tag = "div" if (h >> (i % 16)) % 3 == 0 else "p"
            parts.append(
                f'<{tag} style="text-align: justify;">{para}</{tag}>'
            )
            if i == 0 and h % 3 == 0:
                parts.append("<p>Đề xuất cho bạn.</p>")  # style-less: skipped
            for src in img_by_pos.get(i, []):
                parts.append(f'<img src="{src}"/>')
        parts.append("<!--abody-end--></div>")
        parts.append(f'<span class="name">{f["author"]}</span>')

    elif p == "bhq":
        # breadcrumb-date markup (baohaiquanvietnam.py:116-146): the date
        # hides in a breadcrumb anchor matching dd/mm/yyyy hh:mm:ss;
        # caption paragraphs are skipped from the content
        if f["title"] is not None:
            parts.append(f'<h1 class="title-news-detail-left">{f["title"]}</h1>')
        parts.append(
            f'<div class="que_news"><p><strong>{f["description"]}</strong></p></div>'
        )
        hh, mm_ = (h >> 40) % 24, (h >> 46) % 60
        bc_date = f"{(h >> 16) % 28 + 1:02d}/{(h >> 8) % 12 + 1:02d}/{2022 + h % 4} {hh:02d}:{mm_:02d}:00"
        parts.append(
            '<ol class="breadcrumb"><li><a href="/">Trang chủ</a></li>'
            f'<li><a href="/chuyen-muc">Chuyên mục</a></li>'
            f'<li><a href="#t">{bc_date}</a></li></ol>'
        )
        parts.append('<div class="content_news">')
        for i, para in enumerate(paras):
            parts.append(f"<p>{para}</p>")
            for src in img_by_pos.get(i, []):
                # caption paragraph: img + caption text, SKIPPED from content
                parts.append(f'<p><img src="{src}"/>Ảnh: tư liệu</p>')
        if h % 3 == 0:
            parts.append(f'<p style="text-align: right;">{f["author"]}</p>')
        parts.append("</div>")

    else:
        raise ValueError(p)
    parts.append("</body></html>")
    return "".join(parts)


def fetch(cfg: WebConfig, url: str) -> str:
    """The network: URL -> HTML.  Pure, deterministic, executor-local."""
    host = url.split("/")[2] if url.startswith("http") else None
    if host is None:
        raise ValueError(f"relative URL reached fetch: {url}")
    if url.endswith("/robots.txt"):
        return robots_txt(cfg, host)
    if is_article_url(url):
        return render_article_html(cfg, host, url)
    # listing: recover (type_id, page) from the URL
    type_id, page = parse_listing_url(cfg, host, url)
    return render_listing_html(cfg, host, type_id, page)


def is_article_url(url: str) -> bool:
    # mirrors the reference's article-vs-listing routing regex
    # (app/crawl_request.py:54): r"\d{6,}.html$"
    import re

    return re.search(r"\d{6,}\.html$", url) is not None


def parse_listing_url(cfg: WebConfig, host: str, url: str) -> tuple[int, int]:
    """Invert listing_url: recover (type_id, page)."""
    import re

    spec = cfg.spec(host)
    path = url.split(host, 1)[1]
    if spec.one_shot:
        m = re.search(r"-(\d+)$", path)
        return int(m.group(1)), 1
    kind = PAGINATION[spec.profile]
    if kind == "suffix-p":
        m = re.search(r"-(\d+)-p(\d+)$", path)
        return int(m.group(1)), int(m.group(2))
    if kind == "trang-htm":
        m = re.search(r"-(\d+)/trang-(\d+)\.htm$", path)
        return int(m.group(1)), int(m.group(2))
    if kind == "brsr-offset":
        m = re.search(r"-(\d+)\?BRSR=(\d+)$", path)
        return int(m.group(1)), int(m.group(2)) // 20 + 1
    if kind == "page0":
        m = re.search(r"-(\d+)-page(\d+)$", path)
        return int(m.group(1)), int(m.group(2)) + 1
    if kind == "aspx-page":
        m = re.search(r"-(\d+)\.aspx\?Page=(\d+)$", path)
        return int(m.group(1)), int(m.group(2))
    if kind == "loadmore":
        m = re.search(r"-(\d+)/trang-(\d+)/loadmore$", path)
        return int(m.group(1)), int(m.group(2))
    if kind == "cond-first":
        m = re.search(r"-(\d+)/$", path)
        if m:
            return int(m.group(1)), 1
        m = re.search(r"-(\d+)/p(\d+)$", path)
        return int(m.group(1)), int(m.group(2))
    if kind == "slug-p":
        m = re.search(r"-(\d+)/p(\d+)$", path)
        return int(m.group(1)), int(m.group(2))
    if kind == "p-slash":
        m = re.search(r"-(\d+)/p/(\d+)$", path)
        return int(m.group(1)), int(m.group(2))
    if kind == "htm-trang":
        m = re.search(r"-(\d+)\.htm\?trang=(\d+)$", path)
        return int(m.group(1)), int(m.group(2))
    if kind == "slash-qtrang":
        m = re.search(r"-(\d+)/\?trang=(\d+)$", path)
        return int(m.group(1)), int(m.group(2))
    if kind == "hashtag-page":
        m = re.search(r"/hashtag/.*-(\d+)/page-(\d+)$", path)
        return int(m.group(1)), int(m.group(2))
    if kind == "qpage":
        m = re.search(r"-(\d+)/\?page=(\d+)$", path)
        return int(m.group(1)), int(m.group(2))
    if kind == "qmark-page":
        m = re.search(r"-(\d+)\?page=(\d+)$", path)
        return int(m.group(1)), int(m.group(2))
    if kind == "trang-html":
        m = re.search(r"-(\d+)/trang-(\d+)\.html$", path)
        return int(m.group(1)), int(m.group(2))
    if kind == "brsr-cond":
        m = re.search(r"-(\d+)&s_cond=&BRSR=(\d+)$", path)
        return int(m.group(1)), int(m.group(2))
    if kind == "trang-plain":
        m = re.search(r"-(\d+)/trang-(\d+)$", path)
        return int(m.group(1)), int(m.group(2))
    if kind == "cate-page":
        m = re.search(r"/cate/.*-(\d+)/page/(\d+)$", path)
        return int(m.group(1)), int(m.group(2))
    if kind == "html-qpage":
        m = re.search(r"-(\d+)\.html\?page=(\d+)$", path)
        return int(m.group(1)), int(m.group(2))
    if kind == "danhmuc-qpage":
        m = re.search(r"/danh-muc/.*-(\d+)\?page=(\d+)$", path)
        return int(m.group(1)), int(m.group(2))
    raise ValueError(url)


# ---------------------------------------------------------------------------
# Dimension tables
# ---------------------------------------------------------------------------


def hosts_rows(cfg: WebConfig) -> list[dict]:
    return [
        {
            "host": s.host,
            "base_url": s.base_url,
            "parser_profile": s.profile,
            "pagination_kind": "one-shot" if s.one_shot else PAGINATION[s.profile],
            "page_cap": s.page_cap,
            "content_join": CONTENT_JOIN[s.profile],
            "emits_comments": s.profile in ("vnx", "vnn"),
            "crawl_delay_s": s.crawl_delay_s,
            "robots_disallow": list(s.robots_disallow),
            "n_types": s.n_types,
            "links_per_page": s.links_per_page,
            "max_depth": s.max_depth,
        }
        for s in cfg.hosts
    ]


def categories_rows(cfg: WebConfig) -> list[dict]:
    return [
        {"host": s.host, "type_id": t, "slug": type_slug(cfg, s.host, t)}
        for s in cfg.hosts
        for t in range(s.n_types)
    ]


def robots_txt(cfg: WebConfig, host: str) -> str:
    """robots.txt content for a host (north_rule addition; reference has none)."""
    spec = cfg.spec(host)
    lines = ["User-agent: *"]
    lines += [f"Disallow: {p}" for p in spec.robots_disallow]
    lines.append(f"Crawl-delay: {spec.crawl_delay_s}")
    return "\n".join(lines)
