"""Listing-URL synthesis as a column expression (F2 pagination templates).

One expression covers every pagination kind the reference exhibits
(vnexpress.py:255 suffix-p, dantri.py:303 trang-htm, congthuong.py:198
BRSR offset, vietnamnet.py:220 page0, dangcongsan.py:188 aspx,
baothanhtra.py:210 loadmore, taichinhdoanhnghiep.py:182-184 conditional
first page, baoxaydung.py:196 one-shot).  Used by both the wave-0 seed and
the per-wave next-listing-batch expansion so URL construction happens
executor-side — no O(hosts x types x pages) driver loops anywhere.

Must stay byte-identical to sources/hostsim.listing_url (asserted in
tests/test_parse_profiles.py and the seed-equality pytest).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def listing_url_expr(host: Column, slug: Column, pag_kind: Column,
                     page_no: Column) -> Column:
    pg = page_no.cast("string")
    brsr = (20 * (page_no - 1)).cast("string")
    pg0 = (page_no - 1).cast("string")
    base = F.concat(F.lit("https://"), host, F.lit("/"), slug)
    # an unknown kind must FAIL LOUDLY, not emit NULL URLs into the
    # frontier — raise_error in the otherwise branch (r04: seven kinds were
    # silently NULL here while fetch re-derived URLs from (host,type,page))
    return (
        F.when(pag_kind == "one-shot", base)
        .when(pag_kind == "suffix-p", F.concat(base, F.lit("-p"), pg))
        .when(pag_kind == "trang-htm",
              F.concat(base, F.lit("/trang-"), pg, F.lit(".htm")))
        .when(pag_kind == "brsr-offset", F.concat(base, F.lit("?BRSR="), brsr))
        .when(pag_kind == "page0", F.concat(base, F.lit("-page"), pg0))
        .when(pag_kind == "aspx-page", F.concat(base, F.lit(".aspx?Page="), pg))
        .when(pag_kind == "loadmore",
              F.concat(base, F.lit("/trang-"), pg, F.lit("/loadmore")))
        .when(
            pag_kind == "cond-first",
            F.when(page_no == 1, F.concat(base, F.lit("/")))
            .otherwise(F.concat(base, F.lit("/p"), pg)),
        )
        .when(pag_kind == "slug-p", F.concat(base, F.lit("/p"), pg))
        .when(pag_kind == "p-slash", F.concat(base, F.lit("/p/"), pg))
        .when(pag_kind == "htm-trang", F.concat(base, F.lit(".htm?trang="), pg))
        .when(pag_kind == "slash-qtrang", F.concat(base, F.lit("/?trang="), pg))
        .when(
            pag_kind == "hashtag-page",
            F.concat(F.lit("https://"), host, F.lit("/hashtag/"), slug,
                     F.lit("/page-"), pg),
        )
        .when(pag_kind == "qpage", F.concat(base, F.lit("/?page="), pg))
        .when(pag_kind == "qmark-page", F.concat(base, F.lit("?page="), pg))
        .when(pag_kind == "trang-html",
              F.concat(base, F.lit("/trang-"), pg, F.lit(".html")))
        .when(pag_kind == "brsr-cond",
              F.concat(base, F.lit("&s_cond=&BRSR="), pg))
        .when(pag_kind == "trang-plain", F.concat(base, F.lit("/trang-"), pg))
        .when(
            pag_kind == "cate-page",
            F.concat(F.lit("https://"), host, F.lit("/cate/"), slug,
                     F.lit("/page/"), pg),
        )
        .when(pag_kind == "html-qpage",
              F.concat(base, F.lit(".html?page="), pg))
        .when(
            pag_kind == "danhmuc-qpage",
            F.concat(F.lit("https://"), host, F.lit("/danh-muc/"), slug,
                     F.lit("?page="), pg),
        )
        .otherwise(
            F.raise_error(F.concat(F.lit("unknown pagination kind: "), pag_kind))
        )
    )
