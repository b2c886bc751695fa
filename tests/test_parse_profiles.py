"""Golden-fixture tests for the per-profile parsers (handwritten HTML).

These anchor the parse spec independently of the generator: each reference
quirk (author pop, sentinels, set-dedup, all-or-nothing, absolutization,
data:-URI skip, comment defaults) is pinned on crafted input.
"""

from crawler_news_spark.functions.parse_profiles import parse_article, parse_listing

BASE = "https://x.example.vn"


def art(body: str, title: str | None = "Tựa đề", desc: str | None = "Mô tả x",
        date: str | None = "04/10/2024, 16:40 (GMT+7)", author: str | None = None,
        comments: list[str] | None = None) -> str:
    parts = ['<html><head><meta property="og:image" content="https://img/h.jpg"/></head><body>']
    if title is not None:
        parts.append(f'<h1 class="title-detail">{title}</h1>')
    if date is not None:
        parts.append(f'<span class="date">{date}</span>')
    if desc is not None:
        parts.append(f'<p class="description">{desc}</p>')
    if author is not None:
        parts.append(f'<div class="author-name">{author}</div>')
    parts.append(f'<article class="content-body">{body}</article>')
    if comments:
        c = "".join(f'<div class="comment_content">{x}</div>' for x in comments)
        parts.append(f'<div class="box_comment">{c}</div>')
    parts.append("</body></html>")
    return "".join(parts)


P = '<p class="Normal">{}</p>'
IMG_LAZY = '<img class="lazy" data-src="{}"/>'
IMG_SRC = '<img src="{}"/>'
IMG_ORIG = '<img data-original="{}"/>'


def test_vnx_author_pop_and_comma_join():
    body = P.format("đoạn một") + IMG_LAZY.format("https://i/1.jpg") + \
        P.format("đoạn hai") + P.format("Tác Giả Cuối")
    r = parse_article(art(body), "vnx", BASE)
    assert r["author"] == "Tác Giả Cuối"  # vnexpress.py:190-193
    assert r["content"] == "đoạn một,đoạn hai"  # "," join vnexpress.py:242
    assert r["contentImageUrls"] == ["https://i/1.jpg"]
    assert r["comments"] == [""]  # empty default [""] vnexpress.py:243
    kinds = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]]
    assert kinds == [
        ("text", "đoạn một", None, 0),
        ("text", "đoạn hai", None, 1),
        ("image", None, "https://i/1.jpg", 2),
    ]


def test_vnx_comments_collected():
    r = parse_article(art(P.format("a") + P.format("Tg"), comments=["c1", "c2"]), "vnx", BASE)
    assert r["comments"] == ["c1", "c2"]


def test_null_title_drops_all_profiles():
    html = art(P.format("x"), title=None)
    for prof in ("vnx", "dtr", "btt", "vnn"):
        assert parse_article(html, prof, BASE) is None  # base_crawler.py:53-56


def test_dtr_sentinels_and_newline_join():
    r = parse_article(art(P.format("a") + P.format("b"), desc=None, date=None), "dtr", BASE)
    assert r["description"] == "Không tìm thấy mô tả"  # dantri.py:241
    assert r["pub_date_raw"] == "Không tìm thấy ngày đăng"  # dantri.py:248
    assert r["author"] == "Không rõ tác giả"  # dantri.py:258
    assert r["content"] == "a\nb"  # "\n" join dantri.py:245
    assert r["comments"] is None and r["imageUrl"] is None  # 9-key profile


def test_btt_set_dedup_and_space_join():
    body = (
        P.format("p1") + IMG_SRC.format("https://i/b.jpg") + P.format("  ")
        + IMG_SRC.format("https://i/a.jpg") + P.format("p2")
        + IMG_SRC.format("https://i/b.jpg") + IMG_SRC.format("relative-skipped.jpg")
    )
    r = parse_article(art(body, author="AG"), "btt", BASE)
    assert r["content"] == "p1 p2"  # " " join + empty-para filter baothanhtra.py:165
    # list(set(...)) order destruction modeled as sorted-set (baothanhtra.py:163)
    assert r["contentImageUrls"] == ["https://i/a.jpg", "https://i/b.jpg"]
    assert r["author"] == "AG"
    refs = [s["media_ref"] for s in r["spans"] if s["kind"] == "image"]
    assert refs == ["https://i/a.jpg", "https://i/b.jpg"]


def test_vnn_all_or_nothing():
    assert parse_article(art(P.format("x"), desc=None), "vnn", BASE) is None
    assert parse_article(art(""), "vnn", BASE) is None  # no walk content
    assert parse_article(art(P.format("x")), "vnn", BASE) is not None


def test_vnn_absolutize_and_data_uri_skip():
    body = (
        P.format("x") + IMG_SRC.format("/media/1.jpg")
        + IMG_ORIG.format("https://cdn/2.jpg") + IMG_SRC.format("data:image/png;base64,xx")
    )
    r = parse_article(art(body), "vnn", BASE)
    assert r["contentImageUrls"] == [f"{BASE}/media/1.jpg", "https://cdn/2.jpg"]
    assert r["comments"] == []  # vnn default [] (vietnamnet.py:208)
    assert r["author"] == ""  # missing author box -> "" (vietnamnet.py:169)


def test_listing_parse_order_and_terminal():
    html = (
        "<html><body><div class='list-news'>"
        '<h3 class="title-news"><a href="/a/1.html">x</a></h3>'
        '<h3 class="title-news"><a href="https://h/b/2.html">y</a></h3>'
        "</div></body></html>"
    )
    links, term = parse_listing(html)
    assert links == ["/a/1.html", "https://h/b/2.html"] and not term
    links2, term2 = parse_listing("<html><body><!--one-shot-->" + html[12:])
    assert term2


def test_btu_decompose_and_figure_images():
    """share/script blocks are decomposed before get_text; images come only
    from figure.image wrappers (baotintuc.py:185-199)."""
    html = (
        '<html><head><meta property="og:image" content="https://x/h.jpg"/></head><body>'
        '<h1 class="title-detail">Tít</h1><span class="date">1/2/2023 10:00</span>'
        '<p class="description">Mô tả</p><div class="author-name">Tác Giả</div>'
        '<article class="content-body">'
        '<p class="Normal">Đoạn một.</p>'
        '<div class="share"><p class="Normal">Chia sẻ decoy</p>'
        '<img src="https://img/share-decoy.jpg"/></div>'
        '<script>var t = "noise";</script>'
        '<figure class="image"><img src="https://img/a.jpg"/></figure>'
        '<p class="Normal">Đoạn hai.</p>'
        "</article></body></html>"
    )
    rec = parse_article(html, "btu", "https://h")
    assert rec["content"] == "Đoạn một.\nĐoạn hai."  # decoy text decomposed
    assert rec["contentImageUrls"] == ["https://img/a.jpg"]  # decoy img gone
    assert rec["author"] == "Tác Giả"


def test_thp_style_author_and_prefix_exclusion():
    """Author via style-attr match; paragraphs starting with the marker are
    excluded; content keeps the reference's trailing newline
    (thuonghieuvaphapluat.py:125-139)."""
    html = (
        '<html><body><h1 class="title-detail">Tít</h1>'
        '<span class="date">1/2/2023 10:00</span><p class="description">Mô tả</p>'
        '<article class="content-body">'
        '<p class="Normal">Nội dung chính.</p>'
        '<p class="Normal">Văn Nam - thông tin tòa soạn</p>'
        '<p style="text-align: right; float: right;">Phóng Viên X</p>'
        "</article></body></html>"
    )
    rec = parse_article(html, "thp", "https://h")
    assert rec["content"] == "Nội dung chính.\n"
    assert rec["author"] == "Phóng Viên X"
    assert rec["span_texts"] == ["Nội dung chính."]


def test_bdt_title_from_attribute():
    """Title from the h1 attribute, author from span.author-name
    (baodantoc.py:141-144); missing attribute-title drops the page."""
    html = (
        '<html><body><h1 class="news-title" title="Tiêu đề thật">Chi tiết</h1>'
        '<span class="date">1/2/2023 10:00</span><p class="description">Mô tả</p>'
        '<span class="author-name">Bút Danh</span>'
        '<article class="content-body"><p class="Normal">Đoạn.</p></article>'
        "</body></html>"
    )
    rec = parse_article(html, "bdt", "https://h")
    assert rec["title"] == "Tiêu đề thật"  # not the visible element text
    assert rec["author"] == "Bút Danh"
    # no attribute-form h1 -> dropped even with a title-detail h1 present
    assert parse_article(html.replace('news-title" title="Tiêu đề thật"',
                                      'title-detail"'), "bdt", "https://h") is None


def test_vnn_hero_chain_and_srcset():
    """img.img-content outranks og:image; picture>source data-srcset yields
    its first candidate (vietnamnet.py:136-157)."""
    base = (
        '<html><head><meta property="og:image" content="https://img/og.jpg"/></head>'
        '<body><h1 class="title-detail">Tít</h1><span class="date">d</span>'
        '<p class="description">Mô tả</p>{hero}'
        '<article class="content-body"><p class="Normal">Đoạn.</p>'
        '<picture><source data-srcset="https://img/pic1.jpg 1x, https://img/pic2.jpg 2x"/>'
        '<img class="pic"/></picture>'
        "</article></body></html>"
    )
    with_inline = base.format(hero='<img class="img-content" src="https://img/inline.jpg"/>')
    rec = parse_article(with_inline, "vnn", "https://h")
    assert rec["imageUrl"] == "https://img/inline.jpg"
    assert rec["contentImageUrls"] == ["https://img/pic1.jpg"]  # first candidate
    rec2 = parse_article(base.format(hero=""), "vnn", "https://h")
    assert rec2["imageUrl"] == "https://img/og.jpg"  # falls back to og:image


def test_new_pagination_urls_roundtrip():
    """loadmore (baothanhtra.py:210) and conditional first page
    (taichinhdoanhnghiep.py:182-184) invert exactly."""
    from crawler_news_spark.sources import hostsim as hs

    web = hs.default_web()
    for host, pages in (("btu1.example.vn", (1, 2, 5)), ("thp1.example.vn", (1, 2, 5))):
        for t in (0, 1):
            for p in pages:
                u = hs.listing_url(web, host, t, p)
                assert hs.parse_listing_url(web, host, u) == (t, p), u
    assert hs.listing_url(web, "btu1.example.vn", 0, 3).endswith("/trang-3/loadmore")
    u1 = hs.listing_url(web, "thp1.example.vn", 0, 1)
    u2 = hs.listing_url(web, "thp1.example.vn", 0, 2)
    assert u1.endswith("/") and "/p" not in u1.rsplit("/", 2)[-2]
    assert u2.endswith("/p2")


def test_vnn_author_nested_box_chain():
    """div.article-detail-author > span.name, else first <a>, else ""
    (vietnamnet.py:169-178)."""
    tpl = (
        '<html><head><meta property="og:image" content="https://x/h.jpg"/></head>'
        '<body><h1 class="title-detail">Tít</h1><span class="date">d</span>'
        '<p class="description">Mô tả</p>{box}'
        '<article class="content-body"><p class="Normal">Đoạn.</p></article>'
        "</body></html>"
    )
    span = tpl.format(box='<div class="article-detail-author">'
                          '<span class="name">Tác Giả Span</span></div>')
    assert parse_article(span, "vnn", "https://h")["author"] == "Tác Giả Span"
    link = tpl.format(box='<div class="article-detail-author">'
                          '<a href="#p">Tác Giả Link</a></div>')
    assert parse_article(link, "vnn", "https://h")["author"] == "Tác Giả Link"
    none = tpl.format(box="")
    assert parse_article(none, "vnn", "https://h")["author"] == ""


def test_listing_article_walk_family():
    """article > first h3-or-h2 > a; headingless articles (ad slots) skipped
    (vtcnews.py:231-243)."""
    html = (
        "<html><body>"
        '<article><div class="ad-slot">quảng cáo</div></article>'
        '<article><h3><a href="https://h/x/bai-viet-1000001.html">a</a></h3></article>'
        '<article><h2><a href="https://h/x/bai-viet-1000002.html">b</a></h2></article>'
        "</body></html>"
    )
    links, term = parse_listing(html)
    assert links == [
        "https://h/x/bai-viet-1000001.html",
        "https://h/x/bai-viet-1000002.html",
    ] and not term


def test_listing_http_filter_set_dedup_family():
    """div.list-news-category article a[href]: http(s)-only + first-occurrence
    dedup (quandoinhandan.py:198-202)."""
    html = (
        '<html><body><div class="list-news-category">'
        '<article><a href="javascript:void(0)">xem thêm</a></article>'
        '<article><a href="https://h/a/bai-viet-1000001.html">a</a></article>'
        '<article><a href="#top">đầu trang</a></article>'
        '<article><a href="https://h/a/bai-viet-1000002.html">b</a></article>'
        '<article><a href="https://h/a/bai-viet-1000001.html">a-dup</a></article>'
        "</div></body></html>"
    )
    links, _ = parse_listing(html)
    assert links == [
        "https://h/a/bai-viet-1000001.html",
        "https://h/a/bai-viet-1000002.html",
    ]


def test_listing_multi_class_family():
    """Any of the three title classes matches; off-class titles don't
    (vietnamnet.py:227-231)."""
    html = (
        "<html><body>"
        '<h3 class="horizontalPost__main-title"><a href="/a/bai-viet-1000001.html">a</a></h3>'
        '<h3 class="vnn-title"><a href="/a/bai-viet-1000002.html">b</a></h3>'
        '<h3 class="title-bold"><a href="/a/bai-viet-1000003.html">c</a></h3>'
        '<h3 class="other-title"><a href="/khuyen-mai/uu-dai">decoy</a></h3>'
        "</body></html>"
    )
    links, _ = parse_listing(html)
    assert links == [
        "/a/bai-viet-1000001.html",
        "/a/bai-viet-1000002.html",
        "/a/bai-viet-1000003.html",
    ]


def test_listing_newstitle_div_family():
    """div.categoryListItem container, div.newsTitle > a
    (congnghevadoisong.py:193-201)."""
    html = (
        '<html><body><div class="categoryListItem category_2">'
        '<div class="newsTitle"><a href="https://h/c/bai-viet-1000009.html">x</a></div>'
        '<div class="newsTitle"><a href="https://h/c/bai-viet-1000010.html">y</a></div>'
        "</div></body></html>"
    )
    links, _ = parse_listing(html)
    assert links == [
        "https://h/c/bai-viet-1000009.html",
        "https://h/c/bai-viet-1000010.html",
    ]


def test_cnd_style_lambda_desc_and_skip_first_paragraph():
    """cnd family: description matched only by the style containing BOTH
    bold and justify; content drops the first paragraph (it repeats the
    description); author defaults to "" (congnghevadoisong.py:116-130)."""
    html = (
        '<html><body><h1 class="postTitle">Tít CND</h1>'
        '<span class="newsDate">1/2/2023 10:00</span>'
        '<p style="text-align: justify;">Decoy chỉ justify.</p>'
        '<p style="font-weight: bold; text-align: justify;">Mô tả đậm</p>'
        '<div class="postRickText">'
        '<p class="Normal">Mô tả đậm</p>'
        '<p class="Normal">Đoạn một.</p>'
        '<img src="https://img/c1.jpg"/>'
        '<p class="Normal">Đoạn hai.</p>'
        "</div></body></html>"
    )
    rec = parse_article(html, "cnd", "https://h")
    assert rec["description"] == "Mô tả đậm"
    assert rec["content"] == "Đoạn một.\nĐoạn hai."  # first para skipped
    assert rec["contentImageUrls"] == ["https://img/c1.jpg"]
    assert rec["author"] == ""  # no span.link-source-text-name
    assert rec["pub_date_raw"] == "1/2/2023 10:00"
    with_author = html.replace(
        "</body>", '<span class="link-source-text-name">PV CND</span></body>'
    )
    assert parse_article(with_author, "cnd", "https://h")["author"] == "PV CND"
    # null guard: no h1.postTitle -> dropped
    assert parse_article(html.replace("postTitle", "other"), "cnd", "https://h") is None


def test_cnd_pagination_roundtrip():
    from crawler_news_spark.sources import hostsim as hs

    web = hs.default_web()
    for p in (1, 2, 7):
        u = hs.listing_url(web, "cnd1.example.vn", 1, p)
        assert u.endswith(f"/p{p}")
        assert hs.parse_listing_url(web, "cnd1.example.vn", u) == (1, p)


def test_listing_relative_only_family():
    """section.cat-listnews h2.title > a keeping ONLY '/'-prefixed hrefs —
    the absolute outbound decoy is dropped (kienthuc.py:244-253)."""
    html = (
        '<html><body><section class="cat-listnews hzol-clear">'
        '<h2 class="title"><a href="/a/bai-viet-1000001.html">x</a></h2>'
        '<h2 class="title"><a href="https://ads.example.com/sponsor">qc</a></h2>'
        '<h2 class="title"><a href="/a/bai-viet-1000002.html">y</a></h2>'
        "</section></body></html>"
    )
    links, _ = parse_listing(html)
    assert links == ["/a/bai-viet-1000001.html", "/a/bai-viet-1000002.html"]


# --- round-4 profiles (dcs, vne, ktd, tct, vdl, skc) -----------------------


def test_dcs_id_selectors_and_theo_prefix():
    """id-based selectors; img.imgtelerik only; 'Theo ' author prefix strip;
    title via get_text() WITHOUT strip (dangcongsan.py:113-141)."""
    html = (
        '<html><body><h1 id="contenttitle">Tít DCS </h1>'
        '<div id="description"> Mô tả DCS </div>'
        '<div id="ngaytao">1/2/2023 10:00</div>'
        '<div class="noidungtt">'
        "<p>Đoạn một.</p>"
        "<p> </p>"
        '<img class="imgtelerik" src="https://img/t1.jpg"/>'
        "<p>Đoạn hai.</p>"
        '<img src="https://img/banner-decoy.jpg"/>'
        "</div>"
        '<b id="tacgia">Theo Báo Nhân Dân</b></body></html>'
    )
    rec = parse_article(html, "dcs", "https://h")
    assert rec["title"] == "Tít DCS "  # get_text() keeps the trailing space
    assert rec["description"] == "Mô tả DCS"
    assert rec["content"] == "Đoạn một.\n\nĐoạn hai."  # "\n\n" + strip filter
    assert rec["contentImageUrls"] == ["https://img/t1.jpg"]  # decoy skipped
    assert rec["author"] == "Báo Nhân Dân"  # "Theo " stripped (:132-135)
    no_theo = html.replace("Theo Báo Nhân Dân", "Ban Thời sự")
    assert parse_article(no_theo, "dcs", "https://h")["author"] == "Ban Thời sự"
    assert parse_article(html.replace('id="contenttitle"', 'id="other"'),
                         "dcs", "https://h") is None


def test_vne_header_scoping():
    """All four meta fields come from header.detail__header; a decoy title
    outside the header must not resurrect a headerless page; images from
    <figure> only (vneconomy.py:117-135)."""
    html = (
        '<html><body><header class="detail__header">'
        '<div class="detail__meta">1/2/2023 10:00</div>'
        '<h1 class="detail__title">Tít VNE</h1>'
        '<h2 class="detail__summary">Mô tả VNE</h2>'
        '<div class="detail__author">Phóng Viên Kinh Tế</div>'
        "</header>"
        '<h1 class="detail__title">Tin liên quan decoy</h1>'
        '<div class="detail__content">'
        "<p>Đoạn một.</p>"
        '<figure><img src="https://img/f1.jpg"/></figure>'
        '<img src="https://img/pixel.gif"/>'
        "<p>Đoạn hai.</p>"
        "</div></body></html>"
    )
    rec = parse_article(html, "vne", "https://h")
    assert rec["title"] == "Tít VNE"
    assert rec["author"] == "Phóng Viên Kinh Tế"
    assert rec["content"] == "Đoạn một.\n\nĐoạn hai."
    assert rec["contentImageUrls"] == ["https://img/f1.jpg"]  # bare img skipped
    # titleless header -> dropped despite the decoy title outside
    headerless = html.replace('<h1 class="detail__title">Tít VNE</h1>', "")
    assert parse_article(headerless, "vne", "https://h") is None


def test_ktd_datetime_attribute_and_author_chain():
    """Date from the <time datetime> attribute; 3-tier author chain with the
    PV / word-count filters; author paragraph stays in the content
    (kinhtedouong.py:143-175)."""
    tpl = (
        '<html><body><div class="title-post">'
        '<h1 class="title">Tít KTD</h1>'
        '<time datetime="2023-02-01T10:00:00">1 giờ trước</time></div>'
        '<h2 class="sum-main">Mô tả KTD</h2>'
        '<div class="news-content">'
        "<p>Đoạn một.</p>"
        '<img src="https://img/k1.jpg"/>'
        "{author_part}"
        "</div></body></html>"
    )
    t1 = tpl.format(author_part='<p class="alignright"><strong>Tác Giả Một</strong></p>')
    r1 = parse_article(t1, "ktd", "https://h")
    assert r1["pub_date_raw"] == "2023-02-01T10:00:00"  # the ATTRIBUTE
    assert r1["author"] == "Tác Giả Một"
    assert r1["content"] == "Đoạn một.\n\nTác Giả Một"  # author line kept
    t2 = tpl.format(author_part='<p class="alignright"><em>Tác Giả Em</em></p>')
    assert parse_article(t2, "ktd", "https://h")["author"] == "Tác Giả Em"
    t3 = tpl.format(
        author_part="<p><strong>Tác Giả Ba</strong></p>"
        "<p><strong>PV</strong></p>"
        "<p><strong>GIÁ VÀNG TRONG NƯỚC HÔM NAY TĂNG MẠNH</strong></p>"
    )
    assert parse_article(t3, "ktd", "https://h")["author"] == "Tác Giả Ba"


def test_tct_sapo_drop_and_unfiltered_join():
    """Missing sapo drops the article (the re.sub(None) crash path); 'TCCT '
    prefix stripped; p AND h2 join content WITHOUT an empty filter
    (tapchicongthuong.py:123-153)."""
    html = (
        '<html><body><h1 class="post-title text-left font-playfair">Tít TCT</h1>'
        '<div class="meta-info"><span class="source"><strong>Nhà Báo T</strong></span></div>'
        '<div class="sapo title-1 mb-3">TCCT Mô tả TCT</div>'
        '<div class="post-meta"><span>1/2/2023 10:00</span><span>TCCT</span></div>'
        '<div id="post_content">'
        "<p>Đoạn một.</p>"
        "<h2>Tiểu mục</h2>"
        "<p></p>"
        '<figure><img src="https://img/t1.jpg"/><figcaption>chú thích</figcaption></figure>'
        "<p>Đoạn hai.</p>"
        '<img src="https://img/logo-decoy.png"/>'
        "</div></body></html>"
    )
    rec = parse_article(html, "tct", "https://h")
    assert rec["description"] == "Mô tả TCT"  # TCCT prefix stripped (:132)
    assert rec["author"] == "Nhà Báo T"
    # h2 joins content; empty <p></p> KEPT -> double separator (:141-143)
    assert rec["content"] == "Đoạn một.\n\nTiểu mục\n\n\n\nĐoạn hai."
    assert rec["contentImageUrls"] == ["https://img/t1.jpg"]  # figure only
    no_sapo = html.replace('<div class="sapo title-1 mb-3">TCCT Mô tả TCT</div>', "")
    assert parse_article(no_sapo, "tct", "https://h") is None  # crash-drop


def test_vdl_block_divs_and_author_box():
    """Content from direct-child <div> blocks (text then images per block),
    joined with a SINGLE newline; image-only blocks contribute images only;
    author div.author > span.name else '' (vietnamdaily.py:123-146)."""
    html = (
        '<html><body><h1 class="cms-title article-title">Tít VDL</h1>'
        '<div class="summary cms-desc">Mô tả VDL</div>'
        '<div class="meta clearfix"><time>1/2/2023 10:00</time></div>'
        '<div class="author"><span class="name">Cây Bút V</span></div>'
        '<div id="abody" class="cms-body clearfix">'
        '<div>Khối một.<img src="https://img/v1.jpg"/></div>'
        '<div><img src="https://img/v2.jpg"/></div>'
        "<div>Khối hai.</div>"
        "<!--abody-end--></div></body></html>"
    )
    rec = parse_article(html, "vdl", "https://h")
    assert rec["content"] == "Khối một.\nKhối hai."  # "\n" join, img-only block skipped
    assert rec["contentImageUrls"] == ["https://img/v1.jpg", "https://img/v2.jpg"]
    assert rec["author"] == "Cây Bút V"
    nameless = html.replace('<span class="name">Cây Bút V</span>', "Nguồn: tổng hợp")
    assert parse_article(nameless, "vdl", "https://h")["author"] == ""
    boxless = html.replace(
        '<div class="author"><span class="name">Cây Bút V</span></div>', ""
    )
    assert parse_article(boxless, "vdl", "https://h")["author"] == ""


def test_skc_pipe_description_and_author_detail():
    """Description sheared at the literal ' 03/' then '... | ' prefix strip;
    date from the section's first <li>; unfiltered "\\n\\n" p-join; author
    div.author-detail else None (suckhoecong.py:116-138)."""
    html = (
        '<html><body><section class="box-author">'
        "<h1>Tít SKC</h1>"
        '<div class="info-author">Sức khỏe cộng đồng | Mô tả SKC 03/01/2024 08:00</div>'
        "<ul><li>1/2/2023 10:00</li><li>Theo dõi trên</li></ul>"
        "</section>"
        '<div class="detail text-justify">'
        "<p>Đoạn một.</p>"
        "<p></p>"
        '<img src="https://img/s1.jpg"/>'
        "<p>Đoạn hai.</p>"
        '<div class="author-detail">BS. Hải Yến</div>'
        "<!--detail-end--></div></body></html>"
    )
    rec = parse_article(html, "skc", "https://h")
    assert rec["description"] == "Mô tả SKC"  # ' 03/' split + pipe strip
    assert rec["pub_date_raw"] == "1/2/2023 10:00"  # first <li>
    assert rec["content"] == "Đoạn một.\n\n\n\nĐoạn hai."  # empty p KEPT
    assert rec["contentImageUrls"] == ["https://img/s1.jpg"]
    assert rec["author"] == "BS. Hải Yến"
    no_author = html.replace('<div class="author-detail">BS. Hải Yến</div>', "")
    assert parse_article(no_author, "skc", "https://h")["author"] is None


def test_round4_listing_families():
    """Each new family's container scoping + decoy behavior
    (dangcongsan.py:199-209, vneconomy.py:193-209, kinhtedouong.py:231-240,
    tapchicongthuong.py:210-225, vietnamdaily.py:204-219,
    suckhoecong.py:196-207)."""
    khuvuc = (
        '<html><body><div id="KhuVuc_3">'
        '<a href="/a/bai-viet-1000001.html">x</a>'
        '<a href="/a/bai-viet-1000002.html">y</a>'
        '</div><a href="/sitemap">ngoài container</a></body></html>'
    )
    assert parse_listing(khuvuc, "khuvuc-anchors")[0] == [
        "/a/bai-viet-1000001.html", "/a/bai-viet-1000002.html"]

    vne = (
        '<html><body><div class="col-12 col-lg-9 column-border">'
        "<article><span>quảng cáo</span></article>"
        '<article><a href="/a/bai-viet-1000001.html">x</a>'
        '<a href="#comments">decoy thứ hai</a></article>'
        '<article><a href="https://h/a/bai-viet-1000002.html">y</a></article>'
        "</div><!--col-end--></body></html>"
    )
    assert parse_listing(vne, "article-first-a")[0] == [
        "/a/bai-viet-1000001.html", "https://h/a/bai-viet-1000002.html"]

    ktd = (
        '<html><body><div class="item-post"><a href="/a/bai-viet-1000001.html">x</a></div>'
        '<a href="/lien-he">ngoài item-post</a>'
        '<div class="item-post"><a href="https://h/a/bai-viet-1000002.html">y</a></div>'
        "</body></html>"
    )
    assert parse_listing(ktd, "item-post")[0] == [
        "/a/bai-viet-1000001.html", "https://h/a/bai-viet-1000002.html"]

    tct = (
        '<html><body><div class="widget-layout-1 pt-4 mb-4">'
        '<a href="/a/bai-viet-1000001.html">x</a></div>'
        '<div class="list-view">'
        '<a href="/a/bai-viet-1000002.html">y</a>'
        '<a href="/a/bai-viet-1000001.html">dup</a>'
        '<a href="https://ads.example.com/sponsor">qc</a>'
        "</div></body></html>"
    )
    assert parse_listing(tct, "two-container")[0] == [
        "/a/bai-viet-1000001.html", "/a/bai-viet-1000002.html"]

    vdl = (
        '<html><body><ul class="zone category-listing-story">'
        '<li><article><a href="/khuyen-mai">không phải story</a></article></li>'
        '<li><article class="story"><a href="/a/bai-viet-1000001.html">x</a></article></li>'
        '<li><article class="story"><a href="/a/bai-viet-1000002.html">y</a></article></li>'
        "</ul></body></html>"
    )
    assert parse_listing(vdl, "zone-story")[0] == [
        "/a/bai-viet-1000001.html", "/a/bai-viet-1000002.html"]

    skc = (
        '<html><body><div class="list-new-cate">'
        '<a class="link-title" href="https://h/a/bai-viet-1000001.html">x</a>'
        '<a href="/rss">không có class</a>'
        '<a class="link-title" href="https://h/a/bai-viet-1000002.html">y</a>'
        "</div></body></html>"
    )
    assert parse_listing(skc, "link-title")[0] == [
        "https://h/a/bai-viet-1000001.html", "https://h/a/bai-viet-1000002.html"]


def test_family_dispatch_beats_content_sniff():
    """A page mixing two families' markup parses per the HOST's registered
    family, not per whichever regex fires first (the round-3 advice item)."""
    mixed = (
        '<html><body>'
        '<h3 class="title-news"><a href="/decoy/bai-viet-1000009.html">vnx-shape</a></h3>'
        '<div id="KhuVuc_3"><a href="/a/bai-viet-1000001.html">dcs-shape</a></div>'
        "</body></html>"
    )
    assert parse_listing(mixed, "khuvuc-anchors")[0] == ["/a/bai-viet-1000001.html"]
    assert parse_listing(mixed, "h3-title-news")[0] == ["/decoy/bai-viet-1000009.html"]


def test_round4_pagination_roundtrip():
    from crawler_news_spark.sources import hostsim as hs

    web = hs.default_web()
    cases = {
        "dcs1.example.vn": ".aspx?Page=",
        "vne1.example.vn": ".htm?trang=",
        "ktd1.example.vn": "/?trang=",
        "tct1.example.vn": "/page-",
        "vdl1.example.vn": "/?page=",
        "skc1.example.vn": "/p",
        "qdn1.example.vn": "/p/",  # quandoinhandan.py:186 — fixed borrow
    }
    for host, marker in cases.items():
        for t in (0, 1):
            for p in (1, 2, 9):
                u = hs.listing_url(web, host, t, p)
                assert marker in u, (host, u)
                assert hs.parse_listing_url(web, host, u) == (t, p), u
    assert hs.listing_url(web, "tct1.example.vn", 0, 2).startswith(
        "https://tct1.example.vn/hashtag/")


# --- round-4b profiles (bvl, tcd, tta, bdu) --------------------------------


def test_bvl_split_containers_and_domain_filter():
    """Content text from div.noidung; images from the SEPARATE
    div.post-content and only own-domain srcs; description nested as
    post-summary > h2 (baovephapluat.py:139-168)."""
    html = (
        '<html><body><h1 class="post-title">Tít BVL</h1>'
        '<div class="lbPublishedDate">1/2/2023 10:00</div>'
        '<div class="post-summary"><h2>Mô tả BVL</h2></div>'
        '<div class="noidung"><p>Đoạn một.</p><p></p><p>Đoạn hai.</p></div>'
        '<div class="post-content">'
        '<img src="https://img.h.example.vn/media/1.jpg"/>'
        '<img src="https://cdn.external.example/ads/banner.jpg"/>'
        "</div>"
        '<div class="tacgia">Kiểm Sát Viên</div></body></html>'
    )
    rec = parse_article(html, "bvl", "https://h.example.vn")
    assert rec["description"] == "Mô tả BVL"
    assert rec["content"] == "Đoạn một.\n\n\n\nĐoạn hai."  # empty p KEPT
    # own-domain filter: the external CDN decoy is dropped (:158-163)
    assert rec["contentImageUrls"] == ["https://img.h.example.vn/media/1.jpg"]
    assert rec["author"] == "Kiểm Sát Viên"
    no_author = html.replace('<div class="tacgia">Kiểm Sát Viên</div>', "")
    assert parse_article(no_author, "bvl", "https://h.example.vn")["author"] is None


def test_tcd_list_content_and_right_strong_author():
    """Content is the reference's paragraph LIST (engine pins '\\n' for the
    string column, the exact list rides in span_texts); author = last
    right-aligned p WITH a strong, skipping the strongless decoy
    (tapchidientu.py:121-146)."""
    html = (
        '<html><body><h1 class="detail-title">Tít TCD</h1>'
        '<div class="detail-intro"><p class="caption">Mô tả TCD</p></div>'
        '<div class="datetimeup">1/2/2023 10:00</div>'
        '<div id="main-detail">'
        "<p>Đoạn một.</p>"
        '<img src="https://img/t1.jpg"/>'
        "<p>Đoạn hai.</p>"
        '<p style="text-align: right;"><strong>PV VietQ</strong></p>'
        '<p style="text-align: right;">Nguồn: VietQ</p>'
        "</div></body></html>"
    )
    rec = parse_article(html, "tcd", "https://h")
    assert rec["author"] == "PV VietQ"  # reversed scan skips the strongless p
    assert rec["span_texts"] == ["Đoạn một.", "Đoạn hai.", "PV VietQ", "Nguồn: VietQ"]
    assert rec["content"] == "Đoạn một.\nĐoạn hai.\nPV VietQ\nNguồn: VietQ"
    assert rec["contentImageUrls"] == ["https://img/t1.jpg"]
    assert rec["description"] == "Mô tả TCD"


def test_tta_first_h1_and_image_dedup():
    """Title = FIRST h1 (select_one), content = space-joined fragments,
    images deduped keep-first (tapchitoaan.py:118-142)."""
    html = (
        "<html><body><h1>Tít TTA</h1><h1>Chuyên mục Tòa án</h1>"
        '<h5 class="short-desc">Mô tả TTA</h5>'
        '<div class="post-meta"><span>1/2/2023 10:00</span><span>TAND</span></div>'
        '<span class="author">Thẩm Phán A</span>'
        '<div class="post-entry">'
        "<p>Đoạn một.</p>"
        '<img src="https://img/a.jpg"/>'
        '<img src="https://img/a.jpg"/>'
        "<p>Đoạn hai.</p>"
        '<img src="https://img/b.jpg"/>'
        "</div></body></html>"
    )
    rec = parse_article(html, "tta", "https://h")
    assert rec["title"] == "Tít TTA"  # first h1 wins
    assert rec["content"] == "Đoạn một. Đoạn hai."  # " " separator join
    assert rec["contentImageUrls"] == ["https://img/a.jpg", "https://img/b.jpg"]
    assert rec["author"] == "Thẩm Phán A"
    assert rec["pub_date_raw"] == "1/2/2023 10:00"


def test_bdu_div_title_and_posttime_shear():
    """Title lives in a DIV; post-time sheared with strip(' -'); unfiltered
    '\\n\\n' join (baodautu.py:122-136)."""
    html = (
        '<html><body><div class="title-detail">Tít BDU</div>'
        '<a class="author">Nhà Đầu Tư</a>'
        '<span class="post-time"> - 1/2/2023 10:00 - </span>'
        '<div class="sapo_detail">Mô tả BDU</div>'
        '<div id="content_detail_news">'
        "<p>Đoạn một.</p><p></p>"
        '<img src="https://img/d1.jpg"/>'
        "<p>Đoạn hai.</p>"
        "</div></body></html>"
    )
    rec = parse_article(html, "bdu", "https://h")
    assert rec["title"] == "Tít BDU"
    assert rec["pub_date_raw"] == "1/2/2023 10:00"  # ' - ' sheared both ends
    assert rec["content"] == "Đoạn một.\n\n\n\nĐoạn hai."  # empty p KEPT
    assert rec["author"] == "Nhà Đầu Tư"
    assert rec["contentImageUrls"] == ["https://img/d1.jpg"]


def test_round4b_listing_families():
    """ctrangc3 / thumb-class / two-phase / ul-li-first-a container scoping
    (baovephapluat.py:227-234, tapchidientu.py:205-212,
    tapchitoaan.py:200-216, baodautu.py:194-202)."""
    bvl = (
        '<html><body><div class="ctrangc3">'
        '<a href="https://h/a/bai-viet-1000001.html">x</a>'
        '<a href="https://h/a/bai-viet-1000002.html">y</a>'
        '</div><a href="/gioi-thieu">ngoài</a></body></html>'
    )
    assert parse_listing(bvl, "ctrangc3")[0] == [
        "https://h/a/bai-viet-1000001.html", "https://h/a/bai-viet-1000002.html"]

    tcd = (
        '<html><body><a class="thumb300x170" href="https://h/a/bai-viet-1000001.html">x</a>'
        '<a href="/video">không class</a>'
        '<a class="thumb300x170" href="https://h/a/bai-viet-1000002.html">y</a>'
        "</body></html>"
    )
    assert parse_listing(tcd, "thumb-class")[0] == [
        "https://h/a/bai-viet-1000001.html", "https://h/a/bai-viet-1000002.html"]

    # two-phase: the header link renders FIRST in the document but is
    # appended AFTER the entry links; anchorless entry skipped
    tta = (
        '<html><body><div class="col-lg-8">'
        '<a href="https://h/a/bai-viet-1000009.html">tiêu điểm</a></div>'
        '<div class="d-md-flex post-entry-2 small-img"><span>qc</span></div>'
        '<div class="d-md-flex post-entry-2 small-img">'
        '<a href="https://h/a/bai-viet-1000001.html">x</a><a href="#share">s</a></div>'
        "</body></html>"
    )
    assert parse_listing(tta, "two-phase")[0] == [
        "https://h/a/bai-viet-1000001.html", "https://h/a/bai-viet-1000009.html"]
    # empty FIRST set -> [] even though the header container has a link
    tta_empty = tta.replace(
        '<a href="https://h/a/bai-viet-1000001.html">x</a><a href="#share">s</a>',
        "<span>trống</span>")
    assert parse_listing(tta_empty, "two-phase")[0] == []

    bdu = (
        '<html><body><ul class="list_news_home">'
        "<li><span>quảng cáo</span></li>"
        '<li><a href="https://h/a/bai-viet-1000001.html">x</a><a href="#cmt">c</a></li>'
        '<li><a href="https://h/a/bai-viet-1000002.html">y</a></li>'
        "</ul></body></html>"
    )
    assert parse_listing(bdu, "ul-li-first-a")[0] == [
        "https://h/a/bai-viet-1000001.html", "https://h/a/bai-viet-1000002.html"]


def test_round4b_pagination_roundtrip():
    from crawler_news_spark.sources import hostsim as hs

    web = hs.default_web()
    cases = {
        "bvl1.example.vn": "/p/",
        "tcd1.example.vn": "/p",
        "tta1.example.vn": "?page=",
        "bdu1.example.vn": "/p",
    }
    for host, marker in cases.items():
        for t in (0, 1):
            for p in (1, 2, 8):
                u = hs.listing_url(web, host, t, p)
                assert marker in u, (host, u)
                assert hs.parse_listing_url(web, host, u) == (t, p), u


# --- round-4c profiles (pnm, vtc, cgl) -------------------------------------


def test_pnm_itemprop_body_and_crash_drop():
    """Content div selected by ITEMPROP; srcless imgs skipped; ANY missing
    field (incl. author) crash-drops the whole article (phunumoi.py:115-130)."""
    html = (
        '<html><body><h1 class="articleTitle">Tít PNM</h1>'
        '<div class="articleShortDesc mt10">Mô tả PNM</div>'
        '<time class="articleTimePosted">1/2/2023 10:00</time>'
        '<div itemprop="articleBody">'
        "<p>Đoạn một.</p><p></p>"
        '<img src="https://img/p1.jpg"/>'
        '<img class="lazyload" data-note="no-src"/>'
        "<p>Đoạn hai.</p>"
        "</div>"
        '<p class="author-news">PV Phụ Nữ</p></body></html>'
    )
    rec = parse_article(html, "pnm", "https://h")
    assert rec["content"] == "Đoạn một.\n\nĐoạn hai."  # "\n" join, empty KEPT
    assert rec["contentImageUrls"] == ["https://img/p1.jpg"]  # srcless skipped
    assert rec["author"] == "PV Phụ Nữ"
    # missing author -> unguarded get_text() crash -> whole article dropped
    no_author = html.replace('<p class="author-news">PV Phụ Nữ</p>', "")
    assert parse_article(no_author, "pnm", "https://h") is None
    no_desc = html.replace('<div class="articleShortDesc mt10">Mô tả PNM</div>', "")
    assert parse_article(no_desc, "pnm", "https://h") is None


def test_vtc_header_h1_first_h2_and_datasrc_figures():
    """Title = h1 inside header.mb5; description = FIRST h2 ('' default);
    images only from figure.expNoEdit img[data-src]; author '' default
    (vtcnews.py:155-175)."""
    html = (
        '<html><body><header class="mb5"><h1>Tít VTC</h1></header>'
        "<h2>Mô tả VTC</h2>"
        '<span class="time-update">1/2/2023 10:00</span>'
        '<div class="edittor-content">'
        "<p>Đoạn một.</p>"
        '<figure class="expNoEdit"><img data-src="https://img/v1.jpg"/></figure>'
        '<img src="https://img/inline-ad.jpg"/>'
        "<p>Đoạn hai.</p><p> </p>"
        "</div>"
        '<div class="author-make"><span>PV VTC</span></div></body></html>'
    )
    rec = parse_article(html, "vtc", "https://h")
    assert rec["content"] == "Đoạn một.\nĐoạn hai."  # stripped+filtered "\n"
    assert rec["contentImageUrls"] == ["https://img/v1.jpg"]  # bare src skipped
    assert rec["author"] == "PV VTC"
    no_author = html.replace(
        '<div class="author-make"><span>PV VTC</span></div>', "")
    assert parse_article(no_author, "vtc", "https://h")["author"] == ""
    # h1 outside the header does not count
    headerless = html.replace("<header class=\"mb5\"><h1>Tít VTC</h1></header>",
                              "<h1>Tít VTC</h1>")
    assert parse_article(headerless, "vtc", "https://h") is None


def test_cgl_longform_header_selectors():
    """sc-longform-header-* selectors; unfiltered '\\n' join; figure-only
    images; author else None (congly.py:126-160)."""
    html = (
        '<html><body>'
        '<h1 class="sc-longform-header-title block-sc-title">Tít CGL</h1>'
        '<p class="sc-longform-header-sapo block-sc-sapo">Mô tả CGL</p>'
        '<span class="sc-longform-header-date block-sc-publish-time">1/2/2023 10:00</span>'
        '<span class="sc-longform-header-author block-sc-author">PV Công Lý</span>'
        '<div class="entry entry-no-padding">'
        "<p>Đoạn một.</p><p></p>"
        '<figure><img src="https://img/c1.jpg"/></figure>'
        "<p>Đoạn hai.</p>"
        '<img src="https://img/footer-decoy.jpg"/>'
        "</div></body></html>"
    )
    rec = parse_article(html, "cgl", "https://h")
    assert rec["content"] == "Đoạn một.\n\nĐoạn hai."  # empty p KEPT, "\n" join
    assert rec["contentImageUrls"] == ["https://img/c1.jpg"]
    assert rec["author"] == "PV Công Lý"
    no_author = html.replace(
        '<span class="sc-longform-header-author block-sc-author">PV Công Lý</span>', "")
    assert parse_article(no_author, "cgl", "https://h")["author"] is None


def test_round4c_listing_families():
    """news2item / bgrid-title scoping (phunumoi.py:189-198,
    congly.py:213-233)."""
    pnm = (
        '<html><body><div class="col-xs-12 col-sm-8 col-md-8 news2">'
        '<div class="news2Item"><span>quảng cáo</span></div>'
        '<div class="news2Item"><a href="https://h/a/bai-viet-1000001.html">x</a>'
        '<a href="#save">lưu</a></div>'
        '<div class="news2Item"><a href="https://h/a/bai-viet-1000002.html">y</a></div>'
        "<!--news2-end--></div></body></html>"
    )
    assert parse_listing(pnm, "news2item")[0] == [
        "https://h/a/bai-viet-1000001.html", "https://h/a/bai-viet-1000002.html"]

    cgl = (
        '<html><body><!--one-shot--><ul class="onecms__loading">'
        '<li><h3 class="b-grid__title"><a href="/a/bai-viet-1000001.html">x</a></h3></li>'
        '<li><h3 class="other-title"><a href="/tag/phap-luat">tag</a></h3></li>'
        '<li><h3 class="b-grid__title"><a href="/a/bai-viet-1000002.html">y</a></h3></li>'
        "</ul></body></html>"
    )
    links, term = parse_listing(cgl, "bgrid-title")
    assert links == ["/a/bai-viet-1000001.html", "/a/bai-viet-1000002.html"]
    assert term  # the selenium set-return is the terminal signal


def test_round4c_pagination_roundtrip():
    from crawler_news_spark.sources import hostsim as hs

    web = hs.default_web()
    for t in (0, 1):
        for p in (1, 2, 6):
            u = hs.listing_url(web, "vtc1.example.vn", t, p)
            assert u.endswith(f"/trang-{p}.html"), u
            assert not hs.is_article_url(u)  # \d{6,}.html must NOT match
            assert hs.parse_listing_url(web, "vtc1.example.vn", u) == (t, p)
        u = hs.listing_url(web, "pnm1.example.vn", t, 3)
        assert u.endswith("/p3")
    # cgl is one-shot: bare slug URL
    u = hs.listing_url(web, "cgl1.example.vn", 1, 1)
    assert "?" not in u and "/p" not in u.rsplit("/", 1)[-1]


# --- round-4d profiles (ctg, btv, qlt, tdn) --------------------------------


def test_ctg_p_strong_double_walk():
    """find_all(["p","strong"]) emits p texts AND every strong — a strong
    NESTED in a p contributes twice (congthuong.py:141-143)."""
    html = (
        '<html><body><h1 class="article-detail-title f5">Tít CTG</h1>'
        '<div class="article-detail-desc">Mô tả CTG</div>'
        '<span class="format_time">1/2/2023 10:00</span>'
        '<div id="articleBody" itemprop="articleBody">'
        "<p><strong>Nóng:</strong> giá điện tăng.</p>"
        "<strong>Tiêu điểm</strong>"
        '<img src="https://img/c1.jpg"/>'
        "<p>Đoạn hai.</p>"
        "</div>"
        '<div class="article-detail-author clearfix">Ban Công Thương</div>'
        "</body></html>"
    )
    rec = parse_article(html, "ctg", "https://h")
    # p text (tags stripped), then its nested strong AGAIN, then standalone
    assert rec["span_texts"] == [
        "Nóng: giá điện tăng.", "Nóng:", "Tiêu điểm", "Đoạn hai."]
    assert rec["content"] == "Nóng: giá điện tăng.\nNóng:\nTiêu điểm\nĐoạn hai."
    assert rec["contentImageUrls"] == ["https://img/c1.jpg"]
    assert rec["author"] == "Ban Công Thương"


def test_btv_two_part_date_and_author_fallback():
    """publishedDate assembled as '{format_time} {format_date}'; empty
    h2.author-title falls back to div.post-author
    (baotaichinhvietnam.py:121-137)."""
    html = (
        '<html><body><h1 class="post-title">Tít BTV</h1>'
        '<h2 class="author-title"> </h2>'
        '<div class="post-author">Thời báo Tài chính</div>'
        '<div class="post-desc">Mô tả BTV</div>'
        '<span class="article-publish-time"><span class="format_time">14:45</span> '
        '<span class="format_date">1/2/2023</span></span>'
        '<div class="post-content"><p>Đoạn một.</p><p></p><p>Đoạn hai.</p></div>'
        "</body></html>"
    )
    rec = parse_article(html, "btv", "https://h")
    assert rec["pub_date_raw"] == "14:45 1/2/2023"  # two-part assembly
    assert rec["author"] == "Thời báo Tài chính"  # empty h2 -> fallback
    assert rec["content"] == "Đoạn một.\n\n\n\nĐoạn hai."  # empty p KEPT
    with_h2 = html.replace('<h2 class="author-title"> </h2>',
                           '<h2 class="author-title">Cây Bút B</h2>')
    assert parse_article(with_h2, "btv", "https://h")["author"] == "Cây Bút B"


def test_qlt_crash_drop_and_right_p_author():
    """Unguarded title/desc/date get_text crash-drops; author = publisher
    span else LAST nonempty right-aligned p (quanlythitruong.py:118-146)."""
    html = (
        '<html><body><h1 class="article-detail-title f0">Tít QLT</h1>'
        '<div class="article-detail-desc f0">Mô tả QLT</div>'
        '<span class="format_time">1/2/2023 10:00</span>'
        '<div class="__MASTERCMS_CONTENT fw lt mb clearfix">'
        "<p>Đoạn một.</p>"
        '<p style="text-align: right;">PV Thị Trường</p>'
        '<p style="text-align: right;"> </p>'
        "</div></body></html>"
    )
    rec = parse_article(html, "qlt", "https://h")
    assert rec["author"] == "PV Thị Trường"  # empty right-p skipped (reversed)
    assert rec["content"] == "Đoạn một.\nPV Thị Trường"
    with_pub = html.replace(
        "<body>", '<body><span class="article-publisher lt">Tổng cục QLTT</span>')
    assert parse_article(with_pub, "qlt", "https://h")["author"] == "Tổng cục QLTT"
    # a missing desc crash-drops even with the title present
    no_desc = html.replace('<div class="article-detail-desc f0">Mô tả QLT</div>', "")
    assert parse_article(no_desc, "qlt", "https://h") is None


def test_tdn_h2_desc_normalize_and_cite_crash():
    """Description = content div's first h2, whitespace-normalized; missing
    h2 OR missing blockquote cite crash-drops (taichinhdoanhnghiep.py:125-139)."""
    html = (
        '<html><body><article class="article"><div class="meta">TCDN</div>'
        "<h1>Tít TDN</h1></article>"
        '<span class="bx-time lt">1/2/2023 10:00</span>'
        '<div id="noidung"><h2>  Mô   tả\n TDN </h2>'
        "<p>Đoạn một.</p><p></p><p>Đoạn hai.</p></div>"
        '<blockquote class="blockquote-reverse"><cite>Hà Quang</cite></blockquote>'
        "</body></html>"
    )
    rec = parse_article(html, "tdn", "https://h")
    assert rec["description"] == "Mô tả TDN"  # \s+ -> ' ' then strip
    assert rec["author"] == "Hà Quang"
    assert rec["content"] == "Đoạn một.\n\n\n\nĐoạn hai."  # empty p KEPT
    no_cite = html.replace(
        '<blockquote class="blockquote-reverse"><cite>Hà Quang</cite></blockquote>', "")
    assert parse_article(no_cite, "tdn", "https://h") is None
    no_h2 = html.replace("<h2>  Mô   tả\n TDN </h2>", "")
    assert parse_article(no_h2, "tdn", "https://h") is None


def test_round4d_listing_families():
    """bx-cat-content http-filter / cat-listing / bx-list / dle-content
    (congthuong.py:212-225, baotaichinhvietnam.py:211-222,
    quanlythitruong.py:203-210, taichinhdoanhnghiep.py:197-203)."""
    ctg = (
        '<html><body><div class="bx-cat-content fw lt mb2">'
        '<h3 class="article-title"><a href="javascript:void(0)">thêm</a></h3>'
        '<h3 class="article-title"><a href="https://h/a/bai-viet-1000001.html">x</a></h3>'
        "<!--bxcat-end--></div></body></html>"
    )
    assert parse_listing(ctg, "bx-cat-content")[0] == [
        "https://h/a/bai-viet-1000001.html"]  # javascript decoy dropped

    btv = (
        '<html><body><div class="cat-listing bg-dots mt20 pt20 article-bdt-20 '
        'thumb-w250 title-22 no-catname">'
        '<h3 class="article-title"><a href="https://h/a/bai-viet-1000001.html">x</a>'
        '<a href="#save">lưu</a></h3>'
        "<!--catlisting-end--></div></body></html>"
    )
    assert parse_listing(btv, "cat-listing")[0] == [
        "https://h/a/bai-viet-1000001.html"]  # first a only

    qlt = (
        '<html><body><div class="bx-list fw lt mb clearfix">'
        '<h3 class="article-title"><span>ảnh</span></h3>'
        '<h3 class="article-title"><a href="https://h/a/bai-viet-1000001.html">x</a></h3>'
        "<!--bxlist-end--></div></body></html>"
    )
    assert parse_listing(qlt, "bx-list")[0] == ["https://h/a/bai-viet-1000001.html"]

    tdn = (
        '<html><body><div id="dle-content">'
        '<a class="article-title" href="https://h/a/bai-viet-1000001.html">x</a>'
        '<a href="/lien-he">liên hệ</a>'
        '<a class="article-title" href="https://h/a/bai-viet-1000002.html">y</a>'
        "<!--dle-end--></div></body></html>"
    )
    assert parse_listing(tdn, "dle-content")[0] == [
        "https://h/a/bai-viet-1000001.html", "https://h/a/bai-viet-1000002.html"]


def test_round4d_pagination_roundtrip():
    """The TRUE MASTERCMS template &s_cond=&BRSR={raw page}
    (congthuong.py:198) and tdn's conditional first page."""
    from crawler_news_spark.sources import hostsim as hs

    web = hs.default_web()
    for host in ("ctg1.example.vn", "btv1.example.vn", "qlt1.example.vn"):
        for t in (0, 1):
            for p in (1, 2, 7):
                u = hs.listing_url(web, host, t, p)
                assert f"&s_cond=&BRSR={p}" in u, u  # RAW page number
                assert hs.parse_listing_url(web, host, u) == (t, p)
    u1 = hs.listing_url(web, "tdn1.example.vn", 0, 1)
    u2 = hs.listing_url(web, "tdn1.example.vn", 0, 2)
    assert u1.endswith("/") and u2.endswith("/p2")


# --- round-4e profiles (thc, tgd, bxd, skd, bvh, tnm, kth, bhq) ------------
# full 34-site registry coverage: every factory.py:36-70 class has a profile


def test_thc_justify_filter_and_icon_strip():
    """Only justify-styled p's feed content; 'bi-clock' icon token stripped
    from the date; title in the h1's nested <a>; author 'Theo ' replace
    (thuonghieucongluan.py:117-133)."""
    html = (
        '<html><body><h1 class="page-title mb-3"><a href="#u">Tít THC</a></h1>'
        '<span class="item">bi-clock 1/2/2023 10:00</span>'
        '<div class="article-sapo strong">Mô tả THC</div>'
        '<div class="article-body" id="content_detail">'
        '<p style="text-align: justify;">Đoạn một.</p>'
        "<p>Quảng cáo không justify.</p>"
        '<img src="https://img/t1.jpg"/>'
        '<p style="text-align: justify;">Đoạn hai.</p>'
        '<p style="text-align: right;">Theo Công Luận</p>'
        "</div></body></html>"
    )
    rec = parse_article(html, "thc", "https://h")
    assert rec["pub_date_raw"] == "1/2/2023 10:00"  # bi-clock stripped
    assert rec["content"] == "Đoạn một.\n\nĐoạn hai."  # justify filter
    assert rec["author"] == "Công Luận"  # "Theo " replaced
    assert rec["contentImageUrls"] == ["https://img/t1.jpg"]
    no_date = html.replace('<span class="item">bi-clock 1/2/2023 10:00</span>', "")
    assert parse_article(no_date, "thc", "https://h") is None  # unguarded


def test_tgd_heading_li_date_and_align_author():
    """Date from news-heading ul's first li; author p[align=right] — the
    HTML attribute, not a style (tapchigiaoduc.py:118-133)."""
    html = (
        '<html><body><h1 class="page-title">Tít TGD</h1>'
        '<div class="news-sapo strong">Mô tả TGD</div>'
        '<div class="news-heading"><ul class="list-unstyled list-inline">'
        '<li class="list-inline-item">1/2/2023 10:00</li>'
        '<li class="list-inline-item">Giáo dục</li></ul></div>'
        '<div class="news-content detail" id="news-detail">'
        "<p>Đoạn một.</p><p>  </p><p>Đoạn hai.</p>"
        '<p align="right">PV Giáo Dục</p>'
        "</div></body></html>"
    )
    rec = parse_article(html, "tgd", "https://h")
    assert rec["pub_date_raw"] == "1/2/2023 10:00"  # first li only
    assert rec["author"] == "PV Giáo Dục"
    # get_text("\n") semantics: blank fragment dropped; author line IS text
    assert rec["content"] == "Đoạn một.\nĐoạn hai.\nPV Giáo Dục"


def test_bxd_skd_datarole_and_shears():
    """bxd: publishdate rstrip('|'), author a.name rstrip('-'); skd:
    data-original-over-src image preference + http filter
    (baoxaydung.py:134-152, suckhoedoisong.py:129-160)."""
    bxd = (
        '<html><body><h1 class="title detail-title">Tít BXD</h1>'
        '<h3 class="text detail-sapo">Mô tả BXD</h3>'
        '<span data-role="publishdate">1/2/2023 10:00 |</span>'
        '<div class="detail-cmain"><p>Đoạn một.</p></div>'
        '<div class="detail-author-flex"><span class="ava">A</span>'
        '<a class="name" href="#pv">Kiến Trúc Sư -</a></div></body></html>'
    )
    rec = parse_article(bxd, "bxd", "https://h")
    assert rec["pub_date_raw"] == "1/2/2023 10:00"  # '|' sheared
    assert rec["author"] == "Kiến Trúc Sư"  # '-' sheared
    skd = (
        '<html><body><h1 class="detail-title" data-role="title">Tít SKD</h1>'
        '<h2 class="detail-sapo" data-role="sapo">Mô tả SKD</h2>'
        '<span class="publish-date" data-role="publishdate">1/2/2023 10:00 |</span>'
        '<div class="detail-content afcbc-body" data-role="content">'
        "<p>Đoạn một.</p>"
        '<img data-original="https://img/s1.jpg"/>'
        '<img src="/static/pixel.gif"/>'
        '<img src="https://img/s2.jpg"/>'
        "</div>"
        '<div class="detail-author" data-role="author">BS. Sức Khỏe</div>'
        "</body></html>"
    )
    rec2 = parse_article(skd, "skd", "https://h")
    # data-original preferred; non-http dropped
    assert rec2["contentImageUrls"] == ["https://img/s1.jpg", "https://img/s2.jpg"]
    assert rec2["author"] == "BS. Sức Khỏe"


def test_bvh_no_separator_concat_and_author_crash():
    """.text with NO separator concatenates adjacent paragraphs; missing
    span.detail__author crash-drops (baovanhoa.py:188-199)."""
    html = (
        '<html><body><h1 class="detail__title">Tít BVH</h1>'
        '<h2 class="detail__summary">Mô tả BVH</h2>'
        "<time>1/2/2023 10:00</time>"
        '<span class="detail__author">PV Văn Hóa</span>'
        '<div class="detail__content"><p>Đoạn một.</p><p>Đoạn hai.</p></div>'
        "</body></html>"
    )
    rec = parse_article(html, "bvh", "https://h")
    assert rec["content"] == "Đoạn một.Đoạn hai."  # NO joiner
    assert parse_article(
        html.replace('<span class="detail__author">PV Văn Hóa</span>', ""),
        "bvh", "https://h") is None


def test_tnm_span_decompose_and_urljoin():
    """descDetail's <span> children decomposed before get_text; relative
    img srcs urljoin'd; author = last right-styled content p
    (tainguyenvamoitruong.py:117-143)."""
    html = (
        '<html><body><h2 class="headingDetail">Tít TNM</h2>'
        '<p class="descDetail"><span class="icon-cal">15/3</span>Mô tả TNM</p>'
        '<span class="time icon-time">1/2/2023 10:00</span>'
        '<div class="html-content">'
        "<p>Đoạn một.</p>"
        '<img src="/media/1.jpg"/>'
        '<img src="https://cdn/2.jpg"/>'
        '<p style="text-align: right;">PV Môi Trường</p>'
        "</div></body></html>"
    )
    rec = parse_article(html, "tnm", "https://h.example.vn")
    assert rec["description"] == "Mô tả TNM"  # span decomposed
    assert rec["contentImageUrls"] == [
        "https://h.example.vn/media/1.jpg", "https://cdn/2.jpg"]
    assert rec["author"] == "PV Môi Trường"
    assert "PV Môi Trường" in rec["content"]  # author p stays in content


def test_kth_justify_lambda_p_or_div():
    """Content blocks are p OR div whose style contains justify; unstyled
    decoys skipped; title get_text() keeps whitespace; missing span.name
    crash-drops (kienthuc.py:165-185)."""
    html = (
        '<html><body><h1 class="cms-title">Tít KTH </h1>'
        '<h2 class="sapo cms-desc">Mô tả KTH</h2>'
        "<time>1/2/2023 10:00</time>"
        '<div id="abody">'
        '<p style="text-align: justify;">Đoạn một.</p>'
        "<p>Đề xuất cho bạn.</p>"
        '<div style="margin: 0; text-align: justify;">Khối hai.</div>'
        '<img src="https://img/k1.jpg"/>'
        "<!--abody-end--></div>"
        '<span class="name">Bút Kiến Thức</span></body></html>'
    )
    rec = parse_article(html, "kth", "https://h")
    assert rec["title"] == "Tít KTH "  # no strip
    assert rec["content"] == "Đoạn một.\n\nKhối hai."  # p AND div, justify only
    assert rec["author"] == "Bút Kiến Thức"
    assert parse_article(html.replace(
        '<span class="name">Bút Kiến Thức</span>', ""), "kth", "https://h") is None


def test_bhq_breadcrumb_date_and_caption_skip():
    """Date scanned from breadcrumb anchors by the dd/mm/yyyy hh:mm:ss
    regex; caption p's (img or 'Ảnh:') skipped from content but their
    images still collected (baohaiquanvietnam.py:116-146)."""
    html = (
        '<html><body><h1 class="title-news-detail-left">Tít BHQ</h1>'
        '<div class="que_news"><p><strong>Mô tả BHQ</strong></p></div>'
        '<ol class="breadcrumb"><li><a href="/">Trang chủ</a></li>'
        '<li><a href="#t">04/10/2024 16:40:00</a></li></ol>'
        '<div class="content_news">'
        "<p>Đoạn một.</p>"
        '<p><img src="https://img/b1.jpg"/>Ảnh: tư liệu</p>'
        "<p>Đoạn hai.</p>"
        '<p style="text-align: right;">PV Hải Quân</p>'
        "</div></body></html>"
    )
    rec = parse_article(html, "bhq", "https://h")
    assert rec["pub_date_raw"] == "04/10/2024 16:40:00"  # breadcrumb scan
    assert rec["content"] == "Đoạn một.\nĐoạn hai.\nPV Hải Quân"  # caption skipped
    assert rec["contentImageUrls"] == ["https://img/b1.jpg"]
    assert rec["author"] == "PV Hải Quân"


def test_round4e_listing_families_and_pagination():
    """The last eight families' container scoping + the four new pagination
    kinds roundtrip."""
    from crawler_news_spark.sources import hostsim as hs

    thc = (
        '<html><body><ul class="list-unstyled list-articles mt-2rem">'
        '<h3 class="mt-0 mb-1 title card-title fs-18">'
        '<a href="https://h/a/bai-viet-1000001.html">x</a></h3>'
        '<h3 class="other"><a href="/tag/hot">tag</a></h3>'
        "</ul></body></html>"
    )
    assert parse_listing(thc, "list-articles")[0] == [
        "https://h/a/bai-viet-1000001.html"]

    tgd = (
        '<html><body><div class="row">'
        '<div class="category-box-lg"><h6><a href="https://h/a/bai-viet-1000009.html">nb</a></h6></div>'
        '<div class="img-content"><h6><a href="https://h/a/bai-viet-1000001.html">x</a></h6></div>'
        '<div class="img-content"><span>không h6</span></div>'
        "<!--row-end--></div></body></html>"
    )
    # img-content links first, category-box-lg appended after
    assert parse_listing(tgd, "row-h6")[0] == [
        "https://h/a/bai-viet-1000001.html", "https://h/a/bai-viet-1000009.html"]

    bvh = (
        '<html><body><article class="story"><div class="thumb">ảnh</div></article>'
        '<article class="story"><h3 class="story__title">'
        '<a href="https://h/a/bai-viet-1000001.html">x</a></h3></article>'
        "</body></html>"
    )
    assert parse_listing(bvh, "story-title")[0] == [
        "https://h/a/bai-viet-1000001.html"]

    bhq = (
        '<html><body><div class="wrap-news-list"><span>ảnh</span></div>'
        '<div class="wrap-news-list"><a href="https://h/a/bai-viet-1000001.html">x</a>'
        '<a href="#cmt">c</a></div></body></html>'
    )
    assert parse_listing(bhq, "wrap-news-list")[0] == [
        "https://h/a/bai-viet-1000001.html"]

    web = hs.default_web()
    cases = {
        "thc1.example.vn": "/trang-",
        "tgd1.example.vn": "/page/",
        "tnm1.example.vn": ".html?page=",
        "bhq1.example.vn": "/danh-muc/",
    }
    for host, marker in cases.items():
        for t in (0, 1):
            for p in (1, 2, 5):
                u = hs.listing_url(web, host, t, p)
                assert marker in u, (host, u)
                assert hs.parse_listing_url(web, host, u) == (t, p), u
    # bvh page cap models baovanhoa.py:243-245 (empty past the cap)
    assert hs.listing_links(web, "bvh1.example.vn", 0,
                            web.spec("bvh1.example.vn").page_cap + 1) == []


def test_full_registry_coverage():
    """Every reference crawler class (factory.py:36-70, 34 sites) has a
    profile with a pagination kind, content join, and listing family."""
    from crawler_news_spark.functions.parse_profiles import LISTING_PARSERS
    from crawler_news_spark.sources import hostsim as hs

    assert len(hs.PROFILES) == 34
    for prof in hs.PROFILES:
        assert prof in hs.PAGINATION, prof
        assert prof in hs.CONTENT_JOIN, prof
        assert hs.LISTING_FAMILY[prof] in LISTING_PARSERS, prof
