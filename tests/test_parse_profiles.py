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
