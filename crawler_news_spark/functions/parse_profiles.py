"""Per-profile article/listing parsers — the parse spec.

Pure functions ``html -> record`` mirroring the four representative reference
parser families (SURVEY.md §2.3).  They are used in two places:

- the pure-Python oracle (single-threaded, the correctness spec), and
- the vectorized parse vUDF (operators/parse.py) which maps them over Arrow
  batches (batch-level Python, no per-row Spark serialization).

Reference quirks replicated deliberately:

- vnx: author is popped off the last content paragraph (vnexpress.py:190-193);
  content joined with "," (vnexpress.py:242); empty comments default to
  ``[""]`` (vnexpress.py:243).
- dtr: sentinel strings for missing desc/date/author (dantri.py:241,248,258);
  content joined with "\\n" (dantri.py:245).
- btt: text+image walk in true document order (baothanhtra.py:152-162), but
  images then order-destroyed via ``list(set(...))`` (baothanhtra.py:163) —
  Python set order is run-dependent, so the spec pins the deterministic
  canonicalization ``sorted(set(...))``; content joined with " "
  (baothanhtra.py:165).
- vnn: all-or-nothing null guard title∧desc∧content (vietnamnet.py:162-163);
  relative image hrefs absolutized against the host base and data: URIs
  skipped (vietnamnet.py:146-157); comments default ``[]``.
"""

from __future__ import annotations

import re

_RE_TITLE = re.compile(r'<h1 class="title-detail">(.*?)</h1>')
_RE_TITLE_ATTR = re.compile(r'<h1 class="news-title" title="(.*?)">')
_RE_DESC = re.compile(r'<p class="description">(.*?)</p>')
_RE_DATE = re.compile(r'<span class="date">(.*?)</span>')
_RE_AUTHOR = re.compile(r'<div class="author-name">(.*?)</div>')
_RE_AUTHOR_SPAN = re.compile(r'<span class="author-name">(.*?)</span>')
# style-attribute author match (thuonghieuvaphapluat.py:135:
# find('p', style=lambda s: s and 'float: right' in s))
_RE_STYLE_AUTHOR = re.compile(r'<p style="[^"]*float: right[^"]*">(.*?)</p>')
# nested-box author chain (vietnamnet.py:169-178)
_RE_VNN_AUTHOR_BOX = re.compile(r'<div class="article-detail-author">(.*?)</div>', re.S)
_RE_NAME_SPAN = re.compile(r'<span class="name">(.*?)</span>')
_RE_FIRST_A = re.compile(r"<a[^>]*>(.*?)</a>")
_RE_OG_IMAGE = re.compile(r'<meta property="og:image" content="(.*?)"/>')
_RE_IMG_CONTENT = re.compile(r'<img class="img-content" src="(.*?)"/>')
_RE_BODY = re.compile(r'<article class="content-body">(.*?)</article>', re.S)
# decompose set (baotintuc.py:188-190: select("script, style, .share"))
_RE_DECOMPOSE = re.compile(
    r'<div class="share">.*?</div>|<script>.*?</script>|<style>.*?</style>', re.S
)
_RE_WALK = re.compile(
    r'<p class="Normal">(?P<para>.*?)</p>'
    r'|<figure class="image"><img src="(?P<fig>.*?)"/></figure>'
    r'|<picture><source data-srcset="(?P<srcset>.*?)"/><img class="pic"/></picture>'
    r'|<img class="lazy" data-src="(?P<lazy>.*?)"/>'
    r'|<img src="(?P<src>.*?)"/>'
    r'|<img data-original="(?P<orig>.*?)"/>',
    re.S,
)
_RE_COMMENT = re.compile(r'<div class="comment_content">(.*?)</div>')
_RE_ANCHOR = re.compile(r'<h3 class="title-news"><a href="(.*?)">')
# listing families (F4) beyond h3.title-news — see hostsim.LISTING_FAMILY
_RE_ARTICLE_WALK = re.compile(r"<article><h[23]><a href=\"(.*?)\">")
_RE_MULTI_CLASS = re.compile(
    r'<h3 class="(?:horizontalPost__main-title|vnn-title|title-bold)">'
    r'<a href="(.*?)">'
)
_RE_PLAIN_ARTICLE_A = re.compile(r'<article><a href="(.*?)">')
_RE_NEWSTITLE_DIV = re.compile(r'<div class="newsTitle"><a href="(.*?)">')
_RE_H2_TITLE = re.compile(r'<h2 class="title"><a href="(.*?)">')
# cnd (congnghevadoisong.py:116-126) article selectors
_RE_TITLE_CND = re.compile(r'<h1 class="postTitle">(.*?)</h1>')
_RE_DATE_CND = re.compile(r'<span class="newsDate">(.*?)</span>')
# style LAMBDA match: style contains BOTH 'font-weight: bold' and
# 'text-align: justify' in any order (congnghevadoisong.py:118)
_RE_DESC_CND = re.compile(
    r'<p style="(?=[^"]*font-weight: bold)(?=[^"]*text-align: justify)[^"]*">(.*?)</p>'
)
_RE_AUTHOR_CND = re.compile(r'<span class="link-source-text-name">(.*?)</span>')
_RE_BODY_CND = re.compile(r'<div class="postRickText">(.*?)</div>', re.S)


def _walk_body(html: str, body_re: re.Pattern | None = None) -> list[tuple[str, str]]:
    """In-order (kind, value) walk of the article body: text paras + img refs.

    Image forms: lazy data-src (vnx/dtr), plain src (btt/qdn/thp/bdt/cnd),
    figure-wrapped src (btu), data-original and picture>source data-srcset
    first-candidate (vnn, vietnamnet.py:153-157).  ``body_re`` picks the
    content container (default article.content-body; cnd uses
    div.postRickText).
    """
    m = (body_re or _RE_BODY).search(html)
    if not m:
        return []
    out: list[tuple[str, str]] = []
    for mm in _RE_WALK.finditer(m.group(1)):
        g = mm.groupdict()
        if g["para"] is not None:
            out.append(("text", g["para"]))
        elif g["srcset"] is not None:
            first = g["srcset"].split(",")[0].strip().split()[0].strip()
            out.append(("image", first))
        else:
            for key in ("fig", "lazy", "src", "orig"):
                if g[key] is not None:
                    out.append(("image", g[key]))
                    break
    return out


def _first(rx: re.Pattern, html: str) -> str | None:
    m = rx.search(html)
    return m.group(1) if m else None


def make_spans(texts: list[str], images: list[str]) -> list[dict]:
    """Span sequence: text spans in doc order, then image spans (§1.4).

    The engine's vUDF does NOT ship these structs through Arrow (per-row
    list-of-dict conversion measured ~7x slower than flat string arrays);
    it ships ``span_texts`` + ``contentImageUrls`` and rebuilds the struct
    array JVM-side (plans/wave.py spans_expr).  This dict form is the
    oracle/spec representation.
    """
    spans = [
        {"kind": "text", "text": t, "media_ref": None, "offset": i}
        for i, t in enumerate(texts)
    ]
    base = len(spans)
    spans += [
        {"kind": "image", "text": None, "media_ref": u, "offset": base + i}
        for i, u in enumerate(images)
    ]
    return spans


def parse_article(html: str, profile: str, base_url: str) -> dict | None:
    """Parse an article page.  Returns None when the profile's null guard drops it.

    Output keys: title, description, content, pub_date_raw, author, imageUrl,
    comments, contentImageUrls, spans.
    """
    if profile in ("dcs", "vne", "ktd", "tct", "vdl", "skc",
                   "bvl", "tcd", "tta", "bdu", "pnm", "vtc", "cgl",
                   "ctg", "btv", "qlt", "tdn",
                   "thc", "tgd", "bxd", "skd", "bvh", "tnm", "kth", "bhq"):
        return _parse_article_v2(html, profile, base_url)
    # bdt reads the title ATTRIBUTE of h1.news-title (baodantoc.py:141);
    # cnd reads h1.postTitle (congnghevadoisong.py:116)
    title_re = {"bdt": _RE_TITLE_ATTR, "cnd": _RE_TITLE_CND}.get(profile, _RE_TITLE)
    title = _first(title_re, html)
    if title is None:
        return None  # null-title drop (base_crawler.py:53-56) — all profiles
    if profile == "btu":
        # decompose script/style/.share before any content extraction
        # (baotintuc.py:188-190)
        html = _RE_DECOMPOSE.sub("", html)
    desc = _first(_RE_DESC, html)
    date_raw = _first(_RE_DATE, html)
    hero = _first(_RE_OG_IMAGE, html)
    walk = _walk_body(html)

    if profile == "vnx":
        paras = [v for k, v in walk if k == "text"]
        images = [v for k, v in walk if k == "image"]
        author = paras[-1].strip() if paras else None
        if paras:
            paras = paras[:-1]  # author pop (vnexpress.py:190-193)
        comments = [c.strip() for c in _RE_COMMENT.findall(html)]
        return {
            "title": title,
            "description": desc,
            "content": ",".join(paras),
            "pub_date_raw": date_raw.strip() if date_raw else None,
            "author": author,
            "imageUrl": hero,
            "comments": comments if comments else [""],
            "contentImageUrls": images,
            "span_texts": paras,
            "spans": make_spans(paras, images),
        }

    if profile == "dtr":
        paras = [v.strip() for k, v in walk if k == "text"]
        images = [v for k, v in walk if k == "image"]
        author = _first(_RE_AUTHOR, html)
        return {
            "title": title.strip(),
            "description": desc.strip() if desc else "Không tìm thấy mô tả",
            "content": "\n".join(paras) if paras else None,
            "pub_date_raw": date_raw.strip() if date_raw else "Không tìm thấy ngày đăng",
            "author": author.strip() if author else "Không rõ tác giả",
            "imageUrl": None,
            "comments": None,
            "contentImageUrls": images,
            "span_texts": paras,
            "spans": make_spans(paras, images),
        }

    if profile == "btt":
        paras = [v.strip() for k, v in walk if k == "text" and v.strip()]
        collected = [v for k, v in walk if k == "image" and "http" in v]
        images = sorted(set(collected))  # deterministic stand-in for list(set())
        author = _first(_RE_AUTHOR, html)
        return {
            "title": title.strip(),
            "description": desc.strip() if desc else None,
            "content": " ".join(paras),
            "pub_date_raw": date_raw.strip() if date_raw else None,
            "author": author.strip() if author else None,
            "imageUrl": None,
            "comments": None,
            "contentImageUrls": images,
            "span_texts": paras,
            "spans": make_spans(paras, images),
        }

    if profile == "vnn":
        paras = [v for k, v in walk if k == "text"]
        content = ",".join(paras)
        if not (title and desc and walk):  # all-or-nothing (vietnamnet.py:162-163)
            return None
        images = []
        for k, v in walk:
            if k != "image" or v.startswith("data:image"):
                continue
            images.append(base_url + v if v.startswith("/") else v)
        # nested-box author chain (vietnamnet.py:169-178):
        # div.article-detail-author > span.name, else its first <a>, else ""
        author = None
        box = _first(_RE_VNN_AUTHOR_BOX, html)
        if box is not None:
            author = _first(_RE_NAME_SPAN, box) or _first(_RE_FIRST_A, box)
        comments = [c.strip() for c in _RE_COMMENT.findall(html)]
        # hero fallback chain (vietnamnet.py:136-143): img.img-content first,
        # then og:image, then the sentinel
        inline_hero = _first(_RE_IMG_CONTENT, html)
        hero = inline_hero if inline_hero else hero
        return {
            "title": title,
            "description": desc,
            "content": content,
            "pub_date_raw": date_raw.strip() if date_raw else "Không có thông tin",
            "author": author.strip() if author else "",
            "imageUrl": hero if hero else "Không có ảnh",
            "comments": comments,
            "contentImageUrls": images,
            "span_texts": paras,
            "spans": make_spans(paras, images),
        }

    if profile == "qdn":
        # quandoinhandan family: empty-para filter + "\n" join
        # (quandoinhandan.py:125); author from p>strong heuristic
        # (beautifulSoup_utils.py:12-51 via quandoinhandan.py:140) — the
        # author strong-paragraph REMAINS part of the content
        from .author_heuristic import extract_author_from_strong_texts

        strip_tags = lambda s: re.sub(r"<[^>]+>", "", s).strip()
        paras = [strip_tags(v) for k, v in walk if k == "text"]
        paras = [p for p in paras if p]
        strongs = re.findall(r'<p class="Normal"><strong>(.*?)</strong></p>', html)
        author = extract_author_from_strong_texts(strongs)
        images = [v for k, v in walk if k == "image" and "http" in v]
        return {
            "title": title.strip(),
            "description": desc.strip() if desc else None,
            "content": "\n".join(paras),
            "pub_date_raw": date_raw.strip() if date_raw else None,
            "author": author,
            "imageUrl": None,
            "comments": None,
            "contentImageUrls": images,
            "span_texts": paras,
            "spans": make_spans(paras, images),
        }

    if profile == "btu":
        # decompose-then-get_text family (baotintuc.py:185-191; same shape in
        # baoxaydung.py:146, tapchigiaoduc.py:128, baodantoc.py:181): share/
        # script blocks were stripped above, remaining text joins with "\n";
        # images come only from figure.image wrappers (baotintuc.py:193-199)
        paras = [v.strip() for k, v in walk if k == "text" and v.strip()]
        images = [v for k, v in walk if k == "image"]
        author = _first(_RE_AUTHOR, html)
        return {
            "title": title.strip(),
            "description": desc.strip() if desc else None,
            "content": "\n".join(paras),
            "pub_date_raw": date_raw.strip() if date_raw else None,
            "author": author.strip() if author else None,
            "imageUrl": None,
            "comments": None,
            "contentImageUrls": images,
            "span_texts": paras,
            "spans": make_spans(paras, images),
        }

    if profile == "thp":
        # style-attribute author + excluded-by-prefix paragraphs
        # (thuonghieuvaphapluat.py:125-139; style-attr match also in
        # baohaiquanvietnam.py:119).  Reference accumulates text + '\n' per
        # kept paragraph, so content carries a trailing newline.
        kept = [
            v.strip() for k, v in walk
            if k == "text" and v.strip() and not v.strip().startswith("Văn Nam")
        ]
        content = "".join(t + "\n" for t in kept)
        author = _first(_RE_STYLE_AUTHOR, html)
        images = [v for k, v in walk if k == "image"]
        return {
            "title": title.strip(),
            "description": desc.strip() if desc else None,
            "content": content,
            "pub_date_raw": date_raw.strip() if date_raw else None,
            "author": author.strip() if author else None,
            "imageUrl": None,
            "comments": None,
            "contentImageUrls": images,
            "span_texts": kept,
            "spans": make_spans(kept, images),
        }

    if profile == "bdt":
        # attribute-title family (baodantoc.py:141) + span.author-name
        paras = [v.strip() for k, v in walk if k == "text" and v.strip()]
        images = [v for k, v in walk if k == "image"]
        author = _first(_RE_AUTHOR_SPAN, html)
        return {
            "title": title.strip(),
            "description": desc.strip() if desc else None,
            "content": "\n".join(paras),
            "pub_date_raw": date_raw.strip() if date_raw else None,
            "author": author.strip() if author else None,
            "imageUrl": None,
            "comments": None,
            "contentImageUrls": images,
            "span_texts": paras,
            "spans": make_spans(paras, images),
        }

    if profile == "cnd":
        # skip-first-paragraph content family (congnghevadoisong.py:124-126:
        # the div.postRickText's first <p> repeats the description and is
        # dropped); description via the style-lambda match (:118); author
        # defaults to "" when the source span is absent (:129-130)
        desc_cnd = _first(_RE_DESC_CND, html)
        date_cnd = _first(_RE_DATE_CND, html)
        walk_cnd = _walk_body(html, _RE_BODY_CND)
        texts = [v for k, v in walk_cnd if k == "text"]
        kept = [t.strip() for t in texts[1:] if t.strip()]
        images = [v for k, v in walk_cnd if k == "image"]
        author = _first(_RE_AUTHOR_CND, html)
        return {
            "title": title.strip(),
            "description": desc_cnd.strip() if desc_cnd else None,
            "content": "\n".join(kept),
            "pub_date_raw": date_cnd.strip() if date_cnd else None,
            "author": author.strip() if author else "",
            "imageUrl": None,
            "comments": None,
            "contentImageUrls": images,
            "span_texts": kept,
            "spans": make_spans(kept, images),
        }

    raise ValueError(f"unknown profile {profile}")


# ---------------------------------------------------------------------------
# Round-4 profiles (dcs, vne, ktd, tct, vdl, skc) — id-selector / header-
# scoped / attribute-date / block-div site families from the uncovered
# reference registry (factory.py:36-70)
# ---------------------------------------------------------------------------

_RE_TITLE_DCS = re.compile(r'<h1 id="contenttitle">(.*?)</h1>')
_RE_DESC_DCS = re.compile(r'<div id="description">(.*?)</div>')
_RE_DATE_DCS = re.compile(r'<div id="ngaytao">(.*?)</div>')
_RE_AUTHOR_DCS = re.compile(r'<b id="tacgia">(.*?)</b>')
_RE_BODY_DCS = re.compile(r'<div class="noidungtt">(.*?)</div>', re.S)
# img.imgtelerik only (dangcongsan.py:138-141); the plain-img alternative
# consumes decoys without capturing
_RE_WALK_DCS = re.compile(
    r"<p>(?P<para>.*?)</p>"
    r'|<img class="imgtelerik" src="(?P<img>.*?)"/>'
    r'|<img src="[^"]*"/>',
    re.S,
)

_RE_HEADER_VNE = re.compile(r'<header class="detail__header">(.*?)</header>', re.S)
_RE_TITLE_VNE = re.compile(r'<h1 class="detail__title">(.*?)</h1>')
_RE_DESC_VNE = re.compile(r'<h2 class="detail__summary">(.*?)</h2>')
_RE_DATE_VNE = re.compile(r'<div class="detail__meta">(.*?)</div>')
_RE_AUTHOR_VNE = re.compile(r'<div class="detail__author">(.*?)</div>')
_RE_BODY_VNE = re.compile(r'<div class="detail__content">(.*?)</div>', re.S)
# figure-wrapped images only (vneconomy.py:131-135); bare <img> skipped
_RE_WALK_VNE = re.compile(
    r"<p>(?P<para>.*?)</p>"
    r'|<figure><img src="(?P<img>.*?)"/></figure>'
    r'|<img src="[^"]*"/>',
    re.S,
)

_RE_TITLEPOST_KTD = re.compile(r'<div class="title-post">(.*?)</div>', re.S)
_RE_TITLE_KTD = re.compile(r'<h1 class="title">(.*?)</h1>')
_RE_TIME_ATTR_KTD = re.compile(r'<time datetime="(.*?)">')
_RE_DESC_KTD = re.compile(r'<h2 class="sum-main">(.*?)</h2>')
_RE_BODY_KTD = re.compile(r'<div class="news-content">(.*?)</div>', re.S)
_RE_WALK_KTD = re.compile(
    r'<p(?: class="alignright")?>(?P<para>.*?)</p>'
    r'|<img src="(?P<img>.*?)"/>',
    re.S,
)
_RE_AR_STRONG_KTD = re.compile(r'<p class="alignright"><strong>(.*?)</strong></p>')
_RE_AR_EM_KTD = re.compile(r'<p class="alignright"><em>(.*?)</em></p>')
_RE_P_STRONG_KTD = re.compile(r"<p><strong>(.*?)</strong></p>")

_RE_TITLE_TCT = re.compile(
    r'<h1 class="post-title text-left font-playfair">(.*?)</h1>'
)
_RE_AUTHOR_TCT = re.compile(
    r'<div class="meta-info"><span class="source"><strong>(.*?)</strong></span></div>'
)
_RE_DESC_TCT = re.compile(r'<div class="sapo title-1 mb-3">(.*?)</div>')
_RE_DATE_TCT = re.compile(r'<div class="post-meta"><span>(.*?)</span>')
_RE_BODY_TCT = re.compile(r'<div id="post_content">(.*?)</div>', re.S)
# p AND h2 both feed content (tapchicongthuong.py:141-143); images only
# from figure wrappers (:145-150)
_RE_WALK_TCT = re.compile(
    r"<p>(?P<para>.*?)</p>"
    r"|<h2>(?P<h2>.*?)</h2>"
    r'|<figure><img src="(?P<img>.*?)"/><figcaption>.*?</figcaption></figure>'
    r'|<img src="[^"]*"/>',
    re.S,
)

_RE_TITLE_VDL = re.compile(r'<h1 class="cms-title article-title">(.*?)</h1>')
_RE_DESC_VDL = re.compile(r'<div class="summary cms-desc">(.*?)</div>')
_RE_DATE_VDL = re.compile(r'<div class="meta clearfix"><time>(.*?)</time></div>')
_RE_AUTHOR_BOX_VDL = re.compile(r'<div class="author">(.*?)</div>', re.S)
_RE_BODY_VDL = re.compile(
    r'<div id="abody" class="cms-body clearfix">(.*?)<!--abody-end-->', re.S
)
_RE_BLOCK_VDL = re.compile(r"<div>(?P<blk>.*?)</div>", re.S)
_RE_IMG_PLAIN = re.compile(r'<img src="(.*?)"/>')
_RE_IMG_TAG = re.compile(r"<img[^>]*/>")

_RE_SECTION_SKC = re.compile(r'<section class="box-author">(.*?)</section>', re.S)
_RE_H1_SKC = re.compile(r"<h1>(.*?)</h1>")
_RE_INFO_SKC = re.compile(r'<div class="info-author">(.*?)</div>')
_RE_LI_SKC = re.compile(r"<li>(.*?)</li>")
_RE_BODY_SKC = re.compile(
    r'<div class="detail text-justify">(.*?)<!--detail-end-->', re.S
)
_RE_P_SKC = re.compile(r"<p>(?P<para>.*?)</p>|<img src=\"(?P<img>.*?)\"/>", re.S)
_RE_AUTHOR_SKC = re.compile(r'<div class="author-detail">(.*?)</div>')
_RE_SKC_PIPE = re.compile(r"^[^|]+\|\s*")  # suckhoecong.py:124
_RE_TCCT = re.compile(r"^TCCT\s+")  # tapchicongthuong.py:132

_STRIP_TAGS = re.compile(r"<[^>]+>")

_RE_TITLE_BVL = re.compile(r'<h1 class="post-title">(.*?)</h1>')
_RE_DATE_BVL = re.compile(r'<div class="lbPublishedDate">(.*?)</div>')
_RE_DESC_BVL = re.compile(r'<div class="post-summary"><h2>(.*?)</h2></div>')
_RE_BODY_BVL = re.compile(r'<div class="noidung">(.*?)</div>', re.S)
_RE_IMGDIV_BVL = re.compile(r'<div class="post-content">(.*?)</div>', re.S)
_RE_AUTHOR_BVL = re.compile(r'<div class="tacgia">(.*?)</div>')
_RE_P_PLAIN = re.compile(r"<p>(.*?)</p>", re.S)

_RE_TITLE_TCD = re.compile(r'<h1 class="detail-title">(.*?)</h1>')
_RE_DESC_TCD = re.compile(r'<div class="detail-intro"><p class="caption">(.*?)</p></div>')
_RE_DATE_TCD = re.compile(r'<div class="datetimeup">(.*?)</div>')
_RE_BODY_TCD = re.compile(r'<div id="main-detail">(.*?)</div>', re.S)
_RE_WALK_TCD = re.compile(
    r'<p(?: style="text-align: right;")?>(?P<para>.*?)</p>'
    r'|<img src="(?P<img>.*?)"/>',
    re.S,
)
_RE_RIGHT_P_TCD = re.compile(r'<p style="text-align: right;">(.*?)</p>', re.S)
_RE_STRONG = re.compile(r"<strong>(.*?)</strong>")

_RE_H1_FIRST = re.compile(r"<h1>(.*?)</h1>")
_RE_DESC_TTA = re.compile(r'<h5 class="short-desc">(.*?)</h5>')
_RE_DATE_TTA = re.compile(r'<div class="post-meta"><span>(.*?)</span>')
_RE_AUTHOR_TTA = re.compile(r'<span class="author">(.*?)</span>')
_RE_BODY_TTA = re.compile(r'<div class="post-entry">(.*?)</div>', re.S)
_RE_WALK_TTA = re.compile(r"<p>(?P<para>.*?)</p>|<img src=\"(?P<img>.*?)\"/>", re.S)

_RE_TITLE_BDU = re.compile(r'<div class="title-detail">(.*?)</div>')
_RE_AUTHOR_BDU = re.compile(r'<a class="author">(.*?)</a>')
_RE_DATE_BDU = re.compile(r'<span class="post-time">(.*?)</span>')
_RE_DESC_BDU = re.compile(r'<div class="sapo_detail">(.*?)</div>')
_RE_BODY_BDU = re.compile(r'<div id="content_detail_news">(.*?)</div>', re.S)
_RE_WALK_BDU = re.compile(r"<p>(?P<para>.*?)</p>|<img src=\"(?P<img>.*?)\"/>", re.S)

_RE_TITLE_PNM = re.compile(r'<h1 class="articleTitle">(.*?)</h1>')
_RE_DESC_PNM = re.compile(r'<div class="articleShortDesc mt10">(.*?)</div>')
_RE_DATE_PNM = re.compile(r'<time class="articleTimePosted">(.*?)</time>')
_RE_BODY_PNM = re.compile(r'<div itemprop="articleBody">(.*?)</div>', re.S)
# srcless lazyload decoys must not contribute (phunumoi.py:127 checks
# 'src' in img.attrs)
_RE_WALK_PNM = re.compile(
    r"<p>(?P<para>.*?)</p>"
    r'|<img src="(?P<img>.*?)"/>'
    r"|<img [^>]*/>",
    re.S,
)
_RE_AUTHOR_PNM = re.compile(r'<p class="author-news">(.*?)</p>')

_RE_HEADER_VTC = re.compile(r'<header class="mb5">(.*?)</header>', re.S)
_RE_H2_FIRST = re.compile(r"<h2>(.*?)</h2>")
_RE_DATE_VTC = re.compile(r'<span class="time-update">(.*?)</span>')
_RE_BODY_VTC = re.compile(r'<div class="edittor-content">(.*?)</div>', re.S)
# images ONLY from figure.expNoEdit img[data-src] (vtcnews.py:169-170)
_RE_WALK_VTC = re.compile(
    r"<p>(?P<para>.*?)</p>"
    r'|<figure class="expNoEdit"><img data-src="(?P<img>.*?)"/></figure>'
    r'|<img src="[^"]*"/>',
    re.S,
)
_RE_AUTHOR_VTC = re.compile(r'<div class="author-make"><span>(.*?)</span></div>')

_RE_TITLE_CGL = re.compile(
    r'<h1 class="sc-longform-header-title block-sc-title">(.*?)</h1>'
)
_RE_DESC_CGL = re.compile(
    r'<p class="sc-longform-header-sapo block-sc-sapo">(.*?)</p>'
)
_RE_DATE_CGL = re.compile(
    r'<span class="sc-longform-header-date block-sc-publish-time">(.*?)</span>'
)
_RE_AUTHOR_CGL = re.compile(
    r'<span class="sc-longform-header-author block-sc-author">(.*?)</span>'
)
_RE_BODY_CGL = re.compile(r'<div class="entry entry-no-padding">(.*?)</div>', re.S)
_RE_WALK_CGL = re.compile(
    r"<p>(?P<para>.*?)</p>"
    r'|<figure><img src="(?P<img>.*?)"/></figure>'
    r'|<img src="[^"]*"/>',
    re.S,
)

_RE_TITLE_CTG = re.compile(r'<h1 class="article-detail-title f5">(.*?)</h1>')
_RE_DESC_CTG = re.compile(r'<div class="article-detail-desc">(.*?)</div>')
_RE_FORMAT_TIME = re.compile(r'<span class="format_time">(.*?)</span>')
_RE_BODY_CTG = re.compile(
    r'<div id="articleBody" itemprop="articleBody">(.*?)</div>', re.S
)
# p AND strong are BOTH find_all'd (congthuong.py:141-143): a strong nested
# in a p contributes its text TWICE — once inside the p, once on its own
_RE_WALK_CTG = re.compile(
    r"<p>(?P<para>.*?)</p>"
    r"|<strong>(?P<strong>.*?)</strong>"
    r'|<img src="(?P<img>.*?)"/>',
    re.S,
)
_RE_AUTHOR_CTG = re.compile(r'<div class="article-detail-author clearfix">(.*?)</div>')

_RE_TITLE_BTV = re.compile(r'<h1 class="post-title">(.*?)</h1>')
_RE_AUTHOR_H2_BTV = re.compile(r'<h2 class="author-title">(.*?)</h2>')
_RE_AUTHOR_DIV_BTV = re.compile(r'<div class="post-author">(.*?)</div>')
_RE_DESC_BTV = re.compile(r'<div class="post-desc">(.*?)</div>')
_RE_TIMEBOX_BTV = re.compile(
    r'<span class="article-publish-time">(.*?</span>)</span>'
)
_RE_FORMAT_DATE = re.compile(r'<span class="format_date">(.*?)</span>')
_RE_BODY_BTV = re.compile(r'<div class="post-content">(.*?)</div>', re.S)
_RE_WALK_PI = re.compile(r"<p>(?P<para>.*?)</p>|<img src=\"(?P<img>.*?)\"/>", re.S)

_RE_TITLE_QLT = re.compile(r'<h1 class="article-detail-title f0">(.*?)</h1>')
_RE_DESC_QLT = re.compile(r'<div class="article-detail-desc f0">(.*?)</div>')
_RE_BODY_QLT = re.compile(
    r'<div class="__MASTERCMS_CONTENT fw lt mb clearfix">(.*?)</div>', re.S
)
_RE_WALK_QLT = re.compile(
    r'<p(?: style="text-align: right;")?>(?P<para>.*?)</p>'
    r'|<img src="(?P<img>.*?)"/>',
    re.S,
)
_RE_PUBLISHER_QLT = re.compile(r'<span class="article-publisher lt">(.*?)</span>')
_RE_RIGHT_P_QLT = re.compile(r'<p style="text-align: right;">(.*?)</p>', re.S)

_RE_ARTICLE_H1_TDN = re.compile(r'<article class="article">.*?<h1>(.*?)</h1>', re.S)
_RE_TIME_TDN = re.compile(r'<span class="bx-time lt">(.*?)</span>')
_RE_BODY_TDN = re.compile(r'<div id="noidung">(.*?)</div>', re.S)
_RE_H2_IN_BODY = re.compile(r"<h2>(.*?)</h2>", re.S)
_RE_CITE_TDN = re.compile(
    r'<blockquote class="blockquote-reverse"><cite>(.*?)</cite></blockquote>'
)
_RE_WS = re.compile(r"\s+")

_RE_TITLE_THC = re.compile(r'<h1 class="page-title mb-3"><a[^>]*>(.*?)</a></h1>')
_RE_DATE_THC = re.compile(r'<span class="item">(.*?)</span>')
_RE_DESC_THC = re.compile(r'<div class="article-sapo strong">(.*?)</div>')
_RE_BODY_THC = re.compile(
    r'<div class="article-body" id="content_detail">(.*?)</div>', re.S
)
# ONLY justify-styled paragraphs feed the content (thuonghieucongluan.py:124)
_RE_WALK_THC = re.compile(
    r'<p style="text-align: justify;">(?P<para>.*?)</p>'
    r'|<img src="(?P<img>.*?)"/>'
    r'|<p(?: style="[^"]*")?>.*?</p>',
    re.S,
)
_RE_RIGHT_P_THC = re.compile(r'<p style="text-align: right;">(.*?)</p>', re.S)

_RE_TITLE_TGD = re.compile(r'<h1 class="page-title">(.*?)</h1>')
_RE_DESC_TGD = re.compile(r'<div class="news-sapo strong">(.*?)</div>')
_RE_HEADING_TGD = re.compile(r'<div class="news-heading">(.*?)</div>', re.S)
_RE_DATE_LI_TGD = re.compile(r'<li class="list-inline-item">(.*?)</li>')
_RE_BODY_TGD = re.compile(
    r'<div class="news-content detail" id="news-detail">(.*?)</div>', re.S
)
_RE_WALK_TGD = re.compile(
    r'<p(?: align="right")?>(?P<para>.*?)</p>|<img src="(?P<img>.*?)"/>', re.S
)
_RE_ALIGN_RIGHT_TGD = re.compile(r'<p align="right">(.*?)</p>', re.S)

_RE_TITLE_BXD = re.compile(r'<h1 class="title detail-title">(.*?)</h1>')
_RE_DESC_BXD = re.compile(r'<h3 class="text detail-sapo">(.*?)</h3>')
_RE_DATE_BXD = re.compile(r'<span data-role="publishdate">(.*?)</span>')
_RE_BODY_BXD = re.compile(r'<div class="detail-cmain">(.*?)</div>', re.S)
_RE_AUTHOR_BXD = re.compile(
    r'<div class="detail-author-flex">.*?<a class="name"[^>]*>(.*?)</a>', re.S
)

_RE_TITLE_SKD = re.compile(
    r'<h1 class="detail-title" data-role="title">(.*?)</h1>'
)
_RE_DESC_SKD = re.compile(r'<h2 class="detail-sapo" data-role="sapo">(.*?)</h2>')
_RE_DATE_SKD = re.compile(
    r'<span class="publish-date" data-role="publishdate">(.*?)</span>'
)
_RE_BODY_SKD = re.compile(
    r'<div class="detail-content afcbc-body" data-role="content">(.*?)</div>', re.S
)
_RE_WALK_SKD = re.compile(
    r"<p>(?P<para>.*?)</p>"
    r'|<img data-original="(?P<orig>.*?)"/>'
    r'|<img src="(?P<src>.*?)"/>',
    re.S,
)
_RE_AUTHOR_SKD = re.compile(
    r'<div class="detail-author" data-role="author">(.*?)</div>'
)

_RE_TITLE_BVH = re.compile(r'<h1 class="detail__title">(.*?)</h1>')
_RE_DESC_BVH = re.compile(r'<h2 class="detail__summary">(.*?)</h2>')
_RE_BODY_BVH = re.compile(r'<div class="detail__content">(.*?)</div>', re.S)
_RE_TIME_ANY = re.compile(r"<time[^>]*>(.*?)</time>")
_RE_AUTHOR_BVH = re.compile(r'<span class="detail__author">(.*?)</span>')

_RE_TITLE_TNM = re.compile(r'<h2 class="headingDetail">(.*?)</h2>')
_RE_DESC_TNM = re.compile(r'<p class="descDetail">(.*?)</p>', re.S)
_RE_SPAN_TAG = re.compile(r"<span[^>]*>.*?</span>", re.S)
_RE_DATE_TNM = re.compile(r'<span class="time icon-time">(.*?)</span>')
_RE_BODY_TNM = re.compile(r'<div class="html-content">(.*?)</div>', re.S)
_RE_WALK_TNM = re.compile(
    r'<p(?: style="(?P<style>[^"]*)")?>(?P<para>.*?)</p>'
    r'|<img src="(?P<img>.*?)"/>',
    re.S,
)

_RE_TITLE_KTH = re.compile(r'<h1 class="cms-title">(.*?)</h1>')
_RE_DESC_KTH = re.compile(r'<h2 class="sapo cms-desc">(.*?)</h2>')
_RE_BODY_KTH = re.compile(r'<div id="abody">(.*?)<!--abody-end-->', re.S)
# p OR div blocks whose style contains text-align: justify (kienthuc.py:175)
_RE_WALK_KTH = re.compile(
    r'<(?P<tag>p|div)(?: style="(?P<style>[^"]*)")?>(?P<para>.*?)</(?P=tag)>'
    r'|<img src="(?P<img>.*?)"/>',
    re.S,
)
_RE_AUTHOR_NAME_KTH = re.compile(r'<span class="name">(.*?)</span>')

_RE_TITLE_BHQ = re.compile(r'<h1 class="title-news-detail-left">(.*?)</h1>')
_RE_QUE_STRONG_BHQ = re.compile(
    r'<div class="que_news"><p><strong>(.*?)</strong></p></div>'
)
_RE_BREADCRUMB_BHQ = re.compile(r'<ol class="breadcrumb">(.*?)</ol>', re.S)
_RE_BC_A = re.compile(r"<a[^>]*>(.*?)</a>")
_RE_BC_DATE = re.compile(r"\d{2}/\d{2}/\d{4}\s+\d{2}:\d{2}:\d{2}")
_RE_BODY_BHQ = re.compile(r'<div class="content_news">(.*?)</div>', re.S)
_RE_WALK_BHQ = re.compile(
    r'<p(?: style="(?P<style>[^"]*)")?>(?P<para>.*?)</p>'
    r'|<img src="(?P<img>.*?)"/>',
    re.S,
)


def _walk2(body: str, walk_re: re.Pattern) -> list[tuple[str, str]]:
    """In-order (kind, value) walk for the v2 profiles; decoy alternatives
    match without a capture group and contribute nothing."""
    out: list[tuple[str, str]] = []
    for mm in walk_re.finditer(body):
        g = mm.groupdict()
        if g.get("para") is not None:
            out.append(("text", g["para"]))
        elif g.get("h2") is not None:
            out.append(("text", g["h2"]))
        elif g.get("img") is not None:
            out.append(("image", g["img"]))
    return out


def _rec(title, desc, content, date_raw, author, images, texts) -> dict:
    return {
        "title": title,
        "description": desc,
        "content": content,
        "pub_date_raw": date_raw,
        "author": author,
        "imageUrl": None,
        "comments": None,
        "contentImageUrls": images,
        "span_texts": texts,
        "spans": make_spans(texts, images),
    }


def _parse_article_v2(html: str, profile: str, base_url: str) -> dict | None:
    if profile == "dcs":
        # id-selector family (dangcongsan.py:113-141): h1#contenttitle via
        # get_text() — NO strip; div.noidungtt <p> texts stripped+filtered,
        # joined "\n\n"; img.imgtelerik only; b#tacgia with the
        # case-insensitive "Theo " prefix strip (:129-135)
        title = _first(_RE_TITLE_DCS, html)
        if title is None:
            return None
        desc = _first(_RE_DESC_DCS, html)
        date_raw = _first(_RE_DATE_DCS, html)
        m = _RE_BODY_DCS.search(html)
        walk = _walk2(m.group(1), _RE_WALK_DCS) if m else []
        paras = [v.strip() for k, v in walk if k == "text"]
        paras = [p for p in paras if p]
        images = [v for k, v in walk if k == "image"]
        author = _first(_RE_AUTHOR_DCS, html)
        if author is not None:
            author = author.strip()
            if author.lower().startswith("theo "):
                author = author[5:]
        return _rec(title, desc.strip() if desc else None, "\n\n".join(paras),
                    date_raw.strip() if date_raw else None, author, images, paras)

    if profile == "vne":
        # header-scoped family (vneconomy.py:117-122): all four meta fields
        # come from header.detail__header — a decoy title outside the header
        # must not match; content p stripped+filtered "\n\n" (:127-128);
        # images from <figure> wrappers only (:131-135)
        header = _first(_RE_HEADER_VNE, html)
        if header is None:
            return None
        title = _first(_RE_TITLE_VNE, header)
        if title is None:
            return None
        desc = _first(_RE_DESC_VNE, header)
        date_raw = _first(_RE_DATE_VNE, header)
        author = _first(_RE_AUTHOR_VNE, header)
        m = _RE_BODY_VNE.search(html)
        walk = _walk2(m.group(1), _RE_WALK_VNE) if m else []
        paras = [v.strip() for k, v in walk if k == "text"]
        paras = [p for p in paras if p]
        images = [v for k, v in walk if k == "image"]
        return _rec(title.strip(), desc.strip() if desc else None,
                    "\n\n".join(paras), date_raw.strip() if date_raw else None,
                    author.strip() if author else None, images, paras)

    if profile == "ktd":
        # attribute-date family (kinhtedouong.py:143-148): publish date is
        # the <time datetime> ATTRIBUTE inside .title-post; three-tier
        # author chain p.alignright>strong -> p.alignright>em -> last
        # p>strong with 2-5 words and != "PV" (:160-175); the author
        # paragraph REMAINS part of the content
        tp = _first(_RE_TITLEPOST_KTD, html)
        if tp is None:
            return None
        title = _first(_RE_TITLE_KTD, tp)
        if title is None:
            return None
        date_raw = _first(_RE_TIME_ATTR_KTD, tp)
        desc = _first(_RE_DESC_KTD, html)
        m = _RE_BODY_KTD.search(html)
        body = m.group(1) if m else ""
        walk = _walk2(body, _RE_WALK_KTD)
        paras = [_STRIP_TAGS.sub("", v).strip() for k, v in walk if k == "text"]
        paras = [p for p in paras if p]
        images = [v for k, v in walk if k == "image"]
        author = _first(_RE_AR_STRONG_KTD, body) or _first(_RE_AR_EM_KTD, body)
        if not author:
            for text in reversed(_RE_P_STRONG_KTD.findall(body)):
                text = text.strip()
                if 2 <= len(text.split()) <= 5 and text.upper() != "PV":
                    author = text
                    break
        return _rec(title.strip(), desc.strip() if desc else None,
                    "\n\n".join(paras), date_raw, author.strip() if author else None,
                    images, paras)

    if profile == "tct":
        # unfiltered p+h2 family (tapchicongthuong.py:123-153): a MISSING
        # sapo drops the whole article (re.sub on None raises into the
        # broad except, :131-132) even when the title parsed; "TCCT "
        # prefix stripped from the description; content joins p AND h2
        # texts "\n\n" WITHOUT an empty filter (:141-143)
        title = _first(_RE_TITLE_TCT, html)
        if title is None:
            return None
        desc = _first(_RE_DESC_TCT, html)
        if desc is None:
            return None  # the re.sub(None) crash-drop
        desc = _RE_TCCT.sub("", desc.strip())
        author = _first(_RE_AUTHOR_TCT, html)
        date_raw = _first(_RE_DATE_TCT, html)
        m = _RE_BODY_TCT.search(html)
        walk = _walk2(m.group(1), _RE_WALK_TCT) if m else []
        texts = [v.strip() for k, v in walk if k == "text"]  # empties KEPT
        images = [v for k, v in walk if k == "image"]
        return _rec(title.strip(), desc, "\n\n".join(texts),
                    date_raw.strip() if date_raw else None,
                    author.strip() if author else None, images, texts)

    if profile == "vdl":
        # block-div family (vietnamdaily.py:123-139): content lives in
        # DIRECT-CHILD <div> blocks of #abody, text-then-images per block,
        # joined "\n"; image-only blocks contribute images but no text;
        # author div.author > span.name else "" (:141-146)
        title = _first(_RE_TITLE_VDL, html)
        if title is None:
            return None
        desc = _first(_RE_DESC_VDL, html)
        date_raw = _first(_RE_DATE_VDL, html)
        m = _RE_BODY_VDL.search(html)
        texts: list[str] = []
        images: list[str] = []
        if m:
            for bm in _RE_BLOCK_VDL.finditer(m.group(1)):
                blk = bm.group("blk")
                text = _RE_IMG_TAG.sub("", blk).strip()
                if text:
                    texts.append(text)
                images.extend(_RE_IMG_PLAIN.findall(blk))
        author = ""
        box = _first(_RE_AUTHOR_BOX_VDL, html)
        if box is not None:
            name = _first(_RE_NAME_SPAN, box)
            if name:
                author = name.strip()
        return _rec(title.strip(), desc.strip() if desc else None,
                    "\n".join(texts), date_raw.strip() if date_raw else None,
                    author, images, texts)

    if profile == "skc":
        # pipe-description family (suckhoecong.py:118-138): title is the
        # box-author section's h1; the description rides in div.info-author
        # as "source | desc <date-tail>" — split on the literal ' 03/' then
        # strip the '... | ' prefix (:123-124); date = first <li> of the
        # section's <ul>; content p joined "\n\n" WITHOUT empty filter;
        # author div.author-detail inside the detail div, else None
        sec = _first(_RE_SECTION_SKC, html)
        if sec is None:
            return None
        title = _first(_RE_H1_SKC, sec)
        if title is None:
            return None
        info = _first(_RE_INFO_SKC, sec)
        desc = None
        if info is not None:
            cleaned = info.split(" 03/")[0].strip()
            desc = _RE_SKC_PIPE.sub("", cleaned)
        date_raw = _first(_RE_LI_SKC, sec)
        m = _RE_BODY_SKC.search(html)
        body = m.group(1) if m else ""
        texts = [mm.group("para").strip()
                 for mm in _RE_P_SKC.finditer(body) if mm.group("para") is not None]
        images = [mm.group("img")
                  for mm in _RE_P_SKC.finditer(body) if mm.group("img") is not None]
        author = _first(_RE_AUTHOR_SKC, body)
        return _rec(title.strip(), desc, "\n\n".join(texts),
                    date_raw.strip() if date_raw else None,
                    author.strip() if author else None, images, texts)

    if profile == "bvl":
        # split-container family (baovephapluat.py:139-168): content text
        # comes from div.noidung <p>s ("\n\n", empties KEPT) while images
        # come from a DIFFERENT div (div.post-content) and only when the
        # src contains the site's own domain (:158-163) — off-domain CDN
        # decoys dropped; description is the h2 NESTED in div.post-summary
        title = _first(_RE_TITLE_BVL, html)
        if title is None:
            return None
        date_raw = _first(_RE_DATE_BVL, html)
        desc = _first(_RE_DESC_BVL, html)
        m = _RE_BODY_BVL.search(html)
        texts = [p.strip() for p in _RE_P_PLAIN.findall(m.group(1))] if m else []
        mi = _RE_IMGDIV_BVL.search(html)
        host = base_url.split("://", 1)[-1]
        images = [
            u for u in _RE_IMG_PLAIN.findall(mi.group(1)) if host in u
        ] if mi else []
        author = _first(_RE_AUTHOR_BVL, html)
        return _rec(title.strip(), desc.strip() if desc else None,
                    "\n\n".join(texts), date_raw.strip() if date_raw else None,
                    author.strip() if author else None, images, texts)

    if profile == "tcd":
        # list-content family (tapchidientu.py:121-148): the reference
        # leaves content as the LIST of paragraph texts (never joined —
        # the only site whose record carries an array); the engine's typed
        # schema pins the canonical "\n" join for the string column and
        # carries the exact list as span_texts.  Author = last
        # p[style=text-align: right] that has a <strong> (:141-146)
        title = _first(_RE_TITLE_TCD, html)
        if title is None:
            return None
        desc = _first(_RE_DESC_TCD, html)
        date_raw = _first(_RE_DATE_TCD, html)
        m = _RE_BODY_TCD.search(html)
        body = m.group(1) if m else ""
        walk = _walk2(body, _RE_WALK_TCD)
        texts = [_STRIP_TAGS.sub("", v).strip() for k, v in walk if k == "text"]
        images = [v for k, v in walk if k == "image"]
        author = None
        for p in reversed(_RE_RIGHT_P_TCD.findall(body)):
            sm = _RE_STRONG.search(p)
            if sm:
                author = sm.group(1).strip()
                break
        return _rec(title.strip(), desc.strip() if desc else None,
                    "\n".join(texts), date_raw.strip() if date_raw else None,
                    author, images, texts)

    if profile == "tta":
        # first-h1 family (tapchitoaan.py:118-142): title is the FIRST <h1>
        # in the document (select_one("h1") — no class); content is the
        # whole post-entry get_text(separator=" ", strip=True) = stripped
        # nonempty fragments joined with " "; images deduped keep-first
        # (:136); author span.author
        title = _first(_RE_H1_FIRST, html)
        if title is None:
            return None
        desc = _first(_RE_DESC_TTA, html)
        date_raw = _first(_RE_DATE_TTA, html)
        author = _first(_RE_AUTHOR_TTA, html)
        m = _RE_BODY_TTA.search(html)
        walk = _walk2(m.group(1), _RE_WALK_TTA) if m else []
        texts = [v.strip() for k, v in walk if k == "text"]
        texts = [t for t in texts if t]
        images: list[str] = []
        for k, v in walk:
            if k == "image" and v not in images:
                images.append(v)
        return _rec(title.strip(), desc.strip() if desc else None,
                    " ".join(texts), date_raw.strip() if date_raw else None,
                    author.strip() if author else None, images, texts)

    if profile == "bdu":
        # div-title family (baodautu.py:122-136): the title lives in a DIV
        # (not an h1); the post-time is sheared with strip(' -') — leading/
        # trailing spaces AND dashes removed (:126); content p join "\n\n"
        # with empties KEPT; author is an <a class="author">
        title = _first(_RE_TITLE_BDU, html)
        if title is None:
            return None
        author = _first(_RE_AUTHOR_BDU, html)
        date_raw = _first(_RE_DATE_BDU, html)
        if date_raw is not None:
            date_raw = date_raw.strip(" -")
        desc = _first(_RE_DESC_BDU, html)
        m = _RE_BODY_BDU.search(html)
        walk = _walk2(m.group(1), _RE_WALK_BDU) if m else []
        texts = [v.strip() for k, v in walk if k == "text"]  # empties KEPT
        images = [v for k, v in walk if k == "image"]
        return _rec(title.strip(), desc.strip() if desc else None,
                    "\n\n".join(texts), date_raw,
                    author.strip() if author else None, images, texts)

    if profile == "pnm":
        # itemprop-selector crash-drop family (phunumoi.py:115-130): every
        # field access is an unguarded .get_text() — a missing title, desc,
        # date, articleBody div OR author crashes extract_content into the
        # broad except and drops the article; content div selected by the
        # ITEMPROP attribute, not a class; "\n" join with empties KEPT;
        # srcless <img> decoys skipped (:127)
        title = _first(_RE_TITLE_PNM, html)
        desc = _first(_RE_DESC_PNM, html)
        date_raw = _first(_RE_DATE_PNM, html)
        m = _RE_BODY_PNM.search(html)
        author = _first(_RE_AUTHOR_PNM, html)
        if title is None or desc is None or date_raw is None or m is None \
                or author is None:
            return None  # any missing field -> AttributeError -> drop
        walk = _walk2(m.group(1), _RE_WALK_PNM)
        texts = [v.strip() for k, v in walk if k == "text"]  # empties KEPT
        images = [v for k, v in walk if k == "image"]
        return _rec(title.strip(), desc.strip(), "\n".join(texts),
                    date_raw.strip(), author.strip(), images, texts)

    if profile == "vtc":
        # header-h1 + first-h2 family (vtcnews.py:155-175): title is the h1
        # INSIDE header.mb5; description is the FIRST <h2> in the document
        # ('' when absent); content .edittor-content p stripped+filtered
        # "\n"; images ONLY figure.expNoEdit img[data-src]; author
        # .author-make span ('' when absent)
        header = _first(_RE_HEADER_VTC, html)
        if header is None:
            return None
        title = _first(_RE_H1_FIRST, header)
        if title is None:
            return None
        desc = _first(_RE_H2_FIRST, html)
        date_raw = _first(_RE_DATE_VTC, html)
        m = _RE_BODY_VTC.search(html)
        walk = _walk2(m.group(1), _RE_WALK_VTC) if m else []
        paras = [v.strip() for k, v in walk if k == "text"]
        paras = [p for p in paras if p]
        images = [v for k, v in walk if k == "image"]
        author = _first(_RE_AUTHOR_VTC, html)
        return _rec(title.strip(), desc.strip() if desc else "",
                    "\n".join(paras), date_raw.strip() if date_raw else None,
                    author.strip() if author else "", images, paras)

    if profile == "cgl":
        # longform-header family (congly.py:126-160): sc-longform-header-*
        # selectors; content div.entry all p joined "\n" with empties KEPT;
        # images from <figure> wrappers only; author else None
        title = _first(_RE_TITLE_CGL, html)
        if title is None:
            return None
        desc = _first(_RE_DESC_CGL, html)
        date_raw = _first(_RE_DATE_CGL, html)
        author = _first(_RE_AUTHOR_CGL, html)
        m = _RE_BODY_CGL.search(html)
        walk = _walk2(m.group(1), _RE_WALK_CGL) if m else []
        texts = [v.strip() for k, v in walk if k == "text"]  # empties KEPT
        images = [v for k, v in walk if k == "image"]
        return _rec(title.strip(), desc.strip() if desc else None,
                    "\n".join(texts), date_raw.strip() if date_raw else None,
                    author.strip() if author else None, images, texts)

    if profile == "ctg":
        # p+strong double-walk family (congthuong.py:128-149): find_all
        # (["p","strong"]) returns p elements AND every strong — a strong
        # NESTED in a p contributes its text twice (inside the p's text,
        # then standalone), in document order; "\n" join, empties filtered
        title = _first(_RE_TITLE_CTG, html)
        if title is None:
            return None
        desc = _first(_RE_DESC_CTG, html)
        date_raw = _first(_RE_FORMAT_TIME, html)
        m = _RE_BODY_CTG.search(html)
        texts: list[str] = []
        images: list[str] = []
        if m:
            for mm in _RE_WALK_CTG.finditer(m.group(1)):
                g = mm.groupdict()
                if g["para"] is not None:
                    texts.append(_STRIP_TAGS.sub("", g["para"]).strip())
                    # nested strongs re-emit AFTER their parent p
                    for sm in _RE_STRONG.finditer(g["para"]):
                        texts.append(sm.group(1).strip())
                elif g["strong"] is not None:
                    texts.append(g["strong"].strip())
                elif g["img"] is not None:
                    images.append(g["img"])
        texts = [t for t in texts if t]
        author = _first(_RE_AUTHOR_CTG, html)
        return _rec(title.strip(), desc.strip() if desc else None,
                    "\n".join(texts), date_raw.strip() if date_raw else None,
                    author.strip() if author else None, images, texts)

    if profile == "btv":
        # two-part-date family (baotaichinhvietnam.py:121-145): the publish
        # date is ASSEMBLED as "{format_time} {format_date}" from two spans
        # nested in span.article-publish-time; author h2.author-title with
        # div.post-author fallback; "\n\n" join with empties KEPT
        title = _first(_RE_TITLE_BTV, html)
        if title is None:
            return None
        author = _first(_RE_AUTHOR_H2_BTV, html)
        author = author.strip() if author and author.strip() else None
        if author is None:
            fb = _first(_RE_AUTHOR_DIV_BTV, html)
            author = fb.strip() if fb else None
        desc = _first(_RE_DESC_BTV, html)
        box = _first(_RE_TIMEBOX_BTV, html)
        date_raw = None
        if box is not None:
            tp = _first(_RE_FORMAT_TIME, box)
            dp = _first(_RE_FORMAT_DATE, box)
            if tp is not None and dp is not None:
                date_raw = f"{tp.strip()} {dp.strip()}"
        m = _RE_BODY_BTV.search(html)
        walk = _walk2(m.group(1), _RE_WALK_PI) if m else []
        texts = [v.strip() for k, v in walk if k == "text"]  # empties KEPT
        images = [v for k, v in walk if k == "image"]
        return _rec(title.strip(), desc.strip() if desc else None,
                    "\n\n".join(texts), date_raw, author, images, texts)

    if profile == "qlt":
        # MASTERCMS family (quanlythitruong.py:118-146): unguarded
        # .get_text() on title/desc/date — any missing crash-drops the
        # article; author = span.article-publisher else the LAST nonempty
        # right-aligned p of the content; "\n" join, empties filtered
        title = _first(_RE_TITLE_QLT, html)
        desc = _first(_RE_DESC_QLT, html)
        date_raw = _first(_RE_FORMAT_TIME, html)
        if title is None or desc is None or date_raw is None:
            return None  # AttributeError -> broad except -> drop
        m = _RE_BODY_QLT.search(html)
        body = m.group(1) if m else ""
        walk = _walk2(body, _RE_WALK_QLT)
        paras = [_STRIP_TAGS.sub("", v).strip() for k, v in walk if k == "text"]
        paras = [p for p in paras if p]
        images = [v for k, v in walk if k == "image"]
        author = _first(_RE_PUBLISHER_QLT, html)
        if author is not None:
            author = author.strip()
        else:
            for p in reversed(_RE_RIGHT_P_QLT.findall(body)):
                text = _STRIP_TAGS.sub("", p).strip()
                if text:
                    author = text
                    break
        return _rec(title.strip(), desc.strip(), "\n".join(paras),
                    date_raw.strip(), author, images, paras)

    if profile == "tdn":
        # noidung-h2 family (taichinhdoanhnghiep.py:120-139): the
        # description is the content div's FIRST h2, whitespace-normalized
        # with re.sub(r'\s+',' ') — and the lookup is UNGUARDED, so a
        # missing h2 crash-drops the article; so does a missing
        # blockquote.blockquote-reverse (the author cite chain);
        # "\n\n" join with empties KEPT
        m = _RE_ARTICLE_H1_TDN.search(html)
        title = m.group(1) if m else None
        if title is None:
            return None
        date_raw = _first(_RE_TIME_TDN, html)
        bm = _RE_BODY_TDN.search(html)
        body = bm.group(1) if bm else ""
        h2 = _first(_RE_H2_IN_BODY, body)
        if h2 is None:
            return None  # find("h2").get_text() crash-drop
        desc = _RE_WS.sub(" ", h2).strip()
        cite = _first(_RE_CITE_TDN, html)
        if cite is None:
            return None  # find('blockquote').find('cite') crash-drop
        walk = _walk2(body, _RE_WALK_PI)
        texts = [v.strip() for k, v in walk if k == "text"]  # empties KEPT
        images = [v for k, v in walk if k == "image"]
        return _rec(title.strip(), desc, "\n\n".join(texts),
                    date_raw.strip() if date_raw else None,
                    cite.strip(), images, texts)

    if profile == "thc":
        # justify-filtered family (thuonghieucongluan.py:117-133): title is
        # the <a> NESTED in h1.page-title (unguarded -> crash-drop); the
        # date span carries a 'bi-clock' icon token that is .replace()'d
        # away; ONLY p[style=text-align: justify] feed the content
        # ("\n\n", empties KEPT); author = right-p with a global
        # "Theo "-replace
        title = _first(_RE_TITLE_THC, html)
        date_raw = _first(_RE_DATE_THC, html)
        desc = _first(_RE_DESC_THC, html)
        if title is None or date_raw is None or desc is None:
            return None  # unguarded select_one chain
        date_raw = date_raw.replace("bi-clock", "").strip()
        m = _RE_BODY_THC.search(html)
        body = m.group(1) if m else ""
        texts: list[str] = []
        images: list[str] = []
        for mm in _RE_WALK_THC.finditer(body):
            g = mm.groupdict()
            if g["para"] is not None:
                texts.append(g["para"].strip())
            elif g["img"] is not None:
                images.append(g["img"])
        author = None
        am = _RE_RIGHT_P_THC.search(body)
        if am:
            author = _STRIP_TAGS.sub("", am.group(1)).strip().replace("Theo ", "")
        return _rec(title.strip(), desc.strip(), "\n\n".join(texts),
                    date_raw, author, images, texts)

    if profile == "tgd":
        # heading-ul-date family (tapchigiaoduc.py:114-133): the date rides
        # in the news-heading's first li.list-inline-item (unguarded
        # container chain); content = whole-div get_text("\n") = stripped
        # nonempty fragments "\n"-joined; author p[align=right] — the HTML
        # ALIGN attribute, not a style
        title = _first(_RE_TITLE_TGD, html)
        if title is None:
            return None
        desc = _first(_RE_DESC_TGD, html)
        heading = _first(_RE_HEADING_TGD, html)
        if heading is None:
            return None  # unguarded news_heading.find chain
        date_raw = _first(_RE_DATE_LI_TGD, heading)
        m = _RE_BODY_TGD.search(html)
        walk = _walk2(m.group(1), _RE_WALK_TGD) if m else []
        texts = [v.strip() for k, v in walk if k == "text"]
        texts = [t for t in texts if t]
        images = [v for k, v in walk if k == "image"]
        author = None
        if m:
            am = _RE_ALIGN_RIGHT_TGD.search(m.group(1))
            if am:
                author = _STRIP_TAGS.sub("", am.group(1)).strip()
        return _rec(title.strip(), desc.strip() if desc else "",
                    "\n".join(texts), date_raw.strip() if date_raw else None,
                    author, images, texts)

    if profile == "bxd":
        # data-role family behind a selenium one-shot listing
        # (baoxaydung.py:128-152): publishdate rstrip('|'); author a.name
        # rstrip('-'); content = whole detail-cmain get_text("\n")
        title = _first(_RE_TITLE_BXD, html)
        if title is None:
            return None
        desc = _first(_RE_DESC_BXD, html)
        date_raw = _first(_RE_DATE_BXD, html)
        if date_raw is not None:
            date_raw = date_raw.strip().rstrip("|").strip()
        m = _RE_BODY_BXD.search(html)
        walk = _walk2(m.group(1), _RE_WALK_PI) if m else []
        texts = [v.strip() for k, v in walk if k == "text"]
        texts = [t for t in texts if t]
        images = [v for k, v in walk if k == "image"]
        author = _first(_RE_AUTHOR_BXD, html)
        if author is not None:
            author = author.strip().rstrip("-").strip()
        return _rec(title.strip(), desc.strip() if desc else None,
                    "\n".join(texts), date_raw, author, images, texts)

    if profile == "skd":
        # data-role + data-original family (suckhoedoisong.py:129-160):
        # every selector carries a data-role attribute; images prefer
        # data-original over src and keep http-prefixed only; "\n" join
        title = _first(_RE_TITLE_SKD, html)
        if title is None:
            return None
        desc = _first(_RE_DESC_SKD, html)
        date_raw = _first(_RE_DATE_SKD, html)
        if date_raw is not None:
            date_raw = date_raw.strip().rstrip("|").strip()
        m = _RE_BODY_SKD.search(html)
        texts = []
        images = []
        if m:
            for mm in _RE_WALK_SKD.finditer(m.group(1)):
                g = mm.groupdict()
                if g["para"] is not None:
                    t = g["para"].strip()
                    if t:
                        texts.append(t)
                else:
                    src = g["orig"] if g["orig"] is not None else g["src"]
                    if src and src.startswith("http"):
                        images.append(src)
        author = _first(_RE_AUTHOR_SKD, html)
        return _rec(title.strip(), desc.strip() if desc else None,
                    "\n".join(texts), date_raw,
                    author.strip() if author else None, images, texts)

    if profile == "bvh":
        # no-separator family (baovanhoa.py:184-199): content is the
        # detail__content's .text PROPERTY — get_text() with NO separator,
        # so adjacent paragraphs CONCATENATE; date = first <time> anywhere;
        # author span.detail__author unguarded -> crash-drop
        title = _first(_RE_TITLE_BVH, html)
        if title is None:
            return None
        desc = _first(_RE_DESC_BVH, html)
        author = _first(_RE_AUTHOR_BVH, html)
        if author is None:
            return None  # unguarded .text chain
        date_raw = _first(_RE_TIME_ANY, html)
        m = _RE_BODY_BVH.search(html)
        walk = _walk2(m.group(1), _RE_WALK_PI) if m else []
        texts = [v.strip() for k, v in walk if k == "text"]
        texts = [t for t in texts if t]
        images = [v for k, v in walk if k == "image"]
        return _rec(title.strip(), desc.strip() if desc else None,
                    "".join(texts), date_raw.strip() if date_raw else None,
                    author.strip(), images, texts)

    if profile == "tnm":
        # span-decompose family (tainguyenvamoitruong.py:117-143): the
        # descDetail paragraph's <span> children are DECOMPOSED before
        # get_text; h2 title; author = last right-styled p of the content
        # (which stays in the content); images urljoin'd against the base
        title = _first(_RE_TITLE_TNM, html)
        desc_raw = _first(_RE_DESC_TNM, html)
        date_raw = _first(_RE_DATE_TNM, html)
        if title is None or desc_raw is None or date_raw is None:
            return None  # unguarded .text chain
        desc = _STRIP_TAGS.sub("", _RE_SPAN_TAG.sub("", desc_raw)).strip()
        m = _RE_BODY_TNM.search(html)
        texts = []
        images = []
        author = None
        if m:
            right_texts = []
            for mm in _RE_WALK_TNM.finditer(m.group(1)):
                g = mm.groupdict()
                if g["para"] is not None:
                    t = _STRIP_TAGS.sub("", g["para"]).strip()
                    if t:
                        texts.append(t)
                    if g["style"] and "text-align: right" in g["style"] and \
                            _STRIP_TAGS.sub("", g["para"]).strip():
                        right_texts.append(_STRIP_TAGS.sub("", g["para"]).strip())
                elif g["img"] is not None:
                    src = g["img"]
                    images.append(
                        src if src.startswith("http") else base_url + src
                    )
            if right_texts:
                author = right_texts[-1]
        return _rec(title.strip(), desc, "\n\n".join(texts),
                    date_raw.strip(), author, images, texts)

    if profile == "kth":
        # justify-filtered p+div family (kienthuc.py:165-185): title via
        # get_text() with NO strip; content blocks are p OR div whose style
        # contains text-align: justify (style LAMBDA), "\n\n" join; date =
        # first <time>; author span.name unguarded -> crash-drop
        title = _first(_RE_TITLE_KTH, html)
        if title is None:
            return None
        desc = _first(_RE_DESC_KTH, html)
        date_raw = _first(_RE_TIME_ANY, html)
        author = _first(_RE_AUTHOR_NAME_KTH, html)
        if author is None:
            return None
        m = _RE_BODY_KTH.search(html)
        texts = []
        images = []
        if m:
            for mm in _RE_WALK_KTH.finditer(m.group(1)):
                g = mm.groupdict()
                if g["para"] is not None:
                    if g["style"] and "text-align: justify" in g["style"]:
                        texts.append(_STRIP_TAGS.sub("", g["para"]).strip())
                elif g["img"] is not None:
                    images.append(g["img"])
        return _rec(title, desc.strip() if desc else None,
                    "\n\n".join(texts), date_raw.strip() if date_raw else None,
                    author.strip(), images, texts)

    if profile == "bhq":
        # breadcrumb-date family (baohaiquanvietnam.py:116-146): the date
        # is scanned out of ol.breadcrumb anchors by a dd/mm/yyyy hh:mm:ss
        # regex; caption paragraphs (containing an img or 'Ảnh:') are
        # SKIPPED from the content; author = FIRST right-styled p ('' when
        # absent); images urljoin'd
        title = _first(_RE_TITLE_BHQ, html)
        if title is None:
            return None
        desc = _first(_RE_QUE_STRONG_BHQ, html)
        date_raw = None
        bc = _first(_RE_BREADCRUMB_BHQ, html)
        if bc:
            for a in _RE_BC_A.findall(bc):
                if _RE_BC_DATE.search(a.strip()):
                    date_raw = a.strip()
                    break
        m = _RE_BODY_BHQ.search(html)
        texts = []
        images = []
        author = ""
        if m:
            for mm in _RE_WALK_BHQ.finditer(m.group(1)):
                g = mm.groupdict()
                if g["para"] is not None:
                    raw = g["para"]
                    if author == "" and g["style"] and \
                            "text-align: right" in g["style"]:
                        author = _STRIP_TAGS.sub("", raw).strip()
                    if "<img" in raw or "Ảnh:" in _STRIP_TAGS.sub("", raw):
                        # caption paragraph skipped from the content, but
                        # its nested images still collect below
                        for im in _RE_IMG_PLAIN.findall(raw):
                            images.append(
                                im if im.startswith("http") else base_url + im
                            )
                        continue
                    t = _STRIP_TAGS.sub("", raw).strip()
                    if t:
                        texts.append(t)
                elif g["img"] is not None:
                    src = g["img"]
                    images.append(
                        src if src.startswith("http") else base_url + src
                    )
        return _rec(title.strip(), desc.strip() if desc else "",
                    "\n".join(texts), date_raw, author, images, texts)

    raise ValueError(f"unknown v2 profile {profile}")


# --- listing families (F4) -------------------------------------------------

_RE_KHUVUC = re.compile(r'<div id="KhuVuc_3">(.*?)</div>', re.S)
_RE_A_HREF = re.compile(r'<a href="(.*?)">')
_RE_VNE_CONTAINER = re.compile(
    r'<div class="col-12 col-lg-9 column-border">(.*?)</div><!--col-end-->', re.S
)
_RE_ARTICLE_SPAN = re.compile(r"<article>(.*?)</article>", re.S)
_RE_ITEM_POST = re.compile(r'<div class="item-post">(.*?)</div>', re.S)
_RE_TCT_CONTAINERS = re.compile(
    r'<div class="(?:widget-layout-1 pt-4 mb-4|list-view)">(.*?)</div>', re.S
)
_RE_ZONE_STORY = re.compile(
    r'<ul class="zone category-listing-story">(.*?)</ul>', re.S
)
_RE_STORY_SPAN = re.compile(r'<article class="story">(.*?)</article>', re.S)
_RE_LINK_TITLE = re.compile(r'<a class="link-title" href="(.*?)">')
_RE_CTRANGC3 = re.compile(r'<div class="ctrangc3">(.*?)</div>', re.S)
_RE_THUMB_A = re.compile(r'<a class="thumb300x170" href="(.*?)">')
_RE_POST_ENTRY2 = re.compile(
    r'<div class="d-md-flex post-entry-2 small-img">(.*?)</div>', re.S
)
_RE_COL_LG8 = re.compile(r'<div class="col-lg-8">(.*?)</div>', re.S)
_RE_LI_SPAN = re.compile(r"<li>(.*?)</li>", re.S)
_RE_UL_LNH = re.compile(r'<ul class="list_news_home">(.*?)</ul>', re.S)
_RE_NEWS2_SECTION = re.compile(
    r'<div class="col-xs-12 col-sm-8 col-md-8 news2">(.*?)<!--news2-end-->', re.S
)
_RE_NEWS2_ITEM = re.compile(r'<div class="news2Item">(.*?)</div>', re.S)
_RE_ONECMS_UL = re.compile(r'<ul class="onecms__loading">(.*?)</ul>', re.S)
_RE_BGRID_A = re.compile(r'<h3 class="b-grid__title"><a href="(.*?)">')
_RE_BXCAT = re.compile(
    r'<div class="bx-cat-content fw lt mb2">(.*?)<!--bxcat-end-->', re.S
)
_RE_H3_ARTICLE_TITLE = re.compile(r'<h3 class="article-title">(.*?)</h3>', re.S)
_RE_CATLISTING = re.compile(
    r'<div class="cat-listing bg-dots mt20 pt20 article-bdt-20 thumb-w250 '
    r'title-22 no-catname">(.*?)<!--catlisting-end-->', re.S
)
_RE_BXLIST = re.compile(
    r'<div class="bx-list fw lt mb clearfix">(.*?)<!--bxlist-end-->', re.S
)
_RE_DLE = re.compile(r'<div id="dle-content">(.*?)<!--dle-end-->', re.S)
_RE_A_ARTICLE_TITLE = re.compile(r'<a class="article-title" href="(.*?)">')
_RE_LIST_ARTICLES = re.compile(
    r'<ul class="list-unstyled list-articles mt-2rem">(.*?)</ul>', re.S
)
_RE_H3_CARD_A = re.compile(
    r'<h3 class="mt-0 mb-1 title card-title fs-18"><a href="(.*?)">'
)
_RE_ROW_DIV = re.compile(r'<div class="row">(.*?)<!--row-end-->', re.S)
_RE_IMG_CONTENT_DIV = re.compile(
    r'<div class="img-content">(.*?)</div>', re.S
)
_RE_CATBOX_LG = re.compile(r'<div class="category-box-lg">(.*?)</div>', re.S)
_RE_H6_A = re.compile(r"<h6><a href=\"(.*?)\">")
_RE_CATE_BOX_BXD = re.compile(
    r'<div class="section__news-cate-box">(.*?)<!--catebox-end-->', re.S
)
_RE_BOXCAT_TITLE_A = re.compile(
    r'<h3 class="box-category-title-text"><a href="(.*?)">'
)
_RE_CAT_MIDDLE = re.compile(
    r'<div class="box-category-middle">(.*?)<!--catmid-end-->', re.S
)
_RE_H3_PLAIN_A = re.compile(r"<h3><a href=\"(.*?)\">")
_RE_STORY_BVH = re.compile(r'<article class="story">(.*?)</article>', re.S)
_RE_STORY_TITLE_BVH = re.compile(r'<h3 class="story__title">(.*?)</h3>', re.S)
_RE_LISTNEWS_TNM = re.compile(
    r'<div class="list_news-page">(.*?)<!--listnews-end-->', re.S
)
_RE_TITLE24_A = re.compile(r'<h3 class="title-24"><a href="(.*?)">')
_RE_WRAP_NEWS = re.compile(r'<div class="wrap-news-list">(.*?)</div>', re.S)


def _fam_h3_title_news(html: str) -> list[str]:
    # h3.title-news anchors (vnexpress.py:258-261 shape)
    return _RE_ANCHOR.findall(html)


def _fam_article_walk(html: str) -> list[str]:
    # article > h3|h2 > a, headingless articles skipped (vtcnews.py:231-243)
    return _RE_ARTICLE_WALK.findall(html)


def _fam_multi_class(html: str) -> list[str]:
    # three interchangeable title classes (vietnamnet.py:227-231)
    return _RE_MULTI_CLASS.findall(html)


def _fam_newstitle_div(html: str) -> list[str]:
    # div.newsTitle anchors under the category container
    # (congnghevadoisong.py:193-201)
    return _RE_NEWSTITLE_DIV.findall(html)


def _fam_relative_only(html: str) -> list[str]:
    # h2.title anchors keeping ONLY '/'-prefixed hrefs (kienthuc.py:244-253);
    # absolutization happens downstream (F5)
    if '<section class="cat-listnews' not in html:
        return []
    return [u for u in _RE_H2_TITLE.findall(html) if u.startswith("/")]


def _fam_http_filter(html: str) -> list[str]:
    # article a[href] under the category list, http(s) only, first-occurrence
    # dedup (quandoinhandan.py:198-202 — list(set()) order is run-dependent;
    # keep-first document order is the pinned spec)
    if '<div class="list-news-category">' not in html:
        return []
    seen: set[str] = set()
    links: list[str] = []
    for u in _RE_PLAIN_ARTICLE_A.findall(html):
        if u.startswith("http") and u not in seen:
            seen.add(u)
            links.append(u)
    return links


def _fam_khuvuc_anchors(html: str) -> list[str]:
    # div#KhuVuc_3, ALL a[href] — no heading filter; the site prepends its
    # base unconditionally, so hrefs are relative (dangcongsan.py:199-209)
    m = _RE_KHUVUC.search(html)
    return _RE_A_HREF.findall(m.group(1)) if m else []


def _fam_article_first_a(html: str) -> list[str]:
    # container div, FIRST a[href] of each <article>; anchorless articles
    # skipped; href kept absolute or absolutized downstream
    # (vneconomy.py:193-209)
    m = _RE_VNE_CONTAINER.search(html)
    if not m:
        return []
    links = []
    for am in _RE_ARTICLE_SPAN.finditer(m.group(1)):
        a = _RE_A_HREF.search(am.group(1))
        if a:
            links.append(a.group(1))
    return links


def _fam_item_post(html: str) -> list[str]:
    # .item-post a[href] — every anchor of every item-post
    # (kinhtedouong.py:231-240)
    links = []
    for im in _RE_ITEM_POST.finditer(html):
        links.extend(_RE_A_HREF.findall(im.group(1)))
    return links


def _fam_two_container(html: str) -> list[str]:
    # both container classes, '/'-prefixed hrefs only, ORDERED first-
    # occurrence dedup — the reference's list(dict.fromkeys())
    # (tapchicongthuong.py:210-225)
    seen: set[str] = set()
    links: list[str] = []
    for cm in _RE_TCT_CONTAINERS.finditer(html):
        for u in _RE_A_HREF.findall(cm.group(1)):
            if u.startswith("/") and u not in seen:
                seen.add(u)
                links.append(u)
    return links


def _fam_zone_story(html: str) -> list[str]:
    # ul.zone.category-listing-story > article.story > first a[href];
    # base prepended unconditionally, so hrefs are relative
    # (vietnamdaily.py:204-219)
    m = _RE_ZONE_STORY.search(html)
    if not m:
        return []
    links = []
    for am in _RE_STORY_SPAN.finditer(m.group(1)):
        a = _RE_A_HREF.search(am.group(1))
        if a:
            links.append(a.group(1))
    return links


def _fam_link_title(html: str) -> list[str]:
    # div.list-new-cate, a.link-title hrefs returned AS-IS
    # (suckhoecong.py:196-207)
    if '<div class="list-new-cate">' not in html:
        return []
    return _RE_LINK_TITLE.findall(html)


def _fam_ctrangc3(html: str) -> list[str]:
    # div.ctrangc3, ALL a[href] inside, hrefs as-is (baovephapluat.py:227-234)
    m = _RE_CTRANGC3.search(html)
    return _RE_A_HREF.findall(m.group(1)) if m else []


def _fam_thumb_class(html: str) -> list[str]:
    # a.thumb300x170 anywhere in the document; class-less anchors skipped
    # (tapchidientu.py:205-212)
    return _RE_THUMB_A.findall(html)


def _fam_two_phase(html: str) -> list[str]:
    # ALL post-entry-2 containers' first anchors, THEN the col-lg-8 header
    # containers' first anchors — two-phase document order; the empty-page
    # check looks only at the FIRST set (tapchitoaan.py:200-216)
    entries = [_RE_A_HREF.search(m.group(1)) for m in _RE_POST_ENTRY2.finditer(html)]
    links = [a.group(1) for a in entries if a]
    if not links:
        return []
    for m in _RE_COL_LG8.finditer(html):
        a = _RE_A_HREF.search(m.group(1))
        if a:
            links.append(a.group(1))
    return links


def _fam_news2item(html: str) -> list[str]:
    # news2 section div, div.news2Item > first a[href] each
    # (phunumoi.py:189-198)
    m = _RE_NEWS2_SECTION.search(html)
    if not m:
        return []
    links = []
    for im in _RE_NEWS2_ITEM.finditer(m.group(1)):
        a = _RE_A_HREF.search(im.group(1))
        if a:
            links.append(a.group(1))
    return links


def _fam_bgrid_title(html: str) -> list[str]:
    # selenium one-shot: ul.onecms__loading, h3.b-grid__title > a — the
    # reference accumulates a SET across load-more clicks (congly.py:213-233);
    # document order is the pinned deterministic stand-in for set order
    m = _RE_ONECMS_UL.search(html)
    return _RE_BGRID_A.findall(m.group(1)) if m else []


def _fam_bx_cat_content(html: str) -> list[str]:
    # h3.article-title > a under the bx-cat container, http(s)-prefixed
    # hrefs only (congthuong.py:212-225)
    m = _RE_BXCAT.search(html)
    if not m:
        return []
    links = []
    for hm in _RE_H3_ARTICLE_TITLE.finditer(m.group(1)):
        a = _RE_A_HREF.search(hm.group(1))
        if a and a.group(1).startswith("http"):
            links.append(a.group(1))
    return links


def _fam_cat_listing(html: str) -> list[str]:
    # the seven-class cat-listing container, h3.article-title > first a
    # (baotaichinhvietnam.py:211-222)
    m = _RE_CATLISTING.search(html)
    if not m:
        return []
    links = []
    for hm in _RE_H3_ARTICLE_TITLE.finditer(m.group(1)):
        a = _RE_A_HREF.search(hm.group(1))
        if a:
            links.append(a.group(1))
    return links


def _fam_bx_list(html: str) -> list[str]:
    # div.bx-list, h3.article-title's FIRST a (h3.a — direct child), an
    # anchorless h3 skipped (quanlythitruong.py:203-210)
    m = _RE_BXLIST.search(html)
    if not m:
        return []
    links = []
    for hm in _RE_H3_ARTICLE_TITLE.finditer(m.group(1)):
        a = _RE_A_HREF.search(hm.group(1))
        if a:
            links.append(a.group(1))
    return links


def _fam_dle_content(html: str) -> list[str]:
    # div#dle-content, a.article-title anchors directly
    # (taichinhdoanhnghiep.py:197-203)
    m = _RE_DLE.search(html)
    return _RE_A_ARTICLE_TITLE.findall(m.group(1)) if m else []


def _fam_list_articles(html: str) -> list[str]:
    # ul.list-articles, the six-class h3 > a (thuonghieucongluan.py:192-199)
    m = _RE_LIST_ARTICLES.search(html)
    return _RE_H3_CARD_A.findall(m.group(1)) if m else []


def _fam_row_h6(html: str) -> list[str]:
    # per row: div.img-content h6>a's THEN div.category-box-lg h6>a's
    # (tapchigiaoduc.py:192-206)
    links = []
    for rm in _RE_ROW_DIV.finditer(html):
        row = rm.group(1)
        for cm in _RE_IMG_CONTENT_DIV.finditer(row):
            a = _RE_H6_A.search(cm.group(1))
            if a:
                links.append(a.group(1))
        for cm in _RE_CATBOX_LG.finditer(row):
            a = _RE_H6_A.search(cm.group(1))
            if a:
                links.append(a.group(1))
    return links


def _fam_cate_box(html: str) -> list[str]:
    # selenium one-shot: div.section__news-cate-box,
    # h3.box-category-title-text a (baoxaydung.py:200-220)
    m = _RE_CATE_BOX_BXD.search(html)
    return _RE_BOXCAT_TITLE_A.findall(m.group(1)) if m else []


def _fam_cat_middle(html: str) -> list[str]:
    # selenium one-shot: div.box-category-middle, h3 a
    # (suckhoedoisong.py:212-230)
    links = []
    for bm in _RE_CAT_MIDDLE.finditer(html):
        links.extend(_RE_H3_PLAIN_A.findall(bm.group(1)))
    return links


def _fam_story_title(html: str) -> list[str]:
    # article.story > h3.story__title > first a (baovanhoa.py:254-266)
    links = []
    for sm in _RE_STORY_BVH.finditer(html):
        tm = _RE_STORY_TITLE_BVH.search(sm.group(1))
        if tm:
            a = _RE_A_HREF.search(tm.group(1))
            if a:
                links.append(a.group(1))
    return links


def _fam_listnews_title24(html: str) -> list[str]:
    # div.list_news-page h3.title-24 a, '/'-prefixed absolutized downstream
    # (tainguyenvamoitruong.py:203-214)
    m = _RE_LISTNEWS_TNM.search(html)
    return _RE_TITLE24_A.findall(m.group(1)) if m else []


def _fam_wrap_news_list(html: str) -> list[str]:
    # .wrap-news-list containers, select_one a[href] each
    # (baohaiquanvietnam.py:197-208)
    links = []
    for wm in _RE_WRAP_NEWS.finditer(html):
        a = _RE_A_HREF.search(wm.group(1))
        if a:
            links.append(a.group(1))
    return links


def _fam_ul_li_first_a(html: str) -> list[str]:
    # ul.list_news_home li > first a[href] each (baodautu.py:194-202)
    m = _RE_UL_LNH.search(html)
    if not m:
        return []
    links = []
    for lm in _RE_LI_SPAN.finditer(m.group(1)):
        a = _RE_A_HREF.search(lm.group(1))
        if a:
            links.append(a.group(1))
    return links


LISTING_PARSERS = {
    "h3-title-news": _fam_h3_title_news,
    "article-walk": _fam_article_walk,
    "multi-class": _fam_multi_class,
    "newstitle-div": _fam_newstitle_div,
    "relative-only": _fam_relative_only,
    "http-filter": _fam_http_filter,
    "khuvuc-anchors": _fam_khuvuc_anchors,
    "article-first-a": _fam_article_first_a,
    "item-post": _fam_item_post,
    "two-container": _fam_two_container,
    "zone-story": _fam_zone_story,
    "link-title": _fam_link_title,
    "ctrangc3": _fam_ctrangc3,
    "thumb-class": _fam_thumb_class,
    "two-phase": _fam_two_phase,
    "ul-li-first-a": _fam_ul_li_first_a,
    "news2item": _fam_news2item,
    "bgrid-title": _fam_bgrid_title,
    "bx-cat-content": _fam_bx_cat_content,
    "cat-listing": _fam_cat_listing,
    "bx-list": _fam_bx_list,
    "dle-content": _fam_dle_content,
    "list-articles": _fam_list_articles,
    "row-h6": _fam_row_h6,
    "cate-box": _fam_cate_box,
    "cat-middle": _fam_cat_middle,
    "story-title": _fam_story_title,
    "listnews-title24": _fam_listnews_title24,
    "wrap-news-list": _fam_wrap_news_list,
}

# sniff order for family=None callers: container-gated families first (their
# gates are unambiguous), anchor-shape families after
_SNIFF_ORDER = (
    "khuvuc-anchors", "article-first-a", "item-post", "two-container",
    "zone-story", "link-title", "ctrangc3", "thumb-class", "two-phase",
    "ul-li-first-a", "news2item", "bgrid-title", "bx-cat-content",
    "cat-listing", "bx-list", "dle-content", "list-articles", "row-h6",
    "cate-box", "cat-middle", "story-title", "listnews-title24",
    "wrap-news-list", "h3-title-news", "article-walk",
    "multi-class", "newstitle-div", "relative-only", "http-filter",
)


def parse_listing(html: str, family: str | None = None) -> tuple[list[str], bool]:
    """Listing page -> (hrefs in document order, is_terminal).

    When ``family`` is given (from the host dimension's LISTING_FAMILY) the
    matching parser runs scoped to its own container — a page mixing markup
    from two families parses per the HOST profile, not per whichever regex
    fires first.  ``family=None`` falls back to structural sniffing in
    ``_SNIFF_ORDER`` (families are structurally disjoint by construction).

    is_terminal mirrors the selenium one-shot 'returned a set' stop signal
    (base_crawler.py:129-131).
    """
    if family is not None:
        links = LISTING_PARSERS[family](html)
    else:
        links = []
        for fam in _SNIFF_ORDER:
            links = LISTING_PARSERS[fam](html)
            if links:
                break
    return links, "<!--one-shot-->" in html
