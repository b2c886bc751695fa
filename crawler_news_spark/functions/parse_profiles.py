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


def parse_listing(html: str) -> tuple[list[str], bool]:
    """Listing page -> (hrefs in document order, is_terminal).

    Families are structurally disjoint, so one parser serves all hosts
    (hostsim.LISTING_FAMILY):

    - h3.title-news anchors (vnexpress shape);
    - article > h3|h2 > a walk — headingless articles skipped
      (vtcnews.py:231-243);
    - multi-class titles (vietnamnet.py:227-231);
    - div.newsTitle anchors under the category container
      (congnghevadoisong.py:193-201);
    - h2.title anchors keeping ONLY relative ('/'-prefixed) hrefs — the
      site prepends its base; absolute outbound links are dropped
      (kienthuc.py:244-253; absolutization happens downstream, F5);
    - plain article > a[href] with the http(s) filter + first-occurrence
      dedup (quandoinhandan.py:198-202 — the reference's list(set()) order
      is run-dependent; keep-first document order is the pinned spec).

    is_terminal mirrors the selenium one-shot 'returned a set' stop signal
    (base_crawler.py:129-131).
    """
    links = _RE_ANCHOR.findall(html)
    if not links:
        links = _RE_ARTICLE_WALK.findall(html)
    if not links:
        links = _RE_MULTI_CLASS.findall(html)
    if not links:
        links = _RE_NEWSTITLE_DIV.findall(html)
    if not links and '<section class="cat-listnews' in html:
        links = [u for u in _RE_H2_TITLE.findall(html) if u.startswith("/")]
    if not links and '<div class="list-news-category">' in html:
        seen: set[str] = set()
        links = []
        for u in _RE_PLAIN_ARTICLE_A.findall(html):
            if u.startswith("http") and u not in seen:
                seen.add(u)
                links.append(u)
    return links, "<!--one-shot-->" in html
