"""Canonical StructTypes for every engine table.

The span shape is mandated by BASELINE.json's input_hint:
    documents(doc_id:string, spans:array<struct<kind,text,media_ref,offset:int32>>)

The article record mirrors the reference's 9/11-key dict
(reference: crawler/vnexpress.py:234-246, crawl_result.json).
"""

from __future__ import annotations

from pyspark.sql import types as T

SPAN = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),  # 'text' | 'image'
        T.StructField("text", T.StringType(), True),  # null for media spans
        T.StructField("media_ref", T.StringType(), True),  # null for text spans
        T.StructField("offset", T.IntegerType(), False),  # dense 0..n-1 doc order
    ]
)

SPANS = T.ArrayType(SPAN)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),  # canonical URL
        T.StructField("spans", SPANS, True),
    ]
)

# Frontier rows.  The crawl-order key is (wave, host, type_id, page_no,
# link_index) — never arrival order (reference iterates types ascending,
# base_crawler.py:95-96, pages ascending in batches :113-118, links in
# listing document order, vnexpress.py:268-270).
FRONTIER = T.StructType(
    [
        T.StructField("wave", T.IntegerType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # 'listing' | 'article'
        T.StructField("type_id", T.IntegerType(), False),
        T.StructField("page_no", T.IntegerType(), False),  # listing page (articles: source page)
        T.StructField("link_index", T.IntegerType(), False),  # 0 for listing rows
        T.StructField("url", T.StringType(), False),
        T.StructField("canonical_url", T.StringType(), False),
        T.StructField("canonical_hash", T.LongType(), False),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("priority", T.DoubleType(), False),
    ]
)

SEEN = T.StructType(
    [
        T.StructField("canonical_hash", T.LongType(), False),
        T.StructField("canonical_url", T.StringType(), False),
        T.StructField("wave", T.IntegerType(), False),  # wave first seen
    ]
)

ARTICLES = T.StructType(
    [
        T.StructField("dataSource", T.StringType(), True),
        T.StructField("url", T.StringType(), False),
        T.StructField("publishedDate", T.StringType(), True),
        T.StructField("author", T.StringType(), True),
        T.StructField("title", T.StringType(), True),
        T.StructField("imageUrl", T.StringType(), True),
        T.StructField("description", T.StringType(), True),
        T.StructField("content", T.StringType(), True),
        T.StructField("comments", T.ArrayType(T.StringType()), True),
        T.StructField("contentImageUrls", T.ArrayType(T.StringType()), True),
        T.StructField("article_type", T.StringType(), True),
        T.StructField("createdAt", T.StringType(), True),
        T.StructField("crawl_order", T.LongType(), True),
    ]
)

# Result of the vectorized parse of an article page (operators/parse.py).
PARSED_ARTICLE = T.StructType(
    [
        T.StructField("title", T.StringType(), True),
        T.StructField("description", T.StringType(), True),
        T.StructField("content", T.StringType(), True),
        T.StructField("pub_date_raw", T.StringType(), True),
        T.StructField("author", T.StringType(), True),
        T.StructField("imageUrl", T.StringType(), True),
        T.StructField("comments", T.ArrayType(T.StringType()), True),
        T.StructField("contentImageUrls", T.ArrayType(T.StringType()), True),
        T.StructField("spans", SPANS, True),
    ]
)

# Result of the vectorized parse of a listing page: hrefs in document order.
PARSED_LISTING = T.StructType(
    [
        T.StructField("out_links", T.ArrayType(T.StringType()), True),
        T.StructField("is_terminal", T.BooleanType(), False),  # selenium one-shot 'set' result
    ]
)

LINEAGE = T.StructType(
    [
        T.StructField("wave", T.IntegerType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("host", T.StringType(), True),
        T.StructField("n_fetched", T.LongType(), False),
        T.StructField("n_parsed", T.LongType(), False),
        T.StructField("n_errors", T.LongType(), False),
        T.StructField("n_links", T.LongType(), False),
        T.StructField("n_bloom_fp", T.LongType(), False),
        T.StructField("t_start", T.DoubleType(), False),
        T.StructField("t_end", T.DoubleType(), False),
    ]
)

HOSTS = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("base_url", T.StringType(), False),
        T.StructField("parser_profile", T.StringType(), False),  # vnx|dtr|btt|vnn
        T.StructField("pagination_kind", T.StringType(), False),
        T.StructField("page_cap", T.IntegerType(), True),  # null = until-empty
        T.StructField("content_join", T.StringType(), False),
        T.StructField("emits_comments", T.BooleanType(), False),
        T.StructField("crawl_delay_s", T.DoubleType(), False),
        T.StructField("robots_disallow", T.ArrayType(T.StringType()), True),
        T.StructField("n_types", T.IntegerType(), False),
        T.StructField("links_per_page", T.IntegerType(), False),
        T.StructField("max_depth", T.IntegerType(), False),
    ]
)

CATEGORIES = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("type_id", T.IntegerType(), False),
        T.StructField("slug", T.StringType(), False),
    ]
)
