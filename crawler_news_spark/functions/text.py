"""Text-analysis column functions — all built-in expressions (JVM, codegen).

Training-data pipeline primitives over a document corpus: token counting,
quality scoring, language ID, fingerprinting.  Every function here has an
exact ANSI-SQL twin used as the DuckDB oracle (__spark_entry__.oracle_sql),
so none may use UDFs or engine-specific semantics.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

PUNCT_CLASS = "[^.,!?;:]"

# language marker words (n-gram heuristic; deterministic argmax, ties broken
# by the fixed order en > de > fr > es)
LANG_MARKERS = {
    "en": r"\b(the|and|of|to|in)\b",
    "de": r"\b(der|die|und|das|ist)\b",
    "fr": r"\b(le|la|et|les|des)\b",
    "es": r"\b(el|los|las|una|es)\b",
}


def token_count_ws(text: Column) -> Column:
    """Whitespace tokenization count.

    regexp_extract_all, not split: split('') yields [''] (count 1) while the
    DuckDB twin counts 0 tokens for empty/whitespace-only text — this form
    returns 0 on both engines."""
    return F.size(F.regexp_extract_all(text, F.lit(r"\S+"), F.lit(0)))


def token_count_bpe_ish(text: Column) -> Column:
    """BPE-ish subword proxy: word pieces + digits + punctuation marks."""
    return F.size(F.regexp_extract_all(text, F.lit(r"[a-zA-Z]{1,4}|\d|[^\sa-zA-Z\d]"), F.lit(0)))


def punct_count(text: Column) -> Column:
    return F.length(F.regexp_replace(text, PUNCT_CLASS, ""))


def marker_count(text: Column, lang: str) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(LANG_MARKERS[lang]), F.lit(0)))


def lang_id(text: Column) -> Column:
    """Deterministic argmax over the marker counts (fixed tiebreak order)."""
    c = {k: marker_count(text, k) for k in LANG_MARKERS}
    best = F.greatest(*c.values())
    expr = F.lit("other")
    # reversed so earlier languages win ties (en beats de beats fr beats es)
    for k in reversed(list(LANG_MARKERS)):
        expr = F.when((c[k] > 0) & (c[k] == best), F.lit(k)).otherwise(expr)
    return expr


def quality_score(text: Column) -> Column:
    """Length/punct/stopword composite in [0,1]-ish, micro-unit integerized
    (bigint) so cross-engine hashing is exact."""
    n = F.length(text)
    toks = token_count_ws(text).cast("double")
    mean_word_len = n.cast("double") / F.greatest(toks, F.lit(1.0))
    punct_ratio = punct_count(text).cast("double") / F.greatest(n.cast("double"), F.lit(1.0))
    stop_ratio = marker_count(text, "en").cast("double") / F.greatest(toks, F.lit(1.0))
    score = (
        F.least(n.cast("double") / F.lit(500.0), F.lit(1.0)) * 0.4
        + F.least(stop_ratio * F.lit(5.0), F.lit(1.0)) * 0.3
        + (F.lit(1.0) - F.least(punct_ratio * F.lit(10.0), F.lit(1.0))) * 0.2
        + F.least(mean_word_len / F.lit(8.0), F.lit(1.0)) * 0.1
    )
    return F.floor(score * 1e6 + F.lit(0.5)).cast("long")


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of the whitespace-normalized lowercase text."""
    return F.md5(F.lower(F.regexp_replace(F.trim(text), r"\s+", " ")))


def md5_prefix_hash(text: Column, n: int = 1000) -> Column:
    """The reference's UI-change hash: md5 of the first n chars
    (ui_checker.py:31-32)."""
    return F.md5(F.substring(text, 1, n))


def dup_ngram_frac_u(text: Column, n: int = 3, tokens: Column | None = None) -> Column:
    """Gopher-style repetition signal (Rae et al. 2021, App. A1.1): the
    fraction of word n-grams that are repeats, micro-unit integerized.
    Pure codegen — 0 for documents shorter than n tokens.

    Pass ``tokens`` as a STAGED (named) token-array column on long-document
    corpora: element accesses inside the gram lambda re-evaluate an inlined
    tokenizer once per access (n gets x n_grams regex runs per row —
    measured 8x on the 5-gram sibling); an attribute reference is free."""
    words = (
        tokens
        if tokens is not None
        else F.regexp_extract_all(F.trim(text), F.lit(r"\S+"), F.lit(0))
    )
    nw = F.size(words)
    grams = F.transform(
        F.sequence(F.lit(0), nw - n),
        lambda i: F.concat_ws(" ", *[F.get(words, i + j) for j in range(n)]),
    )
    total = F.size(grams).cast("double")
    dup = F.lit(1.0) - F.size(F.array_distinct(grams)).cast("double") / total
    return (
        F.when(nw >= n, F.floor(dup * 1e6 + F.lit(0.5)).cast("long"))
        .otherwise(F.lit(0).cast("long"))
    )


def top_word_frac_u(text: Column, tokens: Column | None = None) -> Column:
    """Fraction of tokens that are the single most frequent token (the
    other Gopher repetition axis), micro-unit integerized.

    Per-row mode without explode: sort the token array and fold it with a
    (prev, run, best) accumulator — the longest equal-run in the sorted
    array IS the top token count.  Whole-stage codegen, no shuffle."""
    words = (
        tokens
        if tokens is not None
        else F.regexp_extract_all(F.trim(text), F.lit(r"\S+"), F.lit(0))
    )
    nw = F.size(words)
    sw = F.array_sort(words)
    acc0 = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
    )

    def step(a, w):
        run = F.when(w == a["prev"], a["run"] + 1).otherwise(F.lit(1).cast("long"))
        return F.struct(
            w.alias("prev"), run.alias("run"), F.greatest(a["best"], run).alias("best")
        )

    best = F.aggregate(sw, acc0, step)["best"]
    return (
        F.when(
            nw > 0,
            F.floor(best.cast("double") / nw.cast("double") * 1e6 + F.lit(0.5)).cast("long"),
        )
        .otherwise(F.lit(0).cast("long"))
    )


def datasource_of(url: Column) -> Column:
    """scheme://host prefix — '/'.join(url.split('/')[:3]) (vnexpress.py:235)."""
    return F.concat_ws("/", F.slice(F.split(url, "/"), 1, 3))


# ---- SQL twins (DuckDB oracle strings) -------------------------------------

SQL_TOKEN_WS = r"len(regexp_extract_all(trim(text), '\S+'))"
SQL_PUNCT = r"length(regexp_replace(text, '[^.,!?;:]', '', 'g'))"


def sql_marker(lang: str) -> str:
    return f"len(regexp_extract_all(text, '{LANG_MARKERS[lang]}'))"


def sql_lang_id() -> str:
    cs = {k: sql_marker(k) for k in LANG_MARKERS}
    best = "greatest(" + ", ".join(cs.values()) + ")"
    expr = "'other'"
    for k in reversed(list(LANG_MARKERS)):
        expr = f"CASE WHEN {cs[k]} > 0 AND {cs[k]} = {best} THEN '{k}' ELSE {expr} END"
    return expr


def sql_quality_score() -> str:
    n = "length(text)"
    toks = f"cast({SQL_TOKEN_WS} as double)"
    mean_wl = f"(cast({n} as double) / greatest({toks}, 1.0))"
    punct_r = f"(cast({SQL_PUNCT} as double) / greatest(cast({n} as double), 1.0))"
    stop_r = f"(cast({sql_marker('en')} as double) / greatest({toks}, 1.0))"
    score = (
        f"least(cast({n} as double)/500.0, 1.0)*0.4"
        f" + least({stop_r}*5.0, 1.0)*0.3"
        f" + (1.0 - least({punct_r}*10.0, 1.0))*0.2"
        f" + least({mean_wl}/8.0, 1.0)*0.1"
    )
    return f"cast(floor(({score})*1e6 + 0.5) as bigint)"


SQL_FINGERPRINT = r"md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g')))"
