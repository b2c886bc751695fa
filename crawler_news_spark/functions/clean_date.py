"""Date normalization — byte-exact re-spec of the reference's ``clean_date``.

The reference (utils/service_utils.py:105-163) never parses dates into real
timestamps: it is a pure regex string normalizer producing
``"dd/MM/yyyy, HH:mm (GMT+7)"``.  Range queries in the reference compare these
*strings* ($gte/$lte in mongodb_utils.py:99-106) — which only works because the
format is zero-padded.  We replicate that exactly, and additionally expose a
typed ``published_ts`` derivation for real range queries.

Two implementations, both tested against shared golden vectors:

- :func:`clean_date_py` — the executable spec (used by the pure-Python oracle).
- :func:`clean_date_col` — the same pipeline as Spark *column expressions*
  (regexp_replace / regexp_extract / when), i.e. JVM-side, codegen'd, no UDF.

Java regex notes: Vietnamese letters need the UNICODE_CHARACTER_CLASS flag for
``\\w``, spelled ``(?U)`` (Python's ``re`` is unicode-aware by default).
NFC normalization (reference line 108) has no Spark builtin; engine-internal
synthetic inputs are generated NFC-normalized so the default column path skips
it, and :func:`nfc_col` (a tiny Arrow vUDF pre-pass, exposed through
``clean_date_staged(..., nfc=True)``) closes the gap for real-world corpora
that may arrive NFD — golden-tested with decomposed inputs.
"""

from __future__ import annotations

import re
import unicodedata

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Python spec (mirrors /root/reference/utils/service_utils.py:105-163 exactly)
# ---------------------------------------------------------------------------


def clean_date_py(text_date: str) -> str:
    """Normalize a raw Vietnamese news date string.  Executable spec."""
    text_date = unicodedata.normalize("NFC", text_date)
    text_date = re.sub(r"^Cập nhật lúc\s*", "", text_date, flags=re.IGNORECASE).strip()
    text_date = re.sub(
        r"(Thứ\s\w+|Chủ\sNhật)[,\s-]*(ngày\s*)?", "", text_date, flags=re.IGNORECASE
    ).strip()
    text_date = re.sub(r"\s*lúc\s*", " ", text_date, flags=re.IGNORECASE)
    text_date = re.sub(r"\(GMT\)", "", text_date)
    text_date = text_date.replace(" - ", ", ").replace(" -", ",").replace("- ", ",")

    # time-first form: "HH:mm[,] dd/MM/yyyy" -> whole string rewritten
    match = re.search(r"(\d{1,2}):(\d{2})\s*,?\s*(\d{1,2})/(\d{1,2})/(\d{4})", text_date)
    if match:
        hour, minute, day, month, year = match.groups()
        text_date = f"{int(day):02}/{int(month):02}/{year}, {int(hour):02}:{minute}"
    else:
        match_date = re.search(r"(\d{1,2})/(\d{1,2})/(\d{4})", text_date)
        if match_date:
            day, month, year = match_date.groups()
            text_date = text_date.replace(
                match_date.group(), f"{int(day):02}/{int(month):02}/{year}"
            )
        match_time = re.search(r"(\d{1,2}):(\d{2})\s?(AM|PM)?", text_date, re.IGNORECASE)
        if match_time:
            hour_s, minute, period = match_time.groups()
            hour = int(hour_s)
            if period:
                if period.upper() == "PM" and hour != 12:
                    hour += 12
                elif period.upper() == "AM" and hour == 12:
                    hour = 0
            # NB: the reference replaces EVERY time occurrence with the FIRST
            # match's normalized value — a quirk we replicate.
            text_date = re.sub(
                r"(\d{1,2}):(\d{2})\s?(AM|PM)?", f"{hour:02}:{minute}", text_date
            )
        text_date = re.sub(r"(\d{2}/\d{2}/\d{4})\s+(\d{2}:\d{2})", r"\1, \2", text_date)

    match_timezone = re.search(
        r"(\d{2}/\d{2}/\d{4})\s*(\d{2}:\d{2}):\d{2}\s*\+?\d{1,2}:\d{2}", text_date
    )
    if match_timezone:
        date_part, time_part = match_timezone.groups()
        text_date = f"{date_part}, {time_part} (GMT+7)"

    text_date = re.sub(r"(:\d{2})\s?\+?\d{1,2}:\d{2}", "", text_date)
    text_date = re.sub(r"(?<!\s)\(GMT\+7\)", r" (GMT+7)", text_date)
    if "(GMT+7)" not in text_date:
        text_date += " (GMT+7)"
    return text_date


def nfc_col(col: Column) -> Column:
    """Arrow-batched NFC normalization pre-pass (reference
    service_utils.py:108).  The regex pipeline's Vietnamese literals ("Cập
    nhật", "Thứ", "lúc") are NFC; an NFD corpus would silently miss them, so
    non-NFC sources run through this before :func:`clean_date_col` /
    :func:`clean_date_staged`.  Vectorized per Arrow batch — the only
    non-builtin step, and only paid when requested."""

    @F.pandas_udf("string")
    def _nfc(s: pd.Series) -> pd.Series:
        return s.map(
            lambda x: unicodedata.normalize("NFC", x) if x is not None else None
        )

    return _nfc(col)


# ---------------------------------------------------------------------------
# Spark column-expression version (JVM-side, whole-stage-codegen'd)
# ---------------------------------------------------------------------------

_TIME_FIRST = r"(\d{1,2}):(\d{2})\s*,?\s*(\d{1,2})/(\d{1,2})/(\d{4})"
_DATE = r"(\d{1,2})/(\d{1,2})/(\d{4})"
_TIME_AMPM = r"(?i)(\d{1,2}):(\d{2})\s?(AM|PM)?"
_TZ_COMBO = r"(\d{2}/\d{2}/\d{4})\s*(\d{2}:\d{2}):\d{2}\s*\+?\d{1,2}:\d{2}"


def _pad2(c: Column) -> Column:
    return F.lpad(c.cast("string"), 2, "0")


def clean_date_col(col: Column) -> Column:
    """``clean_date`` as a pure column-expression pipeline (no UDF).

    Input is expected NFC-normalized (guaranteed for engine-internal data).
    """
    t = F.regexp_replace(col, r"(?i)^Cập nhật lúc\s*", "")
    t = F.trim(t)
    # (?U) so \w matches Vietnamese letters under Java regex.
    t = F.regexp_replace(t, r"(?iU)(Thứ\s\w+|Chủ\sNhật)[,\s-]*(ngày\s*)?", "")
    t = F.trim(t)
    t = F.regexp_replace(t, r"(?i)\s*lúc\s*", " ")
    t = F.regexp_replace(t, r"\(GMT\)", "")
    t = F.replace(t, F.lit(" - "), F.lit(", "))
    t = F.replace(t, F.lit(" -"), F.lit(","))
    t = F.replace(t, F.lit("- "), F.lit(","))

    # --- branch: time-first form rewrites the whole string -----------------
    tf_hour = F.regexp_extract(t, _TIME_FIRST, 1)
    tf_min = F.regexp_extract(t, _TIME_FIRST, 2)
    tf_day = F.regexp_extract(t, _TIME_FIRST, 3)
    tf_mon = F.regexp_extract(t, _TIME_FIRST, 4)
    tf_year = F.regexp_extract(t, _TIME_FIRST, 5)
    time_first = F.concat(
        _pad2(tf_day), F.lit("/"), _pad2(tf_mon), F.lit("/"), tf_year,
        F.lit(", "), _pad2(tf_hour), F.lit(":"), tf_min,
    )

    # --- else branch: pad the date in place, normalize AM/PM time ----------
    d_day = F.regexp_extract(t, _DATE, 1)
    d_mon = F.regexp_extract(t, _DATE, 2)
    d_year = F.regexp_extract(t, _DATE, 3)
    date_match = F.regexp_extract(t, _DATE, 0)
    padded_date = F.concat(_pad2(d_day), F.lit("/"), _pad2(d_mon), F.lit("/"), d_year)
    t_else = F.when(date_match != "", F.replace(t, date_match, padded_date)).otherwise(t)

    a_hour = F.regexp_extract(t_else, _TIME_AMPM, 1)
    a_min = F.regexp_extract(t_else, _TIME_AMPM, 2)
    a_period = F.upper(F.regexp_extract(t_else, _TIME_AMPM, 3))
    hour24 = (
        F.when((a_period == "PM") & (a_hour.cast("int") != 12), a_hour.cast("int") + 12)
        .when((a_period == "AM") & (a_hour.cast("int") == 12), F.lit(0))
        .otherwise(a_hour.cast("int"))
    )
    norm_time = F.concat(_pad2(hour24), F.lit(":"), a_min)
    t_else = F.when(
        a_hour != "",
        # replace EVERY time occurrence with the first match's value (quirk)
        F.regexp_replace(t_else, _TIME_AMPM, norm_time),
    ).otherwise(t_else)
    t_else = F.regexp_replace(t_else, r"(\d{2}/\d{2}/\d{4})\s+(\d{2}:\d{2})", r"$1, $2")

    t = F.when(tf_hour != "", time_first).otherwise(t_else)

    # --- timezone-combo form rewrites the whole string ---------------------
    tz_date = F.regexp_extract(t, _TZ_COMBO, 1)
    tz_time = F.regexp_extract(t, _TZ_COMBO, 2)
    t = F.when(
        tz_date != "", F.concat(tz_date, F.lit(", "), tz_time, F.lit(" (GMT+7)"))
    ).otherwise(t)

    t = F.regexp_replace(t, r"(:\d{2})\s?\+?\d{1,2}:\d{2}", "")
    t = F.regexp_replace(t, r"(?<!\s)\(GMT\+7\)", " (GMT+7)")
    t = F.when(~t.contains("(GMT+7)"), F.concat(t, F.lit(" (GMT+7)"))).otherwise(t)
    return t


def clean_date_staged(df, src: str, dst: str, nfc: bool = False):
    """``clean_date`` as a staged column pipeline over a DataFrame.

    Semantically identical to :func:`clean_date_col`, but each intermediate
    is a *named column*: naive Column composition duplicates subtrees at
    every ``when/otherwise`` (the tree grows multiplicatively, costing
    seconds of analysis per wave and repeated regex evaluation per row);
    naming the stages keeps the tree linear.  Still 100% built-in
    expressions — no UDF except the optional ``nfc=True`` pre-pass for
    corpora that may arrive NFD (see :func:`nfc_col`).
    """
    if nfc:
        df = df.withColumn("_cd_nfc", nfc_col(F.col(src)))
        src = "_cd_nfc"
    t = F.regexp_replace(F.col(src), r"(?i)^Cập nhật lúc\s*", "")
    t = F.trim(t)
    t = F.regexp_replace(t, r"(?iU)(Thứ\s\w+|Chủ\sNhật)[,\s-]*(ngày\s*)?", "")
    t = F.trim(t)
    t = F.regexp_replace(t, r"(?i)\s*lúc\s*", " ")
    t = F.regexp_replace(t, r"\(GMT\)", "")
    t = F.replace(t, F.lit(" - "), F.lit(", "))
    t = F.replace(t, F.lit(" -"), F.lit(","))
    t = F.replace(t, F.lit("- "), F.lit(","))
    df = df.withColumn("_cd0", t)

    c0 = F.col("_cd0")
    df = df.withColumns(
        {
            "_tf_h": F.regexp_extract(c0, _TIME_FIRST, 1),
            "_tf_m": F.regexp_extract(c0, _TIME_FIRST, 2),
            "_tf_d": F.regexp_extract(c0, _TIME_FIRST, 3),
            "_tf_mo": F.regexp_extract(c0, _TIME_FIRST, 4),
            "_tf_y": F.regexp_extract(c0, _TIME_FIRST, 5),
            "_dm": F.regexp_extract(c0, _DATE, 0),
            "_dd": F.regexp_extract(c0, _DATE, 1),
            "_dmo": F.regexp_extract(c0, _DATE, 2),
            "_dy": F.regexp_extract(c0, _DATE, 3),
        }
    )
    padded_date = F.concat(
        _pad2(F.col("_dd")), F.lit("/"), _pad2(F.col("_dmo")), F.lit("/"), F.col("_dy")
    )
    df = df.withColumn(
        "_cd1",
        F.when(F.col("_dm") != "", F.replace(c0, F.col("_dm"), padded_date)).otherwise(c0),
    )

    c1 = F.col("_cd1")
    df = df.withColumns(
        {
            "_a_h": F.regexp_extract(c1, _TIME_AMPM, 1),
            "_a_m": F.regexp_extract(c1, _TIME_AMPM, 2),
            "_a_p": F.upper(F.regexp_extract(c1, _TIME_AMPM, 3)),
        }
    )
    hour24 = (
        F.when(
            (F.col("_a_p") == "PM") & (F.col("_a_h").cast("int") != 12),
            F.col("_a_h").cast("int") + 12,
        )
        .when((F.col("_a_p") == "AM") & (F.col("_a_h").cast("int") == 12), F.lit(0))
        .otherwise(F.col("_a_h").cast("int"))
    )
    norm_time = F.concat(_pad2(hour24), F.lit(":"), F.col("_a_m"))
    t_else = F.when(
        F.col("_a_h") != "", F.regexp_replace(c1, _TIME_AMPM, norm_time)
    ).otherwise(c1)
    t_else = F.regexp_replace(t_else, r"(\d{2}/\d{2}/\d{4})\s+(\d{2}:\d{2})", r"$1, $2")
    time_first = F.concat(
        _pad2(F.col("_tf_d")), F.lit("/"), _pad2(F.col("_tf_mo")), F.lit("/"),
        F.col("_tf_y"), F.lit(", "), _pad2(F.col("_tf_h")), F.lit(":"), F.col("_tf_m"),
    )
    df = df.withColumn(
        "_cd2", F.when(F.col("_tf_h") != "", time_first).otherwise(t_else)
    )

    c2 = F.col("_cd2")
    df = df.withColumns(
        {
            "_tz_d": F.regexp_extract(c2, _TZ_COMBO, 1),
            "_tz_t": F.regexp_extract(c2, _TZ_COMBO, 2),
        }
    )
    t3 = F.when(
        F.col("_tz_d") != "",
        F.concat(F.col("_tz_d"), F.lit(", "), F.col("_tz_t"), F.lit(" (GMT+7)")),
    ).otherwise(c2)
    df = df.withColumn("_cd3", t3)

    c3 = F.col("_cd3")
    t4 = F.regexp_replace(c3, r"(:\d{2})\s?\+?\d{1,2}:\d{2}", "")
    t4 = F.regexp_replace(t4, r"(?<!\s)\(GMT\+7\)", " (GMT+7)")
    df = df.withColumn("_cd4", t4)
    df = df.withColumn(
        dst,
        F.when(
            ~F.col("_cd4").contains("(GMT+7)"), F.concat(F.col("_cd4"), F.lit(" (GMT+7)"))
        ).otherwise(F.col("_cd4")),
    )
    drop = [c for c in df.columns if c.startswith(("_cd", "_tf_", "_a_", "_tz_", "_d"))
            and c != dst and c in (
                "_cd_nfc", "_cd0", "_cd1", "_cd2", "_cd3", "_cd4", "_tf_h",
                "_tf_m", "_tf_d", "_tf_mo", "_tf_y", "_dm", "_dd", "_dmo",
                "_dy", "_a_h", "_a_m", "_a_p", "_tz_d", "_tz_t",
            )]
    return df.drop(*drop)


def published_ts_col(clean: Column) -> Column:
    """Typed timestamp derived from the normalized string (engine addition).

    The reference only ever compares the strings; we also offer a real
    timestamp for range queries and window aggregation.
    """
    return F.to_timestamp(
        F.regexp_extract(clean, r"(\d{2}/\d{2}/\d{4}, \d{2}:\d{2})", 1),
        "dd/MM/yyyy, HH:mm",
    )
