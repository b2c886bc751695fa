"""clean_date: golden vectors + Spark-expression parity with the Python spec.

Golden expectations hand-derived from the reference's branch structure
(service_utils.py:105-163); the sample record crawl_result.json:4 pins the
canonical output shape "08/10/2023, 06:49 (GMT+7)".
"""

import pytest

from pyspark.sql import functions as F

from crawler_news_spark.functions.clean_date import (
    clean_date_col,
    clean_date_py,
    clean_date_staged,
    published_ts_col,
)

GOLDEN = [
    # already-normalized passthrough
    ("08/10/2023, 06:49 (GMT+7)", "08/10/2023, 06:49 (GMT+7)"),
    # weekday + tz-combo form (service_utils.py:148-152)
    ("Thứ Sáu, 04/10/2024 16:40:00 +07:00", "04/10/2024, 16:40 (GMT+7)"),
    # weekday + "ngày" + dash + unpadded
    ("Chủ Nhật, ngày 5/1/2024 - 09:05", "05/01/2024, 09:05 (GMT+7)"),
    # time-first form (service_utils.py:121-124)
    ("16:40 04/10/2024", "04/10/2024, 16:40 (GMT+7)"),
    # "Cập nhật lúc" prefix
    ("Cập nhật lúc 08:30 09/10/2023", "09/10/2023, 08:30 (GMT+7)"),
    # "lúc" connector, date-first
    ("4/10/2024 lúc 16:40", "04/10/2024, 16:40 (GMT+7)"),
    # AM/PM
    ("5/1/2024 09:05 AM", "05/01/2024, 09:05 (GMT+7)"),
    ("5/1/2024 09:05 PM", "05/01/2024, 21:05 (GMT+7)"),
    ("5/1/2024 12:05 AM", "05/01/2024, 00:05 (GMT+7)"),
    ("5/1/2024 12:05 PM", "05/01/2024, 12:05 (GMT+7)"),
    # bare (GMT) dropped
    ("Thứ Hai, 04/03/2024 10:15 (GMT)", "04/03/2024, 10:15 (GMT+7)"),
    # sentinel strings pass through with the suffix appended
    ("Không tìm thấy ngày đăng", "Không tìm thấy ngày đăng (GMT+7)"),
]


@pytest.mark.parametrize("raw,expected", GOLDEN)
def test_clean_date_py_golden(raw, expected):
    assert clean_date_py(raw) == expected


def test_clean_date_col_matches_py(spark):
    """The column-expression pipeline is byte-identical to the Python spec."""
    from crawler_news_spark.sources import hostsim as hs

    # golden vectors + every generator-emitted raw form
    raws = [r for r, _ in GOLDEN]
    cfg = hs.default_web()
    for spec in cfg.hosts:
        for i in range(40):
            url = hs.article_url(cfg, spec.host, i % spec.n_types, i)
            raws.append(hs.article_fields(cfg, spec.host, url)["date_raw"])
    df = spark.createDataFrame([(r,) for r in raws], "raw string")
    want = [clean_date_py(r) for r in raws]
    got = [r["cleaned"] for r in
           df.select(clean_date_col(F.col("raw")).alias("cleaned")).collect()]
    assert got == want
    # staged (linear-tree) variant is byte-identical too
    staged = clean_date_staged(df, "raw", "cleaned")
    got2 = [r["cleaned"] for r in staged.collect()]
    assert got2 == want
    assert staged.columns == ["raw", "cleaned"]  # temps dropped


def test_published_ts(spark):
    df = spark.createDataFrame([("04/10/2024, 16:40 (GMT+7)",)], "clean string")
    row = df.select(published_ts_col(F.col("clean")).alias("ts")).collect()[0]
    assert str(row["ts"]) == "2024-10-04 16:40:00"


def test_nfc_prepass_on_nfd_inputs(spark):
    """Real corpora may arrive NFD: the Vietnamese literals in the regex
    pipeline ('Cập nhật lúc', 'Thứ', 'lúc') only match their NFC forms.
    The nfc=True pre-pass makes the column pipeline equal the Python spec
    (which normalizes internally, reference service_utils.py:108) on
    decomposed inputs."""
    import unicodedata

    from crawler_news_spark.functions.clean_date import clean_date_py, clean_date_staged

    vectors = [
        "Cập nhật lúc 09:15 04/10/2024",
        "Thứ Sáu, 04/10/2024 16:40:00 +07:00",
        "Chủ Nhật, ngày 4/3/2024 - 16:40",
        "4/3/2024 lúc 16:40",
    ]
    nfd = [unicodedata.normalize("NFD", v) for v in vectors]
    assert nfd != vectors  # inputs really are decomposed
    df = spark.createDataFrame([(v,) for v in nfd], "raw string")
    got = {r["raw"]: r["clean"] for r in
           clean_date_staged(df, "raw", "clean", nfc=True).collect()}
    for raw_nfd, raw in zip(nfd, vectors):
        assert got[raw_nfd] == clean_date_py(raw), raw
    # without the pre-pass the NFD weekday literal fails to strip (pick a
    # vector whose branch does NOT rewrite the whole string)
    df2 = spark.createDataFrame([(nfd[2],)], "raw string")
    plain = clean_date_staged(df2, "raw", "clean").collect()[0]["clean"]
    assert plain != clean_date_py(vectors[2])
