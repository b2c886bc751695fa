"""Streaming request intake: validation, X9 routing, frontier expansion."""

import json
import os

import pytest

from pyspark.sql import functions as F

from crawler_news_spark.streaming.requests import (
    route_requests,
    run_intake_stream,
    requests_to_frontier_rows,
    validate_requests,
)


@pytest.fixture()
def categories(spark):
    return spark.createDataFrame(
        [("h1.vn", 0, "a"), ("h1.vn", 1, "b"), ("h2.vn", 0, "c")],
        "host string, type_id int, slug string",
    )


def test_validate_and_route(spark):
    raw = spark.createDataFrame(
        [
            ("NEWS", "GENERAL", "https://h1.vn/a/bai-1234567.html"),
            ("NEWS", "GENERAL", "https://h1.vn"),
            ("OTHER", "GENERAL", "https://h1.vn/a/bai-1234567.html"),  # dropped
            ("NEWS", "SPECIAL", "https://h1.vn/x"),  # dropped
        ],
        "source string, action string, url string",
    )
    routed = route_requests(validate_requests(raw)).collect()
    assert len(routed) == 2
    by_url = {r["url"]: r["route"] for r in routed}
    assert by_url["https://h1.vn/a/bai-1234567.html"] == "article"
    assert by_url["https://h1.vn"] == "expand"


def test_expand_to_categories(spark, categories):
    raw = spark.createDataFrame(
        [("NEWS", "GENERAL", "https://h1.vn")],
        "source string, action string, url string",
    )
    rows = requests_to_frontier_rows(
        route_requests(validate_requests(raw)), categories
    ).collect()
    assert {(r["kind"], r["type_id"]) for r in rows} == {("listing", 0), ("listing", 1)}


def test_stream_to_crawl_end_to_end(spark, tmp_path):
    """V1/V2 wired to the engine: file-stream requests -> frontier injection
    -> resumed crawl produces the requested article."""
    from crawler_news_spark.plans.wave import CrawlRunConfig, WaveCrawl
    from crawler_news_spark.sources import hostsim as hs

    web = hs.default_web(scale=0.5)
    wc = WaveCrawl(spark, web, str(tmp_path / "cat"),
                   CrawlRunConfig(batch_pages=4, bloom_buckets=4))
    wc.run()

    target = hs.article_url(web, "dtr1.example.vn", 0, 9_999)  # undiscovered
    req_dir = str(tmp_path / "req")
    os.makedirs(req_dir)
    with open(os.path.join(req_dir, "r.json"), "w") as f:
        f.write(json.dumps({"source": "NEWS", "action": "GENERAL", "url": target}) + "\n")

    cats = spark.createDataFrame(
        [("dtr1.example.vn", 0, "x")], "host string, type_id int, slug string"
    )
    injected = []

    def sink(rows, epoch_id):
        injected.append(wc.inject_requests(rows))

    q = run_intake_stream(spark, req_dir, cats, sink, str(tmp_path / "ckpt"))
    q.processAllAvailable()
    q.stop()
    assert sum(injected) == 1
    wc.run(resume=True)
    got = wc.articles_df().filter(F.col("url") == target).count()
    assert got == 1


def test_file_stream_intake(spark, categories, tmp_path):
    req_dir = str(tmp_path / "req")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(req_dir)
    with open(os.path.join(req_dir, "r1.json"), "w") as f:
        f.write(json.dumps({"source": "NEWS", "action": "GENERAL",
                            "url": "https://h2.vn/c/bai-7654321.html"}) + "\n")
        f.write(json.dumps({"source": "NEWS", "action": "GENERAL",
                            "url": "https://h1.vn"}) + "\n")

    got = []

    def sink(df, epoch_id):
        got.extend(df.collect())

    q = run_intake_stream(spark, req_dir, categories, sink, ckpt)
    q.processAllAvailable()
    q.stop()
    kinds = sorted((r["kind"], r["host"]) for r in got)
    assert kinds == [("article", "h2.vn"), ("listing", "h1.vn"), ("listing", "h1.vn")]


def test_exactly_once_frontier_appends_across_restart(spark, categories, tmp_path):
    """Exactly-once frontier appends across a mid-stream crash + restart.

    foreachBatch is at-least-once: a batch whose sink dies before the
    checkpoint commit is REPLAYED with the same epoch id on restart.  The
    frontier append is made idempotent by keying the write on the epoch
    (exactly the catalog's write(table, wave) overwrite-a-slot semantics),
    so replay overwrites its own partial output instead of duplicating —
    and already-committed files are never re-read.  Net: every request row
    lands in the frontier exactly once, crash or no crash.
    """
    req_dir = str(tmp_path / "req")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "frontier")
    os.makedirs(req_dir)

    def write_reqs(name, urls):
        with open(os.path.join(req_dir, name), "w") as f:
            for u in urls:
                f.write(json.dumps(
                    {"source": "NEWS", "action": "GENERAL", "url": u}) + "\n")

    write_reqs("a.json", ["https://h2.vn/c/bai-1111111.html", "https://h1.vn"])
    state = {"fail_next": False, "epochs": []}

    def sink(df, epoch_id):
        if state["fail_next"]:
            state["fail_next"] = False
            raise RuntimeError("injected sink crash before commit")
        df.write.mode("overwrite").parquet(os.path.join(out, f"epoch={epoch_id}"))
        state["epochs"].append(epoch_id)

    q = run_intake_stream(spark, req_dir, categories, sink, ckpt)
    q.processAllAvailable()
    q.stop()
    assert state["epochs"] == [0]

    # a new request file arrives; its first processing attempt crashes in
    # the sink BEFORE the epoch commits
    write_reqs("b.json", ["https://h1.vn/x/bai-2222222.html"])
    state["fail_next"] = True
    q = run_intake_stream(spark, req_dir, categories, sink, ckpt)
    with pytest.raises(Exception):
        q.processAllAvailable()
    q.stop()
    assert state["epochs"] == [0]  # nothing committed by the crashed attempt

    # restart: the failed epoch replays (same id); a.json is NOT re-read
    q = run_intake_stream(spark, req_dir, categories, sink, ckpt)
    q.processAllAvailable()
    q.stop()
    assert state["epochs"] == [0, 1]

    got = spark.read.parquet(out).collect()
    urls = sorted(r["url"] for r in got)
    assert urls == [
        "https://h1.vn",  # expanded to 2 categories
        "https://h1.vn",
        "https://h1.vn/x/bai-2222222.html",
        "https://h2.vn/c/bai-1111111.html",
    ]


def test_streaming_windowed_counts_matches_batch(spark, tmp_path):
    """Watermarked tumbling-window agg: streaming result == batch twin on
    the same rows; the plan actually carries the event-time watermark."""
    import duckdb

    from crawler_news_spark.streaming.windowed import windowed_event_counts

    con = duckdb.connect()
    rows = con.sql(
        "SELECT event_id, user_id, event_type, value, ts "
        "FROM read_parquet('/root/testdata/sf0.001/events.parquet')"
    ).df()
    src_dir = tmp_path / "ev"
    src_dir.mkdir()
    rows.to_parquet(str(src_dir / "part-0.parquet"))

    batch = spark.read.parquet(str(src_dir))
    want = {
        (r["hour"], r["event_type"]): (r["n"], r["value_cents"])
        for r in windowed_event_counts(batch).collect()
    }

    stream = spark.readStream.schema(batch.schema).parquet(str(src_dir))
    agg = windowed_event_counts(stream, watermark="30 minutes")
    assert "eventTimeWatermark" in agg._jdf.queryExecution().analyzed().toString() or \
           "EventTimeWatermark" in agg._jdf.queryExecution().analyzed().toString()
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("win_counts")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["hour"], r["event_type"]): (r["n"], r["value_cents"])
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    assert got == want and len(got) > 0


def test_streaming_seen_filter_stateful(spark, tmp_path):
    """applyInPandasWithState keep-first dedup persists across restarts:
    a URL emitted in micro-batch 1 is dropped when it reappears later."""
    import json as _json

    from crawler_news_spark.streaming.windowed import (
        SEEN_OUT_SCHEMA,
        streaming_seen_filter,
    )

    src = tmp_path / "req"
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()

    def write_batch(name, rows):
        with open(src / name, "w") as f:
            for r in rows:
                f.write(_json.dumps(r) + "\n")

    def row(h, url, li=0):
        return {"canonical_hash": h, "host": "h1.vn", "kind": "article",
                "type_id": 0, "page_no": 1, "link_index": li, "url": url}

    def run_once(qname):
        stream = spark.readStream.schema(SEEN_OUT_SCHEMA).json(str(src))
        emitted = []

        def sink(df, epoch_id):
            emitted.extend(df.collect())

        q = (
            streaming_seen_filter(stream)
            .writeStream.outputMode("append")
            .foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {r["url"] for r in emitted}

    # batch 1: two urls, one duplicated within the batch
    write_batch("b1.json", [row(1, "https://h1.vn/a-1000001.html", 0),
                            row(1, "https://h1.vn/a-1000001.html", 5),
                            row(2, "https://h1.vn/a-1000002.html", 1)])
    got1 = run_once("seen1")
    assert got1 == {"https://h1.vn/a-1000001.html", "https://h1.vn/a-1000002.html"}

    # batch 2 (restart from checkpoint): a repeat of url 1 + one new url
    write_batch("b2.json", [row(1, "https://h1.vn/a-1000001.html", 9),
                            row(3, "https://h1.vn/a-1000003.html", 0)])
    got2 = run_once("seen2")
    assert got2 == {"https://h1.vn/a-1000003.html"}  # repeat dropped by state
