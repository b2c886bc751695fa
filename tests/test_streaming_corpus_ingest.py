"""Streaming incremental corpus ingest (VERDICT r05 item 6): the batch
corpus_update pipeline as a foreachBatch job — cross-LSH per micro-batch
against the existing corpus, exactly-once accepted-doc appends across a
sink crash + restart, and end-state equality with the batch oracle."""

import json
import os

import pytest

from pyspark.sql import functions as F

from crawler_news_spark import queries as Q
from crawler_news_spark.streaming import corpus_ingest as CI


def _write_docs(path, rows):
    with open(path, "w") as f:
        for doc_id, text in rows:
            f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")


def _start(spark, req_dir, existing, out, ckpt, batch_fn):
    stream = spark.readStream.schema(CI.DOC_SCHEMA).json(req_dir)
    return (
        stream.writeStream.outputMode("append")
        .foreachBatch(batch_fn)
        .option("checkpointLocation", ckpt)
        .start()
    )


def test_streaming_ingest_equals_batch_corpus_update(spark, tmp_path):
    """Stream the corpus_update fixture's day-2 intake in three
    micro-batches (sorted split => every exact group arrives min-id-first):
    the accepted set equals the batch pipeline's 88 accepted docs exactly,
    across an injected sink crash + restart."""
    stages = Q.corpus_update_stages(spark)
    existing = stages["existing"].persist()
    day2 = sorted(
        (r["doc_id"], r["text"]) for r in stages["day2"].collect()
    )
    batch_ids = sorted(r["doc_id"] for r in stages["accepted"].collect())
    assert len(batch_ids) == 88

    req_dir = str(tmp_path / "docs")
    out = str(tmp_path / "accepted")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(req_dir)

    third = len(day2) // 3
    chunks = [day2[:third], day2[third: 2 * third], day2[2 * third:]]

    state = {"fail_next": False, "done": []}

    def batch_fn(df, epoch_id):
        if state["fail_next"]:
            state["fail_next"] = False
            raise RuntimeError("injected crash before epoch commit")
        CI.ingest_batch(spark, df, existing, out, epoch_id)
        state["done"].append(epoch_id)

    # batch 0
    _write_docs(os.path.join(req_dir, "a.json"), chunks[0])
    q = _start(spark, req_dir, existing, out, ckpt, batch_fn)
    q.processAllAvailable()
    q.stop()
    assert state["done"] == [0]

    # batch 1 crashes before commit, then replays on restart with the SAME
    # epoch id — the epoch-keyed overwrite makes the append idempotent
    _write_docs(os.path.join(req_dir, "b.json"), chunks[1])
    state["fail_next"] = True
    q = _start(spark, req_dir, existing, out, ckpt, batch_fn)
    with pytest.raises(Exception):
        q.processAllAvailable()
    q.stop()
    assert state["done"] == [0]

    q = _start(spark, req_dir, existing, out, ckpt, batch_fn)
    q.processAllAvailable()
    # batch 2
    _write_docs(os.path.join(req_dir, "c.json"), chunks[2])
    q.processAllAvailable()
    q.stop()
    assert state["done"] == [0, 1, 2]

    got = CI.read_accepted(spark, out)
    ids = sorted(r["doc_id"] for r in got.collect())
    assert len(ids) == len(set(ids))  # exactly once, no replay duplicates
    assert ids == batch_ids  # end state == the batch corpus_update oracle
    existing.unpersist()


def test_ingest_batch_drops_cross_batch_exact_dups(spark, tmp_path):
    """A doc whose body was accepted in an EARLIER epoch is rejected by the
    fingerprint anti-join even though it is not in the existing corpus, and
    crashed-epoch partials (no _SUCCESS) are invisible to that check."""
    existing = spark.createDataFrame(
        [("old-1", "một văn bản hoàn toàn khác biệt trong kho cũ")],
        "doc_id string, text string",
    )
    out = str(tmp_path / "acc")

    b0 = spark.createDataFrame(
        [("new-5", "nội dung mới thứ nhất xuất hiện hôm nay"),
         ("new-9", "nội dung mới thứ nhất xuất hiện hôm nay"),  # in-batch dup
         ("new-7", "bài viết độc lập không trùng lặp gì cả")],
        "doc_id string, text string",
    )
    CI.ingest_batch(spark, b0, existing, out, 0)
    acc0 = {r["doc_id"] for r in CI.read_accepted(spark, out).collect()}
    assert acc0 == {"new-5", "new-7"}  # keep-min within the batch

    # epoch 1: one exact copy of an epoch-0 acceptance, one exact copy of
    # the existing corpus, one genuinely new doc
    b1 = spark.createDataFrame(
        [("new-11", "nội dung mới thứ nhất xuất hiện hôm nay"),
         ("new-12", "một văn bản hoàn toàn khác biệt trong kho cũ"),
         ("new-13", "tin tức cuối cùng chưa từng thấy bao giờ")],
        "doc_id string, text string",
    )
    CI.ingest_batch(spark, b1, existing, out, 1)
    acc = {r["doc_id"] for r in CI.read_accepted(spark, out).collect()}
    assert acc == {"new-5", "new-7", "new-13"}

    # a crashed epoch 2 left partial files without _SUCCESS: invisible
    part = os.path.join(out, "epoch=2")
    os.makedirs(part)
    with open(os.path.join(part, "part-000.parquet"), "w") as f:
        f.write("junk")
    assert {r["doc_id"] for r in CI.read_accepted(spark, out).collect()} == acc
    dirs = CI._committed_epoch_dirs(out, 10)
    assert part not in dirs


_SEM_VOCAB = (
    "triển khai hệ thống dữ liệu phân tán lưu trữ truy vấn chỉ mục nén "
    "mạng lưới máy chủ bộ nhớ đĩa cứng băng thông trễ hạn sao chép đồng "
    "thuận giao dịch nhật ký phân vùng cân bằng tải khôi phục giám sát "
    "cảnh báo triệu hồi nâng cấp bảo trì kiểm thử"
).split()


def _sem_doc(seed: int, n: int = 24) -> str:
    import random

    rng = random.Random(seed)
    return " ".join(rng.choice(_SEM_VOCAB) for _ in range(n))


def _sem_paraphrase(text: str, seed: int) -> str:
    """The hostsim branch-3 rewrite shape: every word replaced by its
    reversed-surface synonym, order reshuffled, one word spliced in — no
    shared char-5-gram shingles, same synonym-class bag."""
    import random

    rng = random.Random(seed)
    toks = [w[::-1] for w in text.split()]
    rng.shuffle(toks)
    toks.insert(rng.randrange(len(toks) + 1), rng.choice(_SEM_VOCAB)[::-1])
    return " ".join(toks)


def test_streaming_semantic_rung_rejects_cross_epoch_paraphrases(spark, tmp_path):
    """Incremental SemDeDup (VERDICT r06 item 8): paraphrased duplicates of
    EXISTING corpus docs — invisible to the exact and cross-LSH rungs —
    arrive across two epochs and are all rejected by the
    semantic rung (class-LSH blocking + frozen-space cosine verify), while genuinely novel docs all pass; per-epoch streaming
    equals the one-shot batch application."""
    docs = {f"old-{i:02d}": _sem_doc(i) for i in range(30)}
    existing = spark.createDataFrame(list(docs.items()), CI.DOC_SCHEMA).persist()
    idx = CI.SemanticCrossIndex(
        spark, existing, dim=64, threshold_u=750_000
    )

    para = {
        f"para-{i:02d}": _sem_paraphrase(docs[f"old-{i:02d}"], 100 + i)
        for i in (2, 5, 11, 17, 23, 28)
    }
    novel = {f"new-{i:02d}": _sem_doc(1000 + i) for i in range(6)}
    intake = sorted({**para, **novel}.items())

    # without the semantic rung every paraphrase sails through (they share
    # no shingles with their originals — LSH-blind by construction)
    out_off = str(tmp_path / "acc_off")
    CI.ingest_batch(spark, spark.createDataFrame(intake, CI.DOC_SCHEMA),
                    existing, out_off, 0)
    acc_off = {r["doc_id"] for r in CI.read_accepted(spark, out_off).collect()}
    assert set(para) <= acc_off

    # with the rung, across two epochs: all paraphrases rejected, all
    # novel docs accepted
    out = str(tmp_path / "acc")
    CI.ingest_batch(spark, spark.createDataFrame(intake[:6], CI.DOC_SCHEMA),
                    existing, out, 0, semantic=idx)
    CI.ingest_batch(spark, spark.createDataFrame(intake[6:], CI.DOC_SCHEMA),
                    existing, out, 1, semantic=idx)
    acc = {r["doc_id"] for r in CI.read_accepted(spark, out).collect()}
    assert acc == set(novel)

    # stream == batch: one-shot application over the whole intake agrees.
    # The index is STATEFUL now (absorb() added the accepted epochs above),
    # so the batch leg needs a fresh index built from the same corpus.
    idx_one = CI.SemanticCrossIndex(
        spark, existing, dim=64, threshold_u=750_000
    )
    out_one = str(tmp_path / "acc_one")
    CI.ingest_batch(spark, spark.createDataFrame(intake, CI.DOC_SCHEMA),
                    existing, out_one, 0, semantic=idx_one)
    assert {r["doc_id"]
            for r in CI.read_accepted(spark, out_one).collect()} == acc

    idx_one.unpersist()
    idx.unpersist()
    existing.unpersist()


def test_streaming_semantic_rung_within_and_cross_epoch_new_dups(spark, tmp_path):
    """ADVICE r07: semantic duplicates among NEW docs must not all be
    accepted.  Two paraphrases of the same new story in ONE batch -> only
    the lowest doc_id survives (within-batch cluster-local pass); a
    paraphrase arriving in a LATER epoch of a story accepted earlier ->
    rejected too (absorb() extends the member set with accepted epochs,
    the exact rung's prior-epoch contract)."""
    docs = {f"old-{i:02d}": _sem_doc(i) for i in range(20)}
    existing = spark.createDataFrame(list(docs.items()), CI.DOC_SCHEMA).persist()
    idx = CI.SemanticCrossIndex(
        spark, existing, dim=64, threshold_u=750_000
    )

    story_a = _sem_doc(5001)
    story_b = _sem_doc(5002)
    epoch0 = [
        ("na-00", story_a),
        ("na-01", _sem_paraphrase(story_a, 42)),   # within-batch paraphrase
        ("nb-00", story_b),
    ]
    epoch1 = [
        ("nb-50", _sem_paraphrase(story_b, 43)),   # cross-epoch paraphrase
        ("nc-00", _sem_doc(5003)),                 # genuinely novel
    ]
    out = str(tmp_path / "acc")
    CI.ingest_batch(spark, spark.createDataFrame(epoch0, CI.DOC_SCHEMA),
                    existing, out, 0, semantic=idx)
    CI.ingest_batch(spark, spark.createDataFrame(epoch1, CI.DOC_SCHEMA),
                    existing, out, 1, semantic=idx)
    acc = {r["doc_id"] for r in CI.read_accepted(spark, out).collect()}
    assert acc == {"na-00", "nb-00", "nc-00"}

    idx.unpersist()
    existing.unpersist()


def test_semantic_epoch_replay_is_idempotent(spark, tmp_path):
    """ADVICE r08 high: after absorb(), a replay of the SAME epoch (query
    restart re-delivering the last batch) must overwrite the committed
    epoch directory with the identical accepted set — previously every
    accepted doc band-collided with its own absorbed copy (cosine exactly
    1.0) and the replayed epoch came back near-empty."""
    docs = {f"old-{i:02d}": _sem_doc(i) for i in range(20)}
    existing = spark.createDataFrame(list(docs.items()), CI.DOC_SCHEMA).persist()
    idx = CI.SemanticCrossIndex(spark, existing, dim=64, threshold_u=750_000)

    novel = sorted({f"new-{i:02d}": _sem_doc(2000 + i) for i in range(8)}.items())
    out = str(tmp_path / "acc")
    batch = spark.createDataFrame(novel, CI.DOC_SCHEMA)
    CI.ingest_batch(spark, batch, existing, out, 0, semantic=idx)
    first = {r["doc_id"] for r in CI.read_accepted(spark, out).collect()}
    assert first == {d for d, _ in novel}

    # replay epoch 0 against the already-absorbed index
    CI.ingest_batch(spark, batch, existing, out, 0, semantic=idx)
    replayed = {r["doc_id"] for r in CI.read_accepted(spark, out).collect()}
    assert replayed == first

    idx.unpersist()
    existing.unpersist()
