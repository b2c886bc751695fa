"""Export sinks.

The reference writes each article to a single overwritten crawl_result.json
(service_utils.py:76-83 — a last-writer-wins race across threads we do NOT
replicate) and inserts into MongoDB (mongodb_utils.py:40-59).  The engine's
canonical store is the wave-snapshot catalog; these helpers export it to
line-delimited JSON / parquet for downstream consumers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def export_json(df: DataFrame, outdir: str, parts: int | None = None) -> None:
    if parts is not None:
        df = df.coalesce(parts)
    df.write.mode("overwrite").json(outdir)


def export_parquet(df: DataFrame, outdir: str, parts: int | None = None) -> None:
    if parts is not None:
        df = df.coalesce(parts)
    df.write.mode("overwrite").parquet(outdir)


def upload_api_sink(spool_root: str, transport=None, metadata: str = "NEWS_INFO"):
    """S8 upload-API sink (service_utils.py:85-103) as a ``foreachBatch``
    callable — usable on both streaming queries and ad-hoc batch exports.

    Reference contract mirrored exactly: serialize the records to JSON, POST
    them with ``{"data": "NEWS_INFO"}`` metadata, and delete the local copy
    only on a 200 (service_utils.py:100-103).  The reference has this sink
    DISABLED (base_crawler.py:60 comments out send_json_to_api), and this
    sandbox has no network, so the default ``transport`` is an honest stub:
    it records the would-be POST in ``spool_root/uploads.log`` and returns
    200.  Inject a real ``transport(path, data) -> status_code`` (e.g. a
    requests.post wrapper) in production; a non-200 keeps the spool dir for
    retry, exactly like the reference keeps OUTPUT_FILE.
    """
    import json
    import os
    import shutil

    def default_transport(path: str, data: dict) -> int:
        with open(os.path.join(spool_root, "uploads.log"), "a") as f:
            f.write(json.dumps({"path": path, "data": data}) + "\n")
        return 200

    send = transport or default_transport

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        out = os.path.join(spool_root, f"batch-{batch_id}")
        batch_df.write.mode("overwrite").json(out)
        status = send(out, {"data": metadata})
        if status == 200:
            shutil.rmtree(out)  # delete-after-ack (service_utils.py:100-103)

    return sink
