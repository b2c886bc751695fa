"""Streaming windowed aggregation + stateful streaming dedup.

Two Structured Streaming operators the batch registry already has twins for:

- :func:`windowed_event_counts` — tumbling 1-hour event windows with a
  watermark for late data (the streaming twin of the batch
  ``windowed_counts`` query; reference analog: the crawl service's rolling
  counters).  Pure built-ins: ``withWatermark`` + ``window()`` groupBy.
- :func:`streaming_seen_filter` — keep-first URL dedup across micro-batches
  via ``applyInPandasWithState``: the streaming counterpart of the wave
  loop's seen anti-join for the on-demand intake path (a request seen in any
  earlier micro-batch is dropped).  State per canonical_hash group is a
  single marker row — GroupState gives exactly the bloom-free, exact
  semantics the intake needs at micro-batch scale; the batch path keeps the
  partitioned bloom for 10^10-row scale.

Both run on any streaming source; tests drive them with a file source and
compare against the batch twins on the same rows.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def windowed_event_counts(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Tumbling 1-hour (event-time) counts per event_type with late-data
    watermark.  Works on both streaming and batch frames (batch ignores the
    watermark) — the correctness tests exploit that equivalence."""
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    # watermarks require TIMESTAMP (tz-aware); parquet written from pandas
    # often carries TIMESTAMP_NTZ
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count("*").alias("n"), F.sum(cents).alias("value_cents"))
        .select(
            F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
            "n",
            "value_cents",
        )
    )


SEEN_STATE_SCHEMA = "seen boolean"
SEEN_OUT_SCHEMA = (
    "canonical_hash long, host string, kind string, type_id int, "
    "page_no int, link_index int, url string"
)


_DEDUP_SORT = ["type_id", "page_no", "link_index", "host", "url"]
_DEDUP_COLS = ["canonical_hash", "host", "kind", "type_id",
               "page_no", "link_index", "url"]


def _dedup_group(key, pdfs, state: GroupState):
    """Emit the group's first-ever row; afterwards the state marker drops
    every later occurrence (across micro-batches).

    A group larger than one Arrow record batch arrives as several chunks, so
    the per-chunk minimum is accumulated across ALL chunks before emitting —
    a chunk-local pick could emit a row that is not the global min of the
    micro-batch (matching the batch path's min(struct) semantics requires
    the global one).
    """
    first = None
    if state.exists:
        for _ in pdfs:  # consume the iterator (contract), emit nothing
            pass
    else:
        for pdf in pdfs:
            if not len(pdf):
                continue
            # keep-first inside the batch too: order by the crawl key
            cand = pdf.sort_values(_DEDUP_SORT).iloc[[0]][_DEDUP_COLS]
            if first is None:
                first = cand
            else:
                first = (
                    pd.concat([first, cand]).sort_values(_DEDUP_SORT).iloc[[0]]
                )
        state.update((True,))
    if first is not None:
        yield first


def streaming_seen_filter(requests: DataFrame) -> DataFrame:
    """Exact keep-first dedup of frontier-shaped request rows keyed by
    canonical_hash, stateful across micro-batches (applyInPandasWithState).

    Input must carry the SEEN_OUT_SCHEMA columns; grouping by the hash makes
    the shuffle key the same bucketable 64-bit identity the batch seen set
    uses, so state is uniformly spread (no hot keys by construction).
    """
    return (
        requests.groupBy("canonical_hash")
        .applyInPandasWithState(
            _dedup_group,
            outputStructType=SEEN_OUT_SCHEMA,
            stateStructType=SEEN_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
