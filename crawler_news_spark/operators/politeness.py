"""Per-host politeness scheduling with explicit skew handling.

The reference's politeness is a 1 s sleep per article plus per-fetch jitter
(base_crawler.py:61, vnexpress.py:177-178).  The engine generalizes it to a
**virtual clock**: every fetch on host ``h`` occupies a slot
``fetch_ts = clock_base[h] + seq * crawl_delay_s``, where ``seq`` is the
host-global fetch sequence number for the wave, ordered by the deterministic
crawl key (kind listing<article, type_id, page_no, link_index) — never
arrival order.  Timestamps are data, not sleeps: correctness is provable
(spacing >= crawl_delay within host) and tests run fast.

Skew: a naive ``row_number() OVER (PARTITION BY host ORDER BY key)`` puts a
giant news host (vnexpress: 71 categories vs vietnamnet's 16) in ONE window
partition — one task does all the work.  Instead the sequence is computed in
two levels:

1. rank *within* ``(host, kind, type_id)`` — many small window partitions,
   parallelism scales with categories, no hot task;
2. add a per-``(host, kind, type_id)`` cumulative offset, computed as a
   distributed window over the tiny counts aggregate and broadcast-joined
   back (the window runs over group rows, #types per host, never URL rows).

This is exact (offsets follow the same key order the windows use); the only
driver-side state is the O(#hosts) per-host clock + kind totals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_KIND_RANK = {"listing": 0, "article": 1}


def schedule_wave(
    frontier_wave: DataFrame,
    delays: dict[str, float],
    clock_base: dict[str, float],
) -> tuple[DataFrame, dict[str, float], dict[str, int]]:
    """Assign ``fetch_ts`` to every frontier row of one wave.

    Returns (frontier with fetch_ts, updated clock_base, row totals
    {'listing': n, 'article': n}) — the totals ride along from the counts
    aggregate so the wave loop never needs a separate count() action.
    ``delays`` maps host -> crawl_delay_s (from robots/crawl config);
    ``clock_base`` carries the per-host virtual clock across waves.
    """
    df = frontier_wave.withColumn(
        "kind_rank", F.when(F.col("kind") == "listing", 0).otherwise(1)
    )

    # (2) per-group offsets computed DISTRIBUTED: cumulative count over the
    # tiny (host, kind, type) aggregate — the window partitions are per host
    # but over group rows (#types per host), never URL rows, so no hot task.
    # Only O(#hosts) rows (per-host/kind totals for the virtual clock and the
    # wave-loop branch decisions) ever reach the driver — at a web-scale
    # taxonomy the old O(#hosts x #types) offsets collect was the bottleneck.
    counts_df = df.groupBy("host", "kind_rank", "type_id").agg(
        F.count("*").alias("n")
    )
    w_off = (
        Window.partitionBy("host")
        .orderBy("kind_rank", "type_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offset_df = counts_df.withColumn(
        "grp_offset", F.coalesce(F.sum("n").over(w_off), F.lit(0))
    ).drop("n")

    host_stats = (
        counts_df.groupBy("host", "kind_rank").agg(F.sum("n").alias("n")).collect()
    )
    running: dict[str, int] = {}
    totals = {"listing": 0, "article": 0, "by_host": {}}
    for r in host_stats:
        kind = "listing" if r["kind_rank"] == 0 else "article"
        totals[kind] += r["n"]
        hk = totals["by_host"].setdefault(r["host"], {"listing": 0, "article": 0})
        hk[kind] += r["n"]
        running[r["host"]] = running.get(r["host"], 0) + r["n"]

    spark = frontier_wave.sparkSession
    delay_df = spark.createDataFrame(
        [(h, delays[h], clock_base.get(h, 0.0)) for h in running],
        "host string, crawl_delay_s double, clock0 double",
    )

    # (1) fine-partition window rank — no host-level hot partition
    w = Window.partitionBy("host", "kind_rank", "type_id").orderBy(
        "page_no", "link_index"
    )
    scheduled = (
        df.withColumn("grp_rank", F.row_number().over(w))
        .join(F.broadcast(offset_df), ["host", "kind_rank", "type_id"])
        .join(F.broadcast(delay_df), "host")
        .withColumn("host_seq", F.col("grp_offset") + F.col("grp_rank"))
        .withColumn(
            "fetch_ts",
            F.col("clock0") + F.col("host_seq") * F.col("crawl_delay_s"),
        )
        .drop("kind_rank", "grp_rank", "grp_offset", "clock0")
    )
    new_base = dict(clock_base)
    for h, n in running.items():
        new_base[h] = clock_base.get(h, 0.0) + n * delays[h]
    return scheduled, new_base, totals


def robots_filter(df: DataFrame, rules: dict[str, tuple[str, ...]]) -> DataFrame:
    """Drop candidate URLs whose path matches a robots Disallow prefix.

    ``rules`` maps host -> disallow path prefixes, compiled to one regex per
    host and delivered as a broadcast ``(host, disallow_rx)`` dimension —
    one hash join plus one rlike per row.  (An earlier per-host predicate
    chain built an O(#hosts) expression tree: fine at 7 hosts, quadratic
    analysis blowup at web-scale host counts.)  Hosts without rules pass via
    the null regex branch; the left join keeps them.
    """
    import re as _re

    rows = []
    for host, prefixes in rules.items():
        if not prefixes:
            continue
        alts = "|".join(_re.escape(p) for p in prefixes)
        rows.append((host, f"^https?://{_re.escape(host)}({alts})"))
    if not rows:
        return df
    dim = df.sparkSession.createDataFrame(rows, "host string, disallow_rx string")
    return (
        df.join(F.broadcast(dim), "host", "left")
        .filter(
            F.col("disallow_rx").isNull()
            | ~F.expr("rlike(canonical_url, disallow_rx)")
        )
        .drop("disallow_rx")
    )
