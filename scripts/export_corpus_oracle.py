"""Export the pure-Python crawl oracle's span table for the corpus-build
flagship.

``q_corpus_build`` crawls the deterministic syndicated web
(hostsim.corpus_web(): default_web(scale=0.5) + wire syndication,
batch_pages=3) — independent of sf_dir — then runs the full training-corpus
pipeline over it.  The crawl stage's expected output is a fixed span table;
this script computes it with the INDEPENDENT single-threaded oracle
(oracle/pyoracle.py) and writes dist/corpus_build_oracle.parquet.  The
registry's oracle SQL is a DuckDB read_parquet over it followed by the
ANSI-SQL twin of every downstream stage (quality gate, exact dedup,
MinHash+LSH near-dup removal, n-gram decontamination, sequence packing).

Re-run whenever hostsim/profiles/wave semantics change:
    python scripts/export_corpus_oracle.py
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawler_news_spark.oracle.pyoracle import crawl_oracle  # noqa: E402
from crawler_news_spark.sources import hostsim as hs  # noqa: E402

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "dist",
    "corpus_build_oracle.parquet",
)


def main() -> None:
    res = crawl_oracle(hs.corpus_web(), batch_pages=3)
    doc_ids, kinds, texts, refs, offsets = [], [], [], [], []
    for doc_id, spans in res.documents.items():
        for s in spans:
            doc_ids.append(doc_id)
            kinds.append(s["kind"])
            texts.append(s["text"])
            refs.append(s["media_ref"])
            offsets.append(s["offset"])
    table = pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.string()),
            "kind": pa.array(kinds, pa.string()),
            "text": pa.array(texts, pa.string()),
            "media_ref": pa.array(refs, pa.string()),
            "offset": pa.array(offsets, pa.int32()),
        }
    )
    pq.write_table(table, OUT)
    print(f"wrote {table.num_rows} span rows -> {OUT}")


if __name__ == "__main__":
    main()
