"""CDC sync scale trend: the delta sync must be proportional to the
DELTA, not the already-indexed corpus.

Builds Iceberg tables at increasing corpus sizes, syncs each into an
index, applies an IDENTICAL fixed-size CDC delta (upsert + delete), and
times the delta sync. If sync cost were corpus-proportional (the full
rebuild it replaces is), the wall time would scale with the corpus
column; delta-proportional maintenance shows a flat trend. Prints one
JSON line:

    python scripts/cdc_scale_probe.py [--sizes 10000,40000,160000]
"""

from __future__ import annotations

import argparse
import json
import os
import tempfile
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="10000,40000,160000")
    ap.add_argument("--delta", type=int, default=500,
                    help="upserted docs per delta (plus delta/5 deletes)")
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]

    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.appName("cdc-scale-probe")
             .config("spark.sql.shuffle.partitions", "8").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    import pyarrow as pa

    from quickwit_spark.config import IndexConfig
    from quickwit_spark.index.corpus import corpus_pandas
    from quickwit_spark.sources import iceberg as ice
    from quickwit_spark.sources.iceberg_ingest import sync_iceberg

    rows = []
    for n in sizes:
        work = tempfile.mkdtemp(prefix=f"cdc_probe_{n}_")
        root = os.path.join(work, "tbl")
        pdf = corpus_pandas(n, seed=7)
        ice.create_table(root, pa.Schema.from_pandas(pdf))
        ice.append_pandas(root, pdf, timestamp_ms=1000)
        cfg = IndexConfig(index_uid=f"probe{n}",
                          index_dir=os.path.join(work, "idx"))
        t0 = time.perf_counter()
        sync_iceberg(spark, root, cfg, partitions_per_ingest=8)
        initial_s = time.perf_counter() - t0

        upd = pdf.iloc[:args.delta].copy()
        upd["content"] = "refreshed " + upd["content"]
        ice.upsert_pandas(root, upd, ["path"], timestamp_ms=2000)
        victims = pdf["path"].iloc[
            args.delta:args.delta + args.delta // 5].tolist()
        ice.delete_where(root, [("path", "in", victims)],
                         timestamp_ms=3000)
        t0 = time.perf_counter()
        summary = sync_iceberg(spark, root, cfg,
                               partitions_per_ingest=8)
        delta_s = time.perf_counter() - t0
        assert summary["docs_retired"] == args.delta + args.delta // 5
        rows.append({"corpus_docs": n,
                     "initial_sync_s": round(initial_s, 3),
                     "delta_sync_s": round(delta_s, 3),
                     "docs_retired": summary["docs_retired"],
                     "docs_ingested": summary["docs"]})
    print(json.dumps({"delta_docs": args.delta, "rows": rows}))


if __name__ == "__main__":
    main()
