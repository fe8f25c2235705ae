"""Iceberg planner scale probe: planning cost must track the DELTA (or
the pruned subset), never the whole table.

Builds a metadata-only table — S snapshots x F data-file entries per
snapshot (data files are manifest records; planning never opens them) —
then times, median-of-3:

  full_plan        plan_files() over all S*F entries
  pruned_plan      plan_files(lang=<one of L>) — partition tier should
                   drop ~ (L-1)/L of the files without decoding their
                   parquet footers (there are none to decode)
  delta_plan       appended_files(since_seq=S-1) — must decode ONE
                   manifest regardless of S (manifest-list seq skip)
  travel_plan      plan_files(snapshot_id=first) — early snapshot stays
                   cheap as the table grows

Run:  python scripts/iceberg_plan_probe.py --snapshots 100 --files 100
Prints ONE JSON line with wall times and per-tier pruning counts.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from quickwit_spark.sources import iceberg  # noqa: E402

LANGS = ["python", "rust", "java", "go", "js", "c", "cpp", "md"]


def _fake_data_file(seq: int, i: int, lang: str) -> dict:
    lo, hi = seq * 1000 + i * 10, seq * 1000 + i * 10 + 9
    return {
        "content": 0,
        "file_path": f"/data/s{seq}/f{i}-{lang}.parquet",
        "file_format": "PARQUET",
        "partition": {"lang": lang},
        "record_count": 10_000,
        "file_size_in_bytes": 4_000_000,
        "value_counts": [{"key": 1, "value": 10_000}],
        "null_value_counts": [{"key": 1, "value": 0}],
        "nan_value_counts": None,
        "lower_bounds": [{"key": 1,
                          "value": iceberg.to_single_value_bytes(
                              "long", lo)}],
        "upper_bounds": [{"key": 1,
                          "value": iceberg.to_single_value_bytes(
                              "long", hi)}],
        "split_offsets": None,
        "equality_ids": None,
        "sort_order_id": None,
    }


def build_metadata_table(root: str, snapshots: int, files: int) -> None:
    import pyarrow as pa
    schema = pa.schema([("doc_id", pa.int64()), ("lang", pa.string()),
                        ("content", pa.string())])
    iceberg.create_table(root, schema, partition_by=[("lang", "identity")])
    tbl = iceberg.load_table(root)
    for s in range(snapshots):
        dfs = [_fake_data_file(s, i, LANGS[i % len(LANGS)])
               for i in range(files)]
        tbl = iceberg._commit_append(tbl, dfs, timestamp_ms=(s + 1) * 1000)


def median3(fn):
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn()
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[1], out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--snapshots", type=int, default=100)
    ap.add_argument("--files", type=int, default=100)
    ap.add_argument("--work-dir", default="/tmp/qw_ice_probe")
    args = ap.parse_args()

    root = os.path.join(args.work_dir, "tbl")
    shutil.rmtree(args.work_dir, ignore_errors=True)
    t0 = time.perf_counter()
    build_metadata_table(root, args.snapshots, args.files)
    build_sec = time.perf_counter() - t0

    tbl = iceberg.load_table(root)
    first_snap = tbl.meta["snapshots"][0]["snapshot-id"]
    total = args.snapshots * args.files

    full_sec, full = median3(lambda: tbl.plan_files())
    assert len(full.files) == total, (len(full.files), total)

    pruned_sec, pruned = median3(
        lambda: tbl.plan_files(filter=[("lang", "=", "python")]))
    bounds_sec, bounded = median3(
        lambda: tbl.plan_files(filter=[("doc_id", "<", 1000)]))
    delta_sec, delta = median3(
        lambda: tbl.appended_files(since_seq=args.snapshots - 1))
    assert len(delta) == args.files, len(delta)
    travel_sec, travel = median3(
        lambda: tbl.plan_files(snapshot_id=first_snap))
    assert len(travel.files) == args.files

    print(json.dumps({
        "snapshots": args.snapshots, "files_per_snapshot": args.files,
        "total_file_entries": total,
        "metadata_build_sec": round(build_sec, 3),
        "full_plan_sec": round(full_sec, 4),
        "full_plan_files_per_sec": round(total / full_sec),
        "pruned_plan_sec": round(pruned_sec, 4),
        "pruned_kept_files": len(pruned.files),
        "pruned_partition_skips": pruned.files_pruned_partition,
        "bounds_plan_sec": round(bounds_sec, 4),
        "bounds_kept_files": len(bounded.files),
        "bounds_manifests_pruned": bounded.manifests_pruned,
        "delta_plan_sec": round(delta_sec, 4),
        "delta_files": len(delta),
        "delta_vs_full_ratio": round(delta_sec / full_sec, 4),
        "time_travel_first_snapshot_sec": round(travel_sec, 4),
    }))


if __name__ == "__main__":
    main()
