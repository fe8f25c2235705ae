"""Scaling-efficiency evidence for the north rule (>= 0.8 from N to 4N
executors), evidenced in-sandbox as local[8] vs local[32] on identical
input (BASELINE.md "Our target" row).

Zips the package, runs scripts/build_index_job.py twice via
`spark-submit --py-files` (the north rule's launch mode), parses the JSON
lines, computes efficiency = throughput_4N / (4 * throughput_N), and
writes BENCH/BASELINE.md.

    python scripts/scaling_bench.py [--docs 400000] [--n 8] [--mult 4]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_zip(tmp: str) -> str:
    zpath = os.path.join(tmp, "quickwit_spark.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        pkg = os.path.join(ROOT, "quickwit_spark")
        for dirpath, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, ROOT))
    return zpath


def run_build(cores: int, docs: int, zpath: str, tmp: str,
              partitions: int) -> dict:
    index_dir = os.path.join(tmp, f"idx_{cores}")
    cmd = [
        "spark-submit",
        "--master", f"local[{cores}]",
        "--conf", f"spark.sql.shuffle.partitions={cores}",
        "--conf", "spark.sql.execution.arrow.pyspark.enabled=true",
        "--conf", "spark.driver.memory=24g",
        "--conf", "spark.ui.enabled=false",
        "--py-files", zpath,
        os.path.join(ROOT, "scripts", "build_index_job.py"),
        "--docs", str(docs),
        "--partitions", str(partitions),
        "--index-dir", index_dir,
        "--fresh",
    ]
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=1800)
    for line in out.stdout.splitlines()[::-1]:
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    sys.stderr.write(out.stdout[-4000:] + "\n" + out.stderr[-4000:])
    raise RuntimeError(f"no JSON from spark-submit (cores={cores})")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=400_000)
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--mult", type=int, default=4)
    ap.add_argument("--out", default=os.path.join(ROOT, "BENCH",
                                                  "BASELINE.md"))
    args = ap.parse_args()

    tmp = tempfile.mkdtemp(prefix="qw_scaling_")
    try:
        zpath = make_zip(tmp)
        small = run_build(args.n, args.docs, zpath, tmp,
                          partitions=args.n * args.mult)
        big = run_build(args.n * args.mult, args.docs, zpath, tmp,
                        partitions=args.n * args.mult)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    eff = big["docs_per_sec"] / (args.mult * small["docs_per_sec"])
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        f.write(f"""# BENCH/BASELINE — scaling efficiency evidence

North rule: >= 0.8 throughput scaling efficiency from N to {args.mult}N
executors. No multi-node cluster exists in this sandbox; per the driver's
instruction this is evidenced by running the SAME distributed build job
(`spark-submit --py-files quickwit_spark.zip scripts/build_index_job.py`)
on the SAME input at two parallelism levels.

Input: {small['docs']:,} synthetic source-code docs,
{small['bytes_raw']/1e6:.1f} MB raw content (seed=42, deterministic),
{args.n * args.mult} build partitions at both levels. Timing excludes
corpus generation (input cached + materialized first).

| parallelism | build wall (s) | docs/sec | MB/sec |
|---|---|---|---|
| local[{args.n}] (N) | {small['build_sec']} | {small['docs_per_sec']:,} | {small['mb_per_sec']} |
| local[{args.n * args.mult}] ({args.mult}N) | {big['build_sec']} | {big['docs_per_sec']:,} | {big['mb_per_sec']} |

**Scaling efficiency (N -> {args.mult}N): {eff:.3f}**
(= {big['docs_per_sec']:,} / ({args.mult} x {small['docs_per_sec']:,}))

Raw JSON:

```json
{json.dumps(small)}
{json.dumps(big)}
```
""")
    print(json.dumps({"efficiency": round(eff, 4), "n": small,
                      "xn": big, "out": args.out}))


if __name__ == "__main__":
    main()
