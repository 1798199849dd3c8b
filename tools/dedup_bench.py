"""Dedup-throughput scaling sidebar: minhash_near_dup on a synthetic
duplicate-heavy corpus at two parallelism levels.

Secondary evidence for the two-cluster-size criterion on a second
workload shape (vectorized hashing + LSH shuffle rather than the
pipeline's automaton scan). Prints one JSON line; appends to
BENCH/BASELINE.md.

Usage: python tools/dedup_bench.py [n_docs]
"""

from __future__ import annotations

import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def run_level(cpus: int, n_docs: int) -> dict:
    code = f"""
import time, json
from pyspark.sql import functions as F
from kgtk_spark.session import get_spark
from kgtk_spark.textops.dedup import minhash_near_dup
spark = get_spark(app_name="dedup_bench", master="local[{cpus}]", shuffle_partitions={cpus})
spark.sparkContext.setLogLevel("ERROR")
n = {n_docs}
base = spark.range(n).select(
    F.col("id").alias("doc_id"),
    F.concat_ws(
        " ",
        F.concat(F.lit("uniq_"), F.col("id").cast("string")),
        *[F.concat(F.lit(f"w{{j}}_"), (F.col("id") * (j + 7) % 1000003).cast("string")) for j in range(39)],
    ).alias("text"),
)
# every 10th doc duplicates the previous one -> ~10% near-dup pairs
docs = base.withColumn(
    "text",
    F.when(F.col("doc_id") % 10 == 9, F.lag("text", 1).over(
        __import__("pyspark.sql.window", fromlist=["Window"]).Window.orderBy("doc_id"))
    ).otherwise(F.col("text")),
).persist()
docs.count()
best = None
for _ in range(2):
    t0 = time.time()
    out = minhash_near_dup(docs, jaccard_threshold=0.8)
    n_rows = out.count()
    dt = time.time() - t0
    best = dt if best is None or dt < best else best
print(json.dumps({{"cpus": {cpus}, "docs": n, "rows": n_rows, "seconds": round(best, 3), "docs_per_sec": round(n / best, 1)}}))
"""
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=1200,
        cwd=str(REPO),
    )
    for line in out.stdout.splitlines():
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(out.stdout[-1000:] + out.stderr[-1000:])


def main():
    import os

    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n = int(os.environ.get("SCALING_N", "8"))
    n4 = n * 4
    rn = run_level(n, n_docs)
    rn4 = run_level(n4, n_docs)
    eff = (rn4["docs_per_sec"] / rn["docs_per_sec"]) / 4
    result = {f"local{n}": rn, f"local{n4}": rn4, "scaling_efficiency": round(eff, 3)}
    print(json.dumps(result))
    with open(REPO / "BENCH" / "BASELINE.md", "a") as f:
        f.write(
            f"\n### Dedup scaling sidebar: minhash_near_dup, {n_docs} docs "
            f"(N={n}, best of 2)\n\n"
            f"| parallelism | seconds | docs/sec |\n|---|---|---|\n"
            f"| local[{n}] | {rn['seconds']} | {rn['docs_per_sec']} |\n"
            f"| local[{n4}] | {rn4['seconds']} | {rn4['docs_per_sec']} |\n\n"
            f"Scaling efficiency: **{eff:.3f}**\n"
        )


if __name__ == "__main__":
    main()
