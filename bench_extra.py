"""Round-6 optimization measurement harness (bench.py is FROZEN).

Times individual catalog queries with the noop sink at any scale
factor, optionally capturing ``explain("formatted")`` per query.

Usage:
    python bench_extra.py [--sf-dir DIR] [--repeats N] [--plans DIR] \
        [--pipeline] [query ...]

Prints one JSON line: {"queries": {name: best_sec}, "sf_dir": ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0"))
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--plans", default=None,
                    help="directory for explain('formatted') dumps")
    ap.add_argument("--suffix", default="",
                    help="suffix for plan files, e.g. _before/_after")
    ap.add_argument("--pipeline", action="store_true",
                    help="also run the kg_pipeline block like bench.py")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from kgtk_spark.session import get_spark
    from kgtk_spark.queries import QUERIES

    import bench as benchmod

    names = args.queries or benchmod.BENCH_QUERIES

    spark = get_spark(
        app_name="kgtk_spark_bench_extra",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
    )
    spark.sparkContext.setLogLevel("ERROR")

    # same warmup as bench.py
    spark.read.parquet(f"{args.sf_dir}/nation.parquet").count()
    from pyspark.sql.functions import pandas_udf

    _warm = pandas_udf(lambda s: s, "long")
    spark.range(0, cpus * 4, 1, cpus).select(_warm("id")).write.format(
        "noop").mode("overwrite").save()

    if args.plans:
        os.makedirs(args.plans, exist_ok=True)
        for name in names:
            df = QUERIES[name](spark, args.sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(args.plans, name + args.suffix + ".txt"),
                      "w") as fp:
                fp.write(plan)

    timings: dict[str, float] = {}
    for sweep in range(args.repeats):
        for name in names:
            fn = QUERIES[name]
            spark.sparkContext.setJobDescription(f"{name} sweep{sweep}")
            t0 = time.time()
            benchmod.run_noop(fn(spark, args.sf_dir))
            elapsed = round(time.time() - t0, 3)
            if name not in timings or elapsed < timings[name]:
                timings[name] = elapsed
            spark.sparkContext.setJobDescription(None)

    out = {"queries": timings, "sf_dir": args.sf_dir,
           "total": round(sum(timings.values()), 3),
           "loadavg": [round(x, 2) for x in os.getloadavg()]}

    if args.pipeline:
        from kgtk_spark.pipeline import alias_dictionary_df, triple_precision_recall
        from kgtk_spark.pipeline.runner import run_pipeline_fused
        from kgtk_spark.pipeline.webgen import generate_pages_distributed

        sf = benchmod.sf_of(args.sf_dir)
        n_pages = max(500, int(500000 * sf))
        n_entities = max(100, int(20000 * sf))
        pages, expected, world = generate_pages_distributed(
            spark, n_pages=n_pages, n_entities=n_entities, seed=42,
            partitions=cpus * 2)
        pages = pages.persist()
        pages.count()
        expected = expected.persist()
        expected.count()
        ad = alias_dictionary_df(spark, world)
        n_aliases = ad.count()
        pipe_sec = None
        for _ in range(3):
            t0 = time.time()
            edges = run_pipeline_fused(
                spark, pages, ad, n_buckets=cpus, alias_count=n_aliases)
            n_edges = edges.count()
            elapsed = time.time() - t0
            if pipe_sec is None or elapsed < pipe_sec:
                pipe_sec = elapsed
        p, r = triple_precision_recall(edges, expected)
        out["kg_pipeline"] = round(pipe_sec, 3)
        out["pipeline_edges"] = n_edges
        out["triples_per_sec"] = round(n_edges / pipe_sec, 2)
        out["triple_pr"] = [round(p, 4), round(r, 4)]

    print(json.dumps(out))


if __name__ == "__main__":
    main()
