"""Round-6 optimization harness (bench.py is FROZEN for measurement —
this file exists so the optimization loop can time individual queries
at any SF, with the same digest materialization as bench.py, and dump
``explain("formatted")`` plans into plans/r06/.

Usage:
  python bench_extra.py time  <sf_dir> <n_reps> <query> [query ...]
  python bench_extra.py plan  <sf_dir> <suffix> <query> [query ...]
      writes plans/r06/<query>_<suffix>.txt
  python bench_extra.py crawl [n_reps]
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from scrapy_cluster_spark.session import get_spark  # noqa: E402

import bench  # noqa: E402


def _spark():
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="bench_extra", cores=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def time_queries(sf_dir: str, n_reps: int, names: list[str]) -> None:
    spark = _spark()
    bench.warmup(spark)
    qs = entrymod.queries()
    times: dict[str, list[float]] = {n: [] for n in names}
    for _rep in range(n_reps):
        for name in names:
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            bench._materialize(qs[name](spark, sf_dir))
            times[name].append(time.time() - t0)
            spark.sparkContext.setJobDescription(None)
        spark.catalog.clearCache()
        bench._assert_no_cached_storage(spark)
    out = {
        n: {"median": round(statistics.median(v), 3),
            "min": round(min(v), 3), "max": round(max(v), 3),
            "samples": [round(x, 3) for x in v]}
        for n, v in times.items()
    }
    print("EXTRA " + json.dumps({"sf_dir": sf_dir, "times": out}))
    spark.stop()


def dump_plans(sf_dir: str, suffix: str, names: list[str]) -> None:
    here = os.path.dirname(os.path.abspath(__file__))
    outdir = os.path.join(here, "plans", "r06")
    os.makedirs(outdir, exist_ok=True)
    spark = _spark()
    qs = entrymod.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} @ {sf_dir} ({suffix})\n")
            f.write(buf.getvalue())
        print("wrote", path)
        spark.catalog.clearCache()
        entrymod.release_caches()
    spark.stop()


def crawl(n_reps: int) -> None:
    spark = _spark()
    bench.warmup(spark)
    r = bench.crawl_throughput_reps(spark, n_reps=n_reps)
    print("EXTRA " + json.dumps(r))
    spark.stop()


if __name__ == "__main__":
    mode = sys.argv[1]
    if mode == "time":
        time_queries(sys.argv[2], int(sys.argv[3]), sys.argv[4:])
    elif mode == "plan":
        dump_plans(sys.argv[2], sys.argv[3], sys.argv[4:])
    elif mode == "crawl":
        crawl(int(sys.argv[2]) if len(sys.argv) > 2 else 3)
    else:
        raise SystemExit(f"unknown mode {mode}")
