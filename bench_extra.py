"""Extra measurement harness for optimization rounds (bench.py stays
frozen — guide §1: measure first, isolate with the noop sink, capture
plans).

Usage:
    python bench_extra.py plans  [out_dir] [label]   # explain("formatted") per query
    python bench_extra.py time   [names...]          # noop-sink timings, min of 3
    python bench_extra.py decode                     # decode backend microbench

Timing methodology mirrors bench.py (warm-up + min of 3) but writes
results through the noop sink so every column of every row is computed
and no collect/driver cost rides the number.
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
MULT = int(os.environ.get("SPARK_GRAFT_BENCH_MULT", "50"))

BENCH_CONF = {
    "spark.sql.files.maxPartitionBytes": str(4 * 1024 * 1024),
    "spark.sql.files.openCostInBytes": "0",
}

# the queries bench.py times (same names), all driven through
# __spark_entry__.queries() so the measured plan is the declared one
TIMED = [
    "parse_route",
    "agg_fac_sev_source",
    "template_render",
    "dedup_exact_docs",
    "minhash_pairs",
    "simsearch_topk",
    "ratelimit",
    "doc_token_stats",
    "mmnormalize",
    "line_dedup",
    "seq_pack",
    "bpe_tokens",
    "dup_spans",
    "dsir_select",
]


def _spark():
    from rsyslog_spark.session import get_spark

    return get_spark(
        "bench-extra", master=f"local[{CPUS}]",
        shuffle_partitions=max(8, CPUS), extra_conf=BENCH_CONF,
    )


def _jobs(spark):
    """name -> thunk returning a DataFrame (bench.py's suite, but as
    DataFrames so we can noop-sink and explain them)."""
    import __spark_entry__ as entrymod
    from pyspark.sql import functions as F

    import bench
    from rsyslog_spark import aggregates as agg, flagship
    from rsyslog_spark.parsing import parse
    from rsyslog_spark.templates import compile_template

    tokens_path = bench._materialize_tokens(spark, MULT)
    lt = spark.read.parquet(tokens_path)
    qs = entrymod.queries()

    jobs = {
        "parse_route": lambda: flagship.make_router().route_counts(parse(lt)),
        "agg_fac_sev_source": lambda: agg.salted_counts(
            parse(lt), ["facility", "severity", "source"]
        ),
        "template_render": lambda: parse(lt).select(
            compile_template("RSYSLOG_TraditionalFileFormat").alias("l")
        ).agg(F.sum(F.length("l"))),
        "decode_only": lambda: lt.select(
            F.length(
                __import__(
                    "rsyslog_spark.parsing.core", fromlist=["decode_tokens"]
                ).decode_tokens("tokens")
            ).alias("n")
        ).agg(F.sum("n")),
        "parse_only": lambda: parse(lt).select(
            F.sum(F.length("msg")).alias("s")
        ),
    }
    for name in TIMED:
        if name in jobs:
            continue
        jobs[name] = lambda n=name: qs[n](spark, SF_DIR)
    return jobs


def cmd_plans(out_dir: str, label: str) -> None:
    spark = _spark()
    jobs = _jobs(spark)
    os.makedirs(out_dir, exist_ok=True)
    for name in TIMED:
        df = jobs[name]()
        p = os.path.join(out_dir, f"{name}_{label}.txt")
        with open(p, "w") as fh:
            fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            ))
        print(p)
    spark.stop()


def cmd_time(names: list[str]) -> None:
    spark = _spark()
    jobs = _jobs(spark)
    names = names or TIMED
    out = {}
    for name in names:
        fn = jobs[name]

        def run():
            fn().write.format("noop").mode("overwrite").save()

        spark.sparkContext.setJobDescription(f"bx:{name}")
        run()  # warm-up
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            run()
            best = min(best, time.time() - t0)
        out[name] = round(best, 3)
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"noop_min3": out, "sf": SF_DIR, "mult": MULT}))
    spark.stop()


def cmd_decode() -> None:
    """Compare decode backends over the bench tokens corpus."""
    from pyspark.sql import functions as F

    import bench
    from rsyslog_spark.parsing.core import decode_tokens

    spark = _spark()
    tokens_path = bench._materialize_tokens(spark, MULT)
    lt = spark.read.parquet(tokens_path)
    for backend in ("jvm", "arrow"):
        # rebuild the DataFrame per attempt: AQE reuses a finalized
        # plan's materialized shuffle stages on re-collect of the SAME
        # DataFrame object, which would time a cache hit
        def mk():
            return lt.select(
                F.length(decode_tokens("tokens", backend=backend)).alias("n")
            ).agg(F.sum("n"))

        spark.sparkContext.setJobDescription(f"decode:{backend}")
        mk().collect()
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            mk().collect()
            best = min(best, time.time() - t0)
        print(json.dumps({f"decode_{backend}": round(best, 3)}), flush=True)
    spark.stop()


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "time"
    if cmd == "plans":
        out_dir = sys.argv[2] if len(sys.argv) > 2 else "plans/r06"
        label = sys.argv[3] if len(sys.argv) > 3 else "before"
        cmd_plans(out_dir, label)
    elif cmd == "decode":
        cmd_decode()
    else:
        cmd_time(sys.argv[2:])
