"""Lineage & metrics: the impstats/statsobj analog (SURVEY.md §3.3).

rsyslog snapshots every component's counters on an interval
(/root/reference/plugins/impstats/impstats.c:113-141,470-501;
runtime/statsobj.h:68-81) and injects them as messages. Here the
equivalent is a ``_lineage`` table: one row per (run, sink) with input
counts, per-sink routed counts, parse-failure counts, and wall time —
collected with ``DataFrame.observe`` so the metrics ride the SAME job
as the data (no second scan), exactly like statsobj counters riding
the message path.
"""

from __future__ import annotations

import time
import uuid

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


class LineageTracker:
    """Wraps a routed DataFrame with observe() metrics and writes the
    snapshot to a _lineage parquet table after the action completes."""

    def __init__(self, sinks: list[str]):
        self.sinks = sinks
        self.obs = Observation("rsyslog_spark_lineage")
        self.run_id = uuid.uuid4().hex[:12]
        self._t0: float | None = None

    def instrument(self, routed: DataFrame) -> DataFrame:
        """Attach counters to the routed DataFrame (call before the
        action). Adds zero extra jobs."""
        metrics = [F.count(F.lit(1)).alias("rows_in")]
        metrics.append(
            F.sum(
                F.when(~F.col("parse_success"), 1).otherwise(0)
            ).alias("parse_failures")
        )
        for s in self.sinks:
            metrics.append(
                F.sum(F.col(f"route_{s}").cast("long")).alias(f"routed_{s}")
            )
        self._t0 = time.time()
        return routed.observe(self.obs, *metrics)

    def snapshot(self) -> dict:
        """Metrics after the action has run."""
        got = dict(self.obs.get)
        got["wall_ms"] = int((time.time() - (self._t0 or time.time())) * 1000)
        got["run_id"] = self.run_id
        return got

    def write(self, spark, lineage_path: str, extra: dict | None = None) -> dict:
        snap = self.snapshot()
        snap.update(extra or {})
        row = {k: (int(v) if isinstance(v, bool) else v) for k, v in snap.items()}
        df = spark.createDataFrame([row])
        df = df.withColumn("ts", F.current_timestamp())
        df.write.mode("append").parquet(lineage_path)
        return snap


def per_partition_lineage(routed: DataFrame, sinks: list[str]) -> DataFrame:
    """Per-input-partition counters (north_star: per-partition lineage):
    one row per physical partition with rows_in, parse_failures, and
    routed counts per sink — the statsobj-per-component analog, keyed
    by partition instead of component."""
    aggs = [
        F.count(F.lit(1)).alias("rows_in"),
        F.sum(F.when(~F.col("parse_success"), 1).otherwise(0)).alias(
            "parse_failures"
        ),
    ] + [
        F.sum(F.col(f"route_{s}").cast("long")).alias(f"routed_{s}")
        for s in sinks
    ]
    return routed.groupBy(
        F.spark_partition_id().alias("partition_id")
    ).agg(*aggs)


def run_with_lineage(
    router, parsed: DataFrame, base_path: str, lineage_path: str | None = None
) -> dict:
    """Route + write all sinks + append run-level and per-partition
    _lineage rows. Returns the run-level snapshot (rows_in,
    parse_failures, routed_<sink>, wall_ms)."""
    sinks = [a.sink for a in router.actions]
    tracker = LineageTracker(sinks)
    routed = tracker.instrument(router.apply(parsed))
    routed.persist()
    try:
        for a in router.actions:
            (
                routed.filter(F.col(f"route_{a.sink}"))
                .drop(*[f"route_{x.sink}" for x in router.actions])
                .write.mode("overwrite")
                .parquet(f"{base_path}/{a.sink}")
            )
        spark = parsed.sparkSession
        lp = lineage_path or f"{base_path}/_lineage"
        per_partition_lineage(routed, sinks).withColumn(
            "run_id", F.lit(tracker.run_id)
        ).write.mode("append").parquet(f"{lp}_partitions")
        return tracker.write(spark, lp)
    finally:
        routed.unpersist()
