"""Structured Streaming equivalents (SURVEY.md §1.4 dataflow model).

rsyslog is a push-based streaming engine; its batch semantics here get
true streaming twins:

- :func:`stream_logtokens`  file-stream source over the tokens table
  (the imfile analog: new files = new data, exactly-once via
  checkpointLocation, which replaces rsyslog's .qi queue checkpoints —
  /root/reference/runtime/queue.c:90-187)
- :func:`windowed_dynstats`  dyn_inc over event-time tumbling windows
  with a watermark (dynstats unusedMetricLife TTL analog: state for
  closed windows is evicted by the watermark —
  /root/reference/runtime/dynstats.c:117-126)
- :func:`stateful_ratelimit`  per-key token bucket with
  applyInPandasWithState (interval+burst semantics of
  /root/reference/runtime/ratelimit.c:2500-2620, but with real
  cross-batch state)
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def stream_logtokens(spark: SparkSession, path: str) -> DataFrame:
    """File-stream the tokens table (imfile analog). Schema is read
    from existing files; maxFilesPerTrigger bounds batch size (the
    iDeqBatchSize analog)."""
    static = spark.read.parquet(path)
    return (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 8)
        .parquet(path)
    )


def windowed_dynstats(
    parsed: DataFrame,
    key_cols: list[str],
    ts_col: str = "event_ts",
    window: str = "60 seconds",
    watermark: str = "120 seconds",
) -> DataFrame:
    """Streaming dyn_inc: per-key counts in tumbling event-time windows;
    watermark evicts closed-window state (TTL analog)."""
    return (
        parsed.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window), *key_cols)
        .agg(F.count(F.lit(1)).alias("n"))
    )


_RL_OUT = StructType(
    [
        StructField("key", StringType()),
        StructField("doc_id", StringType()),
        StructField("rl_pass", BooleanType()),
        StructField("tokens_left", LongType()),
    ]
)
_RL_STATE = StructType(
    [
        StructField("bucket_start_epoch", LongType()),
        StructField("used", LongType()),
    ]
)


def make_ratelimit_fn(interval_seconds: int, burst: int):
    """Token-bucket transition function for applyInPandasWithState.

    State per key: (bucket_start_epoch, used). A new interval refills
    the bucket (ratelimit.c interval semantics: fixed windows, not a
    leaky bucket)."""

    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            bucket_start, used = state.get
        else:
            bucket_start, used = -1, 0
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values("event_epoch")
            for _, row in pdf.iterrows():
                epoch = int(row["event_epoch"])
                win = epoch - (epoch % interval_seconds)
                if win != bucket_start:
                    bucket_start, used = win, 0
                ok = used < burst
                if ok:
                    used += 1
                out.append((key[0], row["doc_id"], ok, burst - used))
        state.update((bucket_start, used))
        yield pd.DataFrame(
            out, columns=["key", "doc_id", "rl_pass", "tokens_left"]
        )

    return fn


def stateful_ratelimit(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    doc_id_col: str = "doc_id",
    interval_seconds: int = 60,
    burst: int = 5,
) -> DataFrame:
    """Cross-batch token-bucket rate limiting (streaming or batch DF).

    Streaming: applyInPandasWithState keeps per-key buckets across
    micro-batches. (On a batch DataFrame use aggregates.ratelimit —
    same semantics, window-function realization.)"""
    prepped = df.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(doc_id_col).alias("doc_id"),
        F.unix_timestamp(F.col(ts_col)).alias("event_epoch"),
    )
    return prepped.groupBy("key").applyInPandasWithState(
        make_ratelimit_fn(interval_seconds, burst),
        outputStructType=_RL_OUT,
        stateStructType=_RL_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_routed_stream(
    stream_df: DataFrame,
    router,
    base_path: str,
    checkpoint: str,
    parse_fn=None,
) -> None:
    """Streaming multi-sink fan-out: per micro-batch, parse → route →
    write every sink slice + one _lineage row. foreachBatch gives each
    epoch transactional semantics (the action-TX analog, action.c:462);
    the checkpoint makes the whole pipeline resumable (queue .qi
    analog)."""
    from rsyslog_spark.parsing import parse as default_parse

    parse_fn = parse_fn or default_parse
    sinks = [a.sink for a in router.actions]

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        from pyspark.sql import functions as FF

        routed = router.apply(parse_fn(batch_df))
        routed.persist()
        try:
            counts = {}
            for a in router.actions:
                part = routed.filter(FF.col(f"route_{a.sink}")).drop(
                    *[f"route_{x.sink}" for x in router.actions]
                )
                part.write.mode("append").parquet(f"{base_path}/{a.sink}")
            agg = routed.agg(
                FF.count(FF.lit(1)).alias("rows_in"),
                *[
                    FF.sum(FF.col(f"route_{s}").cast("long")).alias(
                        f"routed_{s}"
                    )
                    for s in sinks
                ],
            ).withColumn("epoch_id", FF.lit(epoch_id))
            agg.write.mode("append").parquet(f"{base_path}/_lineage")
        finally:
            routed.unpersist()

    q = (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_stream_to_table(
    stream_df: DataFrame, out_path: str, checkpoint: str,
    mode: str = "append",
) -> None:
    """availableNow one-shot: drain everything currently available and
    stop — resumable from `checkpoint` (the .qi/Iceberg-snapshot
    analog: restart picks up only new files)."""
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
