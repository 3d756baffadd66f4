"""Output modules (om*) as Spark writers (SURVEY.md §2.10).

The deep analogy: an omfile *dynafile* names its output file with a
template (/root/reference/tools/omfile.c:133-145) — which is exactly a
partition-by expression. An omkafka *dynatopic/dynakey*
(/root/reference/plugins/omkafka/omkafka.c:227-292) is a key/topic
column pair. Action transactionality (beginTx/commitTx,
runtime/action.c:462) maps to the atomicity of a Spark file-commit /
foreachBatch epoch.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rsyslog_spark.rules.compiler import Env
from rsyslog_spark.templates import compile_template


def omfile(
    df: DataFrame,
    path: str,
    template: str | None = None,
    dynafile_parts: dict[str, str] | None = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """omfile: static file or dynafile.

    ``dynafile_parts`` maps partition-column name → template string;
    each template compiles to a Column and becomes a physical partition
    directory (the dynafile-name cache, omfile.c:186-201, is what
    Spark's dynamic partition writer already is). ``template`` renders
    the row body (text output) — omitted = full columnar row."""
    env = Env()
    out = df
    part_cols = []
    for name, tpl in (dynafile_parts or {}).items():
        out = out.withColumn(name, compile_template(tpl, env))
        part_cols.append(name)
    if template is not None:
        rendered = compile_template(template, env).alias("value")
        out = out.select(*part_cols, rendered)
        if fmt == "parquet":
            fmt = "text"
    w = out.write.mode(mode)
    if part_cols:
        w = w.partitionBy(*part_cols)
    w.format(fmt).save(path)


def omkafka_frame(
    df: DataFrame,
    template: str,
    dynakey: str | None = None,
    dynatopic: str | None = None,
) -> DataFrame:
    """Shape rows for df.write.format("kafka"): (key, value[, topic])
    columns from templates — omkafka's dynatopic+dynakey semantics.
    (No broker in this sandbox; the frame is the testable part.)"""
    env = Env()
    cols = [compile_template(template, env).alias("value")]
    if dynakey:
        cols.insert(0, compile_template(dynakey, env).alias("key"))
    if dynatopic:
        cols.append(compile_template(dynatopic, env).alias("topic"))
    return df.select(*cols)


def om_foreach_batch(
    stream_df: DataFrame,
    writer: Callable[[DataFrame, int], None],
    checkpoint: str,
):
    """Generic transactional sink (ommysql/omelasticsearch/omhttp
    family): foreachBatch gives per-epoch exactly-once handoff — the
    analog of the action TX interface (action.c:462) with the epoch id
    as the transaction id."""
    return (
        stream_df.writeStream.foreachBatch(writer)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def upsert_aggregate(
    df: DataFrame,
    path: str,
    keys: list[str],
    merge: dict[str, str] | None = None,
) -> DataFrame:
    """Idempotent aggregate upsert without a table format — the
    Iceberg-MERGE analog for omsendertrack-style state
    (plugins/omsendertrack: periodic counter state files).

    Existing state at `path` is merged with `df` on `keys`; `merge`
    maps column → one of sum|min|max|last (default sum for numerics).
    The rewrite is write-temp-then-swap, so a retried job converges to
    the same state (at-least-once becomes effectively idempotent for
    these algebraic merges)."""
    import os
    import shutil

    spark = df.sparkSession
    if os.path.isdir(path):
        old = spark.read.parquet(path)
        unioned = old.unionByName(df, allowMissingColumns=True)
    else:
        unioned = df
    merge = merge or {}
    aggs = []
    for c in unioned.columns:
        if c in keys:
            continue
        how = merge.get(c, "sum")
        fn = {"sum": F.sum, "min": F.min, "max": F.max, "last": F.last}[how]
        aggs.append(fn(c).alias(c))
    merged = unioned.groupBy(*keys).agg(*aggs)
    tmp = path + ".tmp_upsert"
    shutil.rmtree(tmp, ignore_errors=True)
    merged.write.mode("overwrite").parquet(tmp)
    if os.path.isdir(path):
        shutil.rmtree(path)
    os.rename(tmp, path)
    return spark.read.parquet(path)


def failover_chain(
    df: DataFrame, primary_pred: Column, *fallback_preds: Column
) -> list[Column]:
    """action.execOnlyWhenPreviousIsSuspended (action.c:385): each
    fallback fires only where every earlier action did not. In pure
    dataflow a 'suspended' action is one whose predicate is false, so
    the chain is cumulative predicate negation."""
    out = [primary_pred]
    seen = primary_pred
    for p in fallback_preds:
        out.append(p & ~seen)
        seen = seen | p
    return out
