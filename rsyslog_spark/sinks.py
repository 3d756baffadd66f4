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
    compression: str | None = None,
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
    if compression:
        # omfile zipLevel / compression.driver (tools/omfile.c:241,278):
        # zlib/zstd stream compression maps to the writer codec
        w = w.option("compression", compression)
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


def omprog(
    df: DataFrame,
    binary: list[str],
    template: str = "RSYSLOG_FileFormat",
    confirm_messages: bool = False,
) -> DataFrame:
    """plugins/omprog: pipe each rendered message line to an external
    program's stdin — one long-lived child per partition (omprog keeps
    one per worker). With ``confirm_messages`` (omprog.c:96,126) the
    child acknowledges each line on stdout ('OK' = delivered; anything
    else is recorded as the failure reason, the reportFailures shape).
    Returns (value, delivered, reply) for lineage/retry accounting —
    an ACTION, so the caller decides what to do with failures."""
    import subprocess

    from pyspark.sql.types import BooleanType as _B
    from pyspark.sql.types import StringType as _S
    from pyspark.sql.types import StructField as _SF
    from pyspark.sql.types import StructType as _ST

    env = Env()
    rendered = df.select(compile_template(template, env).alias("value"))
    out_schema = _ST([
        _SF("value", _S()), _SF("delivered", _B()), _SF("reply", _S()),
    ])

    def run(batches):
        import pandas as _pd

        proc = subprocess.Popen(
            binary, stdin=subprocess.PIPE,
            stdout=subprocess.PIPE if confirm_messages else subprocess.DEVNULL,
            text=True, bufsize=1,
        )
        try:
            for pdf in batches:
                delivered, replies = [], []
                for v in pdf["value"]:
                    line = str(v or "").replace("\n", " ")
                    proc.stdin.write(line + "\n")
                    proc.stdin.flush()
                    if confirm_messages:
                        reply = proc.stdout.readline().rstrip("\n")
                        delivered.append(reply == "OK")
                        replies.append(reply)
                    else:
                        delivered.append(True)
                        replies.append(None)
                yield _pd.DataFrame(
                    {"value": pdf["value"], "delivered": delivered,
                     "reply": replies}
                )
        finally:
            proc.stdin.close()
            proc.wait(timeout=10)

    return rendered.mapInPandas(run, out_schema)


def omfwd_frame(
    df: DataFrame,
    template: str = "RSYSLOG_ForwardFormat",
    framing: str = "octet-stuffing",
) -> DataFrame:
    """Shape rows into omfwd TCP wire frames (tools/omfwd.c:2277-2279;
    RFC 6587): ``octet-counted`` prefixes each message with its byte
    length + SP; ``octet-stuffing`` (traditional, the omfwd default)
    terminates with LF. The resulting `value` column is the exact byte
    sequence a socket sink would write — the socket itself is the
    sandbox-blocked seam."""
    env = Env()
    msg = compile_template(template, env)
    if framing == "octet-counted":
        # length in BYTES (UTF-8), not characters
        val = F.concat(
            F.octet_length(msg).cast("string"), F.lit(" "), msg
        )
    elif framing in ("octet-stuffing", "traditional", "lf"):
        val = F.concat(msg, F.lit("\n"))
    else:
        raise ValueError(
            "framing must be octet-counted or octet-stuffing"
        )
    return df.select(val.alias("value"))


def omelasticsearch_frame(
    df: DataFrame,
    template: str,
    index: str,
    id_template: str | None = None,
    dyn_index: bool = False,
    write_operation: str = "index",
) -> DataFrame:
    """Shape rows into Elasticsearch _bulk entries — omelasticsearch's
    bulkmode batch format (plugins/omelasticsearch/omelasticsearch.c:
    88-94 META_* constants; buildBatch:1219-1260): per message an
    action line ``{"index":{"_index":"<idx>"[,"_id":"<id>"]}}``
    followed by the rendered JSON document. ``dyn_index`` treats
    `index` as a template (dynSearchIndex); ``write_operation`` is
    index|create (ES_WRITE_CREATE). The resulting `value` column is the
    two-line bulk entry — `foreachBatch` + an HTTP POST of the
    concatenated batch is the wire part this sandbox cannot exercise."""
    if write_operation not in ("index", "create"):
        raise ValueError("write_operation must be index|create")
    env = Env()
    idx = compile_template(index, env) if dyn_index else F.lit(index)
    idx = F.regexp_replace(idx, '"', '\\\\"')
    action = F.concat(
        F.lit('{"' + write_operation + '":{"_index":"'), idx, F.lit('"')
    )
    if id_template:
        bulk_id = compile_template(id_template, env)
        action = F.concat(
            action, F.lit(', "_id":"'),
            F.regexp_replace(bulk_id, '"', '\\\\"'), F.lit('"'),
        )
    action = F.concat(action, F.lit("}}"))
    doc = compile_template(template, env)
    return df.select(
        F.concat(action, F.lit("\n"), doc).alias("value")
    )


def om_foreach_batch(
    stream_df: DataFrame,
    writer: Callable[[DataFrame, int], None],
    checkpoint: str,
):
    """Generic sink adapter (ommysql/omelasticsearch/omhttp family):
    foreachBatch hands `writer` each micro-batch with its epoch id —
    the analog of the action TX interface (action.c:462). Delivery is
    AT-LEAST-ONCE: a crashed epoch is replayed, so `writer` must be
    idempotent on (data, epoch_id) — key an upsert on the epoch
    (sinks.upsert_aggregate(batch_id=epoch_id)) or overwrite an
    epoch-named partition (see streaming.run_routed_stream) to get
    effective exactly-once."""
    return (
        stream_df.writeStream.foreachBatch(writer)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def _upsert_recover(path: str) -> None:
    """ROLL BACK an interrupted bucket swap to the pre-batch state.

    The swap parks a _PENDING manifest (the touched bucket list) in
    `path`.bak before moving anything, and removes the whole .bak dir
    only AFTER the batch marker is committed. So if .bak still exists
    we are mid-swap: every touched bucket's current dir may be new
    data from the UNcommitted batch — remove it and restore the parked
    copy (buckets with no parked copy were new; removing them restores
    the pre-batch absence). A later replay of the batch then applies
    exactly once."""
    import json
    import os
    import shutil

    bak = path + ".bak"
    pending = os.path.join(bak, "_PENDING")
    if os.path.isdir(bak):
        if os.path.exists(pending):
            with open(pending) as fh:
                touched: list[int] = json.load(fh)
            for b in touched:
                d = f"_bucket={b}"
                cur = os.path.join(path, d)
                parked = os.path.join(bak, d)
                if os.path.isdir(cur):
                    shutil.rmtree(cur)
                if os.path.isdir(parked):
                    os.rename(parked, cur)
        else:
            # no manifest (foreign/older interruption): conservative —
            # restore any parked bucket missing from the state, never
            # delete data
            for d in os.listdir(bak):
                if d.startswith("_bucket=") and not os.path.isdir(
                    os.path.join(path, d)
                ):
                    os.rename(os.path.join(bak, d), os.path.join(path, d))
        shutil.rmtree(bak, ignore_errors=True)
    shutil.rmtree(path + ".tmp_upsert", ignore_errors=True)


def upsert_aggregate(
    df: DataFrame,
    path: str,
    keys: list[str],
    merge: dict[str, str] | None = None,
    num_buckets: int = 16,
    batch_id: str | int | None = None,
) -> DataFrame:
    """Aggregate upsert without a table format — the Iceberg-MERGE
    analog for omsendertrack-style state (plugins/omsendertrack:
    periodic counter state files). On a real cluster this is one
    Iceberg/Delta MERGE INTO; this sandbox analog keeps the MERGE's
    two scale properties:

    * **O(touched), not O(state)**: state is hash-partitioned on
      ``pmod(xxhash64(keys), num_buckets)``; only buckets present in
      `df` are read (partition-pruned scan), merged, and rewritten.
    * **Crash-safe journaled swap**: a _PENDING manifest of the
      touched buckets lands in `path`.bak before any move; the journal
      is dropped only AFTER the batch marker commits. A crash at any
      point leaves a state that `_upsert_recover` (run automatically
      on entry) ROLLS BACK to the pre-batch snapshot, so the replayed
      batch applies exactly once — no partial-swap double counting.

    Replay semantics: pass ``batch_id`` to make re-application a true
    no-op (committed ids are tracked in `path`.batches markers) —
    without it, replaying a batch double-counts `sum` merges (min/max
    are naturally convergent). A pre-bucketing flat state dir is
    migrated (merged, full rewrite) rather than discarded. `merge`
    maps column → sum|min|max|last (default sum)."""
    import os
    import shutil

    spark = df.sparkSession
    _upsert_recover(path)

    batches_dir = path + ".batches"
    if batch_id is not None:
        marker = os.path.join(batches_dir, str(batch_id))
        if os.path.exists(marker):  # replay of a committed batch: no-op
            return spark.read.parquet(path).drop("_bucket")

    bucket = F.pmod(F.xxhash64(*[F.col(k) for k in keys]), F.lit(num_buckets))
    new = df.withColumn("_bucket", bucket)
    bucketed = os.path.isdir(path) and any(
        d.startswith("_bucket=") for d in os.listdir(path)
    )
    legacy = (
        not bucketed
        and os.path.isdir(path)
        and any(d.endswith(".parquet") for d in os.listdir(path))
    )
    if bucketed:
        # touched bucket ids: at most num_buckets ints — tiny driver list
        touched = sorted(
            r._bucket for r in new.select("_bucket").distinct().collect()
        )
        old = spark.read.parquet(path).filter(F.col("_bucket").isin(touched))
        unioned = old.unionByName(new, allowMissingColumns=True)
    elif legacy:
        # pre-bucketing flat layout: migrate by merging the WHOLE old
        # state into this write (full rewrite, once) — never discard it
        old = spark.read.parquet(path).withColumn("_bucket", bucket)
        unioned = old.unionByName(new, allowMissingColumns=True)
        touched = None
    else:
        touched = None  # first write: all buckets
        unioned = new
    merge = merge or {}
    aggs = []
    for c in unioned.columns:
        if c in keys or c == "_bucket":
            continue
        how = merge.get(c, "sum")
        fn = {"sum": F.sum, "min": F.min, "max": F.max, "last": F.last}[how]
        aggs.append(fn(c).alias(c))
    merged = unioned.groupBy(*keys).agg(*aggs).withColumn("_bucket", bucket)

    tmp = path + ".tmp_upsert"
    shutil.rmtree(tmp, ignore_errors=True)
    merged.write.mode("overwrite").partitionBy("_bucket").parquet(tmp)

    if touched is None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        if os.path.isdir(path):
            shutil.rmtree(path)
        os.rename(tmp, path)
    else:
        # journaled swap: the _PENDING manifest (touched bucket list)
        # lands in .bak BEFORE any move; a crash anywhere before the
        # batch marker is written leaves .bak in place, and recovery
        # rolls the touched buckets BACK so the replay applies exactly
        # once. .bak is removed only after the marker commit below.
        import json as _json

        bak = path + ".bak"
        os.makedirs(bak, exist_ok=True)
        with open(os.path.join(bak, "_PENDING"), "w") as fh:
            _json.dump([int(b) for b in touched], fh)
        for b in touched:
            d = f"_bucket={b}"
            src, dst = os.path.join(tmp, d), os.path.join(path, d)
            if not os.path.isdir(src):
                continue  # bucket merged away to empty (never for aggs)
            if os.path.isdir(dst):
                os.rename(dst, os.path.join(bak, d))
            os.rename(src, dst)
        shutil.rmtree(tmp, ignore_errors=True)

    if batch_id is not None:
        os.makedirs(batches_dir, exist_ok=True)
        with open(os.path.join(batches_dir, str(batch_id)), "w") as fh:
            fh.write("committed")
    # commit point: only now is the swap irrevocable — dropping the
    # journal+backups makes recovery a no-op for this batch
    shutil.rmtree(path + ".bak", ignore_errors=True)
    return spark.read.parquet(path).drop("_bucket")


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
