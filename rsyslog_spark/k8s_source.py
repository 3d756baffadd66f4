"""imkubernetes — pod log files: path metadata, CRI / Docker
json-file record parsing, and partial-record merging.

The reference (contrib/imkubernetes/imkubernetes.c) tails
``/var/log/pods/*/*/*.log``, parses each line as a CRI record
(``<rfc3339-ts> stdout|stderr P|F <msg>``, parseCriLine:1160-1190)
or a Docker json-file record (``{"log":…,"stream":…,"time":…}``,
parseDockerJsonLine:1192-1240), derives pod identity from the path
(parsePodsPath:411-485: ``…/pods/<namespace>_<pod>_<uid>/
<container>/<restart>.log``), merges CRI partial records
(emitPartialIfComplete:1104-1150), and optionally enriches from the
API server — which here is :func:`rsyslog_spark.lookup.mmkubernetes`'s
broadcast pod-metadata join.

Spark-first shape: everything except the merge is a map-only Column
expression over ``spark.read.text(paths).withColumn("path",
input_file_name())``; the merge groups by (file, final-record
segment), so its shuffle is keyed by file — reading a million pod
files across 1000 executors never concentrates data."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: the reference's default tail glob (imkubernetes.c:66)
DFLT_LOG_FILE_GLOB = "/var/log/pods/*/*/*.log"

_PODS_RX = r"(^|/)pods/([^/_]+)_([^/_]+)_([^/]+)/([^/]+)/([^/]+)$"


def pods_path_parse(path: Column) -> Column:
    """parsePodsPath (imkubernetes.c:411-485): the directory above the
    container dir must be exactly ``pods``; the pod dir splits on its
    FIRST two underscores into namespace / pod / uid (so only the uid
    may itself contain underscores); the filename stem
    is the restart count when it is a whole base-10 integer, else -1.
    Returns a struct (null when the path does not match)."""
    ns = F.regexp_extract(path, _PODS_RX, 2)
    pod = F.regexp_extract(path, _PODS_RX, 3)
    uid = F.regexp_extract(path, _PODS_RX, 4)
    container = F.regexp_extract(path, _PODS_RX, 5)
    fname = F.regexp_extract(path, _PODS_RX, 6)
    stem = F.regexp_replace(fname, r"\.[^.]*$", "")
    restart = F.when(
        stem.rlike(r"^-?\d+$"), stem.try_cast("long")
    ).otherwise(F.lit(-1)).cast("long")
    ok = ns != ""
    return F.when(ok, F.struct(
        ns.alias("namespace_name"),
        pod.alias("pod_name"),
        uid.alias("pod_uid"),
        container.alias("container_name"),
        F.coalesce(restart, F.lit(-1)).alias("restart_count"),
    ))


_CRI_RX = r"^(\S*) (stdout|stderr) (\S+) (.*)$"


def cri_line_parse(line: Column) -> Column:
    """parseCriLine (imkubernetes.c:1160-1190): four space-separated
    fields — RFC3339 timestamp, exactly ``stdout``/``stderr``, a
    non-empty flag field whose FIRST byte 'P' marks a partial record,
    then the message (everything after the third space, may be
    empty). The timestamp is best-effort: an unparsable one leaves
    ``ts`` null but the record valid (hasTime=0 path)."""
    stream = F.regexp_extract(line, _CRI_RX, 2)
    ok = stream != ""
    flag = F.regexp_extract(line, _CRI_RX, 3)
    ts = F.try_to_timestamp(F.regexp_extract(line, _CRI_RX, 1))
    return F.when(ok, F.struct(
        stream.alias("stream"),
        flag.startswith("P").alias("is_partial"),
        F.regexp_extract(line, _CRI_RX, 4).alias("msg"),
        ts.alias("ts"),
        F.lit("cri").alias("format_name"),
    ))


def docker_json_line_parse(line: Column) -> Column:
    """parseDockerJsonLine (imkubernetes.c:1192-1240): a JSON object
    with a string ``log`` (ONE trailing newline stripped), optional
    ``stream`` (stderr, else stdout), optional ``time``. Docker
    records are never partial."""
    log = F.get_json_object(line, "$.log")
    stream = F.get_json_object(line, "$.stream")
    ts = F.try_to_timestamp(F.get_json_object(line, "$.time"))
    return F.when(log.isNotNull(), F.struct(
        F.when(stream == "stderr", F.lit("stderr"))
         .otherwise(F.lit("stdout")).alias("stream"),
        F.lit(False).alias("is_partial"),
        F.regexp_replace(log, r"\n$", "").alias("msg"),
        ts.alias("ts"),
        F.lit("docker_json").alias("format_name"),
    ))


def k8s_records(
    df: DataFrame,
    line_col: str = "line",
    path_col: str = "path",
    idx_col: str = "idx",
    max_bytes: int = 128 * 1024,
) -> DataFrame:
    """Full imkubernetes record pipeline: per-line CRI-else-docker
    parse, pod path metadata, then CRI partial merging with the
    reference's exact state rules (emitPartialIfComplete:1104-1150):

    * a run of P records followed by an F record of the SAME stream
      merges into one message (concatenation, no separator), stamped
      with the FIRST merged record's timestamp;
    * a stream switch DISCARDS the accumulated partial (the reference
      frees the buffer and re-inits from the new record);
    * the merged size is capped at ``max_bytes`` (partialAppendBounded
      — overflow truncates but later fragments are still consumed);
    * trailing P records with no closing F emit nothing (an unfinished
      run stays in the buffer; batch semantics drop it).

    Needs ``idx_col`` = the line's order within its file (zero-based;
    from a streaming reader use the offset). The merge groups by
    (file, F-record segment): every segment is one merged output row,
    so the shuffle is file-keyed and bounded."""
    rec = F.coalesce(
        cri_line_parse(F.col(line_col)),
        docker_json_line_parse(F.col(line_col)),
    )
    base = df.select(
        F.col(path_col).alias("_path"),
        F.col(idx_col).cast("long").alias("_idx"),
        rec.alias("r"),
        pods_path_parse(F.col(path_col)).alias("k8s"),
    ).where(F.col("r").isNotNull())

    # segment = which closing-F record a row belongs to: count of
    # FINAL records strictly BEFORE the row, so an F closes the
    # segment its preceding P run opened
    w = (
        Window.partitionBy("_path").orderBy("_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    seg = F.coalesce(
        F.sum((~F.col("r.is_partial")).cast("long")).over(w), F.lit(0)
    )
    segd = base.withColumn("_seg", seg)

    items = F.array_sort(F.collect_list(F.struct(
        F.col("_idx").alias("idx"),
        F.col("r.is_partial").alias("p"),
        F.col("r.stream").alias("stream"),
        F.col("r.msg").alias("msg"),
        F.col("r.ts").alias("ts"),
        F.col("r.format_name").alias("format_name"),
    )))
    g = segd.groupBy("_path", "_seg").agg(
        items.alias("items"), F.any_value("k8s").alias("k8s")
    )
    # the segment's last row is the F record IF the segment is closed
    # (a trailing all-P segment has no F and emits nothing)
    last = F.element_at("items", -1)
    closed = ~last["p"]
    # the merged prefix: longest suffix of P rows contiguous with the
    # F record and sharing its stream (each mismatch freed the buffer)
    n = F.size("items")
    # sequence(1, 0) would run DESCENDING in Spark — guard n == 1
    keep_from = F.when(n == 1, n).otherwise(F.aggregate(
        F.sequence(F.lit(1), n - 1),
        n,  # default: only the F record itself
        lambda acc, i: F.when(
            # scan backward: position n-i must still match the stream
            (acc == n - i + 1)
            & (F.element_at("items", n - i)["stream"] == last["stream"])
            & F.element_at("items", n - i)["p"],
            n - i,
        ).otherwise(acc),
    ))
    merged = F.slice("items", keep_from, n - keep_from + 1)
    # partialAppendBounded caps BYTES, not characters — truncate on
    # the UTF-8 encoding (a multi-byte char split at the boundary
    # decodes to a replacement char, matching the reference's blunt
    # byte cut)
    joined = F.array_join(F.transform(merged, lambda e: e["msg"]), "")
    msg = F.when(
        F.octet_length(joined) <= max_bytes, joined
    ).otherwise(F.make_valid_utf8(
        # a codepoint split at the byte boundary becomes U+FFFD —
        # ANSI decode() would throw on it, make_valid_utf8 repairs
        F.substring(F.encode(joined, "UTF-8"), 1, max_bytes)
        .cast("string")
    ))
    first = F.element_at(merged, 1)
    return g.where(closed).select(
        F.col("_path").alias("path"),
        F.col("k8s"),
        last["stream"].alias("stream"),
        msg.alias("msg"),
        first["ts"].alias("ts"),
        last["format_name"].alias("format_name"),
        first["idx"].alias("first_idx"),
        last["idx"].alias("last_idx"),
        (n - keep_from + 1).cast("long").alias("n_merged"),
    )
