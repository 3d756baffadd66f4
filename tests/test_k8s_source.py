"""imkubernetes: pods-path metadata, CRI / docker json-file record
parsing, and the partial-merge state rules."""

from pyspark.sql import functions as F

from rsyslog_spark.k8s_source import (
    cri_line_parse,
    docker_json_line_parse,
    k8s_records,
    pods_path_parse,
)


def _one(spark, col, value):
    df = spark.createDataFrame([(value,)], "v string")
    return df.select(col.alias("r")).collect()[0].r


def test_pods_path_parse(spark):
    c = pods_path_parse(F.col("v"))
    r = _one(spark, c,
             "/var/log/pods/kube-system_coredns-abc_uid-1_2/coredns/3.log")
    assert r.namespace_name == "kube-system"
    assert r.pod_name == "coredns-abc"
    assert r.pod_uid == "uid-1_2"          # uid keeps later underscores
    assert r.container_name == "coredns"
    assert r.restart_count == 3
    # non-numeric restart stem -> -1 (strtol failure path)
    r = _one(spark, c, "/var/log/pods/ns_pod_uid/c/current.log")
    assert r.restart_count == -1
    # dir above container must be exactly 'pods'
    assert _one(spark, c, "/var/log/containers/ns_pod_uid/c/0.log") is None
    # pod dir needs two underscores
    assert _one(spark, c, "/var/log/pods/nopod/c/0.log") is None


def test_cri_line_parse(spark):
    c = cri_line_parse(F.col("v"))
    r = _one(spark, c,
             "2024-01-01T00:00:05.123456789Z stdout F hello world")
    assert (r.stream, r.is_partial, r.msg) == ("stdout", False,
                                               "hello world")
    assert r.ts is not None and r.format_name == "cri"
    r = _one(spark, c, "bogus-ts stderr P chunk")
    assert (r.stream, r.is_partial, r.ts) == ("stderr", True, None)
    # stream field must be exactly stdout/stderr; 3 spaces required
    assert _one(spark, c, "ts stdouts F x") is None
    assert _one(spark, c, "ts stdout F") is None
    # empty message after the third space is valid
    r = _one(spark, c, "ts stdout F ")
    assert r.msg == ""


def test_docker_json_line_parse(spark):
    c = docker_json_line_parse(F.col("v"))
    r = _one(spark, c,
             '{"log":"boot ok\\n","stream":"stderr",'
             '"time":"2024-01-01T00:00:01Z"}')
    assert (r.stream, r.msg, r.is_partial) == ("stderr", "boot ok", False)
    assert r.ts is not None and r.format_name == "docker_json"
    r = _one(spark, c, '{"log":"no stream"}')
    assert r.stream == "stdout" and r.msg == "no stream"
    assert _one(spark, c, '{"stream":"stdout"}') is None  # log required
    assert _one(spark, c, "not json") is None


def _records(spark, lines, **kw):
    df = spark.createDataFrame(
        [("/var/log/pods/ns_pod_uid/app/0.log", i, ln)
         for i, ln in enumerate(lines)],
        "path string, idx long, line string",
    )
    return k8s_records(df, **kw).orderBy("first_idx").collect()


def test_partial_merge_same_stream(spark):
    out = _records(spark, [
        "2024-01-01T00:00:01Z stdout P part-a-",
        "ts stdout P part-b-",
        "ts stdout F final",
        "ts stdout F standalone",
    ])
    assert [r.msg for r in out] == ["part-a-part-b-final", "standalone"]
    assert out[0].n_merged == 3 and out[1].n_merged == 1
    # merged record keeps the FIRST fragment's timestamp
    assert out[0].ts is not None and out[1].ts is None
    assert out[0].k8s.pod_name == "pod"


def test_partial_merge_stream_switch_discards(spark):
    # P(stdout) P(stderr) F(stderr): the stdout fragment was freed
    out = _records(spark, [
        "ts stdout P lost-",
        "ts stderr P kept-",
        "ts stderr F final",
    ])
    assert [r.msg for r in out] == ["kept-final"]
    assert out[0].stream == "stderr" and out[0].n_merged == 2
    # P(a) P(a) P(b) F(a): partial freed twice; F emits alone
    out = _records(spark, [
        "ts stdout P one-",
        "ts stdout P two-",
        "ts stderr P other-",
        "ts stdout F alone",
    ])
    assert [r.msg for r in out] == ["alone"]
    assert out[0].n_merged == 1


def test_partial_merge_tail_and_cap_and_docker_mix(spark):
    # trailing P run with no F emits nothing
    out = _records(spark, [
        "ts stdout F done",
        "ts stdout P never-",
        "ts stdout P finished-",
    ])
    assert [r.msg for r in out] == ["done"]
    # max_bytes caps the merged message
    out = _records(spark, [
        "ts stdout P " + "x" * 40,
        "ts stdout F " + "y" * 40,
    ], max_bytes=50)
    assert len(out[0].msg) == 50
    # docker lines interleave as complete records
    out = _records(spark, [
        '{"log":"docker line\\n"}',
        "ts stdout P a-",
        "ts stdout F b",
    ])
    assert [r.msg for r in out] == ["docker line", "a-b"]
    assert out[0].format_name == "docker_json"
    assert out[1].format_name == "cri"


def test_partial_merge_cap_counts_bytes_not_chars(spark):
    """code-review r5: partialAppendBounded caps BYTES; 3-byte CJK
    chars must not inflate the cap 3x."""
    out = _records(spark, [
        "ts stdout P " + "日" * 30,   # 90 UTF-8 bytes
        "ts stdout F " + "日" * 30,
    ], max_bytes=100)
    merged = out[0].msg
    assert len(merged.encode("utf-8", "replace")) <= 102  # cap + repl
    assert len(merged) < 60  # NOT 60 chars = 180 bytes
