"""Raw-file source (imfile analog) + batch incremental checkpointing."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from rsyslog_spark.parsing import parse
from rsyslog_spark.sources import incremental_batches, read_raw_lines


def test_read_raw_lines(spark, tmp_path):
    p = tmp_path / "app.log"
    p.write_text(
        "<13>Oct 11 22:14:15 h1 app[1]: first\n"
        "<14>Oct 11 22:14:16 h2 app[2]: second\n"
    )
    lt = read_raw_lines(spark, str(tmp_path), source="applog")
    assert lt.columns == ["doc_id", "tokens", "n_tok", "source"]
    parsed = parse(lt).orderBy("doc_id").collect()
    assert [r.hostname for r in parsed] == ["h1", "h2"]
    assert parsed[0].msg == " first"
    assert parsed[0].source == "applog"


def test_read_raw_lines_multiline(spark, tmp_path):
    p = tmp_path / "trace.log"
    p.write_text(
        "<11>Oct 11 22:14:15 h1 app: error happened\n"
        "  at frame one\n"
        "  at frame two\n"
        "<11>Oct 11 22:14:16 h1 app: next message\n"
    )
    lt = read_raw_lines(
        spark, str(tmp_path), startmsg_regex=r"^<\d+>"
    )
    rows = parse(lt).orderBy("doc_id").collect()
    assert len(rows) == 2
    assert rows[0].msg == " error happened\n  at frame one\n  at frame two"
    assert rows[1].msg == " next message"


def test_incremental_batches(spark, tmp_path):
    data = tmp_path / "in"
    data.mkdir()
    spark.range(5).toPandas().to_parquet(data / "a.parquet")
    inc = incremental_batches(spark, str(data), str(tmp_path / "state.log"))
    df, files = inc.read_pending()
    assert df.count() == 5 and len(files) == 1
    inc.commit(files)
    # nothing new → no work
    df2, files2 = inc.read_pending()
    assert df2 is None and files2 == []
    # new file arrives → only it is processed
    spark.range(3).toPandas().to_parquet(data / "b.parquet")
    df3, files3 = inc.read_pending()
    assert df3.count() == 3 and os.path.basename(files3[0]) == "b.parquet"
    inc.commit(files3)
    assert inc.pending() == []


def test_imrelp_listener_spool_to_stream(spark, tmp_path):
    """imrelp: a real RELP listener spools messages (ack strictly
    AFTER the durable write — RELP's lossless guarantee), and the
    spool directory feeds the standard streaming read."""
    from rsyslog_spark.relp import RelpClient, RelpListener

    spool = str(tmp_path / "spool")
    lst = RelpListener(spool, rotate_every=20)
    try:
        cl = RelpClient("127.0.0.1", lst.port, window=8)
        results: dict = {}
        cl.results = results
        msgs = [f"<13>Jan  1 00:00:00 h tag: ev {i}" for i in range(50)]
        for i, m in enumerate(msgs):
            cl.send_syslog(m.encode(), i)
        cl.drain()
        cl.close()
        assert all(results[i] == 200 for i in range(50))
        assert lst.n_received == 50
        # spool rotated and is batch/stream-readable
        got = sorted(
            r.value for r in spark.read.text(spool + "/*.log").collect()
        )
        assert got == sorted(msgs)
        import glob

        assert len(glob.glob(spool + "/*.log")) >= 3  # rotate_every=20
    finally:
        lst.close()
