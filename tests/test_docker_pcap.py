"""imdocker stream demux + impcap packet parsing."""

from __future__ import annotations

import struct

from pyspark.sql import functions as F

from rsyslog_spark import docker_source as ds
from rsyslog_spark import pcap


# ---------------------------------------------------------------------------
# imdocker
# ---------------------------------------------------------------------------

def test_docker_demux_and_messages():
    blob = ds.mux_frames([
        (1, b"out line 1\npartial"),
        (2, b"err line\n"),
        (1, b" done\n"),
    ])
    frames = ds.docker_stream_demux(blob)
    assert [st for st, _ in frames] == [1, 2, 1]
    msgs = ds.frames_to_messages(frames)
    assert msgs == [
        (1, "out line 1"),
        (2, "err line"),
        (1, "partial done"),
    ]

    # truncated trailing frame dropped; bad stream type stops parse
    assert ds.docker_stream_demux(blob + b"\x01\x00\x00\x00\x00\x00\x00\x09ab") \
        == frames
    assert ds.docker_stream_demux(b"\x07\x00\x00\x00\x00\x00\x00\x01x") == []


def test_docker_container_logs(spark):
    b1 = ds.mux_frames([(1, b"hello\nworld\n"), (2, b"oops\n")])
    b2 = ds.mux_frames([(1, b"solo\n")])
    df = spark.createDataFrame(
        [("c1", bytearray(b1)), ("c2", bytearray(b2))],
        "container_id string, chunk binary",
    )
    out = ds.docker_container_logs(df, dflt_severity=6).collect()
    rows = {(r.container_id, r.msg): r for r in out}
    assert len(rows) == 4
    assert rows[("c1", "oops")].severity == 3       # stderr → LOG_ERR
    assert rows[("c1", "hello")].severity == 6      # default
    assert all(r.syslogtag == "docker:" for r in out)


# ---------------------------------------------------------------------------
# impcap
# ---------------------------------------------------------------------------

def _udp_packet(src, dst, sport, dport, payload: bytes) -> bytes:
    eth = b"\xff" * 6 + b"\x02\x00\x00\x00\x00\x01" + b"\x08\x00"
    udp_len = 8 + len(payload)
    ip = struct.pack(
        ">BBHHHBBH4s4s", 0x45, 0, 20 + udp_len, 0, 0, 64, 17, 0,
        bytes(src), bytes(dst),
    )
    udp = struct.pack(">HHHH", sport, dport, udp_len, 0) + payload
    return eth + ip + udp


def _write_pcap(path, packets, magic=b"\xa1\xb2\xc3\xd4", swap=False):
    endian = "<" if swap else ">"
    hdr = magic + struct.pack(endian + "HHiIII", 2, 4, 0, 0, 65535, 1)
    body = b""
    for i, p in enumerate(packets):
        body += struct.pack(endian + "IIII", 1000 + i, 42, len(p), len(p))
        body += p
    path.write_bytes(hdr + body)


def test_read_pcap_endianness(tmp_path):
    pkts = [b"abc", b"defgh"]
    big, little = tmp_path / "b.pcap", tmp_path / "l.pcap"
    _write_pcap(big, pkts)
    _write_pcap(little, pkts, magic=b"\xd4\xc3\xb2\xa1", swap=True)
    for p in (big, little):
        recs = pcap.read_pcap(str(p))
        assert [d for _, d in recs] == pkts
        assert recs[0][0] == 1000 * 1_000_000 + 42
    # nanosecond magic divides the fraction
    nano = tmp_path / "n.pcap"
    _write_pcap(nano, pkts, magic=b"\xa1\xb2\x3c\x4d")
    assert pcap.read_pcap(str(nano))[0][0] == 1000 * 1_000_000


def test_packet_parse_udp_tcp(spark, tmp_path):
    udp = _udp_packet(
        b"\x0a\x00\x00\x01", b"\x0a\x00\x00\x02", 5514, 514,
        b"<13>hello pcap",
    )
    # minimal TCP packet: same IP shell, proto 6, 20-byte TCP header
    tcp_hdr = struct.pack(
        ">HHIIBBHHH", 2222, 80, 1, 0, 0x50, 0x18, 512, 0, 0
    )
    tcp = (
        b"\xff" * 6 + b"\x02\x00\x00\x00\x00\x01" + b"\x08\x00"
        + struct.pack(
            ">BBHHHBBH4s4s", 0x45, 0, 20 + len(tcp_hdr), 0, 0, 63, 6,
            0, b"\xc0\xa8\x01\x01", b"\xc0\xa8\x01\x02",
        )
        + tcp_hdr
    )
    arp = b"\xff" * 6 + b"\x02\x00\x00\x00\x00\x01" + b"\x08\x06" + b"\x00" * 28
    f = tmp_path / "mix.pcap"
    _write_pcap(f, [udp, tcp, arp])

    out = pcap.packet_parse(
        pcap.pcap_to_df(spark, str(f))
    ).orderBy("pkt_id").collect()
    u, t, a = out

    assert u.ether_type == 0x0800 and u.ip_version == 4
    assert u.ip_proto == 17 and u.ip_ttl == 64
    assert u.src_ip == "10.0.0.1" and u.dst_ip == "10.0.0.2"
    assert (u.src_port, u.dst_port) == (5514, 514)
    assert u.payload == "<13>hello pcap"
    assert u.tcp_flags is None

    assert t.ip_proto == 6
    assert t.src_ip == "192.168.1.1" and t.dst_ip == "192.168.1.2"
    assert (t.src_port, t.dst_port) == (2222, 80)
    assert t.tcp_flags == 0x18  # PSH|ACK
    assert t.payload is None

    assert a.ether_type == 0x0806
    assert a.src_ip is None and a.src_port is None


def test_build_udp_packet_hex_roundtrip(spark):
    df = spark.range(3).select(
        F.col("id").cast("long").alias("id"),
        F.unhex(
            pcap.build_udp_packet_hex(
                [F.lit(10), F.lit(0), F.lit(0), F.col("id") + 1],
                [F.lit(172), F.lit(16), F.lit(0), F.lit(9)],
                F.lit(1024) + F.col("id"),
                F.lit(514),
                F.concat(F.lit("pkt-"), F.col("id").cast("string")),
            )
        ).alias("packet"),
    )
    out = pcap.packet_parse(df).orderBy("id").collect()
    for i, r in enumerate(out):
        assert r.src_ip == f"10.0.0.{i + 1}"
        assert r.dst_ip == "172.16.0.9"
        assert r.src_port == 1024 + i and r.dst_port == 514
        assert r.payload == f"pkt-{i}"
        assert r.ip_proto == 17 and r.ip_version == 4
