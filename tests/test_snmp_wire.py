"""omsnmp trap BER encoding — known-answer vectors + UDP round-trip."""

from __future__ import annotations

import socket
import threading

import pytest

from rsyslog_spark import snmp_wire as sw


# ---------------------------------------------------------------------------
# BER primitives (X.690 known answers)
# ---------------------------------------------------------------------------

def test_ber_known_answers():
    assert sw.ber_int(0) == b"\x02\x01\x00"
    assert sw.ber_int(127) == b"\x02\x01\x7f"
    assert sw.ber_int(128) == b"\x02\x02\x00\x80"  # sign-padded width
    assert sw.ber_int(-1) == b"\x02\x01\xff"
    assert sw.ber_octets("ab") == b"\x04\x02ab"
    # 1.3.6.1.2.1 → 0x2b 06 01 02 01 (classic SNMP example)
    assert sw.ber_oid("1.3.6.1.2.1") == b"\x06\x05\x2b\x06\x01\x02\x01"
    # multi-byte arc: 19406 = 0x97 0x4e in base-128
    assert sw.ber_oid("1.3.19406").endswith(b"\x97\x4e")
    # long-form length
    long = sw.ber_octets(b"x" * 200)
    assert long[:3] == b"\x04\x81\xc8"
    # unsigned high-bit pad for TimeTicks
    assert sw.ber_uint(0x80, 0x43) == b"\x43\x02\x00\x80"


def test_ber_roundtrip_values():
    for v in (0, 1, 127, 128, -128, 1 << 40, -(1 << 40)):
        tag, got, _ = sw.ber_decode(sw.ber_int(v))
        assert got == v, v
    for oid in ("1.3.6.1.4.1.19406.1.1.2.1", "2.25.1", "0.0"):
        tag, got, _ = sw.ber_decode(sw.ber_oid(oid))
        assert got == oid


# ---------------------------------------------------------------------------
# trap structure
# ---------------------------------------------------------------------------

def test_v1_trap_fields():
    b = sw.snmpv1_trap(
        "disk failed", source="10.1.2.3", community="ops",
        specific_trap=7, timeticks=4242,
    )
    t = sw.parse_trap(b)
    assert t["version"] == 1 and t["community"] == "ops"
    assert t["enterprise"] == sw.DFLT_ENTERPRISE
    assert t["agent_addr"] == "10.1.2.3"
    assert t["generic_trap"] == sw.TRAP_ENTERPRISESPECIFIC
    assert t["specific_trap"] == 7 and t["timeticks"] == 4242
    assert t["varbinds"] == [(sw.DFLT_MSG_OID, b"disk failed")]

    # unparsable source → 0.0.0.0 (omsnmp.c:317-327 logs and leaves it)
    t2 = sw.parse_trap(sw.snmpv1_trap("m", source="not-an-ip"))
    assert t2["agent_addr"] == "0.0.0.0"


def test_v2c_trap_fields():
    b = sw.snmpv2c_trap("hello <msg>", timeticks=99, request_id=5)
    t = sw.parse_trap(b)
    assert t["version"] == 2 and t["community"] == "public"
    assert t["request_id"] == 5
    vbs = t["varbinds"]
    assert vbs[0] == (sw.OID_SYSUPTIME, 99)
    assert vbs[1] == (sw.OID_SNMPTRAP, sw.DFLT_TRAP_OID)
    assert vbs[2] == (sw.DFLT_MSG_OID, b"hello <msg>")


def test_omsnmp_send_udp_roundtrip(spark):
    rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rx.bind(("127.0.0.1", 0))
    rx.settimeout(10.0)
    port = rx.getsockname()[1]
    got: list[bytes] = []

    def recv():
        for _ in range(4):
            data, _ = rx.recvfrom(65535)
            got.append(data)

    t = threading.Thread(target=recv, daemon=True)
    t.start()
    df = spark.createDataFrame(
        [(f"trap-{i}", f"10.0.0.{i}") for i in range(4)],
        "value string, src string",
    )
    n = sw.omsnmp_send(
        df.coalesce(1), "127.0.0.1", port,
        source_col="src", version=1, community="c1",
    )
    t.join(timeout=10)
    rx.close()
    assert n == 4 and len(got) == 4
    traps = sorted(
        (sw.parse_trap(b) for b in got),
        key=lambda d: d["varbinds"][0][1],
    )
    assert [t["varbinds"][0][1] for t in traps] == [
        b"trap-0", b"trap-1", b"trap-2", b"trap-3"
    ]
    assert traps[2]["agent_addr"] == "10.0.0.2"
    assert all(t["community"] == "c1" for t in traps)


def test_omsnmp_version_guard(spark):
    df = spark.createDataFrame([("x",)], "value string")
    with pytest.raises(ValueError):
        sw.omsnmp_send(df, "127.0.0.1", 1, version=3)
