"""MaxMind DB format: encoder/decoder known answers, writer→reader
round trips (nested-CIDR trie splitting), and the Spark enrichment."""

import ipaddress

import pytest

from rsyslog_spark.mmdb import (
    MMDBReader,
    build_mmdb,
    decode,
    encode_value,
    flatten_fields,
    mmdb_prefix_rows,
    mmdblookup_file,
)


def test_encode_known_answers():
    # spec examples: type in top 3 bits, size in low 5
    assert encode_value("abc") == b"\x43abc"
    assert encode_value(b"\x01\x02") == b"\x82\x01\x02"
    assert encode_value(True) == b"\x01\x07"    # extended type 14, size 1
    assert encode_value(False) == b"\x00\x07"
    assert encode_value(500) == b"\xa2\x01\xf4"  # uint16, 2 bytes
    assert encode_value(70000) == b"\xc3\x01\x11\x70"  # uint32, 3 bytes
    assert encode_value(1.5) == b"\x68\x3f\xf8\x00\x00\x00\x00\x00\x00"
    assert encode_value(-2) == b"\x04\x01\xff\xff\xff\xfe"  # int32: ext 8-7
    # 29+ sizes spill into extra bytes
    s = "x" * 30
    assert encode_value(s) == b"\x5d\x01" + s.encode()


def test_decode_round_trip_and_pointer():
    vals = [
        "héllo", 12, 70000, 1 << 40, -5, 2.25, True, False,
        [1, "a", [2.5]], {"k": {"n": 7}, "arr": ["x", "y"]}, b"\x00\xff",
    ]
    for v in vals:
        got, off = decode(encode_value(v), 0)
        assert got == v and off == len(encode_value(v))
    # pointer (ss=0, value 0) resolves against data_base
    buf = b"\x42hi" + b"\xe1" + b"\x41k" + b"\x20\x00"
    got, _ = decode(buf, 3, data_base=0)
    assert got == {"k": "hi"}


def test_build_and_read_nested_cidrs():
    entries = [
        ("10.0.0.0/8", {"country": {"iso_code": "AA"}}),
        ("10.1.0.0/16", {"country": {"iso_code": "BB"}}),
        ("192.168.5.0/24", {"country": {"iso_code": "CC"}}),
    ]
    db = build_mmdb(entries)
    r = MMDBReader(db)
    assert r.metadata["binary_format_major_version"] == 2
    assert r.record_size == 24 and r.ip_version == 4

    # longest prefix wins; covering network split into disjoint leaves
    assert r.lookup("10.1.2.3") == {"country": {"iso_code": "BB"}}
    assert r.lookup("10.2.2.3") == {"country": {"iso_code": "AA"}}
    assert r.lookup("192.168.5.9") == {"country": {"iso_code": "CC"}}
    assert r.lookup("192.168.6.9") is None
    assert r.lookup("8.8.8.8") is None

    nets = dict(r.networks())
    # every exported leaf is disjoint and the union reproduces the input
    parsed = [ipaddress.ip_network(c) for c in nets]
    for i, a in enumerate(parsed):
        for b in parsed[i + 1:]:
            assert not a.overlaps(b)
    def covered(ip):
        hits = [c for c in nets if ipaddress.ip_address(ip)
                in ipaddress.ip_network(c)]
        assert len(hits) == 1
        return nets[hits[0]]["country"]["iso_code"]
    assert covered("10.1.255.255") == "BB"
    assert covered("10.0.0.1") == "AA"
    assert covered("10.255.0.1") == "AA"
    assert covered("192.168.5.255") == "CC"

    # identical data payloads are deduplicated in the data section
    many = build_mmdb([(f"10.{i}.0.0/16", {"x": "same"}) for i in range(8)])
    r2 = MMDBReader(many)
    assert len({id(v) for _, v in r2.networks()}) >= 1
    sep = many.find(b"\x00" * 16, 0)
    marker = many.rfind(b"\xab\xcd\xefMaxMind.com")
    data_len = marker - (r2.tree_size + 16)
    assert data_len == len(encode_value({"x": "same"}))


def test_build_rejects_default_route_and_mixed_version():
    with pytest.raises(ValueError):
        build_mmdb([("0.0.0.0/0", {"x": 1})])
    with pytest.raises(ValueError):
        build_mmdb([("::1/128", {"x": 1})], ip_version=4)


def test_record_size_28_layout():
    """Hand-built single-node 28-bit tree: left empty, right → data."""
    node = bytes([0, 0, 1, 0, 0, 0, 17])
    data = encode_value("X")
    meta = encode_value({
        "binary_format_major_version": 2, "node_count": 1,
        "record_size": 28, "ip_version": 4,
    })
    db = node + b"\x00" * 16 + data + b"\xab\xcd\xefMaxMind.com" + meta
    r = MMDBReader(db)
    assert r.lookup("128.0.0.1") == "X"
    assert r.lookup("1.2.3.4") is None
    assert dict(r.networks()) == {"128.0.0.0/1": "X"}


def test_v4_in_v6_tree_lookup_and_export():
    entries = [("::ffff:0:0/96", None)]  # placeholder; build real below
    db = build_mmdb(
        [("2001:db8::/32", {"c": "V6"}),
         ("::0a00:0000/104", {"c": "V4A"})],  # 10.0.0.0/8 inside ::/96
        ip_version=6,
    )
    r = MMDBReader(db)
    assert r.lookup("2001:db8::1") == {"c": "V6"}
    assert r.lookup("10.4.5.6") == {"c": "V4A"}  # v4 maps into ::/96
    nets = dict(r.networks())
    assert nets["10.0.0.0/8"] == {"c": "V4A"}
    assert nets["2001:db8::/32"] == {"c": "V6"}


def test_flatten_fields():
    assert flatten_fields(
        {"country": {"iso_code": "DE", "eu": True},
         "subdivisions": [{"iso_code": "BE"}]}
    ) == {
        "country.iso_code": "DE", "country.eu": True,
        "subdivisions.0.iso_code": "BE",
    }


def test_prefix_rows_and_spark_enrichment(spark):
    db = build_mmdb([
        ("10.0.0.0/8", {"country": {"iso_code": "AA"}}),
        ("10.1.0.0/16", {"country": {"iso_code": "BB"}}),
        ("172.16.0.0/12", {"country": {"iso_code": "CC"}}),
    ])
    rows = dict(mmdb_prefix_rows(db, "country.iso_code"))
    assert rows["172.16.0.0/12"] == "CC"
    df = spark.createDataFrame(
        [(1, "10.1.9.9"), (2, "10.9.9.9"), (3, "172.20.0.1"),
         (4, "8.8.8.8")],
        "id long, ip string",
    )
    out = {
        r.id: r.geo
        for r in mmdblookup_file(
            df, db, "ip", "country.iso_code", nomatch="??"
        ).collect()
    }
    assert out == {1: "BB", 2: "AA", 3: "CC", 4: "??"}


def test_ctrl_byte_size_windows():
    """code-review r5: sizes 285-313 and 65821-66105 used control
    forms past their capacity and crashed the encoder."""
    from rsyslog_spark.mmdb import decode
    for n in (28, 29, 284, 285, 313, 314, 65820, 65821, 66105, 70000):
        s = "x" * n
        got, off = decode(encode_value(s), 0)
        assert got == s and off == len(encode_value(s))


def test_encode_int_bounds():
    import pytest as _pt
    from rsyslog_spark.mmdb import decode
    v, _ = decode(encode_value(-(1 << 31)), 0)
    assert v == -(1 << 31)
    with _pt.raises(ValueError, match="underflow"):
        encode_value(-(1 << 31) - 1)
    with _pt.raises(ValueError, match="overflow"):
        encode_value(1 << 64)


def test_v6_lookup_in_v4_database():
    import pytest as _pt
    db = build_mmdb([("10.0.0.0/8", {"c": "A"})])
    r = MMDBReader(db)
    # IPv4-mapped form resolves as its v4 address
    assert r.lookup("::ffff:10.1.2.3") == {"c": "A"}
    # any other v6 address is the libmaxminddb error case
    with _pt.raises(ValueError, match="IPv6 lookup"):
        r.lookup("2001:db8::1")
