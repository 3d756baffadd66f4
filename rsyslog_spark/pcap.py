"""impcap: pcap file reading + packet header extraction.

The classic pcap format and the Ethernet/IPv4/UDP/TCP headers are
public specs (libpcap file format; RFCs 791/768/793). The reference
module (contrib/impcap) live-captures and promotes per-layer fields
into the message tree; here the capture file is the source (Spark is
batch-first) and the field promotion is PURE COLUMN over a binary
packet column — byte slices via substr, byte→int via hex/conv, so
the whole parse stays in whole-stage codegen with no Python on the
data path.
"""

from __future__ import annotations

import struct

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

ETH_IPV4, ETH_ARP, ETH_IPV6 = 0x0800, 0x0806, 0x86DD
PROTO_TCP, PROTO_UDP, PROTO_ICMP = 6, 17, 1


# ---------------------------------------------------------------------------
# pcap container (driver-side file reader — one capture file is a
# serial byte stream; rows then distribute)
# ---------------------------------------------------------------------------

def read_pcap(path: str) -> list[tuple[int, bytes]]:
    """Classic pcap: 24-byte global header (magic decides byte order
    and tick unit — 0xa1b2c3d4 µs, 0xa1b23c4d ns), then per-record
    [ts_sec, ts_frac, incl_len, orig_len] + data. Returns
    (ts_micros, packet_bytes) per record."""
    with open(path, "rb") as fh:
        data = fh.read()
    if len(data) < 24:
        raise ValueError("pcap: truncated global header")
    magic = data[:4]
    if magic == b"\xa1\xb2\xc3\xd4":
        endian, div = ">", 1
    elif magic == b"\xd4\xc3\xb2\xa1":
        endian, div = "<", 1
    elif magic == b"\xa1\xb2\x3c\x4d":
        endian, div = ">", 1000
    elif magic == b"\x4d\x3c\xb2\xa1":
        endian, div = "<", 1000
    else:
        raise ValueError(f"pcap: bad magic {magic.hex()}")
    out: list[tuple[int, bytes]] = []
    i = 24
    while i + 16 <= len(data):
        sec, frac, incl, _orig = struct.unpack_from(endian + "IIII", data, i)
        i += 16
        if i + incl > len(data):
            break  # truncated tail record
        out.append((sec * 1_000_000 + frac // div, data[i:i + incl]))
        i += incl
    return out


def pcap_to_df(spark: SparkSession, path: str) -> DataFrame:
    rows = read_pcap(path)
    return spark.createDataFrame(
        [(i, t, bytearray(p)) for i, (t, p) in enumerate(rows)],
        "pkt_id long, ts_usec long, packet binary",
    )


# ---------------------------------------------------------------------------
# header extraction (pure Column)
# ---------------------------------------------------------------------------

def _u8(col: Column, pos) -> Column:
    return F.conv(F.hex(F.substr(col, F.lit(pos) if isinstance(pos, int)
                                 else pos, F.lit(1))), 16, 10).cast("long")


def _u16(col: Column, pos) -> Column:
    return F.conv(F.hex(F.substr(col, F.lit(pos) if isinstance(pos, int)
                                 else pos, F.lit(2))), 16, 10).cast("long")


def _ip4(col: Column, pos: Column) -> Column:
    return F.concat_ws(
        ".",
        *[_u8(col, pos + i).cast("string") for i in range(4)],
    )


def packet_parse(df: DataFrame, pkt_col: str = "packet") -> DataFrame:
    """Ethernet → IPv4 → UDP/TCP field promotion, the impcap parser
    chain (contrib/impcap/eth_parser.c, ipv4_parser.c, udp_parser.c,
    tcp_parser.c) as byte-slice Columns:

    * ether_type (offset 12, u16be);
    * IPv4: ihl-aware variable offsets, proto, ttl, src/dst dotted
      quads;
    * UDP: ports + length + payload (decoded utf-8-lossy to string);
    * TCP: ports + flags byte.

    Non-IPv4 frames keep null network fields (the reference's parser
    chain stops at the unknown layer the same way)."""
    pkt = F.col(pkt_col)
    ether_type = _u16(pkt, 13)
    is4 = ether_type == ETH_IPV4

    iph = F.lit(15)  # 1-based offset of the IP header
    vihl = _u8(pkt, 15)
    ihl_bytes = (vihl % 16) * 4
    total_len = _u16(pkt, 17)
    ttl = _u8(pkt, 23)
    proto = _u8(pkt, 24)
    src_ip = _ip4(pkt, iph + 12)
    dst_ip = _ip4(pkt, iph + 16)

    l4 = iph + ihl_bytes  # 1-based offset of the transport header
    sport = _u16(pkt, l4)
    dport = _u16(pkt, l4 + 2)
    udp_len = _u16(pkt, l4 + 4)
    udp_payload = F.substr(pkt, l4 + 8, udp_len - 8)
    tcp_flags = _u8(pkt, l4 + 13)

    is_udp = is4 & (proto == PROTO_UDP)
    is_tcp = is4 & (proto == PROTO_TCP)
    return (
        df.withColumn("ether_type", ether_type)
        .withColumn("ip_version", F.when(is4, F.floor(vihl / 16)))
        .withColumn("ip_proto", F.when(is4, proto))
        .withColumn("ip_ttl", F.when(is4, ttl))
        .withColumn("ip_total_len", F.when(is4, total_len))
        .withColumn("src_ip", F.when(is4, src_ip))
        .withColumn("dst_ip", F.when(is4, dst_ip))
        .withColumn(
            "src_port", F.when(is_udp | is_tcp, sport)
        )
        .withColumn(
            "dst_port", F.when(is_udp | is_tcp, dport)
        )
        .withColumn(
            "payload",
            F.when(is_udp, udp_payload.cast("string")),
        )
        .withColumn("tcp_flags", F.when(is_tcp, tcp_flags))
    )


# ---------------------------------------------------------------------------
# packet synthesis (tests/oracles build packets as hex Columns)
# ---------------------------------------------------------------------------

def build_udp_packet_hex(
    src_ip_bytes: list[Column],
    dst_ip_bytes: list[Column],
    sport: Column,
    dport: Column,
    payload_str: Column,
    ttl: int = 64,
) -> Column:
    """Hex string of a full Ethernet+IPv4+UDP frame from Columns —
    F.unhex() of the result is the binary packet. Checksums are zero
    (the parser, like impcap's, does not verify them)."""
    def h8(c: Column) -> Column:
        return F.lpad(F.lower(F.hex(c.cast("long"))), 2, "0")

    def h16(c: Column) -> Column:
        return F.lpad(F.lower(F.hex(c.cast("long"))), 4, "0")

    payload_hex = F.lower(F.hex(payload_str))
    udp_len = F.length(payload_str) + 8
    ip_len = udp_len + 20
    return F.concat(
        F.lit("ffffffffffff"),          # dst mac (broadcast)
        F.lit("020000000001"),          # src mac
        F.lit("0800"),                  # ethertype IPv4
        F.lit("45"), F.lit("00"),       # ver/ihl, tos
        h16(ip_len),
        F.lit("00000000"),              # id, flags/frag
        h8(F.lit(ttl)), F.lit("11"),    # ttl, proto UDP
        F.lit("0000"),                  # checksum (unverified)
        *[h8(b) for b in src_ip_bytes],
        *[h8(b) for b in dst_ip_bytes],
        h16(sport), h16(dport), h16(udp_len), F.lit("0000"),
        payload_hex,
    )
