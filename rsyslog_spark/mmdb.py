"""MaxMind DB (.mmdb) binary format — reader and writer from the
public spec, feeding the existing CIDR longest-prefix enrichment.

The reference's contrib/mmdblookup/mmdblookup.c delegates the file
format to libmaxminddb (MMDB_open/MMDB_lookup_sockaddr) and only maps
the looked-up fields onto message properties. Here the format itself
is implemented from the public MaxMind DB File Format Specification
v2.0 (https://maxmind.github.io/MaxMind-DB/ — CC-BY-SA): a binary
search tree over IP bits (24/28/32-bit records), a typed data section
(9 basic + extended types, pointer indirection, data-cache reuse),
and a metadata map behind the ``\\xab\\xcd\\xefMaxMind.com`` marker.

Spark-first shape: the database is NOT consulted per row (no Python
in the hot path). :func:`networks` walks the search tree ONCE,
driver-side, into the disjoint leaf networks — exactly the prefix
table the ``kind='cidr'`` LookupTable compiles into a pure-Column
longest-prefix expression (config-sized GeoIP summaries) or a
broadcast range join (full GeoLite-sized tables). At 100 TB the fact
side never shuffles either way.

The writer (:func:`build_mmdb`) exists for fixtures and for
exporting lookup tables into the reference's own on-disk format; it
expands nested CIDRs into the disjoint-leaf trie the same way
MaxMind's own writer does (more-specific networks split covering
ones), so reader.networks(writer(x)) is a normal-form round trip.
"""

from __future__ import annotations

import ipaddress
import struct
from typing import Any, Iterator

_METADATA_MARKER = b"\xab\xcd\xefMaxMind.com"
_DATA_SEPARATOR = b"\x00" * 16

# type codes (spec §"Output Data Section")
_T_PTR, _T_STR, _T_DOUBLE, _T_BYTES = 1, 2, 3, 4
_T_U16, _T_U32, _T_MAP, _T_I32, _T_U64, _T_U128 = 5, 6, 7, 8, 9, 10
_T_ARRAY, _T_CACHE, _T_END, _T_BOOL, _T_FLOAT = 11, 12, 13, 14, 15


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def _read_ctrl(buf: bytes, off: int) -> tuple[int, int, int]:
    """Control byte → (type, size, next_off). Extended types add 7 to
    the following byte; sizes 29/30/31 spill into 1/2/3 more bytes."""
    b = buf[off]
    off += 1
    typ = b >> 5
    if typ == 0:
        typ = buf[off] + 7
        off += 1
    size = b & 0x1F
    if typ != _T_PTR:
        if size == 29:
            size, off = 29 + buf[off], off + 1
        elif size == 30:
            size = 285 + int.from_bytes(buf[off:off + 2], "big")
            off += 2
        elif size == 31:
            size = 65821 + int.from_bytes(buf[off:off + 3], "big")
            off += 3
    return typ, size, off


def decode(buf: bytes, off: int, data_base: int = 0) -> tuple[Any, int]:
    """Decode one value at ``off``; pointers resolve relative to
    ``data_base`` (the data section start). Returns (value, next_off)
    — for pointers, next_off is past the POINTER, not the target."""
    typ, size, off = _read_ctrl(buf, off)
    if typ == _T_PTR:
        ss = (size >> 3) & 0x3
        vv = size & 0x7
        if ss == 0:
            ptr = (vv << 8) | buf[off]
            off += 1
        elif ss == 1:
            ptr = ((vv << 16) | int.from_bytes(buf[off:off + 2], "big")) + 2048
            off += 2
        elif ss == 2:
            ptr = ((vv << 24) | int.from_bytes(buf[off:off + 3], "big")) + 526336
            off += 3
        else:
            ptr = int.from_bytes(buf[off:off + 4], "big")
            off += 4
        val, _ = decode(buf, data_base + ptr, data_base)
        return val, off
    if typ == _T_STR:
        return buf[off:off + size].decode("utf-8"), off + size
    if typ == _T_DOUBLE:
        return struct.unpack(">d", buf[off:off + 8])[0], off + 8
    if typ == _T_FLOAT:
        return struct.unpack(">f", buf[off:off + 4])[0], off + 4
    if typ == _T_BYTES:
        return buf[off:off + size], off + size
    if typ in (_T_U16, _T_U32, _T_U64, _T_U128):
        return int.from_bytes(buf[off:off + size], "big"), off + size
    if typ == _T_I32:
        raw = buf[off:off + size]
        v = int.from_bytes(raw, "big")
        if size == 4 and raw and raw[0] & 0x80:
            v -= 1 << 32
        return v, off + size
    if typ == _T_MAP:
        out = {}
        for _ in range(size):
            k, off = decode(buf, off, data_base)
            v, off = decode(buf, off, data_base)
            out[k] = v
        return out, off
    if typ == _T_ARRAY:
        items = []
        for _ in range(size):
            v, off = decode(buf, off, data_base)
            items.append(v)
        return items, off
    if typ == _T_BOOL:
        return size != 0, off  # value lives in the size bits, no payload
    raise ValueError(f"mmdb: unsupported/invalid type {typ} at {off}")


class MMDBReader:
    """Parsed .mmdb: metadata + search-tree traversal + network export.

    ``source`` is a path or raw bytes. The whole file is held in one
    bytes object — GeoLite-class databases are tens of MB, a
    driver-side dimension load, never shipped per task (only the
    derived prefix table broadcasts)."""

    def __init__(self, source: str | bytes):
        self.buf = (
            source if isinstance(source, bytes)
            else open(source, "rb").read()
        )
        idx = self.buf.rfind(_METADATA_MARKER)
        if idx < 0:
            raise ValueError("mmdb: metadata marker not found")
        self.metadata, _ = decode(self.buf, idx + len(_METADATA_MARKER))
        self.node_count = int(self.metadata["node_count"])
        self.record_size = int(self.metadata["record_size"])
        if self.record_size not in (24, 28, 32):
            raise ValueError(f"mmdb: bad record_size {self.record_size}")
        self.ip_version = int(self.metadata.get("ip_version", 6))
        self.node_bytes = self.record_size * 2 // 8
        self.tree_size = self.node_count * self.node_bytes
        self.data_base = self.tree_size + len(_DATA_SEPARATOR)

    def _record(self, node: int, side: int) -> int:
        """side 0 = left (bit 0), 1 = right (bit 1)."""
        base = node * self.node_bytes
        rs = self.record_size
        if rs == 24:
            o = base + side * 3
            return int.from_bytes(self.buf[o:o + 3], "big")
        if rs == 32:
            o = base + side * 4
            return int.from_bytes(self.buf[o:o + 4], "big")
        # 28: left = b0..b2 + high nibble of b3; right = low nibble + b4..b6
        if side == 0:
            return (
                (self.buf[base + 3] >> 4 << 24)
                | int.from_bytes(self.buf[base:base + 3], "big")
            )
        return (
            ((self.buf[base + 3] & 0x0F) << 24)
            | int.from_bytes(self.buf[base + 4:base + 7], "big")
        )

    def _data_at(self, record: int) -> Any:
        rel = record - self.node_count - 16
        if rel < 0:
            raise ValueError("mmdb: record points into the separator")
        val, _ = decode(self.buf, self.data_base + rel, self.data_base)
        return val

    def lookup(self, ip: str) -> Any | None:
        """Single-address tree walk (tests/driver-side probes; row-at-
        scale enrichment goes through :func:`mmdb_prefix_rows`)."""
        addr = ipaddress.ip_address(ip)
        if addr.version == 6 and self.ip_version == 4:
            # IPv4-mapped addresses resolve as their v4 form; anything
            # else is the libmaxminddb
            # MMDB_IPV6_LOOKUP_IN_IPV4_DATABASE_ERROR case — raise
            # rather than walk the wrong bits to a bogus record
            if addr.ipv4_mapped is not None:
                addr = addr.ipv4_mapped
            else:
                raise ValueError(
                    "mmdb: IPv6 lookup in an IPv4-only database"
                )
        bits = 32 if addr.version == 4 else 128
        val = int(addr)
        if addr.version == 4 and self.ip_version == 6:
            bits, val = 128, int(addr)  # v4 maps into ::/96
        node = 0
        for i in range(bits - 1, -1, -1):
            rec = self._record(node, (val >> i) & 1)
            if rec == self.node_count:
                return None
            if rec > self.node_count:
                return self._data_at(rec)
            node = rec
        raise ValueError("mmdb: tree deeper than address width")

    def networks(self) -> Iterator[tuple[str, Any]]:
        """Every (cidr, data) leaf — disjoint by construction of the
        expanded trie. v4-in-v6 trees yield plain v4 networks."""
        bits = 32 if self.ip_version == 4 else 128
        stack = [(0, 0, 0)]  # node, prefix, depth
        while stack:
            node, prefix, depth = stack.pop()
            for side in (1, 0):
                rec = self._record(node, side)
                p = (prefix << 1) | side
                if rec == self.node_count:
                    continue
                if rec > self.node_count:
                    plen, pfx = depth + 1, p << (bits - depth - 1)
                    if (
                        self.ip_version == 6
                        and plen >= 96
                        and (pfx >> 32) == 0
                    ):  # v4-in-v6 ::/96 → plain v4 network
                        net: ipaddress._BaseNetwork = ipaddress.IPv4Network(
                            (pfx & 0xFFFFFFFF, plen - 96)
                        )
                    elif self.ip_version == 6:
                        net = ipaddress.IPv6Network((pfx, plen))
                    else:
                        net = ipaddress.IPv4Network((pfx, plen))
                    yield str(net), self._data_at(rec)
                else:
                    if depth + 1 > bits:
                        raise ValueError("mmdb: tree deeper than width")
                    stack.append((rec, p, depth + 1))


def flatten_fields(data: Any, prefix: str = "") -> dict[str, Any]:
    """GeoIP maps nest (country.iso_code, location.latitude, …) — the
    reference's mmdblookup addresses them with libmaxminddb dotted
    paths. Flatten to dotted keys for column projection."""
    out: dict[str, Any] = {}
    if isinstance(data, dict):
        for k, v in data.items():
            out.update(flatten_fields(v, f"{prefix}{k}."))
    elif isinstance(data, list):
        for i, v in enumerate(data):
            out.update(flatten_fields(v, f"{prefix}{i}."))
    else:
        out[prefix[:-1]] = data
    return out


def mmdb_prefix_rows(
    source: str | bytes, field: str
) -> list[tuple[str, str]]:
    """(cidr, value) rows for one dotted field — the LookupTable
    kind='cidr' feed. Values are rendered var2String-style (the
    reference promotes looked-up JSON leaves onto string properties)."""
    rows = []
    for cidr, data in MMDBReader(source).networks():
        flat = flatten_fields(data)
        if field in flat and flat[field] is not None:
            v = flat[field]
            if isinstance(v, bool):
                v = "1" if v else "0"
            rows.append((cidr, str(v)))
    return rows


def mmdblookup_file(df, source: str | bytes, ip_col, field: str,
                    out_col: str = "geo", nomatch: str = ""):
    """contrib/mmdblookup end-to-end: .mmdb file → prefix table →
    the existing pure-Column longest-prefix CIDR enrichment."""
    from rsyslog_spark.lookup import LookupTable, mmdblookup

    table = LookupTable(
        "mmdb", "cidr", mmdb_prefix_rows(source, field), nomatch=nomatch
    )
    return mmdblookup(df, table, ip_col, out_col)


# ---------------------------------------------------------------------------
# encoder / writer
# ---------------------------------------------------------------------------


def _enc_ctrl(typ: int, size: int) -> bytes:
    ext = b""
    if typ > 7:
        ext, typ = bytes([typ - 7]), 0
    if size < 29:
        return bytes([(typ << 5) | size]) + ext
    if size < 285:  # 29 + one byte (max 255)
        return bytes([(typ << 5) | 29]) + ext + bytes([size - 29])
    if size < 65821:  # 285 + two bytes (max 65535)
        return (
            bytes([(typ << 5) | 30]) + ext
            + (size - 285).to_bytes(2, "big")
        )
    return bytes([(typ << 5) | 31]) + ext + (size - 65821).to_bytes(3, "big")


def encode_value(v: Any) -> bytes:
    """Deterministic spec encoding (maps keep insertion order; the
    writer never emits pointers — fixtures stay byte-stable)."""
    if isinstance(v, bool):
        return _enc_ctrl(_T_BOOL, 1 if v else 0)
    if isinstance(v, str):
        b = v.encode("utf-8")
        return _enc_ctrl(_T_STR, len(b)) + b
    if isinstance(v, bytes):
        return _enc_ctrl(_T_BYTES, len(v)) + v
    if isinstance(v, float):
        return _enc_ctrl(_T_DOUBLE, 8) + struct.pack(">d", v)
    if isinstance(v, int):
        if v < 0:
            if v < -(1 << 31):
                raise ValueError(f"mmdb encode: int32 underflow {v}")
            return _enc_ctrl(_T_I32, 4) + (v & 0xFFFFFFFF).to_bytes(4, "big")
        if v >= 1 << 64:
            raise ValueError(f"mmdb encode: uint64 overflow {v}")
        if v < 1 << 16:
            b = v.to_bytes((v.bit_length() + 7) // 8, "big")
            return _enc_ctrl(_T_U16, len(b)) + b
        if v < 1 << 32:
            b = v.to_bytes((v.bit_length() + 7) // 8, "big")
            return _enc_ctrl(_T_U32, len(b)) + b
        b = v.to_bytes((v.bit_length() + 7) // 8, "big")
        return _enc_ctrl(_T_U64, len(b)) + b
    if isinstance(v, dict):
        out = _enc_ctrl(_T_MAP, len(v))
        for k, vv in v.items():
            out += encode_value(str(k)) + encode_value(vv)
        return out
    if isinstance(v, (list, tuple)):
        out = _enc_ctrl(_T_ARRAY, len(v))
        for vv in v:
            out += encode_value(vv)
        return out
    raise TypeError(f"mmdb encode: unsupported {type(v).__name__}")


class _Node:
    __slots__ = ("kids", "data")

    def __init__(self):
        self.kids: list[_Node | None] = [None, None]
        self.data: Any = None


def build_mmdb(
    entries: list[tuple[str, Any]],
    database_type: str = "rsyslog-spark-Test",
    ip_version: int = 4,
) -> bytes:
    """Serialize (cidr, data) entries into a spec-conformant .mmdb
    (record_size 24). Insertion is plen-ascending with leaf push-down,
    so nested CIDRs split their covering network into disjoint leaves
    — longest prefix wins, as in MaxMind's own writer."""
    bits = 32 if ip_version == 4 else 128
    root = _Node()
    parsed = []
    for cidr, data in entries:
        net = ipaddress.ip_network(cidr)
        if (net.version == 4) != (ip_version == 4):
            raise ValueError(f"mmdb build: {cidr} vs ip_version {ip_version}")
        parsed.append((net.prefixlen, int(net.network_address), data))
    for plen, pfx, data in sorted(parsed, key=lambda t: t[0]):
        if plen == 0:
            raise ValueError(
                "mmdb build: a /0 default leaf leaves no internal "
                "node — encode the default as the lookup's nomatch"
            )
        node = root
        for i in range(plen):
            bit = (pfx >> (bits - 1 - i)) & 1
            if node.data is not None:  # covering leaf: push down
                for s in (0, 1):
                    node.kids[s] = _Node()
                    node.kids[s].data = node.data
                node.data = None
            if node.kids[bit] is None:
                node.kids[bit] = _Node()
            node = node.kids[bit]
        node.data, node.kids = data, [None, None]

    # breadth-first numbering of internal nodes
    order: list[_Node] = []
    queue = [root]
    while queue:
        n = queue.pop(0)
        if n.data is not None:
            continue
        order.append(n)
        for k in n.kids:
            if k is not None and k.data is None:
                queue.append(k)
    node_ids = {id(n): i for i, n in enumerate(order)}
    node_count = len(order)

    data_sec = bytearray()
    data_off: dict[bytes, int] = {}  # payload dedup (spec data reuse)

    def leaf_record(n: _Node) -> int:
        payload = encode_value(n.data)
        if payload not in data_off:
            data_off[payload] = len(data_sec)
            data_sec.extend(payload)
        return node_count + 16 + data_off[payload]

    tree = bytearray()
    for n in order:
        for side in (0, 1):
            k = n.kids[side]
            if k is None:
                rec = node_count
            elif k.data is not None:
                rec = leaf_record(k)
            else:
                rec = node_ids[id(k)]
            if rec >= 1 << 24:
                raise ValueError("mmdb build: record_size 24 overflow")
            tree += rec.to_bytes(3, "big")

    meta = {
        "binary_format_major_version": 2,
        "binary_format_minor_version": 0,
        "build_epoch": 0,  # deterministic fixtures
        "database_type": database_type,
        "description": {"en": "generated by rsyslog_spark.mmdb"},
        "ip_version": ip_version,
        "languages": ["en"],
        "node_count": node_count,
        "record_size": 24,
    }
    return (
        bytes(tree) + _DATA_SEPARATOR + bytes(data_sec)
        + _METADATA_MARKER + encode_value(meta)
    )
