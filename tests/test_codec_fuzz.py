"""Property-based round-trip fuzzing for the wire codecs implemented
from public specs: decode(encode(x)) == x over generated values.
Catches size-window and sign/width edge cases the golden vectors
miss (the mmdb control-byte bug class)."""

import json as jsonlib

from hypothesis import given, settings, strategies as st

# ---------------------------------------------------------------------------
# mmdb typed data section
# ---------------------------------------------------------------------------

# the MMDB data section has NO null type — None is a valid reject
mmdb_scalars = st.one_of(
    st.booleans(),
    st.integers(min_value=-(1 << 31), max_value=(1 << 64) - 1),
    st.floats(allow_nan=False, allow_infinity=False),
    st.text(max_size=400),
    st.binary(max_size=400),
)
mmdb_values = st.recursive(
    mmdb_scalars,
    lambda children: st.one_of(
        st.lists(children, max_size=6),
        st.dictionaries(st.text(max_size=20), children, max_size=6),
    ),
    max_leaves=20,
)


def _tuplify(v):
    if isinstance(v, list):
        return tuple(_tuplify(x) for x in v)
    if isinstance(v, dict):
        return {k: _tuplify(x) for k, x in v.items()}
    return v


@settings(max_examples=300, deadline=None)
@given(mmdb_values)
def test_mmdb_value_round_trip(v):
    from rsyslog_spark.mmdb import decode, encode_value

    enc = encode_value(v)
    got, off = decode(enc, 0)
    assert off == len(enc)
    assert _tuplify(got) == _tuplify(v)


# ---------------------------------------------------------------------------
# BSON (mongo_wire)
# ---------------------------------------------------------------------------

bson_scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(1 << 63), max_value=(1 << 63) - 1),
    st.floats(allow_nan=False, allow_infinity=False),
    st.text(max_size=200),
)
bson_values = st.recursive(
    bson_scalars,
    lambda children: st.one_of(
        st.lists(children, max_size=5),
        st.dictionaries(
            st.text(max_size=15).filter(lambda s: "\x00" not in s),
            children, max_size=5,
        ),
    ),
    max_leaves=15,
)


@settings(max_examples=300, deadline=None)
@given(st.dictionaries(
    st.text(max_size=15).filter(lambda s: "\x00" not in s),
    bson_values, max_size=6,
))
def test_bson_document_round_trip(doc):
    from rsyslog_spark.mongo_wire import decode_document, encode_document

    enc = encode_document(doc)
    got, off = decode_document(enc)
    assert off == len(enc)
    assert got == doc


# ---------------------------------------------------------------------------
# AMQP 1.0 typed values
# ---------------------------------------------------------------------------


@settings(max_examples=300, deadline=None)
@given(st.recursive(
    st.one_of(
        st.none(),
        st.booleans(),
        st.integers(min_value=-(1 << 63), max_value=(1 << 63) - 1),
        st.text(max_size=300),
        st.binary(max_size=300).map(
            lambda b: __import__(
                "rsyslog_spark.amqp1_wire", fromlist=["Binary"]
            ).Binary(b)
        ),
    ),
    lambda children: st.one_of(
        st.lists(children, max_size=6),
        st.dictionaries(st.text(max_size=10), children, max_size=5),
    ),
    max_leaves=15,
))
def test_amqp1_value_round_trip(v):
    from rsyslog_spark.amqp1_wire import decode_value, encode_value

    enc = encode_value(v)
    got, off = decode_value(enc)
    assert off == len(enc)
    assert got == v


# ---------------------------------------------------------------------------
# Lumberjack v2 windows (beats)
# ---------------------------------------------------------------------------


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.dictionaries(
            st.text(max_size=10), st.text(max_size=40), max_size=4
        ),
        min_size=1, max_size=10,
    ),
    st.booleans(),
    st.integers(min_value=1, max_value=8),
)
def test_lumberjack_window_round_trip(events, compress, chunk):
    from rsyslog_spark.beats import LumberjackParser, lumberjack_window

    wire = lumberjack_window(events, seq_start=1, compress=compress)
    p = LumberjackParser()
    out = []
    for i in range(0, len(wire), chunk):  # fragmented feeds
        out += p.feed(wire[i:i + chunk])
    assert len(out) == 1
    batch, ack = out[0]
    assert [b["event"] for b in batch] == events
    assert [b["seq"] for b in batch] == list(range(1, len(events) + 1))


# ---------------------------------------------------------------------------
# BEEP frames
# ---------------------------------------------------------------------------


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["MSG", "RPY", "ERR", "ANS", "NUL"]),
            st.integers(min_value=0, max_value=1 << 30),  # channel
            st.integers(min_value=0, max_value=1 << 30),  # msgno
            st.integers(min_value=0, max_value=1 << 31),  # seqno
            st.binary(max_size=200),
            st.booleans(),
        ),
        min_size=1, max_size=6,
    ),
    st.integers(min_value=1, max_value=7),
)
def test_beep_frame_round_trip(frames, chunk):
    from rsyslog_spark.beep3195 import BeepParser, beep_frame

    wire = b"".join(
        beep_frame(kw, ch, mn, sq, pl, more=more,
                   ansno=(3 if kw == "ANS" else None))
        for kw, ch, mn, sq, pl, more in frames
    )
    p = BeepParser()
    out = []
    for i in range(0, len(wire), chunk):
        out += p.feed(wire[i:i + chunk])
    assert len(out) == len(frames)
    for got, (kw, ch, mn, sq, pl, more) in zip(out, frames):
        assert (got["kind"], got["channel"], got["msgno"],
                got["seqno"], got["payload"], got["more"]) == (
            kw, ch, mn, sq, pl, more)


# ---------------------------------------------------------------------------
# journal export (binary-safe writer ↔ reader)
# ---------------------------------------------------------------------------


@settings(max_examples=150, deadline=None)
@given(st.lists(
    st.dictionaries(
        st.text(
            alphabet=st.characters(
                whitelist_categories=("Lu", "Ll", "Nd"),
            ),
            min_size=1, max_size=12,
        ),
        st.text(max_size=60),
        min_size=1, max_size=5,
    ),
    min_size=1, max_size=4,
))
def test_journal_export_round_trip(entries):
    import tempfile

    from rsyslog_spark.sinks import journal_export_write
    from rsyslog_spark.sources_os import read_journal_export

    with tempfile.NamedTemporaryFile(suffix=".bin") as fh:
        fh.write(journal_export_write(entries))
        fh.flush()
        recs = read_journal_export(fh.name)
    assert len(recs) == len(entries)
    for rec, entry in zip(recs, entries):
        for k, v in entry.items():
            assert f"{k}={v}" in rec
