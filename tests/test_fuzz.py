"""Property-based fuzzing (hypothesis) — the analog of the reference's
fuzz_rsyslog_message harness (tools/fuzz_rsyslog_message.c): the parser
must never crash, and core invariants must hold for arbitrary input."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from rsyslog_spark.parsing.full import parse_line, sanitize

printable = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=200
)
anytext = st.text(max_size=200)


@settings(max_examples=300, deadline=None)
@given(anytext)
def test_parse_never_crashes(line):
    out = parse_line(line)
    assert isinstance(out, dict)
    assert out["pri"] is None or 0 <= out["pri"] <= 191
    # msg reconstruction never loses non-header content length-wise
    assert out["msg"] is None or isinstance(out["msg"], str)


@settings(max_examples=300, deadline=None)
@given(st.integers(0, 191), printable)
def test_pri_roundtrip(pri, rest):
    out = parse_line(f"<{pri}>{rest}")
    assert out["pri"] == pri


@settings(max_examples=300, deadline=None)
@given(anytext)
def test_sanitize_idempotent_and_clean(s):
    once = sanitize(s)
    assert sanitize(once) == once
    assert not any(ord(c) < 32 and c != "\t" for c in once)


@settings(max_examples=200, deadline=None)
@given(printable)
def test_tag_msg_partition(rest):
    """Whatever the header outcome, tag+msg is a suffix partition of
    the remaining content for headerless lines."""
    out = parse_line("<13>" + rest)
    if out["timereported_str"] is None and out["syslogtag"]:
        # headerless lines may donate their first word to HOSTNAME
        # (reference pmrfc3164 behavior, parsertest-parse-nodate.sh)
        prefix = (out["hostname"] + " ") if out["hostname"] else ""
        recombined = prefix + out["syslogtag"] + out["msg"]
        assert rest.startswith(recombined[: len(rest)])
