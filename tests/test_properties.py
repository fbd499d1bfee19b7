"""Property-based robustness (hypothesis): the parser must be total —
any unicode line parses to a record without raising, preserves the
input verbatim in message_raw, and never loses bytes in the token
round-trip."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from pysyslog import ParserOptions, SyslogParser

P = SyslogParser(
    ParserOptions(
        now_epoch=1543622400.0,
        auto_detect_json=True,
        auto_detect_key_values=True,
    )
)
P_STRICT = SyslogParser(
    ParserOptions(now_epoch=1543622400.0, rfc5424_strict=True)
)


@given(st.text(max_size=500))
@settings(max_examples=300, deadline=None)
def test_parser_total_and_preserving(s):
    msg = P.parse(s)
    assert msg["message_raw"] == s
    # content+message only exist when the line isn't whitespace-led
    if not (s[:1].isspace() and s[:1] != ""):
        if not s or not s[0].isspace():
            assert "content" in msg


@given(st.text(max_size=300))
@settings(max_examples=200, deadline=None)
def test_strict_mode_total(s):
    assert P_STRICT.parse(s)["message_raw"] == s


@given(st.text(max_size=300))
@settings(max_examples=200, deadline=None)
def test_token_roundtrip_any_text(s):
    toks = list(s.encode("utf-8"))
    back = bytes(toks).decode("utf-8")
    assert back == s
    assert list(back.encode("utf-8")) == toks


@given(
    st.integers(min_value=0, max_value=1543622400 + 86400 * 300),
    st.sampled_from([0, 60, -300, 330, 120]),
)
@settings(max_examples=300, deadline=None)
def test_datetime_render_roundtrip(epoch, offset_min):
    """Rendered datetime_str re-parses to the same instant."""
    from pysyslog.parser_core import NS, SyslogParser as SP

    p = SyslogParser(ParserOptions(now_epoch=1543622400.0))
    ns = epoch * NS
    s = p._fmt_iso(ns, offset_min)
    back = p._parse_iso_datetime(s)
    assert back is not None
    assert back[0] == ns and back[1] == offset_min
