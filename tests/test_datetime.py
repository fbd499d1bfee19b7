"""Datetime semantics — port of the reference's
t/03-datetime-calculations.t (year inference, configured named
timezones incl. DST edges, ms/us precision + fractional epoch)."""

from __future__ import annotations

from pysyslog import ParserOptions, SyslogParser


def parse(line, now_iso, tz="UTC"):
    from datetime import datetime, timezone

    now = datetime.fromisoformat(now_iso.replace("Z", "+00:00"))
    opts = ParserOptions(now_epoch=now.timestamp(), default_tz=tz)
    return SyslogParser(opts).parse(line)


DHCP = "<11>Mar  27 01:59:59 11.22.33.44 dhcpd: DHCPINFORM from 172.16.2.137 via vlan3"


def test_future_date_is_previous_year():
    msg = parse(DHCP, "2016-05-29T05:00:00Z")
    assert msg["datetime_utc"] == "2016-03-27T01:59:59Z"
    assert msg["datetime_raw"] == "Mar  27 01:59:59"

    msg = parse(DHCP, "2016-02-29T05:41:00Z")
    assert msg["datetime_utc"] == "2015-03-27T01:59:59Z"


def test_named_timezone_iso_message_offset_wins():
    line = '2015-09-30T06:26:06.779373-05:00 my-host my-script.pl: {"lunchTime":1443612366.442}'
    for tz in ("EST", "Europe/Warsaw"):
        msg = parse(line, "2016-05-29T05:00:00Z", tz)
        assert msg["datetime_utc"] == "2015-09-30T11:26:06.779373Z"
        assert msg["datetime_raw"] == "2015-09-30T06:26:06.779373-05:00"


def test_named_timezone_offsetless_dates_use_zone_offset_at_now():
    # Offset-less dates take the configured zone's offset *at now*
    # (reference: Time::Moment->now()->offset, Line.pm:784).
    #
    # Documented deviation from t/03's literal expectations: the
    # reference's now()->offset reads the REAL wall clock (Time::Moment
    # is XS; Test::MockTime can't intercept it), so its committed
    # Warsaw winter-time expectations encode +02:00 — the offset at
    # whatever summer moment the suite was run — and would fail if the
    # Perl suite ran in winter.  Our engine pins the evaluation instant
    # to `now_epoch`, making these deterministic: CEST(+02) for a May
    # "now", CET(+01) for a February "now".
    msg = parse(DHCP, "2016-05-29T05:00:00Z", "Europe/Warsaw")  # CEST +02
    assert msg["datetime_utc"] == "2016-03-26T23:59:59Z"

    msg = parse(DHCP, "2016-02-29T05:41:00Z", "Europe/Warsaw")  # CET +01
    assert msg["datetime_utc"] == "2015-03-27T00:59:59Z"

    msg = parse(
        "<11>Mar  27 03:00:01 11.22.33.44 dhcpd: DHCPINFORM from 172.16.2.137 via vlan3",
        "2016-02-29T05:41:00Z",
        "Europe/Warsaw",
    )
    assert msg["datetime_utc"] == "2015-03-27T02:00:01Z"


def test_millisecond_resolution():
    now = "2016-01-01T00:00:01Z"

    msg = parse(
        "2015-01-01T11:09:36+02:00 hostname.company.tld : $year Jan  1 11:09:36.290 CET: %ETHPORT-5-IF_DOWN_CFG_CHANGE: Interface Ethernet121/1/1 is down(Config change)",
        now,
        "EET",
    )
    assert msg["date"] == "2015-01-01"
    assert msg["time"] == "11:09:36"
    assert msg["tz"] == "+0200"
    assert msg["datetime_str"] == "2015-01-01T11:09:36+0200"
    assert msg["datetime_utc"] == "2015-01-01T09:09:36Z"
    assert msg["epoch"] == "1420103376"

    msg = parse(
        '2015-09-30T06:26:06.779373-05:00 my-host my-script.pl: {"lunchTime":1443612366.442}',
        now,
        "EST",
    )
    assert msg["date"] == "2015-09-30"
    assert msg["time"] == "06:26:06.779373"
    assert msg["tz"] == "-0500"
    assert msg["datetime_str"] == "2015-09-30T06:26:06.779373-0500"
    assert msg["datetime_utc"] == "2015-09-30T11:26:06.779373Z"
    assert msg["epoch"] == "1443612366.779373"
    # datetime_local rendered at the configured zone's offset-at-now
    assert msg["datetime_local"] == "2015-09-30T06:26:06.779373-0500"

    msg = parse(
        '2015-09-30T06:26:06.779373Z my-host my-script.pl: {"lunchTime":1443612366.442}',
        now,
    )
    assert msg["date"] == "2015-09-30"
    assert msg["time"] == "06:26:06.779373"
    assert msg["tz"] == "Z"
    assert msg["datetime_utc"] == "2015-09-30T06:26:06.779373Z"
    assert msg["epoch"] == "1443594366.779373"  # 06:26:06Z, no -05 shift


def test_millisecond_fraction_renders_three_digits():
    msg = parse(
        "2015-09-30T06:26:06.264Z my-host my-script.pl: hello",
        "2016-01-01T00:00:01Z",
    )
    assert msg["epoch"] == "1443594366.264"
    assert msg["datetime_utc"] == "2015-09-30T06:26:06.264Z"


def test_invalid_date_falls_back_to_now():
    # Day 99 fails construction -> "now" fallback (Line.pm:808-809)
    msg = parse(
        "Mar 99 01:59:59 host prog: hello",
        "2016-05-29T05:00:00Z",
    )
    assert msg["datetime_utc"] == "2016-05-29T05:00:00Z"
    assert msg["datetime_raw"] == "Mar 99 01:59:59"


def test_relay_origin_extraction():
    msg = parse(
        "<14>1 2024-05-23T03:38:26+00:00 fwvirt-src 1 2024-05-23T03:38:26.264Z fw101-SRX4200 RT_FLOW - CLOSE",
        "2024-06-01T00:00:00Z",
    )
    assert msg["origin"] == "fw101-SRX4200"
    assert msg["origin_date"] == "2024-05-23T03:38:26.264Z"
    assert msg["program_name"] == "RT_FLOW"
    assert msg["content"] == "CLOSE"


def test_time_moment_format_string():
    """⇔ $TimeMomentFormatString (Line.pm:34, applied :814-816): a
    custom format drives datetime_utc/local/str rendering, with the
    +00:00→Z rewrite and the generic date/time re-split intact."""
    from datetime import datetime

    now = datetime.fromisoformat("2016-01-01T00:00:01+00:00").timestamp()
    opts = ParserOptions(now_epoch=now, time_format="%Y-%m-%d %H:%M:%S%z")
    msg = SyslogParser(opts).parse(
        "2015-09-30T06:26:06.264Z my-host my-script.pl: hello"
    )
    assert msg["datetime_utc"] == "2015-09-30 06:26:06Z"  # +0000 -> Z
    assert msg["datetime_str"] == "2015-09-30 06:26:06Z"
    assert msg["date"] == "2015-09-30"
    assert msg["time"] == "06:26:06"
    assert msg["tz"] == "Z"
    # epoch is format-independent (%s%f, Line.pm:812)
    assert msg["epoch"] == "1443594366.264"

    # non-UTC offset keeps %z verbatim (no Z rewrite)
    est = ParserOptions(now_epoch=now, time_format="%FT%T%z", default_tz="EST")
    m2 = SyslogParser(est).parse("May 19 22:03:29 janus sshd[10173]: x")
    assert m2["datetime_str"].endswith("-0500")
    assert m2["tz"] == "-0500"


def test_time_format_perl_option_name_maps():
    from pysyslog.options import options_from_perl

    o = options_from_perl({"TimeMomentFormatString": "%T"})
    assert o.time_format == "%T"
