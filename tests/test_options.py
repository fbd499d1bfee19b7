"""Flag semantics — port of the reference's t/02-functions.t plus
auxiliary scalar helpers (preamble_priority/preamble_facility,
Line.pm:1097-1135) and psl_enable_sdata."""

from __future__ import annotations

import pytest

from pysyslog import (
    ParserOptions,
    SyslogParser,
    preamble_facility,
    preamble_priority,
    psl_enable_sdata,
)

MSGS = {
    "Snort Message Parse": "<11>Jan  1 00:00:00 mainfw snort[32640]: [1:1893:4] SNMP missing community string attempt [Classification: Misc Attack] [Priority: 2]: {UDP} 1.2.3.4:23210 -> 5.6.7.8:161",
    "IP as Hostname": "<11>Jan  1 00:00:00 11.22.33.44 dhcpd: DHCPINFORM from 172.16.2.137 via vlan3",
    "Without Preamble": "Jan  1 00:00:00 11.22.33.44 dhcpd: DHCPINFORM from 172.16.2.137 via vlan3",
    "Dotted Hostname": "<11>Jan  1 00:00:00 dev.example.com dhcpd: DHCPINFORM from 172.16.2.137 via vlan3",
    "Syslog reset": "Jan  1 00:00:00 example syslogd 1.2.3: restart (remote reception).",
    "Cisco ASA": "<163>Jun 7 18:39:00 hostname.domain.tld %ASA-3-313001: Denied ICMP type=5, code=1 from 1.2.3.4 on interface inside",
    "Cisco ASA Alt": "<161>Jun 7 18:39:00 hostname : %ASA-3-313001: Denied ICMP type=5, code=1 from 1.2.3.4 on interface inside",
    "Cisco NX-OS": "2013-08-09T11:09:36+02:00 hostname.company.tld : 2013 Aug  9 11:09:36.290 CET: %ETHPORT-5-IF_DOWN_CFG_CHANGE: Interface Ethernet121/1/1 is down(Config change)",
    "Cisco Catalyst": "<188>Aug 13 00:10:02 10.43.0.10 1813056: Aug 13 00:15:02: %C4K_EBM-4-HOSTFLAPPING: Host 00:1B:21:4B:7B:5D in vlan 1 is flapping between port Gi6/37 and port Gi6/38",
}

OPTS = ParserOptions(
    now_epoch=1543622400.0,  # 2018-12-01T00:00:00Z
    default_tz="UTC",
    epoch_create=True,
    prune_raw=True,
    prune_empty=True,
    prune_fields=("program",),
)


@pytest.mark.parametrize("name", sorted(MSGS))
def test_prune_flags(name):
    msg = SyslogParser(OPTS).parse(MSGS[name])
    assert not [k for k in msg if k.endswith("_raw")], f"PruneRaw failed: {msg}"
    assert not [k for k in msg if msg[k] is None], f"PruneEmpty failed: {msg}"
    assert "epoch" in msg and float(msg["epoch"]) > 0, f"EpochCreate failed: {msg}"
    assert "program" not in msg


def test_epoch_create_off():
    msg = SyslogParser(OPTS.with_(epoch_create=False)).parse(MSGS["Cisco ASA"])
    assert "epoch" not in msg
    assert msg["datetime_utc"]  # other datetime fields unaffected


def test_date_parsing_off():
    msg = SyslogParser(OPTS.with_(date_parsing=False, prune_empty=False, prune_raw=False)).parse(
        MSGS["Cisco ASA"]
    )
    assert msg["datetime_raw"] == "Jun 7 18:39:00"
    for k in ("date", "time", "epoch", "datetime_str", "datetime_utc"):
        assert k not in msg


def test_preamble_helpers():
    assert preamble_priority(13) == {"preamble": 13, "as_int": 5, "as_text": "notice"}
    assert preamble_facility(13) == {"preamble": 13, "as_int": 8, "as_text": "user"}


def test_psl_enable_sdata():
    o = psl_enable_sdata(ParserOptions(now_epoch=0))
    assert o.auto_detect_json and o.auto_detect_key_values and o.rfc5424_structured_data


def test_non_syslog_whitespace_guard():
    p = SyslogParser(OPTS.with_(prune_raw=False))
    msg = p.parse("   continuation line content")
    assert msg == {"message_raw": "   continuation line content"}
