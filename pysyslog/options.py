"""Parser configuration.

Reimplements (from scratch, for a columnar engine) the package-global
configuration surface of the reference parser
(/root/reference/lib/Parse/Syslog/Line.pm:23-38).  The reference uses
mutable process globals; a distributed engine cannot, so options are an
immutable dataclass captured by the parse UDF closure and shipped to
executors.  `default_tz` + `now_epoch` replace the reference's
process-global timezone (`set_syslog_timezone`, Line.pm:1137-1156) and
wall clock (year inference, Line.pm:794-803): both must be explicit
parameters for deterministic, retry-safe distributed execution.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Callable, Optional, Tuple


@dataclass(frozen=True)
class ParserOptions:
    # ⇔ $DateParsing (Line.pm:24)
    date_parsing: bool = True
    # ⇔ $EpochCreate (Line.pm:25)
    epoch_create: bool = True
    # ⇔ $ExtractProgram (Line.pm:27) — "the most expensive set of regex"
    extract_program: bool = True
    # ⇔ $AutoDetectJSON (Line.pm:28)
    auto_detect_json: bool = False
    # ⇔ $AutoDetectKeyValues (Line.pm:29)
    auto_detect_key_values: bool = False
    # ⇔ $PruneRaw (Line.pm:30)
    prune_raw: bool = False
    # ⇔ $PruneEmpty (Line.pm:31)
    prune_empty: bool = False
    # ⇔ @PruneFields (Line.pm:32)
    prune_fields: Tuple[str, ...] = ()
    # ⇔ $RFC5424StructuredData (Line.pm:37)
    rfc5424_structured_data: bool = True
    # ⇔ $RFC5424StructuredDataStrict (Line.pm:38)
    rfc5424_strict: bool = False
    # ⇔ $FmtDate hook (Line.pm:33, :761-763). Callable(datetime_raw) ->
    # sequence (date, time, epoch, datetime_str); shorter sequences pad
    # with None exactly like the Perl hash-slice assignment.
    fmt_date: Optional[Callable] = None
    # ⇔ $TimeMomentFormatString (Line.pm:34, POD :348-350, applied at
    # :814-816): strftime-style format for datetime_utc/local/str.  The
    # reference's +00:00→Z rewrite still applies to the rendered string.
    # Supported codes: %Y %m %d %e %H %M %S %F %T %f %z %s %% (the
    # subset Time::Moment documents for this option's typical use).
    time_format: str = "%FT%T%f%z"
    # ⇔ set_syslog_timezone / use_utc_syslog (Line.pm:1137-1156), but
    # explicit.  IANA name ("UTC", "Europe/Warsaw", "EST").
    default_tz: str = "UTC"
    # Deterministic "now" (seconds since epoch, UTC) used for year
    # inference and parse-failure fallback (Line.pm:794-809).  None ->
    # resolved once at parser construction from the wall clock; tests
    # and distributed runs should always pin it.
    now_epoch: Optional[float] = None

    def with_(self, **kw) -> "ParserOptions":
        return replace(self, **kw)


# Perl-global-name -> dataclass-field mapping, so fixture `options:`
# blocks (t/data/*.yaml) and CLI flags can be applied directly.
# The reference's four DEPRECATED globals (Line.pm:40-44 —
# DateTimeCreate, HiResFmt, OutputTimeZone, NormalizeToUTC) are
# declared there but never read by the parse flow (POD :504-514 points
# users at TimeMomentFormatString / datetime_utc); they are
# intentionally absent here, and options_from_perl ignores them exactly
# as the reference does.
PERL_OPTION_NAMES = {
    "DateParsing": "date_parsing",
    "EpochCreate": "epoch_create",
    "ExtractProgram": "extract_program",
    "AutoDetectJSON": "auto_detect_json",
    "AutoDetectKeyValues": "auto_detect_key_values",
    "PruneRaw": "prune_raw",
    "PruneEmpty": "prune_empty",
    "PruneFields": "prune_fields",
    "RFC5424StructuredData": "rfc5424_structured_data",
    "RFC5424StructuredDataStrict": "rfc5424_strict",
    "TimeMomentFormatString": "time_format",
}


def options_from_perl(d: dict, base: ParserOptions = ParserOptions()) -> ParserOptions:
    """Build options from a {PerlGlobalName: value} dict (fixture style)."""
    kw = {}
    for k, v in (d or {}).items():
        f = PERL_OPTION_NAMES.get(k)
        if f is None:
            continue
        if f == "prune_fields":
            kw[f] = tuple(v) if not isinstance(v, str) else tuple(v.split())
        elif f == "time_format":
            kw[f] = str(v)
        else:
            kw[f] = bool(int(v)) if isinstance(v, str) else bool(v)
    return base.with_(**kw)


def psl_enable_sdata(base: ParserOptions = ParserOptions()) -> ParserOptions:
    """⇔ psl_enable_sdata() (Line.pm:1078-1082): all SDATA detection on."""
    return base.with_(
        auto_detect_json=True,
        auto_detect_key_values=True,
        rfc5424_structured_data=True,
    )
